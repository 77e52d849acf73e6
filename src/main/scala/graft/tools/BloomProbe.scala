package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: does Spark's runtime Bloom-filter injection fire on the
  * TPC-H star queries at test SF, and under which thresholds? */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtimeFilter.number.threshold"))
      println(s"$k = ${spark.conf.getOption(k)}")

    def probe(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val hits = p.linesIterator
        .filter(l => l.toLowerCase.contains("bloom")).toSeq
      println(s"== $name bloomLines=${hits.size}")
      hits.take(4).foreach(l => println("   " + l.trim.take(160)))
    }
    println("--- fact-scale simulation: no auto-broadcast, app threshold 0 ---")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probe("q_tpch_q9")
    probe("q_tpch_q5")
    probe("q_tpch_q8")

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // bloom on/off A/B under the fact-scale sim (3 alternating reps each)
    for (rep <- 1 to 3; on <- Seq(true, false)) {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        on.toString)
      println(f"rep=$rep bloom=$on q9=${time("q_tpch_q9")}%.2f s")
    }
    spark.stop()
  }
}
