package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not driver contract): does scan parallelism bound the
  * mid-band pure queries? The fixture tables are single ~2-11 MB parquet
  * files; with maxPartitionBytes=128m and openCost=4m a lineitem scan
  * packs into ~3 splits, so a 32-core session runs the scan stage ~10%
  * occupied. spark.sql.files.minPartitionNum floors the split count at
  * the session's parallelism — scale-adaptive (at cluster scale the
  * 128 MB cap dominates), not a local constant. */
object ScanParProbe {
  def force(df: DataFrame): Long = {
    df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
    df.count()
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q_tpch_q1", "q_tpch_q6", "q_tpch_q21", "q_tpch_q2",
      "q_agg_groupby_sum", "q_tpch_q18")
    def timeAll(tag: String): Unit = qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, d))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-10s $q%-20s ${ts.map(t => f"$t%5.2f").mkString(" ")}")
    }
    timeAll("default")
    spark.conf.set("spark.sql.files.minPartitionNum", cpus)
    timeAll("minPart")
    spark.conf.set("spark.sql.files.minPartitionNum", "0")
    spark.conf.set("spark.sql.files.openCostInBytes", (128 * 1024).toString)
    timeAll("openCost")
    spark.stop()
  }
}
