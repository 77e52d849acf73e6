package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Mirror of the driver's t1 smoke: SparkEntry.entry on sf0.001 must
  * return rows. Prints the row count and the first rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows: $n")
    df.show(5, truncate = false)
    require(n > 0, "entry must return rows")
    spark.stop()
  }
}
