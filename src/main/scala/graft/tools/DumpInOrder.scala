package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump one key's NORMALIZED plan captured in full-session order (every
  * declared query planned first, sorted by name, as PlanDigest does) —
  * for diffing a digest move against the standalone capture. */
object DumpInOrder {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    val target = args(0)
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = try
        fn(spark, d).queryExecution.executedPlan.toString
      catch { case _: Throwable => "ERROR" }
      if (name == target)
        java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
          PlanDigest.normalize(plan).getBytes("UTF-8"))
      if (name == target && args.length < 3) { spark.stop(); return }
    }
    spark.stop()
  }
}
