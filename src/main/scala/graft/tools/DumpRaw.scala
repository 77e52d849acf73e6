package graft.tools
import org.apache.spark.sql.SparkSession
object DumpRaw {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    val p = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)), p.getBytes("UTF-8"))
    spark.stop()
  }
}
