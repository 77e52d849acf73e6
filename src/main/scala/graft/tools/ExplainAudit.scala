package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
/** Prints key physical-plan facts for every declared query: join
  * strategies, pushed filters, scan schemas, sort strategy. Used to audit
  * that plans are the ones a 100 TB deployment would want. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkEntry.configure(SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val interesting = plan.linesIterator.filter(l =>
          l.contains("Join") || l.contains("TakeOrdered") ||
          l.contains("Exchange") || l.contains("PushedFilters: [I") ||
          l.contains("HashAggregate") || l.contains("Generate") ||
          l.contains("Window") || l.contains("Sort ")).map(_.trim.take(110))
        println(s"== $name")
        interesting.take(12).foreach(l => println(s"   $l"))
      } catch { case e: Throwable => println(s"== $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
