package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import scala.collection.mutable
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var log = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val gc = si.taskMetrics.jvmGCTime
        log ::= f"stage ${si.stageId}%3d ${ms/1000.0}%7.2f s tasks=${si.numTasks}%3d gc=${gc/1000.0}%5.2f exec=${si.taskMetrics.executorRunTime/1000.0}%7.2f"
      }
    })
    for (i <- 1 to 3) {
      log = Nil
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.qDedupNgramJaccard(spark, d).count()
      println(f"== run $i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      log.reverse.foreach(println)
    }
    spark.stop()
  }
}
