package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q_table_lifecycle / q_table_maintenance_lifecycle —
  * after the MetaIO change, where does the remaining per-pass cost
  * live (data writes vs stats vs commits vs the summary read)? */
object LifecyclePhaseProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    import graft.operators.Lakehouse
    // warm
    graft.SparkEntry.queries("q_table_lifecycle")(spark, d).collect()
    val nJobs0 = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs0.incrementAndGet()
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          starts.put(j.jobId, (System.nanoTime(), desc)): Unit
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
            done.add(((System.nanoTime() - t0) / 1e9, desc)): Unit
          }
        }
      })
    for (pass <- 1 to 2) {
      val before = nJobs0.get()
      done.clear()
      time("lifecycle") {
        graft.SparkEntry.queries("q_table_lifecycle")(spark, d).collect()
      }
      println(s"  jobs: ${nJobs0.get() - before}")
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq.sortBy(-_._1).take(14).foreach { case (t, desc) =>
        println(f"    $t%5.2fs  ${desc.take(90)}")
      }
      val b2 = nJobs0.get()
      done.clear()
      time("maintenance") {
        graft.SparkEntry.queries("q_table_maintenance_lifecycle")(spark, d)
          .collect()
      }
      println(s"  jobs: ${nJobs0.get() - b2}")
      done.asScala.toSeq.sortBy(-_._1).take(12).foreach { case (t, desc) =>
        println(f"    $t%5.2fs  ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
