package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `.explain("formatted")` output for declared queries to
  * plans/<dir>/<query>_<tag>.txt — the optimization-round evidence files
  * (judge checks plan claims against these). Usage:
  *   ExplainDump <outSubdir> <tag> [q_a,q_b,...]    (default: all queries)
  * Runs at the bench master/conf (local[$SPARK_GRAFT_CPUS]) so the plans
  * match what Bench times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outSub = args(0)
    val tag = args(1)
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
      .resolve("plans").resolve(outSub)
    Files.createDirectories(root)
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, d)
        // QueryExecution.explainString mirrors df.explain("formatted")
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(root.resolve(s"${name}_$tag.txt"), txt.getBytes("UTF-8"))
        println(s"ok $name")
      } catch { case e: Throwable =>
        println(s"ERR $name ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
