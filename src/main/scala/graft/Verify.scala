package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration escape hatch, same contract as Bench's: unset in the
    // driver run → full declared surface
    val filter = sys.env.get("SPARK_GRAFT_VERIFY_FILTER")
      .map(_.split(",").toSet)
    val queries = filter match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = filter match {
      case Some(names) => SparkEntry.oracleSql.view.filterKeys(names).toMap
      case None => SparkEntry.oracleSql
    }
    // A filtered run writes its oracle subset to a DIFFERENT artifact name
    // (ADVICE r7): rerunning a filter into an outDir already holding a full
    // dump would otherwise pair full per-query results with a partial
    // oracle_sql.json — a mixed artifact a downstream comparator could
    // silently mis-scope. The filtered artifact carries EVERY filtered
    // query name (null for rows-only keys) so the comparator knows the
    // exact scope including oracle-less queries. The driver's full run
    // (no filter) is byte-unchanged.
    filter match {
      case Some(_) =>
        val json = queries.keys.toSeq.sorted
          .map(k => s"${q(k)}: ${oracles.get(k).map(q).getOrElse("null")}")
          .mkString("{", ",", "}")
        Files.writeString(Paths.get(s"$outDir/oracle_sql_filtered.json"), json)
      case None =>
        val json = oracles
          .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
        Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
