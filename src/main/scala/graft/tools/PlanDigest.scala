package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dumps a stable digest of every declared query's executed plan to
  * PLANS_DIGEST.json, so plan regressions are detectable mechanically
  * across rounds even when timing noise masks them (BASELINE §C's
  * min-rule complement): a changed digest with an unchanged query means
  * the PLAN changed — diff the two explains; an unchanged digest means
  * any timing drift is ambient.
  *
  * Normalization strips the per-session counters (expression ids
  * `#123`, `plan_id=…`, statistics sizes, staged-layout dir hashes and
  * temp-view suffixes) so the digest is a function of plan SHAPE only.
  * Queries whose physical plan legitimately varies with sampling
  * (range-partition boundaries) still digest stably: boundaries live in
  * exchange metadata the normalizer drops.
  */
object PlanDigest {
  def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+L?", "#_")
      .replaceAll("plan_id=\\d+", "plan_id=_")
      .replaceAll("sizeInBytes=[^,)\\]]+", "size=_")
      .replaceAll("g7_[0-9a-f]+_", "g7__")
      .replaceAll("graft_(b_orders|b_lineitem|rollup|stream|scaleprobe)[_a-z0-9]*",
        "graft_$1_")
      .replaceAll("local-\\d+", "local-_")
      .replaceAll("/tmp/[^ ,)\\]]+", "/tmp/_")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(_)")
      // JVM identity hashes: array-typed expression args ([J@1a2b3c) and
      // any other Object.toString leak into plan strings
      .replaceAll("@[0-9a-f]{6,}", "@_")
      // JIT-assigned lambda-class addresses (Lambda$123/0x00007f…);
      // the replacement $ must be escaped or Java reads it as a group ref
      .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$_")
      // HOF lambda-variable counters (lambda x_3) increment per SESSION,
      // so they are stable across fresh JVMs only while query order never
      // changes — normalize them away entirely
      .replaceAll("(lambda [a-z]+)_\\d+", "$1_")

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("PLANS_DIGEST.json")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val md = MessageDigest.getInstance("MD5")
    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val dg = try {
          val p = normalize(fn(spark, d).queryExecution.executedPlan.toString)
          md.reset()
          md.digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
        } catch { case _: Throwable => "ERROR" }
        s""""$name": "$dg""""
    }
    val json = entries.mkString("{\n  ", ",\n  ", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"wrote ${entries.size} digests to $out")
    spark.stop()
  }
}
