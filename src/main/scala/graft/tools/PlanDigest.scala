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
      // staged-layout dirs are built from java.io.tmpdir, which is not
      // /tmp on every host — normalize the RUNTIME tmpdir (regex-quoted)
      // as well as the literal /tmp so digests stay machine-independent
      .replaceAll(
        java.util.regex.Pattern.quote(
          sys.props("java.io.tmpdir").stripSuffix("/")) + "/[^ ,)\\]]+",
        "/tmp/_")
      .replaceAll("/tmp/[^ ,)\\]]+", "/tmp/_")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(_)")
      // JVM identity hashes: array-typed expression args ([J@1a2b3c) and
      // any other Object.toString leak into plan strings.
      // Integer.toHexString pads nothing, so a hash below 0x100000
      // prints 5-or-fewer digits — the round-12 q_minhash_source_sketch
      // digest flap was exactly this rule written as {6,} missing one.
      // \b keeps it off hex-prefixed identifiers (no plan token puts a
      // word char after an identity hash).
      .replaceAll("@[0-9a-f]+\\b", "@_")
      // JIT-assigned lambda-class addresses (Lambda$123/0x00007f…);
      // the replacement $ must be escaped or Java reads it as a group ref
      .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$_")
      // HOF lambda-variable counters (lambda x_3) increment per SESSION,
      // so they are stable across fresh JVMs only while query order never
      // changes — normalize them away entirely
      .replaceAll("(lambda [a-z]+)_\\d+", "$1_")

  private def md5(s: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** (name → digest) for every declared query, sorted by name.
    * Also the bench artifact's plan-drift source (Bench.rollupDigest).
    *
    * Metadata truncation MUST be effectively disabled while digesting:
    * Spark cuts DataFilters/Location strings at
    * spark.sql.maxMetadataStringLength (default 100) BEFORE our
    * normalization runs, and the cut offset shifts with raw expr-id
    * widths — so a session that has planned more queries (wider #ids)
    * truncates at a different token and the digest drifts with session
    * HISTORY, not plan shape (found via q_funnel in round 9). */
  def digestMap(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val dg = try
        md5(normalize(fn(spark, dir).queryExecution.executedPlan.toString))
      catch { case _: Throwable => "ERROR" }
      name -> dg
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }

  /** One hash over the whole (name, digest) map — compact enough for the
    * one-line bench JSON; any plan change anywhere changes it. */
  def rollupDigest(spark: SparkSession, dir: String): String =
    md5(digestMap(spark, dir)
      .map { case (n, d) => s"$n=$d" }.mkString("\n"))

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("PLANS_DIGEST.json")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entries = digestMap(spark, d).map {
      case (name, dg) => s""""$name": "$dg""""
    }
    val json = entries.mkString("{\n  ", ",\n  ", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"wrote ${entries.size} digests to $out")
    spark.stop()
  }
}
