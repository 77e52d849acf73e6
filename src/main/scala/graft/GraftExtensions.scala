package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DoubleArrayDot, MinHashSig, SimHash64, SortedLongIntersectCount}
import graft.operators.Dedup

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a,b)…")`
  * works and the library is usable from pure-SQL jobs
  * (`--conf spark.sql.extensions=graft.GraftExtensions` on spark-submit,
  * or `.withExtensions` on the builder — SparkEntry.configure does the
  * latter).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - sequential-fold dot product of two array<double>"),
      (exprs: Seq[Expression]) => DoubleArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count",
        "graft_intersect_count(a, b) - merge-scan intersection size of two sorted distinct array<bigint>"),
      (exprs: Seq[Expression]) =>
        SortedLongIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        s"graft_minhash_sig(hashes) - ${Dedup.NumHashes}-permutation MinHash signature of an array<bigint> of shingle hashes"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, Dedup.hashA, Dedup.hashB,
          Dedup.MersennePrime)))
    e.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(hashes) - 64-bit SimHash of an array<bigint> of token hashes"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    // Spark's runtime-filter bloom machinery surfaced as SQL functions
    // (membership-set sketch for seen-set gating; see Curation
    // .decontaminateBloom). The probe's bloom argument must be a constant
    // or scalar subquery — Spark's own BloomFilterMightContain contract.
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(hashed_value, est_items) - mergeable Bloom filter over pre-hashed (xxhash64) bigint values"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      info("graft_bloom_might_contain",
        "graft_bloom_might_contain(bloom, hashed_value) - membership probe; false is definite, true needs exact verify"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
    // Transparent materialized-view rewrite (plans.MvRewriteRule): an
    // optimizer rule that answers a whole-fact-table aggregate from the
    // registered daily rollup when every expression is semantically
    // derivable — an empty registry makes it a single map lookup.
    e.injectOptimizerRule(s => graft.plans.MvRewriteRule(s))
    // TABLE-VALUED time travel: `SELECT … FROM graft_orders_version(dir,
    // v)` resolves to the versioned table's snapshot read — the SQL
    // surface of the table format (Iceberg's `VERSION AS OF` shape as a
    // TVF), so pure-SQL jobs can time-travel without touching the Scala
    // API. Arguments must be foldable (a table identifier is planner
    // input); the staged demo table is memoized per (session, dir), so
    // analysis pays the build at most once per app.
    e.injectTableFunction((
      FunctionIdentifier("graft_orders_version"),
      info("graft_orders_version",
        "graft_orders_version(sf_dir, version) - snapshot read of the staged versioned orders table at `version`"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 && exprs.forall(_.foldable),
          "graft_orders_version(sf_dir, version) takes two literals")
        val dir = exprs(0).eval().toString
        val v = exprs(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case x => x.toString.toInt
        }
        val s = org.apache.spark.sql.SparkSession.active
        operators.Lakehouse.readVersion(
          s, operators.Lakehouse.versionedOrdersRoot(s, dir), v,
          "o_orderkey").queryExecution.logical
      }))
  }
}
