package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All declared queries live in the Registry (QueryDef.scala); each module
  * under graft.operators contributes its defs with colocated DuckDB
  * oracles.
  */
object SparkEntry {

  /** Session defaults shared by Verify / Bench / tests.
    * ANSI off: the reference's coercion semantics (SURVEY §1.2) are the
    * classic permissive casts (bad string → null, wraparound arithmetic),
    * and DuckDB's TRY-style behavior is matched per-query in the oracles.
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // Floor scan parallelism at the session's core count (guide §6:
      // `spark.sql.files.minPartitionNum`). The fixture tables are single
      // small parquet files, which the default split math (open-cost 4 MB
      // floor) packs into 1-3 splits — a 32-core session then runs every
      // scan stage <10% occupied and the whole mid-band of pure queries
      // is scan-task-bound (measured: tpch_q1 1.53→1.30 s, q6 0.44→0.28,
      // q2 2.2→1.85 warm). Scale-adaptive, not a local constant: the
      // floor tracks whatever parallelism the session is given (the
      // driver's lower-core bench run gets the lower floor), and at
      // cluster scale (128 MB-1 GB files) maxPartitionBytes dominates
      // and the floor is inert.
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      // earlier fixture drops stored events.ts as TIMESTAMP(NANOS), which
      // Spark has no native type for; read those as Long nanos and convert
      // in Tables.events (no-op on the current TIMESTAMP(MICROS) fixtures).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's semantic heart: latest-active argmax per group
    * (dags/subscription_flow.py:93-103). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.qArgmaxPerGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
