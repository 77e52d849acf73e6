package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §B).
  * Plain parquet reads: the fixed schemas live in the parquet footers, the
  * vectorized reader + Catalyst column pruning / predicate pushdown do the
  * heavy lifting. At cluster scale these paths would be partitioned
  * directories; the API shape (dir + logical name) is the same.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `ts` normalization, adaptive to the fixture generation in use:
    * earlier drops stored parquet TIMESTAMP(NANOS) — Spark has no
    * nanosecond timestamp type, so (with
    * spark.sql.legacy.parquet.nanosAsLong) it arrives as a Long of
    * epoch-nanos and is converted to a microsecond timestamp; current
    * drops store TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ), cast to
    * the session-zone timestamp (session is pinned UTC, so the instant is
    * unchanged). Sub-microsecond truncation on the nanos path is
    * irrelevant to the windowed queries (coarsest unit kept is whole
    * seconds). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
