package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark plan builder over a testdata dir plus an
  * optional DuckDB oracle (ANSI SQL over the same parquet tables).
  *
  * Determinism contract (SURVEY.md §2.12): every query's output is sorted
  * by a unique key, money arithmetic goes through DECIMAL(18,2) before a
  * final cast to DOUBLE (bit-identical across engines), and timestamps in
  * outputs are formatted as strings — so the driver's sort-columns-then-hash
  * compare is stable.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All declared queries, in declaration order. */
  lazy val all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Relational2.defs ++
      operators.Olap.defs ++
      operators.Olap2.defs ++
      operators.Subqueries.defs ++
      operators.Events.defs ++
      operators.Temporal.defs ++
      operators.Graph.defs ++
      operators.Entity.defs ++
      operators.TextAnalysis.defs ++
      operators.Curation.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs ++
      operators.Pipeline.defs ++
      operators.Lakehouse.defs ++
      operators.SqlTwins.defs ++
      streaming.EventsStreaming.defs
}
