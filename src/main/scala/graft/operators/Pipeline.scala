package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** End-to-end corpus curation — the north-star COMPOSITION: the pipeline a
  * training-data user actually runs, built purely from this library's
  * operators, staying one lazy DataFrame program except where the dedup
  * clustering is inherently iterative.
  *
  * Stages (each individually oracled/spec-tested elsewhere):
  *  1. annotate: text features in one pass (fingerprint, quality, lang,
  *     token stats — TextAnalysis.withTextFeatures);
  *  2. exact dedup: deterministic survivor per content fingerprint;
  *  3. near-dup collapse: MinHash+LSH pairs → pointer-jumping connected
  *     components → keep each cluster's canonical (min doc_id);
  *  4. quality gate;
  *  5. deterministic train/val/test split from a salted content hash —
  *     reproducible across runs, engines, and partition layouts (never
  *     rand()).
  *
  * At 100 TB every stage is the shape documented in SCALE.md: per-row
  * codegen for (1), one hash shuffle for (2), the bucketed LSH pipeline
  * for (3), and pure narrow work for (4)-(5).
  */
object Pipeline {

  /** Curated, annotated corpus: exact+near dedup'd, quality-gated, split.
    * Output columns: doc_id, lang, source, n_chars, lang_pred, n_tokens,
    * quality, split. */
  def curateCorpus(docs: DataFrame, minQuality: Double): DataFrame = {
    val featured = TextAnalysis.withTextFeatures(docs)
    // 2. exact dedup — row_number, not dropDuplicates: survivor choice
    // must be deterministic (SURVEY §2 A2 tie-break trap)
    val wExact = Window.partitionBy("fingerprint").orderBy("doc_id")
    val exactKept = featured
      .withColumn("__rn", row_number().over(wExact))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // 3. near-dup collapse via the LSH scale path; left join keeps docs
    // that never appeared in any near-dup pair (canonical IS NULL)
    val clusters = Dedup.connectedComponents(
      Dedup.minhashPairs(exactKept.select("doc_id", "text")))
    val bucket = pmod(
      xxhash64(concat(lit("graft_split"), col("fingerprint"))), lit(100L))
    exactKept
      .join(clusters, Seq("doc_id"), "left")
      .filter(col("canonical").isNull || col("canonical") === col("doc_id"))
      .filter(col("quality") >= minQuality)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "n_chars", "lang_pred",
        "n_tokens", "quality", "split")
      .orderBy("doc_id")
  }

  // Declared rows-only: the composition crosses the LSH/CC stages DuckDB
  // cannot replicate; every constituent stage has its own oracle or spec.
  val qCorpusCurate: (SparkSession, String) => DataFrame = (s, d) =>
    curateCorpus(Tables.documents(s, d), minQuality = 0.3)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_corpus_curate", qCorpusCurate, None)
  )
}
