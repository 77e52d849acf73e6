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
    * quality, split.
    *
    * `fullCorpusPairs`: an already-verified near-dup pair table over the
    * UN-dedup'd corpus (the persisted artifact a 100 TB pipeline computes
    * once and feeds to every consumer — SCALE.md §2). When supplied AND the
    * table was built without the hot-bucket cap engaging
    * (`nHotBuckets == 0`), the LSH stage is replaced by two semi-joins
    * restricting those pairs to the exact-dedup survivors. That restriction
    * equals recomputing pairs on the survivor subset: banding is a
    * deterministic per-doc function, so the subset's candidate pairs are
    * exactly the full corpus's candidate pairs with both endpoints
    * surviving. When the cap DID engage, restriction is not exact — star
    * degradation routes member↔member pairs through a hub, and if the full
    * corpus trips the cap where the survivor subset would not, verified
    * member↔member pairs are simply absent from the restricted set
    * (clusters under-merge, duplicates survive) even when every hub
    * survives — so this falls back to recomputing pairs on the survivors. */
  def curateCorpus(docs: DataFrame, minQuality: Double,
      fullCorpusPairs: Option[Dedup.PairTable] = None): DataFrame = {
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
    val pairs = fullCorpusPairs match {
      case Some(pt) if pt.nHotBuckets == 0 =>
        val ids = exactKept.select("doc_id")
        pt.pairs
          .join(ids.select(col("doc_id").as("doc_a")), Seq("doc_a"),
            "left_semi")
          .join(ids.select(col("doc_id").as("doc_b")), Seq("doc_b"),
            "left_semi")
      case other =>
        if (other.isDefined)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "shared pair table was built with the hot-bucket cap engaged; " +
              "recomputing near-dup pairs on the exact-dedup survivors")
        Dedup.minhashPairs(exactKept.select("doc_id", "text"))
    }
    val clusters = Dedup.connectedComponents(pairs)
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
  // Feeds from the SHARED verified pair table (computed once per corpus and
  // reused by the pair report and both clusterings) instead of re-running
  // shingle→band→verify on the survivor subset.
  val qCorpusCurate: (SparkSession, String) => DataFrame = (s, d) =>
    curateCorpus(Tables.documents(s, d), minQuality = 0.3,
      fullCorpusPairs = Some(Dedup.sharedMinhashPairTable(s, d)))

  /** The HARD-ORACLED composition: annotate → exact dedup → quality gate →
    * deterministic split, i.e. [[curateCorpus]] minus the LSH/CC stage (the
    * one part DuckDB cannot replicate) and with the split bucket derived
    * from md5 hex digits instead of xxhash64 — both engines compute the
    * identical 0..255 bucket, so the end-to-end pipeline (feature
    * annotation feeding a dedup window feeding a gate feeding a split) is
    * hash-verified as a whole, not only stage-by-stage. */
  def curateCorpusExact(docs: DataFrame, minQuality: Double): DataFrame = {
    val featured = TextAnalysis.withTextFeatures(docs)
    val wExact = Window.partitionBy("fingerprint").orderBy("doc_id")
    val h = md5(to_binary(concat(lit("graft_split"), col("fingerprint")),
      lit("utf-8")))
    // 0..255 from the first two hex digits — cross-engine arithmetic
    val bucket =
      (expr("instr('0123456789abcdef', substring(__h, 1, 1))") - 1) * 16 +
        (expr("instr('0123456789abcdef', substring(__h, 2, 1))") - 1)
    featured
      .withColumn("__rn", row_number().over(wExact))
      .filter(col("__rn") === 1)
      .filter(col("quality") >= minQuality)
      .withColumn("__h", h)
      .withColumn("split",
        when(bucket < 205, "train").when(bucket < 231, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "n_chars", "lang_pred",
        "n_tokens", "quality", "split")
      .orderBy("doc_id")
  }

  val qCorpusCurateExact: (SparkSession, String) => DataFrame = (s, d) =>
    curateCorpusExact(Tables.documents(s, d), minQuality = 0.3)

  // --- incremental curation: gate a NEW batch against what's been seen ---

  private def fingerprintOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    md5(to_binary(lower(regexp_replace(c, "\\s+", " ")), lit("utf-8")))

  /** INCREMENTAL curation — the production loop: a 100 TB pipeline curates
    * a day's batch against the corpus it has already ingested; it never
    * recurates the corpus. Gates, in order: (1) within-batch exact dedup
    * (deterministic survivor); (2) exact-dup-of-seen rejection (anti-join
    * on fingerprint — equivalent to checking curated survivors, because an
    * identical text fails the identical quality gate); (3) near-dup-of-seen
    * rejection via the banded-signature join (the in-memory twin of
    * probing the persisted LSH index, which is built over everything
    * ingested); (4) within-batch near-dup collapse (LSH pairs → connected
    * components → canonical); (5) quality gate; (6) the same deterministic
    * split as [[curateCorpus]].
    *
    * Batch-vs-incremental caveat (inherent, documented): a new doc that
    * BRIDGES two already-accepted near-dup clusters is simply rejected
    * here, while a full recuration would merge the clusters and keep one
    * survivor — incremental curation never mutates accepted rows.
    * PipelineSpec pins both the no-bridge equivalence and this divergence. */
  def curateIncrement(seenDocs: DataFrame, newDocs: DataFrame,
      minQuality: Double, seenIndexTable: Option[String] = None,
      seenFingerprints: Option[DataFrame] = None): DataFrame = {
    val featured = TextAnalysis.withTextFeatures(newDocs)
    val wExact = Window.partitionBy("fingerprint").orderBy("doc_id")
    val batchKept = featured
      .withColumn("__rn", row_number().over(wExact))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // The seen fingerprint set is INGEST-TIME state exactly like the
    // seen LSH index: it exists before any batch arrives (a production
    // pipeline maintains it as the exact-dup index of everything
    // ingested). Callers that already hold it pass it in; the inline
    // derivation remains for ad-hoc use and the specs.
    val seenFp = seenFingerprints.getOrElse(seenDocs
      .select(fingerprintOf(col("text")).as("fingerprint"))
      .distinct())
    val freshExact = batchKept
      .join(seenFp, Seq("fingerprint"), "left_anti")
    // near-dup of anything seen: banded-signature equi-join on
    // (band, bkey), exact-Jaccard verified. With `seenIndexTable` set the
    // seen side is the PERSISTED bucketed LSH index — the production
    // shape: the index exists before the batch arrives, only the batch
    // side shuffles into its bucketing (LshIndexSpec locks the
    // exchange-free property). Without it, the same join runs against
    // in-memory banded signatures (identical criterion, spec-pinned).
    val nearSeen = (seenIndexTable match {
      case Some(table) =>
        Dedup.nearDupAgainstLshIndex(seenDocs.sparkSession, table,
          freshExact.select(col("doc_id"), col("text")))
          .select("doc_id")
      case None =>
        val seenBands = Dedup.bandedSignatures(
            seenDocs.select(col("doc_id"), col("text")))
          .select(col("doc_id").as("idx_id"), col("sh").as("idx_sh"),
            col("n").as("idx_n"), col("band"), col("bkey"))
        val newBands = Dedup.bandedSignatures(
          freshExact.select(col("doc_id"), col("text")))
        val inter = graft.functions.VectorFunctions
          .sortedIntersectCount(col("sh"), col("idx_sh")).cast("double")
        val jac = inter / (col("n") + col("idx_n") - inter)
        newBands.join(seenBands, Seq("band", "bkey"))
          .filter(jac >= 0.8)
          .select("doc_id")
    }).distinct().localCheckpoint()
    // Within-batch near-dup clusters over ALL exact-survivors (BEFORE the
    // near-of-seen removal): a batch cluster that touches anything seen is
    // rejected WHOLE — a doc connected to the seen corpus only through a
    // rejected batch-mate must still go (it would join the seen cluster
    // under full recuration). This makes the increment equal a full
    // recuration restricted to the new ids (uncapped regime; spec-pinned).
    val pairs = Dedup.minhashPairs(freshExact.select("doc_id", "text"))
    val clusters = Dedup.connectedComponents(pairs)
    val flaggedClusters = clusters
      .join(nearSeen, Seq("doc_id"), "left_semi")
      .select(col("canonical")).distinct()
    val bucket = pmod(
      xxhash64(concat(lit("graft_split"), col("fingerprint"))), lit(100L))
    freshExact
      .join(nearSeen.withColumn("__near", lit(1)), Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .join(flaggedClusters.withColumn("__flagged", lit(1)),
        Seq("canonical"), "left")
      .filter(col("__near").isNull && col("__flagged").isNull &&
        (col("canonical").isNull || col("canonical") === col("doc_id")))
      .filter(col("quality") >= minQuality)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "n_chars", "lang_pred",
        "n_tokens", "quality", "split")
      .orderBy("doc_id")
  }

  /** The HARD-ORACLED increment: [[curateIncrement]] minus the LSH stages
    * (within-batch exact dedup + exact-dup-of-seen rejection + gate +
    * md5-hex split) — fully DuckDB-expressible, so the incremental gating
    * chain is hash-verified end-to-end. */
  def curateIncrementExact(seenDocs: DataFrame, newDocs: DataFrame,
      minQuality: Double): DataFrame = {
    val featured = TextAnalysis.withTextFeatures(newDocs)
    val wExact = Window.partitionBy("fingerprint").orderBy("doc_id")
    val seenFp = seenDocs
      .select(fingerprintOf(col("text")).as("fingerprint"))
      .distinct()
    val h = md5(to_binary(concat(lit("graft_split"), col("fingerprint")),
      lit("utf-8")))
    val bucket =
      (expr("instr('0123456789abcdef', substring(__h, 1, 1))") - 1) * 16 +
        (expr("instr('0123456789abcdef', substring(__h, 2, 1))") - 1)
    featured
      .withColumn("__rn", row_number().over(wExact))
      .filter(col("__rn") === 1)
      .join(seenFp, Seq("fingerprint"), "left_anti")
      .filter(col("quality") >= minQuality)
      .withColumn("__h", h)
      .withColumn("split",
        when(bucket < 205, "train").when(bucket < 231, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "source", "n_chars", "lang_pred",
        "n_tokens", "quality", "split")
      .orderBy("doc_id")
  }

  // Declared increment queries: the TOP 20% of doc ids play the new batch
  // arriving after the bottom 80% was ingested — ids grow with ingest
  // time, which is also the regime where increment ≡ full-recuration-
  // restricted-to-new holds (an interleaved-id new doc could steal
  // canonical status from an accepted old doc under full recuration,
  // which an immutable-corpus increment must not emulate).
  private def splitOldNew(docs: DataFrame): (DataFrame, DataFrame) = {
    val cut = docs.agg(((max(col("doc_id")) + 1L) * 4L).as("__c4"))
    val d = docs.crossJoin(broadcast(cut))
    (d.filter(col("doc_id") * 5L < col("__c4")).drop("__c4"),
      d.filter(col("doc_id") * 5L >= col("__c4")).drop("__c4"))
  }

  // The seen-corpus LSH index is INGEST-time state — it exists before any
  // batch arrives (built once per (session, corpus) here, persisted on
  // disk in deployment; the same precomputed-artifact pattern as the IVF
  // centroid cache). The increment query probes it instead of re-banding
  // the seen corpus per call.
  private val seenIndexCache = graft.AppCache[String]()

  // builds are SIDE-EFFECTING (index write / checkpoint job), so both
  // stagings are synchronized against TrieMap's double-evaluation under
  // concurrent first access (ADVICE r14; the bm25IndexCache discipline)
  private def seenLshIndex(s: SparkSession, d: String,
      old: DataFrame): String =
    seenIndexCache.synchronized {
      seenIndexCache.get(s, d)({
        val table = "graft_seen_lsh_" + Integer.toHexString(
          (s.sparkContext.applicationId + "|" + d).hashCode)
        Dedup.writeLshIndex(old.select(col("doc_id"), col("text")), table)
      })
    }

  // the exact-dup twin of seenLshIndex: the distinct fingerprint set of
  // everything ingested, staged once per (app, corpus)
  private val seenFpCache = graft.AppCache[DataFrame]()

  private def seenFingerprintSet(s: SparkSession, d: String,
      old: DataFrame): DataFrame =
    seenFpCache.synchronized {
      seenFpCache.get(s, d)(
        old.select(fingerprintOf(col("text")).as("fingerprint"))
          .distinct().localCheckpoint())
    }

  val qCorpusCurateIncrement: (SparkSession, String) => DataFrame =
    (s, d) => {
      val (old, fresh) = splitOldNew(Tables.documents(s, d))
      curateIncrement(old, fresh, minQuality = 0.3,
        seenIndexTable = Some(seenLshIndex(s, d, old)),
        seenFingerprints = Some(seenFingerprintSet(s, d, old)))
    }

  val qCorpusCurateIncrementExact: (SparkSession, String) => DataFrame =
    (s, d) => {
      val (old, fresh) = splitOldNew(Tables.documents(s, d))
      curateIncrementExact(old, fresh, minQuality = 0.3)
    }

  // DuckDB mirror of curateCorpusExact, stage for stage (marker scores and
  // quality identical to the q_lang_id / q_quality_score oracles; survivor
  // window identical to q_dedup_exact's; split bucket from md5 hex).
  // Parameterized so the INCREMENT oracle reuses the identical pipeline
  // over the new-batch slice with the seen-fingerprint rejection added.
  private def curateExactSql(extraCtes: String, docWhere: String,
      extraKeptCond: String): String = {
    val markers = Seq(
      "s_en" -> Seq(" the ", " and ", " of "),
      "s_fr" -> Seq(" le ", " la ", " et "),
      "s_es" -> Seq(" el ", " los ", " y "),
      "s_de" -> Seq(" der ", " und ", " die "),
      "s_zh" -> Seq("的", "了"))
    val scoreCols = markers.map { case (n, ms) =>
      ms.map(m =>
        s"(length(padded) - length(replace(padded, '$m', '')))")
        .mkString(" + ") + s" AS $n"
    }.mkString(", ")
    s"""WITH ${extraCtes}f AS (SELECT doc_id, lang, source, n_chars, text, ' ' || text || ' ' AS padded, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint, len(string_split_regex(trim(text), '\\s+')) AS n_tokens FROM documents$docWhere), sc AS (SELECT *, $scoreCols FROM f), lp AS (SELECT *, CASE WHEN s_en + s_fr + s_es + s_de + s_zh = 0 THEN 'und' WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en' WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr' WHEN s_es >= s_de AND s_es >= s_zh THEN 'es' WHEN s_de >= s_zh THEN 'de' ELSE 'zh' END AS lang_pred, round(0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100) + 0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 500) + 0.2 * (CASE WHEN length(padded) - length(replace(padded, ' the ', '')) > 0 THEN 1.0 ELSE 0.0 END), 4) AS quality FROM sc), kept AS (SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn FROM lp), b AS (SELECT *, (instr('0123456789abcdef', substring(md5('graft_split' || fingerprint), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5('graft_split' || fingerprint), 2, 1)) - 1) AS bk FROM kept WHERE rn = 1 AND quality >= 0.3$extraKeptCond) SELECT doc_id, lang, source, n_chars, lang_pred, n_tokens, quality, CASE WHEN bk < 205 THEN 'train' WHEN bk < 231 THEN 'val' ELSE 'test' END AS split FROM b ORDER BY doc_id"""
  }

  private val curateExactOracle: String = curateExactSql("", "", "")

  private val curateIncrementExactOracle: String = curateExactSql(
    "old_fp AS (SELECT DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp FROM documents WHERE doc_id * 5 < (SELECT (max(doc_id) + 1) * 4 FROM documents)), ",
    " WHERE doc_id * 5 >= (SELECT (max(doc_id) + 1) * 4 FROM documents)",
    " AND fingerprint NOT IN (SELECT fp FROM old_fp)")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_corpus_curate", qCorpusCurate, None),
    QueryDef("q_corpus_curate_exact", qCorpusCurateExact,
      Some(curateExactOracle)),
    QueryDef("q_corpus_curate_increment", qCorpusCurateIncrement, None),
    QueryDef("q_corpus_curate_increment_exact", qCorpusCurateIncrementExact,
      Some(curateIncrementExactOracle))
  )
}
