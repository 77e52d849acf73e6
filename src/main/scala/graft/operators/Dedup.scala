package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.SketchFunctions.{minhashSig, simhash64}
import graft.functions.VectorFunctions.sortedIntersectCount

/** Deduplication operators over `documents` — the training-data-pipeline
  * core: exact dedup, brute-force n-gram Jaccard (the oracle-able
  * baseline), MinHash+LSH (the 100 TB scale path), and SimHash banding.
  *
  * Scale design:
  *  - Exact dedup: one hash shuffle on the md5 of normalized text (narrow
  *    shuffle key, not the text itself) — embarrassingly scalable.
  *  - Shingles are hashed to sorted distinct Long arrays once per doc;
  *    Jaccard runs as a codegen'd merge-scan intersection
  *    (graft.functions.SortedLongIntersectCount) — no string compares, no
  *    per-pair allocation.
  *  - Brute-force Jaccard generates candidates with a size-key EQUI-join
  *    (each doc emits the integer set sizes a >=0.8 partner could have —
  *    implied by the threshold, so no result change) and keeps the exact
  *    ratio+Jaccard predicates inside the codegen'd join condition, so
  *    non-matching pairs are never materialized. (At 100 TB the
  *    brute-force baseline is replaced by LSH; this operator is the
  *    correctness oracle at test scale.)
  *  - MinHash+LSH replaces O(n²) with shingle→signature→band→bucket-join:
  *    O(n·k) signature work plus a shuffle keyed on (band, bucket); only
  *    same-bucket candidates are verified exactly. Bucket skew (a hot
  *    bucket collecting many docs) is the known hazard — at 100 TB you cap
  *    bucket width or salt; here buckets are tiny.
  *  - All hashing is xxhash64 (Spark-native, codegen'd, deterministic).
  */
object Dedup {

  // --- exact dedup: keep the first doc_id per normalized text ---
  // row_number (not dropDuplicates) for a deterministic survivor choice
  // (SURVEY §2 A2 tie-break trap).
  val qDedupExact: (SparkSession, String) => DataFrame = (s, d) => {
    val w = Window
      .partitionBy(md5(to_binary(
        lower(regexp_replace(col("text"), "\\s+", " ")), lit("utf-8"))))
      .orderBy("doc_id")
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** Segment-level exact dedup — the line-level dedup of the
    * training-data literature, adapted to this corpus's single-line
    * documents: each document splits into fixed 16-token segments, every
    * distinct segment keeps only its first corpus-wide occurrence
    * (first = lowest (doc_id, seg_idx) — the deterministic-survivor
    * discipline), and documents reassemble from surviving segments in
    * order. Catches the repeated-boilerplate case document-level dedup
    * misses without paying near-dup candidate generation.
    *
    * Scale shape: segmentation is a codegen'd HOF over the token array
    * (no shuffle); the dedup window shuffles once keyed on the segment
    * text (~100-byte keys); reassembly shuffles once on doc_id. Both are
    * plain hash partitions — no corpus broadcast, no quadratic step.
    * Documents whose every segment was seen earlier drop out entirely
    * (they contribute nothing to training). */
  def segmentDedup(docs: DataFrame, segLen: Int): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val nSegs = ceil(size(toks).cast("double") / segLen).cast("int")
    val segs = transform(sequence(lit(0), nSegs - 1),
      i => array_join(slice(toks, i * segLen + 1, lit(segLen)), " "))
    val w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    docs
      .select(col("doc_id"), posexplode(segs).as(Seq("seg_idx", "seg")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_segments"),
        array_join(transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x.getField("seg")), " ").as("dedup_text"))
      .orderBy("doc_id")
  }

  val qDedupSegments: (SparkSession, String) => DataFrame = (s, d) =>
    segmentDedup(Tables.documents(s, d), 16)

  /** Exact-substring dedup — the training-data literature's standard
    * (remove every >=50-token substring that occurs more than once in
    * the corpus), which [[segmentDedup]] only approximates at fixed
    * aligned 16-token granularity. Stride-1 form: every w-token sliding
    * window (suffix window) of every document; the first corpus-wide
    * occurrence of a window survives (lowest (doc_id, pos) — the
    * deterministic-survivor discipline) and every later occurrence marks
    * its w-token span as duplicated. Emits one row per affected
    * document: token count, duplicated-token count (the UNION of
    * overlapping duplicate spans — an interval sweep via a running-max
    * window, not a naive per-span sum), and the fraction a removal pass
    * would cut.
    *
    * Scale shape: stride-1 windows inflate gram TEXT ~50x, so grams are
    * hashed to 8-byte longs inside the projection (same xxhash64 move as
    * [[hashedShingles]]) — the corpus-sized shuffle carries
    * (doc_id, pos, hash) triples, ~20 bytes per token, keyed on the gram
    * hash; the interval union shuffles once more on doc_id. Both are
    * plain hash partitions, linear in corpus size: the single-node
    * suffix-array construction the literature uses is replaced by
    * gram-hash partitioning, which is the shape that distributes.
    * First-occurrence selection is a min(struct(doc_id,pos)) AGGREGATE
    * joined back, NOT a per-gram row_number window: the aggregate
    * partial-combines map-side, so a boilerplate gram shared by millions
    * of documents costs one merged row per map task instead of one
    * sorted million-row reducer partition (and the join against the
    * 1-row-per-gram first-occurrence table is AQE-skew-splittable where
    * a window partition is not).
    * (Hash collisions: 2^-64 per gram pair; a collision can only mark a
    * span duplicated spuriously, never corrupt surviving text.)
    *
    * Deliberate cost: the gram projection is computed TWICE (once under
    * the first-occurrence aggregate, once on the join's probe side —
    * the partial-agg difference keeps ReuseExchange from deduplicating
    * them). Recomputing the codegen'd, embarrassingly-parallel
    * projection is cheaper than materializing the corpus-sized gram
    * table in-query; a pipeline running this daily lands the gram table
    * once as an artifact instead (the cachedNgramPairs discipline).
    * MEASURED (round 8, ScaleProbe ×10/×100, SCALE.md §8): caching via
    * `cacheGrams` wins at ×10 (3.0 vs 8.8 s — the gram table fits
    * memory) but loses at ×100 (24.0 vs 22.2 s — materialization costs
    * more than the second projection pass), so recompute is the scale
    * default. */
  /** The stride-1 hashed gram table both substring-dedup variants scan:
    * (doc_id, n_tok, pos, gh) — one row per w-token sliding window. */
  private[graft] def substringGramTable(docs: DataFrame, w: Int): DataFrame = {
    val parts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .repartition(parts)
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        explode(transform(sequence(lit(1), size(col("t")) - (w - 1)),
          i => struct(i.cast("long").as("pos"),
            xxhash64(concat_ws(" ", slice(col("t"), i, lit(w)))).as("gh"))))
          .as("g"))
      .select(col("doc_id"), col("n_tok"),
        col("g.pos").as("pos"), col("g.gh").as("gh"))
  }

  def substringDedup(docs: DataFrame, w: Int,
      cacheGrams: Boolean = false): DataFrame = {
    val gramsBase = substringGramTable(docs, w)
    // cacheGrams: materialize the gram table once and feed both the
    // first-occurrence aggregate and the probe side from it — the OTHER
    // arm of the documented recompute-vs-cache trade-off, exposed so
    // ScaleProbe can measure the two at ×10/×100 instead of arguing
    // from shape (VERDICT r8 item 1). Default stays recompute.
    val grams = if (cacheGrams) gramsBase.localCheckpoint() else gramsBase
    val firsts = grams
      .groupBy("gh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    grams
      .join(firsts, "gh")
      .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
      .transform(dupSpanRollup(_, w))
  }

  /** Per-doc interval-union rollup over duplicate gram occurrences
    * (doc_id, n_tok, pos): a span's new coverage is what extends past
    * the running max end of all earlier spans in the doc. */
  private def dupSpanRollup(dupOccs: DataFrame, w: Int): DataFrame = {
    val wSweep = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = greatest(lit(0L), col("pos") + w -
      greatest(col("pos"), col("prev_end")))
    dupOccs
      .withColumn("prev_end",
        coalesce(max(col("pos") + w).over(wSweep), col("pos")))
      .groupBy("doc_id", "n_tok")
      .agg(sum(covered).cast("long").as("dup_tokens"))
      .select(col("doc_id"), col("n_tok"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tok"), 6)
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  val qDedupSubstring: (SparkSession, String) => DataFrame = (s, d) =>
    substringDedup(Tables.documents(s, d), 50)

  /** Bloom-gated [[substringDedup]] — identical rows, cheaper probe
    * side. The first-occurrence aggregate also counts occurrences and
    * keeps only grams with cnt > 1 (a unique gram's sole occurrence IS
    * its first — the original plan joins it and filters it right back
    * out), then reduces the surviving gram hashes to ONE fixed-size
    * Bloom filter (scalar subquery — ships with the plan, no shuffle).
    * The probe-side gram recompute filters through `might_contain`
    * BEFORE its corpus-sized shuffle, so only duplicate-candidate
    * grams move: on a mostly-unique corpus (the Zipf regime, §11c)
    * that is a small fraction of the gram stream, and the join's build
    * side shrinks from every-distinct-gram to duplicated-grams-only.
    * Lossless by construction: a false positive only sends an extra
    * gram row into the exact equi-join, which drops it (no matching
    * build row); the declared key therefore SHARES q_dedup_substring's
    * oracle by reference.
    *
    * `expectedDupGrams` must be sized to the corpus's DUPLICATED-gram
    * count, not its document count: an undersized filter saturates
    * (FPP → 1) and degrades losslessly to pass-through — measured at
    * ×100 Zipf organic (~5M dup grams): 4M capacity = parity with the
    * ungated plan, 16M capacity = 1.34× faster; at ×10 (~.5M dup
    * grams) the default gives 1.45× (SCALE.md §11c). When the dup-gram
    * count outgrows a broadcastable bitmap (≳10⁹), run the ungated
    * plan — the gate is an optimization, never a correctness knob. */
  def substringDedupBloom(docs: DataFrame, w: Int,
      expectedDupGrams: Long = 4000000L): DataFrame = {
    val grams = substringGramTable(docs, w)
    val dupFirsts = grams
      .groupBy("gh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("gh"), col("first"))
    val bloom = dupFirsts
      .agg(graft.functions.SketchFunctions.bloomAgg(col("gh"),
        expectedDupGrams).as("bf"))
      .scalar()
    grams
      .filter(graft.functions.SketchFunctions.bloomMightContain(bloom,
        col("gh")))
      .join(dupFirsts, "gh")
      .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
      .transform(dupSpanRollup(_, w))
  }

  val qDedupSubstringBloom: (SparkSession, String) => DataFrame = (s, d) =>
    substringDedupBloom(Tables.documents(s, d), 50)

  /** The REMOVAL pass over [[substringDedup]]'s detection: rebuild every
    * document with its duplicated w-token spans deleted (the first
    * corpus-wide occurrence of each span survives in place). Duplicate
    * spans are merged into disjoint intervals FIRST (gaps-and-islands
    * over the same running-max sweep), so the covered-position explode
    * is bounded by the doc's token count, never by overlap multiplicity;
    * tokens then drop by a LEFT ANTI join on (doc, position) and
    * documents reassemble in order — the segmentDedup reassembly shape
    * at token granularity. Untouched documents pass through whole. */
  def substringDedupApply(docs: DataFrame, w: Int): DataFrame = {
    val parts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .repartition(parts)
    val grams = toks
      .filter(size(col("t")) >= w)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - (w - 1)),
          i => struct(i.cast("long").as("pos"),
            xxhash64(concat_ws(" ", slice(col("t"), i, lit(w)))).as("gh"))))
          .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    val firsts = grams.groupBy("gh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val wSweep = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIsl = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = grams
      .join(firsts, "gh")
      .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
      .withColumn("e", col("pos") + w)
      .withColumn("prev_end",
        coalesce(max(col("e")).over(wSweep), lit(-1L)))
      .withColumn("iid",
        sum(when(col("pos") > col("prev_end"), 1).otherwise(0)).over(wIsl))
      .groupBy("doc_id", "iid")
      .agg(min("pos").as("s"), max("e").as("e"))
      .select(col("doc_id").as("c_doc"),
        explode(sequence(col("s"), col("e") - 1)).as("cpos"))
    toks
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        posexplode(col("t")).as(Seq("p0", "tok")))
      .withColumn("pos", col("p0").cast("long") + 1L)
      .join(covered,
        col("doc_id") === col("c_doc") && col("pos") === col("cpos"),
        "left_anti")
      .groupBy("doc_id", "n_tok")
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ").as("cleaned_text"))
      .orderBy("doc_id")
  }

  val qDedupSubstringApply: (SparkSession, String) => DataFrame = (s, d) =>
    substringDedupApply(Tables.documents(s, d), 50)

  /** Word-bigram shingles hashed to a sorted distinct Long array. The
    * sort+distinct make the merge-scan intersection valid; hashing makes
    * it allocation-free. Collision probability over ~10² shingles/doc is
    * ~2^-50 — numerically irrelevant to Jaccard. */
  def hashedShingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val bigrams = transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    array_sort(array_distinct(transform(bigrams, b => xxhash64(b))))
  }

  /** Jaccard from sorted distinct hash arrays + precomputed sizes. */
  private def jaccard(shA: Column, nA: Column, shB: Column, nB: Column)
      : Column = {
    val inter = sortedIntersectCount(shA, shB).cast("double")
    inter / (nA + nB - inter)
  }

  /** docs(doc_id, text) → (doc_id, sh: sorted distinct shingle hashes,
    * n: size).
    *
    * The input is repartitioned BEFORE the shingle computation: documents
    * often arrive as one parquet split, and the higher-order shingle
    * expressions are the expensive narrow work — without the repartition
    * they run on a single core (measured 10.9 s single-task vs 0.5 s
    * spread at sf0.1). Same move a cluster job makes when upstream
    * parallelism is below the core count. Docs with <2 tokens produce an
    * EMPTY shingle set and are dropped here: their Jaccard against another
    * empty set is 0.0/0.0 = NaN, which Spark's comparison semantics order
    * ABOVE every double — so `jac >= 0.8` would be true and every pair of
    * short docs would be emitted as a near-dup (and in minhashPairs their
    * all-sentinel signatures collide in every LSH bucket → O(m²) pairs).
    * The guard is expressed on the token count, not on size(sh), so
    * predicate pushdown can't duplicate the expensive shingle expressions
    * below the projection. */
  def shingleDocs(docs: DataFrame): DataFrame = {
    val parts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    docs.select(col("doc_id"), col("text"))
      .repartition(parts)
      .filter(size(split(trim(col("text")), "\\s+")) >= 2)
      .select(col("doc_id"), hashedShingles(col("text")).as("sh"))
      .withColumn("n", size(col("sh")))
  }

  private def shingled(s: SparkSession, d: String): DataFrame =
    shingleDocs(Tables.documents(s, d))

  // --- brute-force n-gram Jaccard near-dup (oracle-able baseline) ---
  // Pair generation is an EQUI-join, not a cross join: j >= 0.8 implies
  // 5·min(n_a,n_b) >= 4·max(n_a,n_b), so each left doc emits exactly the
  // integer sizes a partner could have (ceil(4n/5)..floor(5n/4)) and joins
  // them against the right side's actual size. That turns O(n²) candidate
  // generation into a SHUFFLED hash join on the size key emitting only
  // size-compatible pairs, with the exact ratio+Jaccard predicates as
  // codegen'd join filters — results identical to the brute-force oracle.
  // No broadcast: the right side is the full shingled corpus, which does
  // not fit one node beyond test SFs (the r9 verdict's watch item) — the
  // size-key equi-join shuffles both sides, the same cluster shape the
  // LSH verify path uses.
  def ngramJaccardPairs(docsIn: DataFrame): DataFrame = {
    val docs = shingleDocs(docsIn)
    val a = docs
      .select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("n").as("n_a"))
      .withColumn("m", explode(sequence(
        (col("n_a") * 4 + 4).divide(5).cast("long"),
        (col("n_a") * 5).divide(4).cast("long"))))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("n").as("n_b"))
    val jac = jaccard(col("sh_a"), col("n_a"), col("sh_b"), col("n_b"))
    a.join(b,
        col("m") === col("n_b") &&
          col("doc_a") < col("doc_b") &&
          least(col("n_a"), col("n_b")) * 5 >=
            greatest(col("n_a"), col("n_b")) * 4 &&
          jac >= 0.8,
        "inner")
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  // The exact pair table has TWO declared consumers (the pair report and
  // the oracled clustering) — computed once per (session, corpus) and
  // shared, the same persisted-artifact pattern as cachedMinhashPairs
  // below. Deterministic, so the cache is semantics-free.
  private val ngramPairsCache = graft.AppCache[DataFrame]()

  private[graft] def cachedNgramPairs(s: SparkSession, d: String): DataFrame =
    ngramPairsCache.get(s, d)(
      ngramJaccardPairs(Tables.documents(s, d)).localCheckpoint())

  val qDedupNgramJaccard: (SparkSession, String) => DataFrame = (s, d) =>
    cachedNgramPairs(s, d)

  // --- asymmetric containment near-dup (doc-inside-doc) ---
  // Jaccard misses the quote/boilerplate case: a short doc wholly pasted
  // into a much longer one has tiny Jaccard but containment
  // |A∩B|/|A| ≈ 1. Candidate generation uses PREFIX FILTERING (the
  // ppjoin family): order all shingles by global rarity (document
  // frequency asc, hash asc — a total order both docs agree on); if B
  // contains ≥ t = ceil(0.9·|A|) of A's shingles, B must contain one of
  // A's first |A|−t+1 RAREST shingles (pigeonhole), so joining only
  // that prefix against the full inverted index finds every qualifying
  // pair. EXACT: candidates are then verified with the merge-scan
  // intersection, so the result equals the brute-force oracle. Scale
  // shape: gram-df aggregate + per-doc rank window + equi-join on the
  // gram hash — all key-partitioned shuffles; rarest-first prefixes
  // make the probe side naturally skew-resistant (a gram shared by
  // every doc is never anyone's prefix once corpus df ranks it last —
  // an adversarial single-gram corpus degrades to the LSH hot-bucket
  // cap regime and would be salted the same way).
  def containmentPairs(docsIn: DataFrame, tauPct: Int = 90): DataFrame = {
    val docs = shingleDocs(docsIn).localCheckpoint()
    val grams = docs.select(col("doc_id"), col("n"),
      explode(col("sh")).as("g"))
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    // overlap threshold t = ceil(tau·n) in pure integer arithmetic
    val t = floor((col("n") * tauPct + lit(99)) / lit(100))
    // ONE df-rank pass feeds BOTH join sides (checkpointed like the
    // capped path's prefixWindow): the probe prefix filters it, and the
    // index side keeps every gram WITH its rank for the positional
    // filter below.
    val ranked = grams.join(dfreq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("gdf").asc, col("g").asc)))
      .localCheckpoint()
    val prefix = ranked
      .filter(col("rk") <= col("n") - t + 1)
      .select(col("doc_id").as("doc_a"), col("n").as("n_a"),
        col("g").as("pg"))
    val index = ranked.select(col("doc_id").as("doc_b"),
      col("n").as("n_b"), col("g"), col("rk").as("rk_b"))
    // POSITIONAL filter (the ppjoin family's second prune): order the
    // grams of A∩B by the shared total order (gdf asc, g asc — g is
    // distinct within a doc, so the order is total and both docs agree
    // on it); the FIRST common gram g* has at most n−t non-common grams
    // before it in EITHER doc, so pos_A(g*) ≤ n_a−t+1 AND
    // pos_B(g*) ≤ n_b−t+1. Every qualifying pair therefore survives
    // through its first-common-gram row even when the condition drops
    // all its other matching rows — candidates shrink (measured 3.14M →
    // the verified join's real neighborhood at sf0.1), results exactly
    // unchanged. This is what tames a boilerplate-heavy corpus: a
    // common gram that sits DEEP in the index doc's rarity order can no
    // longer mint candidates by itself.
    val tA = floor((col("n_a") * tauPct + lit(99)) / lit(100))
    val cand = prefix.join(index,
        col("pg") === col("g") &&
          // containment needs |B| ≥ t ≥ tau·|A|; direction: small-in-big,
          // equal sizes tie-broken by id so mirrored pairs appear once
          col("n_b") * 100 >= col("n_a") * tauPct &&
          (col("n_a") < col("n_b") ||
            (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))) &&
          col("rk_b") <= col("n_b") - tA + 1)
      .select("doc_a", "doc_b", "n_a").distinct()
    val inter = sortedIntersectCount(col("sh_a"), col("sh_b"))
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .filter(inter * 100 >= col("n_a") * tauPct)
      .select(col("doc_a"), col("doc_b"),
        round(inter.cast("double") / col("n_a"), 4).as("cont"))
      .orderBy("doc_a", "doc_b")
  }

  val qDedupContainment: (SparkSession, String) => DataFrame = (s, d) =>
    containmentPairs(Tables.documents(s, d))

  /** [[containmentPairs]] with an explicit df-cap degrade path — the
    * HotBucketCap discipline applied to prefix filtering. Exact
    * containment's cost is governed by the document-frequency of each
    * probe doc's RAREST prefix gram: the probe fan-out is
    * Σ_{g∈prefix(A)} df(g), so a corpus whose gram rarity collapses
    * (boilerplate-heavy, tiny vocabulary — measured at ×100 organic:
    * >78 GB of shuffle spill from ~10⁹ candidates) makes the exact
    * join unbounded. Here a doc whose HOTTEST PREFIX gram (the rank
    * n−t+1 boundary — max df within the prefix window) exceeds `dfCap`
    * routes OUT of the PROBE side into the returned overflow frame
    * (callers send those through the LSH family); as INDEX-side docs
    * they still participate, so every returned pair is exact and every
    * pair whose contained side is prunable IS returned. Candidate
    * volume is then ≤ n · prefixLen · dfCap — linear in the corpus at
    * fixed cap, the contract the uncapped exact join cannot give.
    * Returns (pairs, overflow docs (doc_id, max_prefix_df)). */
  def containmentPairsCapped(docsIn: DataFrame, tauPct: Int = 90,
      dfCap: Int = 64): (DataFrame, DataFrame) = {
    val docs = shingleDocs(docsIn).localCheckpoint()
    val grams = docs.select(col("doc_id"), col("n"),
      explode(col("sh")).as("g"))
    val dfreq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    val t = floor((col("n") * tauPct + lit(99)) / lit(100))
    // ONE ranking pass, materialized ONCE: the overflow decision, the
    // probe prefix AND the index side all read from it, so the per-doc
    // df-rank window — the step the uncapped join runs once — is not
    // paid twice (a second full-window pass measured 2–9× the whole
    // uncapped join on the ×10 Zipf probe). Materialized at FULL gram
    // size (not prefix size) since the positional filter below needs
    // every index gram's rank.
    val ranked = grams.join(dfreq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("gdf").asc, col("g").asc)))
      .localCheckpoint()
    val prefixWindow = ranked.filter(col("rk") <= col("n") - t + 1)
    // prunability is decided by the HOTTEST prefix gram — rank n−t+1,
    // the max df inside the prefix window (ranks sort by df asc, so the
    // boundary rank's df is the prefix max, and it is tie-break
    // independent: the multiset of the n−t+1 smallest dfs does not
    // depend on how equal-df grams order). The probe fan-out is
    // Σ_{g∈prefix} df(g): ONE over-cap gram anywhere in the prefix
    // breaks the n·prefixLen·dfCap bound, so gating on the rarest gram
    // (the r9 version) let boilerplate-plus-unique-shingle docs keep
    // hot prefix tails and blow up anyway (ADVICE r9). Completeness is
    // unaffected: the index side keeps every gram.
    val overflow = prefixWindow
      .filter(col("rk") === col("n") - t + lit(1) && col("gdf") > dfCap)
      .select(col("doc_id"), col("gdf").as("max_prefix_df"))
    val prefix = prefixWindow
      .join(overflow.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("doc_a"), col("n").as("n_a"),
        col("g").as("pg"))
    val index = ranked.select(col("doc_id").as("doc_b"),
      col("n").as("n_b"), col("g"), col("rk").as("rk_b"))
    // positional filter — see containmentPairs: the first common gram
    // of a qualifying pair lies within BOTH docs' prefix windows, so
    // the rk_b bound keeps every true pair while pruning spurious
    // candidate rows; the n·prefixLen·dfCap bound only tightens
    val tA = floor((col("n_a") * tauPct + lit(99)) / lit(100))
    val cand = prefix.join(index,
        col("pg") === col("g") &&
          col("n_b") * 100 >= col("n_a") * tauPct &&
          (col("n_a") < col("n_b") ||
            (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))) &&
          col("rk_b") <= col("n_b") - tA + 1)
      .select("doc_a", "doc_b", "n_a").distinct()
    val inter = sortedIntersectCount(col("sh_a"), col("sh_b"))
    val pairs = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .filter(inter * 100 >= col("n_a") * tauPct)
      .select(col("doc_a"), col("doc_b"),
        round(inter.cast("double") / col("n_a"), 4).as("cont"))
      .orderBy("doc_a", "doc_b")
    (pairs, overflow)
  }

  /** Declared serving configuration for the capped path. The cap is
    * chosen so the overflow route ENGAGES at the verification SFs (this
    * corpus's hottest-prefix-gram df floor sits at ~23 for sf0.01 and
    * ~260 for sf0.1, so 24 overflows ≈4% of sf0.01 docs and ≈95% of
    * sf0.1 docs): the correctness gate then proves the restricted-exact
    * semantics with LIVE overflow routing, not the vacuous huge-cap
    * case. Deployment tunes the cap per corpus (API default 64); the
    * candidate bound n·prefixLen·dfCap needs only that the cap is
    * FIXED, not its value. */
  val ContainmentDfCap = 24

  // pairs + overflow have one declared consumer each but share the whole
  // df-rank/prefix pipeline — computed once per (app, corpus) and shared
  // (the cachedNgramPairs discipline).
  private val cappedCache = graft.AppCache[(DataFrame, DataFrame)]()

  private def cachedCapped(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    cappedCache.get(s, d)({
      val (p, o) =
        containmentPairsCapped(Tables.documents(s, d), 90, ContainmentDfCap)
      (p.localCheckpoint(), o)
    })

  val qDedupContainmentCapped: (SparkSession, String) => DataFrame =
    (s, d) => cachedCapped(s, d)._1

  val qDedupContainmentOverflow: (SparkSession, String) => DataFrame =
    (s, d) => cachedCapped(s, d)._2.orderBy("doc_id")

  // --- MinHash + LSH (the scale path; verified against true Jaccard) ---
  val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands
  val MersennePrime = 2147483647L // 2^31 - 1
  // Deterministic permutation constants from a fixed-seed LCG (no runtime
  // randomness — resumable, cluster-stable).
  val (hashA, hashB) = {
    var x = 123456789L
    def next(): Long = {
      x = 6364136223846793005L * x + 1442695040888963407L
      (x >>> 33) % MersennePrime
    }
    val a = Array.fill(NumHashes)(next() % (MersennePrime - 1) + 1)
    val b = Array.fill(NumHashes)(next())
    (a, b)
  }

  /** MinHash signature over an array of shingle hashes — native one-pass
    * expression (graft.functions.MinHashSig). */
  def minhashSignature(shingleHashes: Column): Column =
    minhashSig(shingleHashes, hashA, hashB, MersennePrime)

  /** LSH band keys: one xxhash64 bucket key per band of the signature. */
  def lshBands(sig: Column): Column =
    array((0 until Bands).map { j =>
      val rows = (0 until RowsPerBand)
        .map(r => element_at(sig, j * RowsPerBand + r + 1))
      struct(lit(j).as("band"),
        xxhash64(lit(j) +: rows: _*).as("bkey"))
    }: _*)

  /** Hot-bucket cap for LSH candidate generation (SCALE.md §2): a bucket
    * wider than this many docs no longer emits all O(m²) member pairs —
    * it degrades to STAR candidates (every member paired with the bucket's
    * min doc_id), which is O(m) per bucket, keeps every member reachable
    * for connected-components clustering, and still verifies each emitted
    * pair with exact Jaccard. The adversarial case this guards: a corpus
    * with m identical (or boilerplate-dominated) documents collides all m
    * into one bucket per band; uncapped that is m²/2 candidate rows on one
    * reducer. Trade-off: within an over-cap bucket, member↔member pairs
    * that do NOT pass through the hub are not emitted as pairs (cluster
    * membership is unaffected — they join the hub's component). */
  val HotBucketCap = 64

  // The shingled subplan is referenced three times (banding + both verify
  // sides) and the exploded band table twice (self-join): materialize each
  // ONCE via localCheckpoint instead of recomputing per reference — the
  // local analogue of persisting the signature table to storage, which is
  // what the 100 TB pipeline does to reuse it across jobs.
  /** Verified near-dup pairs plus how the candidate generation got them:
    * `nHotBuckets` > 0 means the hot-bucket cap engaged and the pair set is
    * star-degraded (member↔member pairs inside an over-cap bucket are only
    * represented through the hub). Consumers that RESTRICT a pair table to a
    * doc subset (Pipeline.curateCorpus) must know this: restriction equals
    * recompute-on-subset only for the uncapped pair set. */
  final case class PairTable(pairs: DataFrame, nHotBuckets: Long)

  def minhashPairs(docsIn: DataFrame, cap: Int = HotBucketCap): DataFrame =
    minhashPairsWithStats(docsIn, cap).pairs

  def minhashPairsWithStats(docsIn: DataFrame,
      cap: Int = HotBucketCap): PairTable = {
    val docs = shingleDocs(docsIn).localCheckpoint()
    val exploded = docs
      .select(col("doc_id"), explode(lshBands(minhashSignature(col("sh"))))
        .as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.bkey").as("bkey"))
      .localCheckpoint()
    // Only the HOT buckets are materialized (aggregate, filter to width >
    // cap, checkpoint) — a metadata-sized table, usually empty. The
    // common no-hot-bucket case then runs the original self-join with
    // ZERO added joins; the one extra aggregate pass over the checkpointed
    // band table is the price of the skew guard (measured ~1 s at 10×
    // sf0.1, vs ~4.5 s for a stats join against every row).
    val hotBuckets = exploded.groupBy("band", "bkey")
      .agg(count(lit(1)).as("bw"), min("doc_id").as("bmin"))
      .filter(col("bw") > cap)
      .localCheckpoint()
    val nHot = hotBuckets.count()
    if (nHot > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"LSH hot-bucket cap engaged: $nHot bucket(s) wider than $cap " +
          "docs degraded to star candidates")
    // The band self-join shuffles on (band, bkey): the exploded band
    // table is corpus-sized (n·bands rows), so letting tiny-scale stats
    // auto-broadcast it would lock in a plan that cannot survive scale.
    val cand =
      if (nHot == 0) {
        exploded.as("x").hint("shuffle_hash")
          .join(exploded.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bkey") === col("y.bkey") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
      } else {
        // ONE left join tags every band row with its bucket's hub (or
        // null), materialized once and consumed by both branches —
        // hotBuckets can itself be data-sized under mass duplication, so
        // the join shuffles on the bucket key, never a forced broadcast.
        val tagged = exploded.hint("shuffle_hash")
          .join(hotBuckets, Seq("band", "bkey"), "left")
          .localCheckpoint()
        val smallB = tagged.filter(col("bmin").isNull)
          .select("doc_id", "band", "bkey")
        val candSmall = smallB.as("x").hint("shuffle_hash")
          .join(smallB.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bkey") === col("y.bkey") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        val candHot = tagged
          .filter(col("bmin").isNotNull && col("doc_id") =!= col("bmin"))
          .select(col("bmin").as("doc_a"), col("doc_id").as("doc_b"))
        candSmall.unionByName(candHot).distinct()
      }
    val sa = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("n").as("n_a"))
    val sb = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("n").as("n_b"))
    val jac = jaccard(col("sh_a"), col("n_a"), col("sh_b"), col("n_b"))
    // Verify re-attaches shingles via SHUFFLE joins on doc_id, never a
    // broadcast: sa/sb are corpus-sized (the checkpointed signature table),
    // and a corpus-sized broadcast side dies at cluster scale (driver OOM /
    // broadcast limit). Candidates are the sparse side — hint them as the
    // hash-build side; AQE may still broadcast at runtime when the data is
    // actually tiny, which is the correct adaptive behavior.
    val verified = cand.hint("shuffle_hash").join(sa, "doc_a")
      .hint("shuffle_hash").join(sb, "doc_b")
      .filter(jac >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jac"))
      .orderBy("doc_a", "doc_b")
    PairTable(verified, nHot)
  }

  // The verified pair table is computed once per (session, corpus) and
  // reused by every consumer — the pair report AND the clustering below.
  // This is the persisted-artifact pattern (SCALE.md §2): a 100 TB dedup
  // job writes the verified pairs to storage and feeds all downstream
  // steps from it; localCheckpoint is the in-session analogue. Results are
  // deterministic, so the cache is semantics-free.
  private val pairsCache = graft.AppCache[PairTable]()

  private def cachedMinhashPairs(s: SparkSession, d: String): PairTable =
    pairsCache.get(s, d)({
      val pt = minhashPairsWithStats(Tables.documents(s, d))
      pt.copy(pairs = pt.pairs.localCheckpoint())
    })

  val qDedupMinhash: (SparkSession, String) => DataFrame = (s, d) =>
    cachedMinhashPairs(s, d).pairs

  /** The shared per-(session, corpus) verified pair table — the persisted
    * artifact every downstream near-dup consumer (pair report, clustering,
    * corpus curation) reads instead of re-running shingle→band→verify. */
  def sharedMinhashPairs(s: SparkSession, d: String): DataFrame =
    cachedMinhashPairs(s, d).pairs

  /** Same shared artifact WITH its candidate-generation stats — consumers
    * that restrict the pair set to a doc subset need `nHotBuckets` to know
    * whether restriction is exact (see [[PairTable]]). */
  def sharedMinhashPairTable(s: SparkSession, d: String): PairTable =
    cachedMinhashPairs(s, d)

  /** Drop the per-(session, corpus) pair-table artifacts (minhash + ngram).
    * Benchmark plumbing: the bench's untimed warmup would otherwise build
    * these caches so no timed query ever pays the shingle→band→verify cost
    * (ADVICE r4); clearing between warmup and the timed pass makes the
    * first timed consumer pay the build exactly once, mirroring a real
    * pipeline that computes the artifact in-run. */
  def clearPairCaches(): Unit = {
    pairsCache.clear()
    ngramPairsCache.clear()
    cappedCache.clear()
  }

  // --- persisted LSH index: the on-disk form of the dedup scale path ---
  // TWO tables, routing separated from payload (round 5 — the single
  // banded-signature table duplicated every doc's shingle array across
  // its 8 band rows, so every probe scanned 8× the payload):
  //   <table>       (doc_id, band, bkey)  bucketed by bkey   — routing
  //   <table>_sigs  (doc_id, sh, n)       bucketed by doc_id — payload
  // The ingest gate ("is this new doc a near-dup of anything indexed?")
  // joins probe bands against the routing table (index side
  // exchange-free: the bucket layout satisfies the join clustering),
  // dedups candidates, and only THEN fetches each candidate's shingles
  // from the payload table — read once per candidate doc, not once per
  // band row. This is the batch twin of
  // EventsStreaming.nearDupAgainstIndex, persisted.

  /** Banded signature table for a corpus: (doc_id, sh, n, band, bkey). */
  def bandedSignatures(docs: DataFrame): DataFrame =
    shingleDocs(docs)
      .select(col("doc_id"), col("sh"), col("n"),
        explode(lshBands(minhashSignature(col("sh")))).as("b"))
      .select(col("doc_id"), col("sh"), col("n"),
        col("b.band").as("band"), col("b.bkey").as("bkey"))

  private def bandsOf(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"),
        explode(lshBands(minhashSignature(col("sh")))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.bkey").as("bkey"))

  /** Persist the LSH index (routing + payload tables); returns the base
    * table name. */
  def writeLshIndex(docs: DataFrame, table: String, buckets: Int = 64)
      : String = {
    val sh = shingleDocs(docs).localCheckpoint()
    graft.functions.ScalePatterns.writeBucketed(
      bandsOf(sh), table, "bkey", buckets)
    graft.functions.ScalePatterns.writeBucketed(
      sh.select("doc_id", "sh", "n"), s"${table}_sigs", "doc_id", buckets)
    table
  }

  private def bucketCountOf(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalArgumentException(
        s"$table is not a bucketed LSH index"))

  /** INCREMENTAL index maintenance: append new documents into both index
    * tables, reusing each table's own bucket spec so the bucketing
    * invariant (probe joins shuffle only the probe side) survives the
    * append. A 100 TB pipeline appends a day's docs; it never rebuilds
    * the corpus index. Banding is a deterministic per-doc function, so
    * append(old, new) is row-identical to a full rebuild over old ∪ new —
    * LshIndexSpec proves probe equality. */
  def appendToLshIndex(spark: SparkSession, table: String,
      newDocs: DataFrame): String = {
    val buckets = bucketCountOf(spark, table)
    val sigBuckets = bucketCountOf(spark, s"${table}_sigs")
    val sh = shingleDocs(newDocs).localCheckpoint()
    bandsOf(sh).write.mode("append")
      .bucketBy(buckets, "bkey").sortBy("bkey")
      .format("parquet").saveAsTable(table)
    sh.select("doc_id", "sh", "n").write.mode("append")
      .bucketBy(sigBuckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${table}_sigs")
    table
  }

  /** Batch ingest gate against a persisted index: verified near-dup pairs
    * (new_doc_id, idx_id, jac). Routing join first (index side
    * exchange-free), candidate dedup, then one payload fetch per
    * candidate from the doc_id-bucketed signature table (its side of the
    * fetch join is likewise exchange-free). */
  def nearDupAgainstLshIndex(spark: SparkSession, table: String,
      newDocs: DataFrame): DataFrame = {
    val probeSh = shingleDocs(newDocs).localCheckpoint()
    // Routing join on bkey ALONE — it equals the bucket column exactly, so
    // the bucketed scan engages (a join on (band, bkey) would need
    // subset-bucketing, which Spark does not auto-select). bkey already
    // hashes the band id into the key, so a cross-band bkey collision is
    // merely a spurious candidate that the exact-Jaccard verify removes.
    val cand = bandsOf(probeSh).select("doc_id", "bkey")
      .join(spark.table(table)
        .select(col("doc_id").as("idx_id"), col("bkey")),
        Seq("bkey"))
      .filter(col("doc_id") =!= col("idx_id"))
      .select("doc_id", "idx_id")
      .distinct()
    val idxSigs = spark.table(s"${table}_sigs")
      .select(col("doc_id").as("idx_id"), col("sh").as("idx_sh"),
        col("n").as("idx_n"))
    val inter = graft.functions.VectorFunctions
      .sortedIntersectCount(col("sh"), col("idx_sh")).cast("double")
    val jac = inter / (col("n") + col("idx_n") - inter)
    // probe payload attaches FIRST (probe-batch-sized join), the index
    // payload LAST on the bucketed key — so nothing downstream ever
    // re-shuffles index-table data, only candidate-sized rows move
    // (LshIndexSpec asserts no exchange above either index scan)
    cand
      .join(probeSh.select(col("doc_id"), col("sh"), col("n")),
        Seq("doc_id"))
      .join(idxSigs, Seq("idx_id"))
      .filter(jac >= 0.8)
      .select(col("doc_id"), col("idx_id"), round(jac, 4).as("jac"))
  }

  // --- SimHash: 64-bit frequency-weighted signature + banded pairing ---
  // Signature via the native one-pass SimHash64 expression: per-bit
  // majority vote of token hashes, frequency-weighted (tokens non-distinct).
  def simhashPairs(docsIn: DataFrame): DataFrame = {
    val parts = docsIn.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val docs = docsIn
      .select(col("doc_id"), col("text"))
      .repartition(parts)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("hs", transform(col("toks"), t => xxhash64(t)))
      .withColumn("simhash", simhash64(col("hs")))
      .select("doc_id", "simhash")
    // Band into 8 × 8-bit chunks: by pigeonhole, any pair with hamming
    // distance <= 7 shares at least one untouched chunk, so the banded
    // equi-join is COMPLETE for the <=7 threshold (verified exactly with
    // bit_count(xor) afterwards — false candidates are filtered, none are
    // missed). 4×16 banding would only guarantee <=3.
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 8).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), j * 8).bitwiseAND(lit(0xFFL))
            .as("chunk"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band").as("band"),
        col("b.chunk").as("chunk"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 7)
      .orderBy("doc_a", "doc_b")
  }

  val qDedupSimhash: (SparkSession, String) => DataFrame = (s, d) =>
    simhashPairs(Tables.documents(s, d))

  // --- per-source corpus sketch via the mergeable MinHash aggregate ---
  // Group-level signatures built with MinHashMergeAgg (element-wise min is
  // exactly the signature of the UNION of the group's shingle sets), then
  // pairwise similarity estimated as matching-slot fraction. At 100 TB
  // this is the one-pass "near-dup profile across shards/days" job:
  // partials merge on any partition layout. Rows-only (xxhash64 sketch has
  // no DuckDB counterpart).
  val qMinhashSourceSketch: (SparkSession, String) => DataFrame = (s, d) => {
    import graft.functions.MinHashMergeAgg.minhashMerge
    val docs = Tables.documents(s, d)
      .select(col("source"), col("text"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .select(col("source"),
        minhashSignature(hashedShingles(col("text"))).as("sig"))
    val sketches = docs.groupBy("source")
      .agg(minhashMerge(col("sig"), NumHashes, MersennePrime).as("sketch"))
    val a = sketches.select(col("source").as("src_a"),
      col("sketch").as("sk_a"))
    val b = sketches.select(col("source").as("src_b"),
      col("sketch").as("sk_b"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        (aggregate(zip_with(col("sk_a"), col("sk_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, m) => acc + m).cast("double") / NumHashes)
          .as("est_jaccard"))
      .orderBy("src_a", "src_b")
  }

  // --- near-dup clustering: connected components over verified pairs ---
  // Two regimes, selected by the size of the PAIR table (which is sparse
  // relative to the corpus — it holds only verified near-duplicates):
  //
  //  * pair set fits a driver bound → union-find on the driver in one
  //    collect. The bound plays the same role as a broadcast-join
  //    threshold: 2M pairs ≈ 32 MB on the driver, and the iterative
  //    alternative pays O(log d) full driver-loop rounds (measured 13
  //    rounds / 2.7 s on the sf0.1 embedding graph vs ~0.1 s local).
  //    The labels are IDENTICAL by construction (canonical = component
  //    min), and ConnectedComponentsPropertySpec holds both paths equal
  //    on random graphs.
  //  * larger → iterative min-label propagation WITH pointer jumping
  //    (driver loop, localCheckpoint per round to cut lineage): each
  //    round a node adopts the min of (its label, its neighbors' labels,
  //    the label of its current label's node). The label-of-label hop
  //    doubles the propagation distance per round, so convergence is
  //    O(log diameter) instead of O(diameter). Each round is
  //    self-contained shuffles on node id; at cluster scale you
  //    checkpoint to storage instead of locally. Labels only ever move
  //    to the min id reachable, so the result is exactly the
  //    per-component min.

  /** Default pair-count bound for the driver union-find fast path.
    * Deployments tune it per driver size with the session conf
    * `graft.cc.localMaxPairs` (read at call time, so a long-lived session
    * can lower it when the driver is sharing heap with other work). */
  val LocalCcMaxPairs = 2000000L

  /** Conservative driver cost of one union-find pair: up to two boxed
    * HashMap entries (node→parent) plus table slack. Deliberately padded —
    * the guard exists to refuse the fast path long before OOM risk. */
  private val CcBytesPerPair = 200L

  /** Memory-pressure guard for the fast path: the projected union-find
    * footprint must fit in a quarter of the heap NOT already in use.
    * A pair set under the count bound but arriving on a pressured driver
    * (caches, other artifacts) degrades to the distributed loop instead
    * of gambling on GC. */
  private def ccDriverCanHold(pairCount: Long): Boolean = {
    val rt = Runtime.getRuntime
    val headroom = rt.maxMemory() - (rt.totalMemory() - rt.freeMemory())
    pairCount * CcBytesPerPair < headroom / 4
  }

  /** Which regime the last connectedComponents call took ("local" |
    * "distributed") — observability for specs asserting the conf override
    * and the memory guard actually steer the path. */
  @volatile private[graft] var lastCcPath: String = ""

  /** Round checkpoint for the CC loop. `localCheckpoint` (default) keeps
    * the lineage cut in executor memory/disk — right for a single-session
    * run, but the blocks die with their executors, so a 1000-executor
    * cluster job that loses a node mid-loop recomputes the whole chain.
    * Setting the session conf `graft.cc.checkpointDir` (same pattern as
    * `graft.cc.localMaxPairs`) switches every round cut to a RELIABLE
    * checkpoint under that directory (HDFS/object store on a cluster) —
    * each round restarts from durable storage instead of lineage.
    * Dataset.checkpoint preserves the frame's partitioning in its
    * LogicalRDD, so the loop's reuse-the-edge-partitioning design is
    * unchanged under either mode (CcCheckpointSpec asserts identical
    * labels and on-disk round artifacts). */
  private def ccCheckpoint(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("graft.cc.checkpointDir").filter(_.nonEmpty) match {
      case Some(dir) =>
        if (!s.sparkContext.getCheckpointDir.exists(_.contains(dir)))
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }

  /** Connected components over an undirected pair set (doc_a, doc_b):
    * (doc_id, canonical = min id in component). `localMaxPairs` bounds the
    * driver fast path (0 forces the distributed loop — ScaleProbe and the
    * property spec exercise it explicitly); callers that pass nothing get
    * the session conf `graft.cc.localMaxPairs` (default LocalCcMaxPairs),
    * further gated by the driver-memory guard above. */
  def connectedComponents(pairsIn: DataFrame,
      localMaxPairs: Long = -1L): DataFrame = {
    val s = pairsIn.sparkSession
    val maxPairs =
      if (localMaxPairs >= 0L) localMaxPairs
      else s.conf.getOption("graft.cc.localMaxPairs").map(_.toLong)
        .getOrElse(LocalCcMaxPairs)
    val ccT0 = System.nanoTime()
    val pairs = pairsIn
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .localCheckpoint()
    // (the pair snapshot above stays local in both modes: it is consumed
    // within this call; only the ROUND cuts below — the state a cluster
    // failure would otherwise rebuild the full chain for — go reliable)
    val pairCount = pairs.count()
    if (sys.props.contains("graft.cc.debug"))
      System.err.println(s"CC pairs ckpt n=$pairCount " +
        s"t=${(System.nanoTime() - ccT0) / 1e6}ms")
    if (pairCount <= maxPairs && ccDriverCanHold(pairCount)) {
      lastCcPath = "local"
      return localUnionFind(s, pairs)
    }
    lastCcPath = "distributed"
    // The iterative rounds pay task scheduling on every stage of every
    // round, so the loop's shuffles AND the edge table itself are sized to
    // the GRAPH (~500k directed edges per partition), not the session
    // default — the same size-to-volume move as the streaming state
    // partitions (EventsStreaming.runToMemorySink). The near-dup graph is
    // sparse relative to the corpus, so at test scale the default 32-way
    // layout schedules ~30 near-empty tasks per stage per round; at
    // cluster scale edges/500k exceeds the default and the min() keeps
    // the session's full parallelism. Set for the loop's eager jobs only,
    // restored after.
    val edgeCount = 2L * pairCount
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val nParts = math.max(1L, math.min(prevParts.toLong,
      (edgeCount + 499999L) / 500000L)).toInt
    s.conf.set("spark.sql.shuffle.partitions", nParts.toString)
    // With the shuffles explicitly sized above, AQE has nothing left to
    // adapt inside a round — it only splits each checkpoint into one job
    // per query stage (scheduling overhead multiplied by rounds).
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    // Hash-partitioned by src and checkpointed ONCE: LogicalRDD preserves
    // the partitioning, so each round's edges⋈labels equi-join reuses it
    // (only the label side shuffles) instead of re-exchanging the edge
    // table every round.
    val edges = ccCheckpoint(pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .repartition(nParts, col("src")))
    var labels = ccCheckpoint(edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val viaEdges = edges
        .join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("lbl"))
      // pointer jump: adopt the label of the node my label points at
      val viaLabels = labels.as("a")
        .join(labels.as("b"), col("a.lbl") === col("b.node"))
        .select(col("a.node").as("node"), col("b.lbl").as("lbl"))
      // The previous label rides along as `old` (each node contributes it
      // exactly once, from the labels branch; max() ignores the nulls the
      // other branches carry), so convergence detection reads the freshly
      // checkpointed table instead of paying a labels⋈next join per round.
      val next = ccCheckpoint(labels.select(col("node"), col("lbl"),
          col("lbl").as("old"))
        .unionByName(viaEdges.withColumn("old",
          lit(null).cast("long")))
        .unionByName(viaLabels.withColumn("old",
          lit(null).cast("long")))
        .groupBy("node")
        .agg(min("lbl").as("lbl"), max("old").as("old")))
      changed = next.filter(col("lbl") =!= col("old")).count()
      labels = next.select("node", "lbl")
      iter += 1
      if (sys.props.contains("graft.cc.debug"))
        System.err.println(s"CC iter=$iter changed=$changed " +
          s"t=${(System.nanoTime() - ccT0) / 1e6}ms")
    }
    labels.select(col("node").as("doc_id"), col("lbl").as("canonical"))
      .orderBy("doc_id")
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Driver union-find over a bounded pair set: path-halving find, union
    * by root id (the smaller root wins, so the final root of every
    * component IS its min id — the same canonical the distributed loop
    * converges to). One collect in, one parallelize out. */
  private def localUnionFind(s: SparkSession,
      pairs: DataFrame): DataFrame = {
    import s.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x)
      while (p != x) {
        val gp = parent.get(p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.get(x)
      }
      x
    }
    val it = pairs.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val a = r.getLong(0); val b = r.getLong(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      parent.size())
    val keys = parent.keySet().iterator()
    while (keys.hasNext) {
      val k = keys.next()
      out += ((k, find(k)))
    }
    s.createDataset(out.toSeq).toDF("doc_id", "canonical")
      .orderBy("doc_id")
  }

  // The ORACLED clusters consume the EXACT brute-force pairs — structurally
  // the same pair set as the DuckDB recursive-CTE oracle, so the hash match
  // is guaranteed on any corpus, not fixture-dependent. (LSH banding is
  // probabilistic: a true pair at Jaccard 0.8 collides in >=1 of 8 bands
  // with p ≈ 0.985, so ~1.5% of threshold pairs can be missed on an
  // adversarial corpus — equality with an exact oracle would then be a
  // property of the fixture, not of the operator.)
  val qDedupClusters: (SparkSession, String) => DataFrame = (s, d) =>
    connectedComponents(cachedNgramPairs(s, d))

  // The SCALE path: clusters over the LSH-verified pairs (bucketed
  // candidates, shuffle-join verify, no full-corpus broadcast anywhere in
  // the plan). Rows-only by design — its recall is the banding bound above,
  // not exact; DedupSpec asserts LSH pairs == brute pairs on the fixtures,
  // so the cluster sets coincide there, but that equivalence is statistical
  // and is NOT declared as an oracle equality.
  val qDedupClustersLsh: (SparkSession, String) => DataFrame = (s, d) =>
    connectedComponents(cachedMinhashPairs(s, d).pairs)

  /** Leakage-free train/valid/test split: the split unit is the NEAR-DUP
    * CLUSTER, not the document — assigning per-doc lets one member of a
    * duplicate pair land in train and its twin in test, leaking training
    * text into evaluation (the classic contamination bug cluster-aware
    * splitting exists to prevent). Every doc resolves its cluster
    * canonical (itself when unpaired — left join + coalesce, no shuffle
    * beyond the cluster join), then a ~75/12.5/12.5 split is drawn from a
    * salted md5 of the CANONICAL id (first hex char mod 10 — mildly
    * non-uniform across the ten buckets, exactly reproducible; a uniform
    * split would widen to more hex chars), so whole clusters move
    * together and the assignment is stable across engines/runs/layouts.
    * Oracled end-to-end via the recursive-CTE cluster oracle;
    * PipelineSpec asserts the no-split-straddling-pair property. */
  val qSplitLeakageFree: (SparkSession, String) => DataFrame = (s, d) => {
    val clusters = connectedComponents(cachedNgramPairs(s, d))
    val bucket = ascii(substring(md5(to_binary(
      concat(lit("split"), col("canonical").cast("string")),
      lit("utf-8"))), 1, 1)) % 10
    Tables.documents(s, d)
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("doc_id")))
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "valid")
          .otherwise("test"))
      .select("doc_id", "canonical", "split")
      .orderBy("doc_id")
  }

  /** Dedup-quality report — the cluster-size histogram every dedup run
    * prints before anyone trusts its output: per near-dup-cluster size,
    * how many clusters, how many documents they hold, and how many are
    * removable (size − 1 each); singletons land as the csize=1 row
    * computed from two 1-row aggregates (total − clustered), never a
    * corpus anti-join, and the row is omitted when every document is
    * clustered. Pure composition over the clustering result: the
    * histogram aggregates the GROUPED cluster table (cluster-count-
    * sized, not corpus-sized), so at 100 TB the report costs one extra
    * tiny shuffle on top of the clustering it audits. */
  val qDedupReport: (SparkSession, String) => DataFrame = (s, d) => {
    val canon = connectedComponents(cachedNgramPairs(s, d))
    val hist = canon.groupBy("canonical").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
      .select(col("csize"), col("n_clusters"),
        (col("csize") * col("n_clusters")).as("n_docs"),
        ((col("csize") - 1) * col("n_clusters")).as("n_removable"))
    val tot = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    val clustered = canon.agg(count(lit(1)).as("c"))
    // fully-clustered corpus → no zero-count singles row (ADVICE r6)
    val singles = tot.crossJoin(clustered)
      .filter(col("n") > col("c"))
      .select(lit(1L).as("csize"), (col("n") - col("c")).as("n_clusters"),
        (col("n") - col("c")).as("n_docs"), lit(0L).as("n_removable"))
    hist.unionByName(singles).orderBy("csize")
  }

  // shared BY REFERENCE between q_dedup_substring and its bloom-gated
  // twin — the gate is lossless, so both answer to the same SQL
  private val substringOracleSql =
    "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), g AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, CAST(i AS BIGINT) AS pos, array_to_string(t[i:i+49], ' ') AS gram FROM t, unnest(range(1, len(t) - 48)) AS u(i) WHERE len(t) >= 50), r AS (SELECT doc_id, n_tok, pos, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g), d AS (SELECT doc_id, n_tok, pos, COALESCE(MAX(pos + 50) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos) AS prev_end FROM r WHERE rn > 1) SELECT doc_id, n_tok, CAST(SUM(GREATEST(0, pos + 50 - GREATEST(pos, prev_end))) AS BIGINT) AS dup_tokens, round(CAST(SUM(GREATEST(0, pos + 50 - GREATEST(pos, prev_end))) AS DOUBLE) / n_tok, 6) AS dup_frac FROM d GROUP BY doc_id, n_tok ORDER BY doc_id"

  /** Shared DuckDB CTE producing the verified near-dup pairs with exact
    * Jaccard — the oracle counterpart of qDedupNgramJaccard's plan. */
  private[graft] val ngramPairsCte =
    """sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(string_split_regex(trim(text), '\s+'))), i -> string_split_regex(trim(text), '\s+')[i] || ' ' || string_split_regex(trim(text), '\s+')[i+1])) AS sh FROM documents), cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id AND len(a.sh) > 0 AND len(b.sh) > 0 AND least(len(a.sh), len(b.sh)) * 5 >= greatest(len(a.sh), len(b.sh)) * 4), pairs AS (SELECT doc_a, doc_b, jac FROM (SELECT doc_a, doc_b, CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE) / (len(sh_a) + len(sh_b) - len(list_distinct(list_intersect(sh_a, sh_b)))) AS jac FROM cand) WHERE jac >= 0.8)"""

  /** Shared DuckDB CTE for the df-capped containment path: gram df,
    * per-doc rarity ranks, the rank-(n−t+1) prefix boundary, the over-cap
    * overflow set, and the exact ppjoin pair table restricted to prunable
    * (non-overflow) probe docs. The boundary df is tie-break independent
    * (it is the (n−t+1)-th smallest df), so string-vs-hash gram ordering
    * differences between DuckDB and Spark cannot shift the overflow set. */
  private val cappedCte =
    s"""sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(string_split_regex(trim(text), '\\s+'))), i -> string_split_regex(trim(text), '\\s+')[i] || ' ' || string_split_regex(trim(text), '\\s+')[i+1])) AS sh FROM documents), g AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS gr FROM sh WHERE len(sh) > 0), dfq AS (SELECT gr, COUNT(*) AS gdf FROM g GROUP BY gr), bnd AS (SELECT doc_id, gdf FROM (SELECT doc_id, n, gdf, row_number() OVER (PARTITION BY doc_id ORDER BY gdf ASC, gr ASC) AS rk FROM g JOIN dfq USING(gr)) WHERE rk = n - (n*90+99)//100 + 1), ovr AS (SELECT doc_id, gdf AS max_prefix_df FROM bnd WHERE gdf > $ContainmentDfCap), cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, len(a.sh) AS na, len(list_distinct(list_intersect(a.sh, b.sh))) AS inter FROM sh a CROSS JOIN sh b WHERE len(a.sh) > 0 AND a.doc_id NOT IN (SELECT doc_id FROM ovr) AND (len(a.sh) < len(b.sh) OR (len(a.sh) = len(b.sh) AND a.doc_id < b.doc_id)) AND len(b.sh) * 100 >= len(a.sh) * 90)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_minhash_source_sketch", qMinhashSourceSketch, None),
    QueryDef("q_dedup_segments", qDedupSegments, Some(
      "WITH segs AS (SELECT doc_id, unnest(range(len(s))) AS seg_idx, unnest(s) AS seg FROM (SELECT doc_id, list_transform(range(CAST(ceil(len(t)/16.0) AS BIGINT)), i -> array_to_string(t[i*16+1:i*16+16], ' ')) AS s FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents))), keep AS (SELECT doc_id, seg_idx, seg, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn FROM segs) SELECT doc_id, COUNT(*) AS kept_segments, string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text FROM keep WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id")),
    QueryDef("q_dedup_substring", qDedupSubstring, Some(substringOracleSql)),
    // the Bloom gate is LOSSLESS (false positives die in the exact
    // equi-join), so the gated plan answers to the identical oracle
    QueryDef("q_dedup_substring_bloom", qDedupSubstringBloom,
      Some(substringOracleSql)),
    QueryDef("q_dedup_substring_apply", qDedupSubstringApply, Some(
      "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, array_to_string(t[i:i+49], ' ') AS gram FROM t, unnest(range(1, len(t) - 48)) AS u(i) WHERE len(t) >= 50), r AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g), d AS (SELECT doc_id, pos, pos + 50 AS e FROM r WHERE rn > 1), sw AS (SELECT doc_id, pos, e, COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS prev_end FROM d), isl AS (SELECT doc_id, pos, e, SUM(CASE WHEN pos > prev_end THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS iid FROM sw), mi AS (SELECT doc_id, MIN(pos) AS s, MAX(e) AS e FROM isl GROUP BY doc_id, iid), cov AS (SELECT doc_id, unnest(range(s, e)) AS cpos FROM mi), tok AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, CAST(i AS BIGINT) AS pos, t[i] AS tok FROM t, unnest(range(1, len(t) + 1)) AS u(i)) SELECT tok.doc_id, tok.n_tok, COUNT(*) AS kept_tokens, string_agg(tok.tok, ' ' ORDER BY tok.pos) AS cleaned_text FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.cpos WHERE cov.cpos IS NULL GROUP BY tok.doc_id, tok.n_tok ORDER BY tok.doc_id")),
    QueryDef("q_dedup_exact", qDedupExact, Some(
      "SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars, row_number() OVER (PARTITION BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 ORDER BY doc_id")),
    QueryDef("q_dedup_containment", qDedupContainment, Some(
      """WITH sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(string_split_regex(trim(text), '\s+'))), i -> string_split_regex(trim(text), '\s+')[i] || ' ' || string_split_regex(trim(text), '\s+')[i+1])) AS sh FROM documents), pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, len(a.sh) AS na, len(list_distinct(list_intersect(a.sh, b.sh))) AS inter FROM sh a CROSS JOIN sh b WHERE len(a.sh) > 0 AND (len(a.sh) < len(b.sh) OR (len(a.sh) = len(b.sh) AND a.doc_id < b.doc_id)) AND len(b.sh) * 100 >= len(a.sh) * 90) SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / na, 4) AS cont FROM pairs WHERE inter * 100 >= na * 90 ORDER BY doc_a, doc_b""")),
    QueryDef("q_dedup_containment_capped", qDedupContainmentCapped, Some(
      s"WITH $cappedCte SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / na, 4) AS cont FROM cpairs WHERE inter * 100 >= na * 90 ORDER BY doc_a, doc_b")),
    QueryDef("q_dedup_containment_overflow", qDedupContainmentOverflow, Some(
      s"WITH $cappedCte SELECT doc_id, max_prefix_df FROM ovr ORDER BY doc_id")),
    QueryDef("q_dedup_ngram_jaccard", qDedupNgramJaccard, Some(
      s"WITH $ngramPairsCte SELECT doc_a, doc_b, round(jac, 4) AS jac FROM pairs ORDER BY doc_a, doc_b")),
    QueryDef("q_dedup_clusters", qDedupClusters, Some(
      s"WITH RECURSIVE $ngramPairsCte, edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs), reach(src, dst) AS (SELECT src, dst FROM edges UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src) SELECT src AS doc_id, least(src, MIN(dst)) AS canonical FROM reach GROUP BY src ORDER BY doc_id")),
    QueryDef("q_dedup_clusters_lsh", qDedupClustersLsh, None),
    QueryDef("q_dedup_report", qDedupReport, Some(
      s"WITH RECURSIVE $ngramPairsCte, edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs), reach(src, dst) AS (SELECT src, dst FROM edges UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), canon AS (SELECT src AS doc_id, least(src, MIN(dst)) AS canonical FROM reach GROUP BY src), sizes AS (SELECT canonical, COUNT(*) AS csize FROM canon GROUP BY canonical), hist AS (SELECT csize, COUNT(*) AS n_clusters, csize * COUNT(*) AS n_docs, (csize - 1) * COUNT(*) AS n_removable FROM sizes GROUP BY csize), tot AS (SELECT COUNT(*) AS n FROM documents), cl AS (SELECT COUNT(*) AS c FROM canon) SELECT csize, n_clusters, n_docs, n_removable FROM hist UNION ALL SELECT CAST(1 AS BIGINT), n - c, n - c, CAST(0 AS BIGINT) FROM tot CROSS JOIN cl WHERE n > c ORDER BY csize")),
    QueryDef("q_split_leakage_free", qSplitLeakageFree, Some(
      s"WITH RECURSIVE $ngramPairsCte, edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs), reach(src, dst) AS (SELECT src, dst FROM edges UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), canon AS (SELECT src AS doc_id, least(src, MIN(dst)) AS canonical FROM reach GROUP BY src) SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical, CASE WHEN ascii(substr(md5('split' || CAST(COALESCE(c.canonical, d.doc_id) AS VARCHAR)), 1, 1)) % 10 < 8 THEN 'train' WHEN ascii(substr(md5('split' || CAST(COALESCE(c.canonical, d.doc_id) AS VARCHAR)), 1, 1)) % 10 = 8 THEN 'valid' ELSE 'test' END AS split FROM documents d LEFT JOIN canon c ON d.doc_id = c.doc_id ORDER BY d.doc_id")),
    QueryDef("q_dedup_minhash", qDedupMinhash, None),
    QueryDef("q_dedup_simhash", qDedupSimhash, None)
  )
}
