package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.SketchFunctions

/** Training-data curation operators beyond dedup/quality: benchmark
  * decontamination, repetition/spam signals, identifier scrubbing, and
  * deterministic domain-mix resampling. All oracle-able (the point: these
  * gates decide what enters a training set, so they must be verifiable),
  * and all built scale-first:
  *  - decontamination joins the corpus n-gram stream against the
  *    benchmark's distinct n-gram set — the benchmark side is SMALL BY
  *    DEFINITION (an eval set, not a corpus), which is the one place a
  *    broadcast is structurally justified;
  *  - repetition signals are pure per-row higher-order expressions — no
  *    shuffle at all;
  *  - scrubbing is a codegen'd regexp pass;
  *  - mix sampling reuses the salted-md5 bucket (reproducible across
  *    runs, engines, partition layouts — never rand()).
  */
object Curation {

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-grams from an ALREADY-MATERIALIZED token array column
    * (duplicates kept). Two hard-won rules are baked in:
    *  - callers must project the token array in its own select before
    *    invoking this — a lambda referencing `split(text)` re-splits the
    *    text once per n-gram (quadratic in doc length; the q_ngram_bigrams
    *    lesson, re-measured here as 19.6 s → 0.6 s on repetition scores);
    *  - guarded for <n-token docs: Spark's sequence(1, 0) counts DOWN
    *    (yielding bogus indices), unlike DuckDB's empty range — the
    *    when() keeps both engines at "empty array". */
  private[graft] def ngramsFromToks(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*)))
      .otherwise(array())

  /** (doc_id, t) with the token array materialized and the scan spread
    * over the cores — documents.parquet arrives as ONE split, and the
    * per-row HOF work below is the expensive narrow stage (same
    * repartition-first move as Dedup.shingleDocs). */
  private[graft] def tokenized(docs: DataFrame): DataFrame = {
    val parts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    docs.select(col("doc_id"), toks(col("text")).as("t"))
      .repartition(parts)
  }

  /** Benchmark decontamination: flag corpus docs sharing any word 4-gram
    * with the benchmark set (here: every 50th doc plays the eval set).
    * Returns (doc_id, n_overlap = distinct shared 4-grams). The corpus
    * side streams (explode → join → count); only the benchmark's distinct
    * gram set is broadcast. At 100 TB: corpus exploded grams shuffle
    * nothing — the join is map-side against the broadcast eval grams. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    val corpusGrams = tokenized(docs)
      .select(col("doc_id"), explode(ngramsFromToks(col("t"), 4)).as("g"))
      .distinct()
    val benchGrams = tokenized(benchmark)
      .select(explode(ngramsFromToks(col("t"), 4)).as("g"))
      .distinct()
    corpusGrams.join(broadcast(benchGrams), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  val qDecontaminate: (SparkSession, String) => DataFrame = (s, d) => {
    val docs = Tables.documents(s, d)
    decontaminate(
      docs.filter(pmod(col("doc_id"), lit(50L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(50L)) === 0L))
  }

  /** Bloom-gated decontamination — what [[decontaminate]] becomes when the
    * benchmark/seen gram set outgrows an exact broadcast (decontaminating
    * new data against an entire ingested corpus, not a 1k-task eval set).
    * Spark's runtime-filter machinery, applied deliberately:
    *   1. reduce the benchmark grams to ONE fixed-size Bloom filter
    *      (mergeable partial/final aggregate — size set by expectedItems,
    *      not by the data);
    *   2. feed it in as a SCALAR SUBQUERY (computed once, shipped to every
    *      task with the plan — BloomFilterMightContain requires a
    *      constant/subquery bloom side) and gate the corpus gram stream
    *      map-side, BEFORE the distinct — the corpus-wide shuffle that
    *      dominates [[decontaminate]] now carries only true overlaps plus
    *      the fp residue;
    *   3. exact-verify survivors with a shuffle join against the real
    *      gram set (no broadcast hint — the whole premise is that side is
    *      big; AQE will still broadcast it when it isn't).
    * False positives cost only wasted verify work, never wrong output, so
    * the result is bit-identical to [[decontaminate]] and shares its
    * DuckDB oracle. */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
      expectedGrams: Long = 1000000L): DataFrame = {
    val benchGrams = tokenized(benchmark)
      .select(explode(ngramsFromToks(col("t"), 4)).as("g"))
      .distinct()
    val bloom = benchGrams
      .agg(SketchFunctions.bloomAgg(xxhash64(col("g")),
        expectedGrams).as("bf"))
      .scalar()
    val gated = tokenized(docs)
      .select(col("doc_id"), explode(ngramsFromToks(col("t"), 4)).as("g"))
      .filter(SketchFunctions.bloomMightContain(bloom,
        xxhash64(col("g"))))
      .distinct()
    gated.join(benchGrams, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  val qDecontaminateBloom: (SparkSession, String) => DataFrame = (s, d) => {
    val docs = Tables.documents(s, d)
    decontaminateBloom(
      docs.filter(pmod(col("doc_id"), lit(50L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(50L)) === 0L))
  }

  /** Repetition/spam signals, one codegen'd pass, zero shuffle:
    *  - rep_bigram: 1 − distinct/total word bigrams (copy-paste loops);
    *  - top_tok_frac: most frequent token's share (one-word spam).
    * Rounded to 6 for cross-engine hash parity. */
  val qRepetitionScore: (SparkSession, String) => DataFrame = (s, d) => {
    val t = col("t")
    val topCnt = array_max(transform(array_distinct(t),
      u => size(filter(t, x => x === u))))
    tokenized(Tables.documents(s, d))
      .withColumn("bg", ngramsFromToks(t, 2))
      .select(col("doc_id"),
        when(size(col("bg")) > 0,
          round(lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
            size(col("bg")), 6)).otherwise(0.0).as("rep_bigram"),
        round(topCnt.cast("double") / size(t), 6).as("top_tok_frac"))
      .orderBy("doc_id")
  }

  /** Identifier scrubbing (the PII-redaction shape over synthetic data —
    * fixtures have no emails/phones, so digit-run ids in events.props
    * stand in): mask every digit run, count what was masked. The
    * deploy-time version swaps the regex list for the real PII patterns;
    * the plumbing (codegen'd regexp pass, masked text + audit count) is
    * what this verifies. */
  val qScrubIds: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        regexp_replace(col("props"), "\\d+", "#").as("masked"),
        size(expr("regexp_extract_all(props, '\\\\d+', 0)")).as("n_ids"))
      .orderBy("event_id")

  /** Deterministic domain-mix resampling: even-numbered sources (the
    * "oversampled web scrape" stand-in) are downsampled to ~40% on a
    * salted md5 bucket; odd sources kept whole. Reproducible across
    * engines/runs/layouts; the kept row carries its sampling weight so
    * downstream loss-weighting can undo the mix. */
  val qDomainMix: (SparkSession, String) => DataFrame = (s, d) => {
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val h = md5(to_binary(concat(lit("graft_mix"),
      col("doc_id").cast("string")), lit("utf-8")))
    val bucket =
      (expr("instr('0123456789abcdef', substring(__h, 1, 1))") - 1) * 16 +
        (expr("instr('0123456789abcdef', substring(__h, 2, 1))") - 1)
    Tables.documents(s, d)
      .withColumn("__h", h)
      .withColumn("__bucket", bucket)
      .filter(pmod(srcNum, lit(2)) === 1 || col("__bucket") < 102)
      .withColumn("weight",
        when(pmod(srcNum, lit(2)) === 1, 1.0).otherwise(
          round(lit(256.0) / 102.0, 6)))
      .select("doc_id", "source", "weight")
      .orderBy("doc_id")
  }

  /** Temperature-scaled domain mixture — the pretraining mixture-weight
    * pattern (GPT-3 / The Pile): target share of domain d ∝ n_d^α with
    * α = 0.5, so small domains are UP-weighted relative to their raw
    * share and the web-scrape bulk stops dominating. Against a total
    * token budget T (= N/2 here), domain d's keep-rate is
    * min(1, T·n_d^α / (Σ_e n_e^α · n_d)); kept rows carry 1/rate so
    * downstream loss-weighting can undo the resample (qDomainMix's
    * contract, now with data-derived rates instead of fixed ones).
    *
    * Cross-engine exactness: sqrt is correctly-rounded IEEE in both
    * engines, so s_d = floor(sqrt(n_d)·1e6) is an exact integer in
    * both; the acceptance test u < rate (u the md5 hex-quad of the
    * salted doc id, (v+0.5)/65536) multiplies out to the pure-integer
    * comparison (2v+1)·total·n_d < 2·65536·s_d·T, evaluated in
    * DECIMAL(38,0) on the Spark side so the ~1e19 long ceiling of the
    * raw products can never WRAP silently (the lrTrainTrace lesson —
    * decimal overflow nulls loudly at verify, long overflow lies);
    * the weight divides exactly-representable doubles, rounded to 6.
    *
    * Plan shape: one tiny per-source aggregate (|domains| rows) joined
    * back broadcast, then a map-side filter — the corpus is never
    * shuffled. At 100 TB this is a scan + broadcast-hash-join, and the
    * decision is reproducible across engines, runs, and layouts.
    *
    * The fixture's `source` column is deliberately uniform (25 docs
    * each — temperature would be a no-op), so the domain is derived
    * Zipf-skewed from the id: digit-length of doc_id % 500 gives
    * domains of 10 / 90 / 400 docs — pure string arithmetic, identical
    * in both engines. Under α = 0.5 the small domain's rate caps at 1
    * (kept whole, weight 1) while the bulk domain is cut hardest —
    * exactly the rebalancing the technique exists for (CurationSpec
    * pins the monotonicity). */
  val qDomainMixTemperature: (SparkSession, String) => DataFrame =
    (s, d) => {
      val domCol = concat(lit("d"),
        length(pmod(col("doc_id"), lit(500)).cast("string")))
      val docs = Tables.documents(s, d).withColumn("dom", domCol)
      val dims = docs
        .groupBy("dom").agg(count(lit(1)).as("n_d"))
        .withColumn("s_d",
          floor(sqrt(col("n_d").cast("double")) * 1e6).cast("long"))
      val tot = dims.agg(sum(col("s_d")).as("total"),
        (sum(col("n_d")) / 2).cast("long").as("t_budget"))
      val rates = dims.crossJoin(broadcast(tot))
      val h = md5(to_binary(concat(lit("graft_temp"),
        col("doc_id").cast("string")), lit("utf-8")))
      def digit(i: Int): Column =
        expr(s"instr('0123456789abcdef', substring(__h, $i, 1))") - 1
      val v = ((digit(1) * 16 + digit(2)) * 16 + digit(3)) * 16 + digit(4)
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      // decimal on BOTH comparisons: the raw-long form of this one
      // wraps at the same ~1e19 the accept test is protected against
      val keepAll = dec(col("s_d")) * dec(col("t_budget")) >=
        dec(col("total")) * dec(col("n_d"))
      val accept = dec(lit(2) * col("v") + 1) * dec(col("total")) *
        dec(col("n_d")) <
        dec(lit(131072L)) * dec(col("s_d")) * dec(col("t_budget"))
      docs
        .join(broadcast(rates), "dom")
        .withColumn("__h", h)
        .withColumn("v", v.cast("long"))
        .filter(keepAll || accept)
        .withColumn("weight",
          when(keepAll, 1.0).otherwise(
            round(col("total").cast("double") * col("n_d") /
              (col("s_d").cast("double") * col("t_budget")), 6)))
        .select("doc_id", "dom", "weight")
        .orderBy("doc_id")
    }

  private val gramsCte =
    """g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS g FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents))"""

  /** Sequence packing for LM training — concatenate documents in a
    * deterministic order and cut at fixed 512-token boundaries, the
    * standard pretraining batch-prep step. Emits one row per packed
    * sequence: how many documents contribute, how many tokens it holds
    * (512 everywhere except each shard's final sequence), and the
    * contributing doc-id span.
    *
    * Scale shape: packing is per-SOURCE-shard (window partitioned by
    * source, ordered by doc_id) — the global-concatenation variant would
    * serialize the corpus through one partition, which is exactly the
    * shape a 100 TB pipeline cannot run; sharded packing is what real
    * pipelines do (each shard feeds its own reader). Everything is exact
    * integer arithmetic: a doc's sequence span is derived from its
    * running token offset (floor division), boundary-straddling docs
    * explode into one row per spanned sequence (bounded by
    * doc_len/512 + 1 — never corpus-sized), and per-sequence token
    * counts are the interval intersection. One window shuffle on source,
    * one group shuffle on (source, seq_id). */
  def packSequences(docs: DataFrame, maxLen: Int): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("source"), col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("seq_id", explode(sequence(
        floor(col("cum_before") / maxLen).cast("long"),
        floor((col("cum_before") + col("n_tok") - 1) / maxLen)
          .cast("long"))))
      .withColumn("tok_in_seq",
        least(col("cum_before") + col("n_tok"), (col("seq_id") + 1) * maxLen)
          - greatest(col("cum_before"), col("seq_id") * maxLen))
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok_in_seq").cast("long").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "seq_id")
  }

  val qPackSequences: (SparkSession, String) => DataFrame = (s, d) =>
    packSequences(Tables.documents(s, d), 512)

  /** Deterministic global corpus shuffle — the batch-prep step after
    * [[packSequences]]: place every document at a salted-hash position in
    * a reproducible total order and split that order into training
    * shards. The ORDER is the point: pretraining wants documents
    * decorrelated from ingest order (source-grouped batches destabilize
    * training) and IDENTICAL on every rerun (resumable jobs,
    * reproducible ablations) — so position is md5(salt ‖ doc_id), never
    * rand(). Shard = leading hash byte mod nShards (the same
    * hex-digit-pair decode both engines share, qDomainMix's move).
    *
    * Scale shape: assignment is map-only; the per-shard sequence is a
    * window partitioned BY SHARD ordered by (hash, doc_id) —
    * corpus/nShards-sized partitions, never a single global sort. At
    * 100 TB nShards is sized so a shard fits a writer task (thousands of
    * shards), keeping the window partitions bounded. */
  private[graft] def shardAssign(docs: DataFrame, nShards: Int): DataFrame =
    docs
      .withColumn("__h", md5(to_binary(concat(lit("graft_shuffle"),
        col("doc_id").cast("string")), lit("utf-8"))))
      .withColumn("shard", pmod(
        (expr("instr('0123456789abcdef', substring(__h, 1, 1))") - 1) * 16 +
          (expr("instr('0123456789abcdef', substring(__h, 2, 1))") - 1),
        lit(nShards)).cast("int"))

  /** Declared shard-assignment query: per shard, the document count and
    * an ORDER-SENSITIVE digest (Σ position·f(doc_id) mod a prime product
    * bound — exact integer arithmetic in both engines), so the oracle
    * pins not just which shard every document lands in but WHERE in the
    * shard's order it sits. */
  val qShuffleShards: (SparkSession, String) => DataFrame = (s, d) => {
    val w = Window.partitionBy("shard").orderBy("__h", "doc_id")
    shardAssign(Tables.documents(s, d), 8)
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(pmod(col("rn") * (pmod(col("doc_id"), lit(1000003L)) + 7),
          lit(2147483647L))).cast("long").as("digest"))
      .orderBy("shard")
  }

  /** Shard writer: lands the shuffled corpus as one directory per shard
    * (hive layout `shard=K/`), rows inside each shard in their assigned
    * order, files cut at maxRecordsPerFile. Repartitioning ON THE SHARD
    * ID gives each writer task whole shards, so with the in-task sort
    * the (row → file, row → position) mapping is fully deterministic —
    * rerunning the writer reproduces the identical shard layout
    * (ShardWriterSpec asserts it). File size stays bounded by
    * maxRecordsPerFile no matter how the corpus grows. */
  def writeShards(docs: DataFrame, dir: String, nShards: Int,
      maxRecordsPerFile: Int): Unit =
    landShards(docs, dir, nShards, maxRecordsPerFile, "overwrite")

  /** Incremental append into an existing shard layout: a new batch
    * hashes to its shards by the same salted assignment and lands as NEW
    * files inside the existing shard directories — existing files are
    * never rewritten, so the append costs the batch, not the corpus
    * (the q_landing_overwrite discipline applied to shard placement).
    * The global in-shard order key (__h, doc_id) is stored with the
    * rows; a reader that needs the merged total order merges sorted
    * files by that key, exactly like any LSM-flavored layout.
    * ShardWriterSpec proves the base corpus's assignment and files are
    * untouched by an append and the batch lands where shardAssign says
    * it must. */
  def appendToShards(docs: DataFrame, dir: String, nShards: Int,
      maxRecordsPerFile: Int): Unit =
    landShards(docs, dir, nShards, maxRecordsPerFile, "append")

  /** Shard-layout compaction — the maintenance job the append path makes
    * necessary: every `appendToShards` batch lands NEW files, so a
    * long-lived layout accumulates per-shard file counts that make the
    * 100 TB read open/footer-bound (the generic single-table form is
    * `ScalePatterns.compactTo`; this is the shard-preserving variant).
    * One hash shuffle ON THE SHARD ID carries each shard to exactly one
    * writer task, the in-task sort restores the canonical (__h, doc_id)
    * total order, and `partitionBy` re-lands the hive layout — so the
    * compacted output is ONE file per shard, byte-deterministic, and
    * content-identical to the merged view of the fragmented input
    * (q_compact_shards hash-proves that against q_shuffle_shards'
    * oracle). Compaction writes a FRESH directory: atomic swap is a
    * table format's job; versioned dirs keep concurrent readers
    * consistent. Parallelism = nShards (a deployment compacts with
    * thousands of shards; the per-task volume is one shard by design).
    */
  def compactShards(s: SparkSession, srcDir: String, dstDir: String,
      nShards: Int): Unit =
    s.read.parquet(srcDir)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__h", "doc_id")
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(dstDir)

  private val compactInvocation = new java.util.concurrent.atomic.AtomicLong

  /** Declared compaction query: land the corpus fragmented (small
    * maxRecordsPerFile → several files per shard), compact, then compute
    * the ORDER-SENSITIVE per-shard digest from the COMPACTED layout.
    * Sharing q_shuffle_shards' oracle makes the driver hash-prove that
    * compaction preserved every document, its shard, and its exact
    * position in the shard's order — the whole invariant a compactor can
    * break. */
  val qCompactShards: (SparkSession, String) => DataFrame = (s, d) => {
    val base = s"${sys.props("java.io.tmpdir")}/graft_compact_" +
      s.sparkContext.applicationId + "_" + compactInvocation.incrementAndGet()
    writeShards(Tables.documents(s, d), s"$base/frag", 8,
      maxRecordsPerFile = 16)
    compactShards(s, s"$base/frag", s"$base/compact", 8)
    val w = Window.partitionBy("shard").orderBy("__h", "doc_id")
    val digest = s.read.parquet(s"$base/compact")
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(pmod(col("rn") * (pmod(col("doc_id"), lit(1000003L)) + 7),
          lit(2147483647L))).cast("long").as("digest"))
      .orderBy("shard")
      // materialize the (nShards-row) digest BEFORE dropping the
      // invocation's directory — repeated bench iterations would
      // otherwise accumulate full fragmented+compacted corpus copies in
      // tmpdir for the JVM lifetime
      .localCheckpoint()
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    digest
  }

  private def landShards(docs: DataFrame, dir: String, nShards: Int,
      maxRecordsPerFile: Int, mode: String): Unit =
    shardAssign(docs, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "__h", "doc_id")
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .partitionBy("shard")
      .parquet(dir)

  /** Span-corruption mask generation — the denoising-objective prep step
    * (T5-style): every token position draws a deterministic salted-hash
    * trial; ~5% of positions start a masked span of 2–4 tokens (length
    * from the same hash), overlapping spans merge, and the report per
    * document is span count, masked-token count (the INTERVAL UNION via
    * the same running-max sweep as q_dedup_substring), and the masked
    * fraction. Everything derives from md5(salt ‖ doc_id ‖ pos) — never
    * rand() — so the mask is reproducible across runs, engines, and
    * partition layouts, which is what makes a masking pass auditable.
    *
    * Scale shape: position explode → one doc_id-keyed window shuffle for
    * the sweep; the hash trials are map-side codegen'd expressions. At
    * 100 TB the explode multiplies rows by tokens-per-doc, but each row
    * is 24 bytes and the only shuffle key is doc_id — corpus-linear. */
  val qSpanMask: (SparkSession, String) => DataFrame = (s, d) => {
    val hx = "0123456789abcdef"
    val h = md5(to_binary(concat(lit("graft_mask"),
      col("doc_id").cast("string"), lit(":"), col("pos").cast("string")),
      lit("utf-8")))
    val d1 = expr(s"instr('$hx', substring(__h, 1, 1))") - 1
    val d2 = expr(s"instr('$hx', substring(__h, 2, 1))") - 1
    val d3 = expr(s"instr('$hx', substring(__h, 3, 1))") - 1
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = tokenized(Tables.documents(s, d))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        explode(sequence(lit(1L), size(col("t")).cast("long"))).as("pos"))
      .withColumn("__h", h)
      .filter(d1 * 16 + d2 < 13) // ≈5.1% of positions start a span
      .withColumn("end",
        least(col("pos") + 2 + pmod(d3, lit(3)), col("n_tok") + 1))
    starts
      .withColumn("prev_end",
        coalesce(max(col("end")).over(w), col("pos")))
      .groupBy("doc_id", "n_tok")
      .agg(count(lit(1)).as("n_spans"),
        sum(greatest(lit(0L), col("end") -
          greatest(col("pos"), col("prev_end")))).cast("long")
          .as("n_masked"))
      .select(col("doc_id"), col("n_tok"), col("n_spans"), col("n_masked"),
        round(col("n_masked").cast("double") / col("n_tok"), 6)
          .as("mask_frac"))
      .orderBy("doc_id")
  }

  /** Robust outlier gate — Tukey's IQR fence per group, the standard
    * numeric-cleaning step before a column feeds training: keep values
    * in [q1 − 1.5·IQR, q3 + 1.5·IQR], report what survived. Quartiles
    * here are EXACT interpolated percentiles (oracle-able; per-group
    * sorted state) — at 100 TB the drop-in scale twin is
    * approx_percentile's fixed-size sketch (declared separately as
    * q_approx_percentile), with the fence logic unchanged. The stats
    * side aggregates to one row per group (group-cardinality-sized, a
    * true broadcast dim), so the join back is broadcast by construction
    * and the only data shuffles are the two aggregations' own.
    *
    * Determinism: the fence expressions are written with the same
    * operation order in both engines, but the quartile INTERPOLATION
    * internals (Spark percentile vs DuckDB quantile_cont) are not under
    * this code's control — the result is empirically bit-identical on
    * this data at every test SF, and a cutpoint landing within an ulp of
    * a data value could in principle flip fence membership on other
    * data. CurationSpec pins the safety margin loudly: no event value
    * lies within 1e-6 of any fence. */
  val qOutlierIqr: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.events(s, d).select(col("event_type"), col("value"))
    val stats = e.groupBy("event_type").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.75)").as("q3"),
      count(lit(1)).as("n_total"))
    e.join(broadcast(stats), "event_type")
      .filter(
        col("value") >= col("q1") - (col("q3") - col("q1")) * 1.5 &&
          col("value") <= col("q3") + (col("q3") - col("q1")) * 1.5)
      .groupBy(col("event_type"), col("n_total"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("kept_sum"))
      .select("event_type", "n_total", "n_kept", "kept_sum")
      .orderBy("event_type")
  }

  /** Equi-depth (quantile) binning — the feature-engineering
    * discretization step: decile cutpoints from ONE exact-percentile
    * aggregation (9 doubles — a 1-row broadcast), bin assignment as a
    * codegen'd count-of-cuts-below fold over that array, per-bin
    * count + value range out. Two tiny shuffles total (the percentile
    * agg and the 10-group final); the corpus-side work is map-only.
    * Both engines document the same lerp interpolation and the results
    * are empirically bit-identical on this data at every test SF — but
    * the interpolation internals are not under this code's control, so
    * CurationSpec asserts the margin that keeps bin membership stable
    * (no value within 1e-6 of a cutpoint). At 100 TB the drop-in twin
    * is approx_percentile cutpoints — the assignment fold is
    * unchanged. */
  val qEquidepthBins: (SparkSession, String) => DataFrame = (s, d) => {
    val e = Tables.orders(s, d).select(col("o_totalprice").as("v"))
    val cuts = e.agg(expr(
      "percentile(v, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("cuts"))
    e.crossJoin(broadcast(cuts))
      .select(col("v"), aggregate(col("cuts"), lit(0),
        (acc, c) => acc + when(col("v") >= c, 1).otherwise(0)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("cnt"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bin")
  }

  private val shardDigestOracle =
    "WITH a AS (SELECT doc_id, md5('graft_shuffle' || CAST(doc_id AS VARCHAR)) AS h FROM documents), b AS (SELECT doc_id, h, CAST(((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(h, 2, 1)) - 1)) % 8 AS INT) AS shard FROM a), r AS (SELECT shard, doc_id, row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn FROM b) SELECT shard, COUNT(*) AS n_docs, CAST(SUM((rn * (doc_id % 1000003 + 7)) % 2147483647) AS BIGINT) AS digest FROM r GROUP BY shard ORDER BY shard"

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document log
    * importance weight under hashed-n-gram bag-of-features models of a
    * TARGET distribution (here lang='en' — the "quality domain" stand-in)
    * vs the RAW corpus. Features are unigram+bigram occurrences hashed to
    * 256 buckets via the md5 hex-pair decode both engines share
    * (qDomainMix's move — never engine-specific hash()); bucket counts
    * get +1 smoothing; each doc's weight is the sum over its feature
    * OCCURRENCES of the bucket log-ratio.
    *
    * Scale shape: feature hashing is a codegen'd map pass; both count
    * tables aggregate to ≤256 rows (map-side partial combine does nearly
    * all the work); the log-ratio table joins back as a BROADCAST of 256
    * rows; the only corpus-sized shuffle is the per-doc re-aggregation on
    * doc_id. Cross-engine float discipline: ln() runs on identically-
    * ordered arithmetic and is rounded to 6 decimals into DECIMAL(24,6)
    * BEFORE the exact per-doc sum (the q_quality_unigram_lp rule), so
    * partitioning can never flip a hash. */
  /** (doc_id, lang, b): one row per hashed feature OCCURRENCE
    * (unigrams + bigrams → 256 buckets via the cross-engine md5
    * hex-pair decode). Shared by the batch weights and the streaming
    * ingest gate, which must bucket IDENTICALLY for the additive
    * count merge to reproduce the batch ratio table. */
  private[graft] def dsirFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("lang"),
        explode(concat(col("t"), ngramsFromToks(col("t"), 2))).as("f"))
      .withColumn("b",
        (expr("instr('0123456789abcdef', substring(md5(f), 1, 1))") - 1)
          * 16 +
        (expr("instr('0123456789abcdef', substring(md5(f), 2, 1))") - 1))
      .select("doc_id", "lang", "b")

  /** Smoothed log-ratio table from merged bucket counts (b, c_s, c_t):
    * ≤256 rows, the broadcast side of every DSIR scoring join. The
    * arithmetic ORDER is the cross-engine contract (ln on identically
    * ordered ops, rounded to 6 into DECIMAL(24,6) before any sum) —
    * streaming refreshes MUST route through this same expression. */
  private[graft] def dsirRatioFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.agg(sum(col("c_s")).as("n_s"),
      sum(col("c_t")).as("n_t"))
    counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log(((col("c_t") + 1).cast("double") * (col("n_s") + 256)) /
          ((col("c_s") + 1).cast("double") * (col("n_t") + 256))), 6)
          .cast("decimal(24,6)").as("lr"))
  }

  /** Per-bucket source/target counts over a feature frame — additive
    * over disjoint document batches, which is what makes the streaming
    * per-batch refresh exact (merged counts ≡ full-corpus counts). */
  private[graft] def dsirCounts(feats: DataFrame): DataFrame =
    feats.groupBy("b").agg(count(lit(1)).as("c_s"),
      count(when(col("lang") === "en", 1)).as("c_t"))

  /** DuckDB twin of the full DSIR weight computation — shared BY
    * REFERENCE with q_stream_dsir_gate: the streaming ingest's additive
    * count merge plus final-table scoring must reproduce the batch
    * weights bit-for-bit, and the driver hash-proves it. */
  private[graft] val dsirOracle: String =
    "WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM documents), f0 AS (SELECT doc_id, lang, unnest(t) AS f FROM t UNION ALL SELECT doc_id, lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS f FROM t WHERE len(t) >= 2), fb AS (SELECT doc_id, lang, (instr('0123456789abcdef', substring(md5(f), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5(f), 2, 1)) - 1) AS b FROM f0), sc AS (SELECT b, COUNT(*) AS c_s FROM fb GROUP BY b), tc AS (SELECT b AS tb, COUNT(*) AS c_t FROM fb WHERE lang = 'en' GROUP BY 1), tot AS (SELECT (SELECT SUM(c_s) FROM sc) AS n_s, (SELECT COALESCE(SUM(c_t), 0) FROM tc) AS n_t), r AS (SELECT b, CAST(round(ln((CAST(c_t + 1 AS DOUBLE) * (n_s + 256)) / (CAST(c_s + 1 AS DOUBLE) * (n_t + 256))), 6) AS DECIMAL(24,6)) AS lr FROM (SELECT sc.b, c_s, COALESCE(c_t, 0) AS c_t FROM sc LEFT JOIN tc ON sc.b = tc.tb) CROSS JOIN tot) SELECT doc_id, CAST(SUM(lr) AS DOUBLE) AS dsir_lw, COUNT(*) AS n_feats FROM fb JOIN r USING (b) GROUP BY doc_id ORDER BY doc_id"

  val qDsirWeights: (SparkSession, String) => DataFrame = (s, d) => {
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val feats = dsirFeatures(
      Tables.documents(s, d).repartition(parts))
    val ratio = dsirRatioFromCounts(dsirCounts(feats))
    feats.join(broadcast(ratio), "b")
      .groupBy("doc_id")
      .agg(sum(col("lr")).cast("double").as("dsir_lw"),
        count(lit(1)).as("n_feats"))
      .orderBy("doc_id")
  }

  /** Corpus snapshot diff — the data-versioning audit between two corpus
    * versions: per-source counts of added / removed / changed / unchanged
    * documents via a content-digest FULL OUTER join on the doc key. The
    * "next snapshot" is a deterministic synthetic revision of the fixture
    * (every 50th doc dropped, every 31st doc's text revised, re-keyed
    * copies of every 97th appended) so the oracle states the identical
    * construction and the driver hash-verifies the whole diff.
    *
    * Scale shape: digests are a codegen'd map pass; the diff is ONE
    * co-partitioned full-outer shuffle join on the doc key (zero-exchange
    * when both snapshots share a bucketed layout), and the report
    * aggregates to sources×4 rows. This is the nightly what-changed gate
    * between corpus drops — at 100 TB its cost is one keyed join, never
    * a text comparison (digests compare, text stays in place). */
  val qCorpusDiff: (SparkSession, String) => DataFrame = (s, d) => {
    val cur = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5(col("text")).as("dg"))
    val revised = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(50L)) =!= 7)
      .select(col("doc_id").as("n_id"), col("source").as("n_src"),
        md5(when(pmod(col("doc_id"), lit(31L)) === 3,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
          .as("n_dg"))
    val added = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(97L)) === 5)
      .select((col("doc_id") + 1000000L).as("n_id"),
        col("source").as("n_src"), md5(col("text")).as("n_dg"))
    cur.join(revised.unionByName(added),
        col("doc_id") === col("n_id"), "full_outer")
      .select(coalesce(col("source"), col("n_src")).as("src"),
        when(col("doc_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("dg") =!= col("n_dg"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("src", "status").agg(count(lit(1)).as("n"))
      .orderBy("src", "status")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    * per-doc key u^(1/w), keep the top-k keys — the distributed-friendly
    * form of weighted reservoir sampling (the selection is TakeOrdered,
    * no shuffle beyond the top-k reduction; at 100 TB each executor
    * surfaces its local top-k and the driver merges k rows). Here w =
    * n_chars (length-proportional inclusion — the "sample tokens, not
    * documents" correction every corpus subsample needs).
    *
    * Determinism discipline: u is NOT rand() — it's the md5 hex-quad of
    * the salted doc id decoded to [0,1) via the engine-portable
    * instr() digit arithmetic (qDomainMix's move), so the sample is
    * reproducible across engines, runs, and partition layouts; the
    * A-Res key is rounded to 8 decimals BEFORE the top-k order (pow()
    * ulp differences across engines cannot flip ranks; ties break on
    * doc_id). */
  val qSampleWeighted: (SparkSession, String) => DataFrame = (s, d) => {
    val h = md5(to_binary(concat(lit("graft_wrs"),
      col("doc_id").cast("string")), lit("utf-8")))
    def digit(i: Int): Column =
      expr(s"instr('0123456789abcdef', substring(__h, $i, 1))") - 1
    val v = ((digit(1) * 16 + digit(2)) * 16 + digit(3)) * 16 + digit(4)
    Tables.documents(s, d)
      .withColumn("__h", h)
      .withColumn("u", (v.cast("double") + 0.5) / 65536.0)
      .withColumn("wkey", round(pow(col("u"),
        lit(1.0) / col("n_chars")), 8))
      .select("doc_id", "source", "n_chars", "wkey")
      .orderBy(col("wkey").desc, col("doc_id").asc)
      .limit(100)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_sample_weighted", qSampleWeighted, Some(
      "SELECT doc_id, source, n_chars, round(POWER((((((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(h, 2, 1)) - 1)) * 16 + (instr('0123456789abcdef', substring(h, 3, 1)) - 1)) * 16 + (instr('0123456789abcdef', substring(h, 4, 1)) - 1)) + 0.5) / 65536.0, 1.0 / n_chars), 8) AS wkey FROM (SELECT doc_id, source, n_chars, md5('graft_wrs' || CAST(doc_id AS VARCHAR)) AS h FROM documents) ORDER BY wkey DESC, doc_id ASC LIMIT 100")),
    QueryDef("q_corpus_diff", qCorpusDiff, Some(
      "WITH cur AS (SELECT doc_id, source, md5(text) AS dg FROM documents), nxt AS (SELECT doc_id AS n_id, source AS n_src, md5(CASE WHEN doc_id % 31 = 3 THEN text || ' rev2' ELSE text END) AS n_dg FROM documents WHERE doc_id % 50 <> 7 UNION ALL SELECT doc_id + 1000000, source, md5(text) FROM documents WHERE doc_id % 97 = 5) SELECT COALESCE(c.source, n.n_src) AS src, CASE WHEN c.doc_id IS NULL THEN 'added' WHEN n.n_id IS NULL THEN 'removed' WHEN c.dg <> n.n_dg THEN 'changed' ELSE 'unchanged' END AS status, COUNT(*) AS n FROM cur c FULL OUTER JOIN nxt n ON c.doc_id = n.n_id GROUP BY 1, 2 ORDER BY 1, 2")),
    QueryDef("q_dsir_weights", qDsirWeights, Some(dsirOracle)),
    QueryDef("q_equidepth_bins", qEquidepthBins, Some(
      "WITH c AS (SELECT quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM orders) SELECT CAST(len(list_filter(c.cuts, x -> o.o_totalprice >= x)) AS INT) AS bin, COUNT(*) AS cnt, MIN(o.o_totalprice) AS lo, MAX(o.o_totalprice) AS hi FROM orders o CROSS JOIN c GROUP BY 1 ORDER BY 1")),
    QueryDef("q_pack_sequences", qPackSequences, Some(
      "WITH docs AS (SELECT source, doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok, COALESCE(SUM(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM documents), spans AS (SELECT source, doc_id, n_tok, cum_before, unnest(generate_series(CAST(cum_before // 512 AS BIGINT), CAST((cum_before + n_tok - 1) // 512 AS BIGINT))) AS seq_id FROM docs) SELECT source, seq_id, COUNT(*) AS n_docs, CAST(SUM(LEAST(cum_before + n_tok, (seq_id + 1) * 512) - GREATEST(cum_before, seq_id * 512)) AS BIGINT) AS n_tokens, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc FROM spans GROUP BY 1, 2 ORDER BY 1, 2")),
    QueryDef("q_span_mask", qSpanMask, Some(
      "WITH p AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, CAST(i AS BIGINT) AS pos FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents), unnest(range(1, len(t) + 1)) AS u(i)), hsh AS (SELECT doc_id, n_tok, pos, md5('graft_mask' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)) AS h FROM p), st AS (SELECT doc_id, n_tok, pos, LEAST(pos + 2 + ((instr('0123456789abcdef', substring(h, 3, 1)) - 1) % 3), n_tok + 1) AS spanend FROM hsh WHERE (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) < 13), sw AS (SELECT doc_id, n_tok, pos, spanend, COALESCE(MAX(spanend) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos) AS prev_end FROM st) SELECT doc_id, n_tok, COUNT(*) AS n_spans, CAST(SUM(GREATEST(0, spanend - GREATEST(pos, prev_end))) AS BIGINT) AS n_masked, round(CAST(SUM(GREATEST(0, spanend - GREATEST(pos, prev_end))) AS DOUBLE) / n_tok, 6) AS mask_frac FROM sw GROUP BY doc_id, n_tok ORDER BY doc_id")),
    QueryDef("q_shuffle_shards", qShuffleShards, Some(shardDigestOracle)),
    // same oracle BY REFERENCE: the digest from the compacted layout must
    // equal the digest of the logical shard assignment — compaction
    // preserved membership, shard placement, and in-shard order exactly
    QueryDef("q_compact_shards", qCompactShards, Some(shardDigestOracle)),
    QueryDef("q_decontaminate", qDecontaminate, Some(
      s"WITH $gramsCte, bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0), corpus AS (SELECT doc_id, g FROM g WHERE doc_id % 50 <> 0) SELECT doc_id, COUNT(*) AS n_overlap FROM corpus JOIN bench USING (g) GROUP BY doc_id ORDER BY doc_id")),
    // bit-identical to q_decontaminate by construction (bloom gate is a
    // superset pre-filter; exact verify restores equality) — same oracle
    QueryDef("q_decontaminate_bloom", qDecontaminateBloom, Some(
      s"WITH $gramsCte, bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0), corpus AS (SELECT doc_id, g FROM g WHERE doc_id % 50 <> 0) SELECT doc_id, COUNT(*) AS n_overlap FROM corpus JOIN bench USING (g) GROUP BY doc_id ORDER BY doc_id")),
    QueryDef("q_repetition_score", qRepetitionScore, Some(
      "SELECT doc_id, CASE WHEN len(bg) > 0 THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6) ELSE 0.0 END AS rep_bigram, round(CAST(list_max(list_transform(list_distinct(t), u -> len(list_filter(t, x -> x = u)))) AS DOUBLE) / len(t), 6) AS top_tok_frac FROM (SELECT doc_id, t, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)) ORDER BY doc_id")),
    QueryDef("q_scrub_ids", qScrubIds, Some(
      "SELECT event_id, regexp_replace(props, '\\d+', '#', 'g') AS masked, len(regexp_extract_all(props, '\\d+')) AS n_ids FROM events ORDER BY event_id")),
    QueryDef("q_outlier_iqr", qOutlierIqr, Some(
      "WITH s AS (SELECT event_type, quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3, COUNT(*) AS n_total FROM events GROUP BY event_type) SELECT e.event_type, s.n_total, COUNT(*) AS n_kept, CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS kept_sum FROM events e JOIN s ON e.event_type = s.event_type WHERE e.value >= s.q1 - (s.q3 - s.q1) * 1.5 AND e.value <= s.q3 + (s.q3 - s.q1) * 1.5 GROUP BY e.event_type, s.n_total ORDER BY e.event_type")),
    QueryDef("q_domain_mix_temperature", qDomainMixTemperature, Some(
      "WITH dd AS (SELECT doc_id, 'd' || length(CAST(doc_id % 500 AS VARCHAR)) AS dom FROM documents), c AS (SELECT dom, COUNT(*) AS n_d FROM dd GROUP BY dom), cs AS (SELECT dom, n_d, CAST(floor(sqrt(CAST(n_d AS DOUBLE)) * 1e6) AS BIGINT) AS s_d FROM c), t AS (SELECT SUM(s_d) AS total, SUM(n_d) // 2 AS t_budget FROM cs), h AS (SELECT doc_id, dom, CAST((((instr('0123456789abcdef', substring(hh, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(hh, 2, 1)) - 1)) * 16 + (instr('0123456789abcdef', substring(hh, 3, 1)) - 1)) * 16 + (instr('0123456789abcdef', substring(hh, 4, 1)) - 1) AS BIGINT) AS v FROM (SELECT doc_id, dom, md5('graft_temp' || CAST(doc_id AS VARCHAR)) AS hh FROM dd)) SELECT doc_id, h.dom, CASE WHEN s_d * t_budget >= total * n_d THEN 1.0 ELSE round(CAST(total AS DOUBLE) * n_d / (CAST(s_d AS DOUBLE) * t_budget), 6) END AS weight FROM h JOIN cs ON h.dom = cs.dom CROSS JOIN t WHERE s_d * t_budget >= total * n_d OR (2 * v + 1) * total * n_d < 131072 * s_d * t_budget ORDER BY doc_id")),
    QueryDef("q_domain_mix", qDomainMix, Some(
      "SELECT doc_id, source, CASE WHEN CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 2 = 1 THEN 1.0 ELSE round(256.0 / 102.0, 6) END AS weight FROM (SELECT doc_id, source, (instr('0123456789abcdef', substring(md5('graft_mix' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substring(md5('graft_mix' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bk FROM documents) WHERE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 2 = 1 OR bk < 102 ORDER BY doc_id"))
  )
}
