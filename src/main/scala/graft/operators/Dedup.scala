package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Deduplication operators over `documents` — the training-data-pipeline
  * core: exact dedup, brute-force n-gram Jaccard (the oracle-able
  * baseline), MinHash+LSH (the 100 TB scale path), and SimHash banding.
  *
  * Scale design:
  *  - Exact dedup: one hash shuffle on the normalized-text key (or its md5
  *    to keep shuffle rows narrow) — embarrassingly scalable.
  *  - Brute-force Jaccard is O(n²) pairs and exists as the correctness
  *    baseline; a cheap size-ratio prefilter (mathematically implied by the
  *    Jaccard threshold) prunes most pairs before the set intersection.
  *  - MinHash+LSH replaces O(n²) with shingle→signature→band→bucket-join:
  *    cost is O(n·k) signature work plus a shuffle keyed on (band, bucket);
  *    only same-bucket candidates are verified exactly. Bucket skew (a hot
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

  /** Distinct word-bigram shingles of `text`. */
  private def bigramShingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
  }

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_distinct(array_intersect(a, b))).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // --- brute-force n-gram Jaccard near-dup (oracle-able baseline) ---
  // j >= 0.8 implies |A| and |B| within 0.8× of each other, so the size
  // prefilter cannot change results — it only prunes work.
  val qDedupNgramJaccard: (SparkSession, String) => DataFrame = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), bigramShingles(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      size(col("sh")).as("n_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      size(col("sh")).as("n_b"))
    a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(0.8) * greatest(col("n_a"), col("n_b")))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  // --- MinHash + LSH (the scale path; verified against true Jaccard) ---
  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands
  private val MersennePrime = 2147483647L // 2^31 - 1
  // Deterministic permutation constants from a fixed-seed LCG (no runtime
  // randomness — resumable, cluster-stable).
  private val (hashA, hashB) = {
    var x = 123456789L
    def next(): Long = {
      x = 6364136223846793005L * x + 1442695040888963407L
      (x >>> 33) % MersennePrime
    }
    val a = Array.fill(NumHashes)(next() % (MersennePrime - 1) + 1)
    val b = Array.fill(NumHashes)(next())
    (a, b)
  }

  /** MinHash signature column over a shingle array: for each of the k
    * permutations, min over shingles of (a·h + b) mod p, with the shingle
    * first reduced mod p so the multiply never overflows a Long (ANSI-safe).
    */
  def minhashSignature(shingles: Column): Column = {
    val hashes = transform(shingles, sh => pmod(xxhash64(sh),
      lit(MersennePrime)))
    array((0 until NumHashes).map { i =>
      array_min(transform(hashes,
        h => pmod(h * lit(hashA(i)) + lit(hashB(i)), lit(MersennePrime))))
    }: _*)
  }

  /** LSH band keys: one xxhash64 bucket key per band of the signature. */
  def lshBands(sig: Column): Column =
    array((0 until Bands).map { j =>
      val rows = (0 until RowsPerBand)
        .map(r => element_at(sig, j * RowsPerBand + r + 1))
      struct(lit(j).as("band"),
        xxhash64(lit(j) +: rows: _*).as("bkey"))
    }: _*)

  val qDedupMinhash: (SparkSession, String) => DataFrame = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), bigramShingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val exploded = docs
      .select(col("doc_id"), explode(lshBands(minhashSignature(col("sh"))))
        .as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.bkey").as("bkey"))
    val cand = exploded.as("x")
      .join(exploded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sa = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val sb = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  // --- SimHash: 64-bit frequency-weighted signature + banded pairing ---
  /** SimHash via a SQL lambda expression over the `hs` (token-hash array)
    * column: per-bit majority vote of token hashes, frequency-weighted
    * (tokens kept non-distinct). Variable shift amounts need SQL
    * `shiftleft`/`>>` which accept column shift counts, unlike the Scala
    * wrappers — hence expr() rather than Column API. */
  val simhashSql: String =
    """aggregate(
         transform(sequence(0, 63), i ->
           CASE WHEN aggregate(hs, 0L,
                  (acc, h) -> acc + CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) > 0
                THEN shiftleft(1L, i) ELSE 0L END),
         0L, (acc, b) -> acc | b)"""

  val qDedupSimhash: (SparkSession, String) => DataFrame = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("hs", transform(col("toks"), t => xxhash64(t)))
      .withColumn("simhash", expr(simhashSql))
      .select("doc_id", "simhash")
    // band into 4 × 16-bit chunks; near-dups (hamming <= 6) share a chunk
    // with high probability; verify with exact bit_count(xor).
    val banded = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL))
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
      .filter(col("hamming") <= 6)
      .orderBy("doc_a", "doc_b")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_exact", qDedupExact, Some(
      "SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars, row_number() OVER (PARTITION BY md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 ORDER BY doc_id")),
    QueryDef("q_dedup_ngram_jaccard", qDedupNgramJaccard, Some(
      """WITH sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(string_split_regex(trim(text), '\s+'))), i -> string_split_regex(trim(text), '\s+')[i] || ' ' || string_split_regex(trim(text), '\s+')[i+1])) AS sh FROM documents), pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b, len(a.sh) AS n_a, len(b.sh) AS n_b FROM sh a CROSS JOIN sh b WHERE a.doc_id < b.doc_id AND CAST(least(len(a.sh), len(b.sh)) AS DOUBLE) >= 0.8 * greatest(len(a.sh), len(b.sh))) SELECT doc_a, doc_b, round(jac, 4) AS jac FROM (SELECT doc_a, doc_b, CAST(len(list_distinct(list_intersect(sh_a, sh_b))) AS DOUBLE) / (len(sh_a) + len(sh_b) - len(list_distinct(list_intersect(sh_a, sh_b)))) AS jac FROM pairs) WHERE jac >= 0.8 ORDER BY doc_a, doc_b""")),
    QueryDef("q_dedup_minhash", qDedupMinhash, None),
    QueryDef("q_dedup_simhash", qDedupSimhash, None)
  )
}
