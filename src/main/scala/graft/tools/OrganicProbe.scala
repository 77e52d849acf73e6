package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.operators.Dedup

/** ORGANIC ×10 scale probe for the heavy dedup paths (VERDICT r8 item
  * 1). ScaleProbe replicates the corpus, which makes every LSH bucket
  * uniformly hot and every 50-token window an exact n-way duplicate —
  * the worst case for the cap path but the WRONG distribution for the
  * long tail. This probe instead grows the corpus organically:
  * generation g (1..9) rewrites each base document with
  *   - per-position token substitution at rate 5·g% (substitutes drawn
  *     from the SAME document by salted hash — natural token stats, no
  *     synthetic marker tokens), and
  *   - a 60% prefix slice for every third generation (true containment
  *     shapes).
  * The result is a 50k-doc corpus whose pairwise similarity spans
  * ~0.3–0.95: LSH buckets get a realistic occupancy long tail (some
  * over the cap, most under), substring dedup sees partially-shared
  * windows instead of whole-doc copies, and containment's rarest-gram
  * prefilter faces organic gram frequencies. Deterministic end to end —
  * every random draw is a salted xxhash64 of (generation, doc, pos).
  *
  * Reported per op: 1× wall-clock, ×10 wall-clock, the ratio, and the
  * hot-bucket-cap engagement count (nHotBuckets) for the LSH paths.
  */
object OrganicProbe {

  /** Zipf-vocabulary synthetic base corpus (VERDICT r9 item 2): the
    * testdata documents draw from a ~31-type vocabulary, so every
    * bigram is corpus-hot and the containment probes measure the
    * overflow FLOOR (100% of docs unprunable), not an estimate. This
    * base instead draws each token from a Zipf(alpha=1.1) law over
    * `vocab`=50k types via the continuous inverse-CDF approximation
    * r = (1 + u·(V^(1−α) − 1))^(1/(1−α)), u a salted-xxhash64 uniform —
    * entirely in-plan (pow/floor over codegen'd hashes, no UDFs, fully
    * deterministic). The resulting gram-frequency spectrum has the long
    * rare tail real text has: most docs own a sub-cap prefix gram and
    * stay on the exact path, while template-heavy mutants overflow —
    * the regime the df cap was designed for, now measurable as a
    * fraction instead of a floor. */
  def zipfBase(spark: SparkSession, nDocs: Int, vocab: Int = 50000,
      alpha: Double = 1.1): DataFrame = {
    val oneMinus = 1.0 - alpha
    val cdfScale = math.pow(vocab.toDouble, oneMinus) - 1.0
    val half = (1L << 52).toDouble
    spark.range(1, nDocs + 1).toDF("doc_id")
      .withColumn("len",
        (lit(60) + pmod(xxhash64(lit("len"), col("doc_id")), lit(240)))
          .cast("int"))
      .withColumn("text", array_join(
        transform(sequence(lit(1), col("len")), i => {
          val u = (pmod(xxhash64(lit("tok"), col("doc_id"), i),
            lit(1L << 52)).cast("double") + lit(0.5)) / lit(half)
          val r = pow(lit(1.0) + u * lit(cdfScale), lit(1.0 / oneMinus))
          concat(lit("w"),
            least(floor(r), lit(vocab.toDouble)).cast("long").cast("string"))
        }), " "))
      .select(col("doc_id"), col("text"))
  }

  /** Generation g of the organic corpus: mutated (and for g % 3 == 2,
    * prefix-sliced) copies of the base docs, ids offset by g·10⁷. */
  def generation(base: DataFrame, g: Int,
      idOffsetUnit: Long = 10_000_000L): DataFrame = {
    val rate = 5 * g // percent
    val t0 = split(trim(col("text")), "\\s+")
    val t = if (g % 3 == 2)
      slice(t0, lit(1), greatest(lit(1), (size(t0) * 6) / 10)) else t0
    val sub = transform(col("t"), (x, i) => {
      val h = xxhash64(lit(g), col("doc_id"), i)
      val pick = element_at(col("t"),
        (pmod(xxhash64(lit(g + 101), col("doc_id"), i), size(col("t")))
          + 1).cast("int"))
      when(pmod(h, lit(100)) < rate, pick).otherwise(x)
    })
    base
      .withColumn("t", t)
      .withColumn("text", array_join(sub, " "))
      .withColumn("doc_id", col("doc_id") + lit(g * idOffsetUnit))
      .drop("t")
  }

  def organicCorpus(base: DataFrame, generations: Int,
      idOffsetUnit: Long = 10_000_000L): DataFrame =
    (1 to generations).map(generation(base, _, idOffsetUnit))
      .foldLeft(base)(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probeFilter = sys.env.get("SPARK_GRAFT_PROBE_FILTER")

    // SPARK_GRAFT_ORGANIC_VOCAB=zipf swaps the base corpus for the
    // Zipf(1.1, 50k types) synthetic — same doc count as the sf dir
    val useZipf = sys.env.get("SPARK_GRAFT_ORGANIC_VOCAB").contains("zipf")
    val base = (if (useZipf)
        zipfBase(spark, Tables.documents(spark, d).count().toInt)
      else Tables.documents(spark, d)).localCheckpoint()
    if (useZipf) println("== vocabulary: Zipf(1.1), 50k types ==")
    // materialize the generated corpus so generation cost never lands
    // inside a probed op's timing
    val organic = organicCorpus(base, 9).localCheckpoint()
    println(s"== organic probe: base=${base.count()} docs, " +
      s"organic=${organic.count()} docs ==")

    def time(label: String)(f: => Long): Unit =
      if (probeFilter.forall(label.contains)) {
        System.gc()
        val t0 = System.nanoTime()
        val rows = f
        println(
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $label ($rows rows)")
      }

    // untimed warmup: codegen + C2 compilation of the shared kernels,
    // so the 1x numbers measure the op, not first-iteration JIT
    Dedup.substringDedup(base, 50).count()
    Dedup.minhashPairsWithStats(base).pairs.count()
    Dedup.containmentPairs(base).count()

    // 1. exact-substring dedup (w=50)
    time("substring dedup w=50 1x organic-base")(
      Dedup.substringDedup(base, 50).count())
    time("substring dedup w=50 10x organic")(
      Dedup.substringDedup(organic, 50).count())
    time("substring dedup BLOOM w=50 10x organic")(
      Dedup.substringDedupBloom(organic, 50).count())

    // 1b. in-engine LR quality training: 24 GD iterations, each one
    // corpus pass over the checkpointed 6-column feature frame — the
    // wall should track corpus size with a large fixed floor (24 tiny
    // jobs), i.e. strongly sublinear across the decade
    time("quality LR train 24it 10x organic")(
      graft.operators.TextAnalysis.lrTrainTrace(organic).last._1.toLong)

    // 2. MinHash/LSH clustering, with cap-engagement counts
    time("LSH pairs + clusters 1x organic-base") {
      val pt = Dedup.minhashPairsWithStats(base)
      val n = Dedup.connectedComponents(pt.pairs, localMaxPairs = 0L)
        .count()
      println(s"          1x hot-bucket engagements: ${pt.nHotBuckets}")
      n
    }
    time("LSH pairs + clusters 10x organic") {
      val pt = Dedup.minhashPairsWithStats(organic)
      val n = Dedup.connectedComponents(pt.pairs, localMaxPairs = 0L)
        .count()
      println(s"          10x hot-bucket engagements: ${pt.nHotBuckets}")
      n
    }

    // 3. containment (rarest-gram prefix filtering)
    time("containment pairs 1x organic-base")(
      Dedup.containmentPairs(base).count())
    time("containment pairs 10x organic")(
      Dedup.containmentPairs(organic).count())
    time("containment pairs 10x organic DF-CAPPED (cap=64)") {
      val (pairs, overflow) =
        Dedup.containmentPairsCapped(organic, 90, dfCap = 64)
      val n = pairs.count()
      println(s"          overflow (unprunable) docs: ${overflow.count()}")
      n
    }

    // ×100: a SECOND wave of 9 mutation generations over the ×10
    // corpus (distinct id stratum) — mutations compound, so the
    // similarity structure is hierarchical near-dup families, the way
    // real web boilerplate drifts. Opt-in: SPARK_GRAFT_ORGANIC_X100=1.
    if (sys.env.get("SPARK_GRAFT_ORGANIC_X100").contains("1")) {
      val organic100 =
        organicCorpus(organic, 9, idOffsetUnit = 1_000_000_000L)
          .localCheckpoint()
      println(s"== x100 wave: ${organic100.count()} docs ==")
      time("quality LR train 24it 100x organic")(
        graft.operators.TextAnalysis.lrTrainTrace(organic100).last._1.toLong)
      time("substring dedup w=50 100x organic")(
        Dedup.substringDedup(organic100, 50).count())
      time("substring dedup BLOOM w=50 100x organic")(
        Dedup.substringDedupBloom(organic100, 50).count())
      // default 4M capacity saturates against this corpus's ~5M
      // duplicated grams (FPP → pass-through); capacity sized to the
      // corpus restores the gate
      time("substring dedup BLOOM16M w=50 100x organic")(
        Dedup.substringDedupBloom(organic100, 50,
          expectedDupGrams = 16000000L).count())
      // stage decomposition for the superlinear decade (round 11):
      // cumulative-prefix timings — each row adds one stage, so
      // successive differences attribute the cost
      time("substring-decompose grams-only 100x")(
        Dedup.substringGramTable(organic100, 50).count())
      time("substring-decompose firsts-agg 100x")(
        Dedup.substringGramTable(organic100, 50)
          .groupBy("gh")
          .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
          .count())
      time("substring-decompose dup-occurrences 100x") {
        val grams = Dedup.substringGramTable(organic100, 50)
        val firsts = grams.groupBy("gh")
          .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
        grams.join(firsts, "gh")
          .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
          .count()
      }
      time("LSH pairs + clusters 100x organic") {
        val pt = Dedup.minhashPairsWithStats(organic100)
        val n = Dedup.connectedComponents(pt.pairs, localMaxPairs = 0L)
          .count()
        println(s"          100x hot-bucket engagements: ${pt.nHotBuckets}")
        n
      }
      time("containment pairs 100x organic")(
        Dedup.containmentPairs(organic100).count())
      // The bounded exact path: df-capped prefix filtering — docs whose
      // rarest gram is hotter than the cap route to overflow (→ LSH),
      // everything prunable stays exact, and candidate volume is
      // ≤ n·prefixLen·dfCap by construction.
      time("containment pairs 100x organic DF-CAPPED (cap=64)") {
        val (pairs, overflow) =
          Dedup.containmentPairsCapped(organic100, 90, dfCap = 64)
        val n = pairs.count()
        println(s"          overflow (unprunable) docs: ${overflow.count()}")
        n
      }
      // Dedup-first composition, measured for completeness: collapsing
      // LSH clusters to canonicals first removes only the high-sim
      // family members (~18% here — compounded mutations put most pairs
      // under the LSH threshold), so the survivor set ALSO exceeded
      // this box's disk in the exact join. The df cap above is the
      // load-bearing guard; this probe documents that composition
      // alone is not.
      time("containment 100x AFTER LSH dedup (survivors)") {
        val cc = Dedup.connectedComponents(
          Dedup.minhashPairsWithStats(organic100).pairs,
          localMaxPairs = 0L)
        val nonCanon = cc.filter(col("doc_id") =!= col("canonical"))
          .select("doc_id")
        val survivors = organic100
          .join(nonCanon, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        println(s"          survivors: ${survivors.count()}")
        Dedup.containmentPairs(survivors).count()
      }
    }

    spark.stop()
  }
}
