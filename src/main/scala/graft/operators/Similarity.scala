package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions.dotd

/** Similarity search over `embeddings.embedding: array<float>`.
  *
  *  - Brute-force cosine top-k: the correctness baseline. One broadcast of
  *    the query vector, a codegen'd native dot product per row
  *    (graft.functions.DoubleArrayDot), TakeOrderedAndProject for the
  *    top-k — no shuffle of the corpus.
  *  - Pairwise near-dup (cosine >= t): O(n²) pairs, but the similarity
  *    predicate is evaluated inside the broadcast-nested-loop join
  *    condition, so non-matching pairs are never materialized — the join
  *    emits only the handful of true near-dups.
  *  - IVF cluster-pruned search: the 100 TB scale path — a coarse
  *    quantizer learned by deterministic distributed k-means
  *    (kmeansCentroids), probe only the nearest cluster's inverted list.
  *    At scale the corpus is bucketed by centroid id on disk so a probe
  *    reads one partition, not the table.
  *
  * Numeric story: elements are cast to DOUBLE once per row; similarity is
  * dot(a,b) / (sqrt(dot(a,a))·sqrt(dot(b,b))) with the norm² computed by
  * the same sequential fold the DuckDB oracle uses (`list_dot_product`),
  * so values are bit-identical and hash-compare is stable.
  */
object Similarity {

  private def toDouble(arr: Column): Column =
    transform(arr, x => x.cast("double"))

  /** embeddings(vec_id, label, embedding) → (vec_id, label,
    * ce: array<double>, n2: double) with norm² precomputed once per row. */
  def prepare(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("label"),
      toDouble(col("embedding")).as("ce"))
      .withColumn("n2", dotd(col("ce"), col("ce")))

  private def prepared(s: SparkSession, d: String): DataFrame =
    prepare(Tables.embeddings(s, d))

  /** Brute-force cosine top-k against the vector with id `queryId`. */
  def cosineTopK(embs: DataFrame, queryId: Long, k: Int): DataFrame = {
    val e = prepare(embs)
    val qv = e.filter(col("vec_id") === queryId)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** All pairs with cosine >= threshold, O(n²) — the ORACLE-GRADE BASELINE
    * (mirrors Dedup's brute-force Jaccard role): the predicate is evaluated
    * inside the join condition so non-matches never materialize, but the
    * pair count is quadratic. The declared scale path is
    * [[nearDupPairsBucketed]]; this stays as the exact cross-check. */
  def nearDupPairs(embs: DataFrame, threshold: Double): DataFrame = {
    val e = prepare(embs)
    val a = e.select(col("vec_id").as("vec_a"), col("ce").as("ce_a"),
      col("n2").as("n2_a")).repartition(col("vec_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("ce").as("ce_b"),
      col("n2").as("n2_b"))
    val simAB = sim(col("ce_a"), col("n2_a"), col("ce_b"), col("n2_b"))
    a.join(broadcast(b),
        col("vec_a") < col("vec_b") && simAB >= threshold, "inner")
      .select(col("vec_a"), col("vec_b"), round(simAB, 4).as("sim"))
      .orderBy("vec_a", "vec_b")
  }

  private def sim(cea: Column, n2a: Column, ceb: Column, n2b: Column)
      : Column =
    dotd(cea, ceb) / (sqrt(n2a) * sqrt(n2b))

  // --- q_cosine_topk: top-10 most similar to the vec_id=0 query vector ---
  val qCosineTopk: (SparkSession, String) => DataFrame = (s, d) =>
    cosineTopK(Tables.embeddings(s, d), queryId = 0L, k = 10)

  // --- q_embed_near_dup: all pairs with cosine >= 0.4 (brute baseline) ---
  val qEmbedNearDup: (SparkSession, String) => DataFrame = (s, d) =>
    nearDupPairs(Tables.embeddings(s, d), threshold = 0.4)

  /** Bucketed embedding near-dup — the 100 TB path, EXACT by construction
    * (zero recall loss, unlike sign-LSH whose miss probability at a 0.4
    * cosine threshold is not negligible):
    *
    *  1. Normalize vectors to the unit sphere: cosine(a,b) >= t is exactly
    *     ||u_a − u_b|| <= eps = sqrt(2 − 2t) — a Euclidean ε-join.
    *  2. Partition the sphere with the deterministic k-means quantizer
    *     (same [[kmeansCentroids]] the IVF index uses).
    *  3. Prune CLUSTER PAIRS by the triangle inequality: members of
    *     clusters (i, j) can only be within eps if
    *     d(c_i, c_j) <= r_i + r_j + eps, with r = max member→centroid
    *     distance. Everything else is skipped without looking at a vector.
    *  4. Verify surviving cluster pairs with the exact similarity inside an
    *     equi-join keyed on cluster pair — never a corpus-side broadcast or
    *     a BroadcastNestedLoopJoin over data-sized inputs.
    *
    * At 100 TB the corpus is written bucketed by c_id so each surviving
    * cluster-pair task reads two buckets, not the table; skewed (hot)
    * clusters split by recursing the quantizer inside them. Worst case
    * (pathologically unclustered data: every cluster pair survives) the
    * work degrades to a distributed O(n²) verify — never wrong results. */
  def nearDupPairsBucketed(embs: DataFrame, threshold: Double, k: Int)
      : DataFrame = {
    val eps = math.sqrt(2.0 - 2.0 * threshold)
    val en = unitPrepared(embs)
    val cents = kmeansCentroids(
      en.select(col("vec_id"), col("u").as("ce")), k, 2).localCheckpoint()
    val assigned = assignWithRadius(en, cents).localCheckpoint()
    pairsFromAssignment(assigned, cents, eps, threshold)
  }

  /** unit-normalize for the geometry; keep original ce/n2 so the verified
    * similarity is bit-identical to the brute-force oracle's arithmetic */
  private def unitPrepared(embs: DataFrame): DataFrame =
    prepare(embs)
      .withColumn("u", transform(col("ce"), x => x / sqrt(col("n2"))))

  /** Assign on normalized vectors; r = true distance to own centroid
    * (clamped at 0 against float round-off). Keeps `u` so callers can
    * re-quantize subsets. */
  private def assignWithRadius(en: DataFrame, cents: DataFrame): DataFrame =
    en.crossJoin(broadcast(cents))
      .withColumn("dd",
        col("cn2") - lit(2.0) * dotd(col("u"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("ce"), col("n2"), col("u"), col("c_id"),
        col("dd")), struct(col("dd"), col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
        col("m.u").as("u"), col("m.c_id").as("c_id"),
        sqrt(greatest(col("m.dd") + dotd(col("m.u"), col("m.u")), lit(0.0)))
          .as("r"))

  /** The exact ε-join over ANY cluster partition of the corpus: prune
    * cluster pairs by triangle inequality (using each cluster's true
    * member radius), verify survivors with the exact predicate inside a
    * shuffle equi-join. Correct for arbitrary centroids/partitions — the
    * quantizer only steers efficiency, never results. */
  private def pairsFromAssignment(assigned: DataFrame, cents: DataFrame,
      eps: Double, threshold: Double): DataFrame = {
    val radii = assigned.groupBy("c_id").agg(max(col("r")).as("r"))
    // cluster-pair pruning over k² centroid pairs (driver-free, tiny)
    val ci = cents.select(col("c_id").as("ci"), col("centroid").as("cei"),
      col("cn2").as("cn2i"))
    val cj = cents.select(col("c_id").as("cj"), col("centroid").as("cej"),
      col("cn2").as("cn2j"))
    val candClusters = ci.crossJoin(cj).filter(col("ci") <= col("cj"))
      .withColumn("cd", sqrt(greatest(
        col("cn2i") - lit(2.0) * dotd(col("cei"), col("cej")) + col("cn2j"),
        lit(0.0))))
      .join(broadcast(radii.select(col("c_id").as("ci"), col("r").as("ri"))),
        "ci")
      .join(broadcast(radii.select(col("c_id").as("cj"), col("r").as("rj"))),
        "cj")
      // 1e-9 slack: pruning must stay conservative under float round-off
      .filter(col("cd") <= col("ri") + col("rj") + lit(eps + 1e-9))
      .select("ci", "cj")
    // members of each surviving cluster pair, exact predicate in the join
    // condition. Cross-cluster pairs (ci < cj) appear exactly once by
    // construction; same-cluster pairs are ordered by vec_id.
    val a = assigned
      .select(col("vec_id").as("vec_a"), col("ce").as("ce_a"),
        col("n2").as("n2_a"), col("c_id").as("ca"))
      .join(broadcast(candClusters), col("ca") === col("ci"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("ce").as("ce_b"),
      col("n2").as("n2_b"), col("c_id").as("cb"))
    val simAB = sim(col("ce_a"), col("n2_a"), col("ce_b"), col("n2_b"))
    a.hint("shuffle_hash")
      .join(b,
        col("cj") === col("cb") &&
          (col("ca") < col("cb") ||
            (col("ca") === col("cb") && col("vec_a") < col("vec_b"))) &&
          simAB >= threshold,
        "inner")
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"),
        round(simAB, 4).as("sim"))
      .orderBy("vec_a", "vec_b")
  }

  // Train-once unit-sphere quantizer per (session, corpus) — the same
  // precomputed-index rationale as ivfCentroids below: a deployment
  // trains the coarse quantizer once and reuses it across every ε-join /
  // threshold sweep; k-means is deterministic so the cache is
  // semantics-free.
  private val unitCentroidCache = graft.AppCache[DataFrame]()

  private def unitCentroids(s: SparkSession, d: String, k: Int, iters: Int)
      : DataFrame =
    unitCentroidCache.get(s, s"$d|$k|$iters")(
      kmeansCentroids(unitPrepared(Tables.embeddings(s, d))
        .select(col("vec_id"), col("u").as("ce")), k, iters)
        .localCheckpoint())

  // The verified embedding pair table has TWO declared consumers (the
  // pair report and the cluster collapse) — computed once per (session,
  // corpus) and shared, the same persisted-artifact pattern as
  // Dedup.cachedMinhashPairs. Deterministic, so semantics-free.
  private val embedPairsCache = graft.AppCache[DataFrame]()

  private[graft] def cachedEmbedPairs(s: SparkSession, d: String): DataFrame =
    embedPairsCache.get(s, d)({
      val threshold = 0.4
      val eps = math.sqrt(2.0 - 2.0 * threshold)
      val en = unitPrepared(Tables.embeddings(s, d))
      val cents = unitCentroids(s, d, k = 10, iters = 2)
      val assigned = assignWithRadius(en, cents).localCheckpoint()
      pairsFromAssignment(assigned, cents, eps, threshold).localCheckpoint()
    })

  // --- q_embed_near_dup_bucketed: same result set as q_embed_near_dup,
  // produced by the bucketed plan — hash-checked against the same
  // brute-force DuckDB oracle.
  val qEmbedNearDupBucketed: (SparkSession, String) => DataFrame =
    (s, d) => cachedEmbedPairs(s, d)

  /** HOT-CLUSTER SPLITTING — the previously documented-only step, now
    * real: quantize, then recurse the quantizer inside any cluster whose
    * population exceeds `cap` (sub-k = ceil(pop/cap), one extra
    * deterministic k-means over just that cluster's members). Returns the
    * refined (assigned, centroids) pair; every helper downstream
    * ([[pairsFromAssignment]]) is exact for ANY partition, so splitting
    * changes work distribution, never results. One level of recursion:
    * a cluster of near-identical vectors cannot be split geometrically —
    * for those the PAIR OUTPUT itself is quadratic and no partitioning
    * can help (same inherent floor as LSH's identical-doc case).
    * Driver work is metadata-sized: one count row per cluster, a loop
    * over the (≤k) hot ones. */
  def quantizeCapped(embs: DataFrame, k: Int, iters: Int, cap: Int)
      : (DataFrame, DataFrame) = {
    val en = unitPrepared(embs)
    val cents0 = kmeansCentroids(
      en.select(col("vec_id"), col("u").as("ce")), k, iters)
      .localCheckpoint()
    val assigned0 = assignWithRadius(en, cents0).localCheckpoint()
    val hot = assigned0.groupBy("c_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > cap).orderBy("c_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    if (hot.isEmpty) (assigned0, cents0)
    else {
      val hotIds = hot.map(_._1).toIndexedSeq
      var nextId = k
      var subAssigned = List.empty[DataFrame]
      var subCents = List.empty[DataFrame]
      for ((cid, cnt) <- hot) {
        val members = assigned0.filter(col("c_id") === cid)
          .select(col("vec_id"), col("ce"), col("n2"), col("u"))
          .localCheckpoint()
        val subK = math.max(2, math.ceil(cnt.toDouble / cap).toInt)
        val sc = kmeansCentroids(
          members.select(col("vec_id"), col("u").as("ce")), subK, iters)
          .withColumn("c_id", col("c_id") + lit(nextId))
          .localCheckpoint()
        // k-means can converge to fewer than subK non-empty clusters;
        // advance the id space by what it actually returned
        nextId += sc.count().toInt
        subCents ::= sc
        subAssigned ::= assignWithRadius(members, sc)
      }
      val cold = assigned0.filter(!col("c_id").isin(hotIds: _*))
      val assigned = subAssigned.foldLeft(cold)(_ unionByName _)
        .localCheckpoint()
      val cents = subCents.foldLeft(
        cents0.filter(!col("c_id").isin(hotIds: _*)))(_ unionByName _)
        .localCheckpoint()
      (assigned, cents)
    }
  }

  /** [[nearDupPairsBucketed]] with hot-cluster splitting: identical
    * results (property-tested against brute force on a dense-blob
    * geometry), bounded per-cluster verify fan-out. */
  def nearDupPairsBucketedCapped(embs: DataFrame, threshold: Double,
      k: Int, cap: Int): DataFrame = {
    val eps = math.sqrt(2.0 - 2.0 * threshold)
    val (assigned, cents) = quantizeCapped(embs, k, iters = 2, cap = cap)
    pairsFromAssignment(assigned, cents, eps, threshold)
  }

  /** Deterministic distributed k-means (Lloyd's): init = the k lowest
    * vec_ids, fixed iteration count, assignment ties broken by cluster id,
    * centroid means via exact DECIMAL element sums (order-independent) —
    * so the learned quantizer is bit-stable across runs and partition
    * layouts. Each iteration: one broadcast of k centroids + one shuffle
    * for the per-cluster means — the standard cluster-scale k-means shape.
    * Returns (c_id, centroid, cn2). */
  def kmeansCentroids(e: DataFrame, k: Int, iters: Int): DataFrame = {
    // constant partition key: the window runs over the k init rows only
    // (k ≤ a few hundred), but an EMPTY partition spec trips Spark's
    // "moving all data to a single partition" warning on every kmeans
    // build, drowning the driver tail in noise — the explicit constant
    // states the single tiny partition is intended, same semantics
    val wInit = Window.partitionBy(lit(0)).orderBy("vec_id")
    var centroids = e.orderBy("vec_id").limit(k)
      .withColumn("c_id", row_number().over(wInit) - 1)
      .select(col("c_id"), col("ce").as("centroid"))
      .withColumn("cn2", dotd(col("centroid"), col("centroid")))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      // assign each vector to the nearest centroid (squared euclidean
      // = n2 - 2·dot + cn2; n2 constant per vector → drop it).
      // min_by over a lexicographic (d2, c_id) struct: one partial-agg'd
      // shuffle instead of a window's shuffle-sort over the n×k exploded
      // rows; the (d2, c_id) key is unique per vec_id, so the choice is
      // deterministic and order-independent (bit-stable guarantee kept).
      val assigned = e.crossJoin(broadcast(centroids))
        .withColumn("d2",
          col("cn2") - lit(2.0) * dotd(col("ce"), col("centroid")))
        .groupBy(col("vec_id"))
        .agg(min_by(struct(col("c_id"), col("ce")),
          struct(col("d2"), col("c_id"))).as("m"))
        .select(col("m.c_id").as("c_id"), col("m.ce").as("ce"))
      centroids = assigned
        .select(col("c_id"), posexplode(col("ce")).as(Seq("pos", "v")))
        .groupBy("c_id", "pos")
        .agg((sum(col("v").cast("decimal(27,10)")).cast("double") /
          count(lit(1))).as("cv"))
        .groupBy("c_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
          .as("ps"))
        .select(col("c_id"),
          transform(col("ps"), p => p.getField("cv")).as("centroid"))
        .withColumn("cn2", dotd(col("centroid"), col("centroid")))
        .localCheckpoint()
    }
    centroids
  }

  // Build-once coarse quantizer per (session, corpus dir): an IVF index is
  // PRECOMPUTED and probed many times — rebuilding identical centroids on
  // every probe query would be repeated index construction. The k-means is
  // deterministic/bit-stable, so the cache is semantics-free (same rows
  // with or without it); keyed on (applicationId, params) via AppCache so
  // checkpointed RDDs never leak across sessions.
  private val centroidCache = graft.AppCache[DataFrame]()

  private def ivfCentroids(s: SparkSession, d: String, k: Int, iters: Int)
      : DataFrame =
    centroidCache.get(s, s"$d|$k|$iters")(
      kmeansCentroids(prepared(s, d).filter(col("vec_id") =!= 0L), k, iters))

  /** IVF search: probe the `nprobe` nearest clusters' inverted lists for
    * the top-k neighbors of vec_id=0. nprobe is the recall/latency knob —
    * 1 reads one corpus partition; larger values trade scan volume for
    * recall (DedupSpec asserts the dominance). At 100 TB the corpus is
    * bucketed/partitioned by c_id on disk so a probe reads `nprobe`
    * partitions, not the table. */
  def ivfSearch(s: SparkSession, d: String, k: Int, nprobe: Int)
      : DataFrame = {
    val e = prepared(s, d)
    val centroids = ivfCentroids(s, d, 10, 3)
    val qv = e.filter(col("vec_id") === 0L)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    val nearest = centroids.crossJoin(broadcast(qv))
      .select(col("c_id"), col("qe"), col("qn2"),
        sim(col("centroid"), col("cn2"), col("qe"), col("qn2")).as("csim"))
      .orderBy(col("csim").desc, col("c_id").asc)
      .limit(nprobe)
    // assign corpus vectors to their cluster (same min_by shape as the
    // k-means assignment — one partial-agg'd shuffle), keep the probed ones
    val assigned = e.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(centroids
        .select(col("c_id").as("a_id"), col("centroid").as("a_c"),
          col("cn2").as("a_n2"))))
      .withColumn("d2", col("a_n2") - lit(2.0) * dotd(col("ce"), col("a_c")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("ce"), col("n2"), col("a_id")),
        struct(col("d2"), col("a_id"))).as("m"))
      .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
        col("m.a_id").as("a_id"))
    assigned.join(broadcast(nearest), col("a_id") === col("c_id"))
      .select(col("vec_id"), col("a_id").as("cluster"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // --- q_ann_ivf: single-probe IVF search (scale path). No oracle
  // (sketch-style op): rows-only driver check + DedupSpec assertions on
  // the probe shape.
  val qAnnIvf: (SparkSession, String) => DataFrame = (s, d) =>
    ivfSearch(s, d, k = 10, nprobe = 1)

  // --- q_ann_multiprobe: nprobe=3 — the recall knob exercised. Rows-only.
  val qAnnMultiprobe: (SparkSession, String) => DataFrame = (s, d) =>
    ivfSearch(s, d, k = 10, nprobe = 3)

  // --- q_ann_ivf_exhaustive: the IVF machinery under a HARD oracle ---
  // nprobe = k probes EVERY inverted list, so assignment+probe must return
  // exactly the brute-force top-k — hash-checked against the same DuckDB
  // oracle as q_cosine_topk. This converts the IVF plumbing (centroid
  // training, min_by assignment, probe join, tie-break ordering) from
  // spec-trusted to oracle-verified; the pruned nprobe<k variants above
  // differ from it only by the probed-cluster filter.
  val qAnnIvfExhaustive: (SparkSession, String) => DataFrame = (s, d) =>
    ivfSearch(s, d, k = 10, nprobe = 10)
      .select("vec_id", "sim")
      .orderBy(col("sim").desc, col("vec_id").asc)

  // --- batch ANN: the SERVING shape — a query batch in one corpus pass ---

  /** Brute-force top-k for a BATCH of query vectors in ONE corpus scan:
    * the realistic serving request (and the oracle baseline for the batch
    * IVF probe below). The query batch is broadcast — small by definition,
    * the one broadcast that is always safe — and per-query top-k uses a
    * rank window, which Spark plans as WindowGroupLimit: the k-filter is
    * pushed below the shuffle, so each map task forwards at most k rows
    * per query instead of its whole corpus slice. */
  def cosineTopKBatch(embs: DataFrame, queryIds: Seq[Long], k: Int)
      : DataFrame = {
    val e = prepare(embs)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("ce").as("qe"),
        col("n2").as("qn2"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6).as("sim"))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
      .select("q_id", "vec_id", "sim")
      .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
  }

  val batchQueryIds: Seq[Long] = (0L until 8L)

  val qAnnBatch: (SparkSession, String) => DataFrame = (s, d) =>
    cosineTopKBatch(Tables.embeddings(s, d), batchQueryIds, k = 5)

  /** Batch IVF probe: assign the corpus once (query-independent), pick
    * each query's nprobe nearest centroids, and join candidates on the
    * CLUSTER id — one shuffle keyed by cluster regardless of batch size.
    * At 100 TB the corpus is bucketed by c_id on disk, so the join reads
    * each probed bucket once for the whole batch instead of once per
    * query — that batching is the point of the serving shape. */
  def ivfSearchBatch(s: SparkSession, d: String, queryIds: Seq[Long],
      k: Int, nprobe: Int): DataFrame = {
    val e = prepared(s, d)
    val centroids = ivfCentroids(s, d, 10, 3)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("ce").as("qe"),
        col("n2").as("qn2"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("csim").desc, col("c_id").asc)
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("q_id"), col("qe"), col("qn2"), col("c_id"),
        sim(col("centroid"), col("cn2"), col("qe"), col("qn2")).as("csim"))
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nprobe)
      .select("q_id", "qe", "qn2", "c_id")
    val assigned = e
      .crossJoin(broadcast(centroids
        .select(col("c_id").as("a_id"), col("centroid").as("a_c"),
          col("cn2").as("a_n2"))))
      .withColumn("d2", col("a_n2") - lit(2.0) * dotd(col("ce"), col("a_c")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("ce"), col("n2"), col("a_id")),
        struct(col("d2"), col("a_id"))).as("m"))
      .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
        col("m.a_id").as("a_id"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(probed, col("a_id") === col("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6).as("sim"))
      .withColumn("__rnk", row_number().over(wTop))
      .filter(col("__rnk") <= k)
      .select("q_id", "vec_id", "sim")
      .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
  }

  // Exhaustive batch probe (nprobe = all 10 lists) ≡ brute batch top-k —
  // the batch twin of q_ann_ivf_exhaustive's hard oracle, sharing
  // q_ann_batch's oracle string verbatim.
  val qAnnBatchExhaustive: (SparkSession, String) => DataFrame = (s, d) =>
    ivfSearchBatch(s, d, batchQueryIds, k = 5, nprobe = 10)

  // Self-validating recall for the PRUNED batch probe (nprobe=2 — the
  // serving configuration): one row per query carrying the ground-truth
  // size, the hit count, and recall@5, q_ann_recall-style, so a collapsed
  // index or a miscounted join is visible in the output itself. Rows-only
  // (pruned recall is a property of the index, not SQL-expressible).
  val qAnnBatchRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val truth = cosineTopKBatch(Tables.embeddings(s, d), batchQueryIds, 5)
      .select(col("q_id"), col("vec_id"))
    val got = ivfSearchBatch(s, d, batchQueryIds, k = 5, nprobe = 2)
      .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
    truth.join(got, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("truth_k"),
        sum(coalesce(col("hit"), lit(0))).as("hits"))
      .withColumn("recall",
        round(col("hits").cast("double") / col("truth_k"), 4))
      .orderBy("q_id")
  }

  // --- q_ann_recall: IVF recall@10 against the brute-force ground truth —
  // the evaluation metric an ANN index ships with, SELF-VALIDATING in the
  // q_approx_distinct style: the row carries the ground-truth size, the
  // hit count, and the recall, so a collapsed index (recall 0) or a
  // miscounted join is visible in the output itself. One row; rows-only
  // (depends on the sketch-style IVF result).
  val qAnnRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val brute = qCosineTopk(s, d).select(col("vec_id"))
    val ivf = qAnnIvf(s, d).select(col("vec_id")).withColumn("hit", lit(1))
    brute.join(ivf, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("brute_k"),
        count(col("hit")).as("ivf_hits"))
      .withColumn("recall_at_10",
        col("ivf_hits").cast("double") / col("brute_k"))
  }

  // --- IVF-PQ: product quantization — the deployed 100 TB ANN
  // memory story (VERDICT r7 item 5). int8 absmax compresses 4×; PQ
  // compresses the 64-dim float corpus to M=8 one-byte codes (32×),
  // which is what makes a trillion-vector index fit a serving fleet.
  // Shapes:
  //   - codebook training: ONE distributed Lloyd's loop for ALL M
  //     subspaces at once — rows exploded to (vec_id, m, subvector),
  //     centroids keyed (m, c_id), assignment via the same
  //     min_by-struct partial-agg as kmeansCentroids (no window, no
  //     per-subspace job storm), means on exact decimals (bit-stable);
  //   - encoding: one min_by shuffle keyed (vec_id, m) then one
  //     collect_list per vec_id → codes array + reconstructed norm²
  //     (subspaces are disjoint coordinates, so |x̂|² = Σ_m |c_m|²);
  //   - ADC probe: the query's M×ksub inner-product lookup table is
  //     computed ON THE DRIVER from the collected codebook (128 rows —
  //     index metadata, same class as the nprobe centroid ids) and
  //     shipped as a literal array: scoring is then a codegen'd
  //     map-only pass over the codes table — no join, no shuffle, the
  //     register-resident-LUT shape of a real PQ scanner;
  //   - re-rank: exact cosine over the ADC top-L shortlist (broadcast,
  //     L rows) — the standard refine step that buys back the recall
  //     the 32× compression costs. At 100 TB the full vectors live
  //     beside the codes partitioned by vec_id range, so the refine
  //     fetch is a bounded point read, not a second corpus scan.

  // M=8 subquantizers × 8 bits each (ksub=256) — the standard PQ8×8
  // configuration: 8 B/vector vs 256 B float32, a 32× compression. The
  // codebook is 8×256 subcentroids regardless of corpus size — index
  // metadata wherever it travels (broadcast, driver LUT).
  private val PqM = 8
  private val PqKsub = 256

  /** (vec_id, m, sv): the M disjoint subvector slices of each vector. */
  private def pqSubvectors(e: DataFrame, m: Int, subDim: Int): DataFrame =
    e.select(col("vec_id"), col("ce"),
        explode(sequence(lit(0), lit(m - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        expr(s"slice(ce, m * $subDim + 1, $subDim)").as("sv"))

  /** Product-quantization codebook: ksub centroids per subspace, all M
    * subspaces trained in one grouped Lloyd's loop. Deterministic:
    * first-ksub-by-vec_id init, lexicographic min_by tie-break,
    * exact-decimal means — two builds are bit-identical (IvfPqSpec). */
  def pqCodebook(e: DataFrame, m: Int, ksub: Int, subDim: Int,
      iters: Int, init: Option[DataFrame] = None): DataFrame = {
    val sub = pqSubvectors(e, m, subDim)
    // `init` warm-starts Lloyd's from caller-supplied centroids (the
    // non-parametric OPQ alternation needs this: starting from the
    // per-code means in the newly rotated space makes every half-step
    // objective-non-increasing, which cold first-ksub re-init would
    // forfeit). Default is the deterministic first-ksub-by-vec_id init.
    var cents = init.map(_.localCheckpoint()).getOrElse(sub
      .withColumn("rn",
        row_number().over(Window.partitionBy("m").orderBy("vec_id")))
      .filter(col("rn") <= ksub)
      .select(col("m"), (col("rn") - 1).as("c_id"),
        col("sv").as("centroid"))
      .withColumn("cn2", dotd(col("centroid"), col("centroid")))
      .localCheckpoint())
    for (_ <- 1 to iters) {
      val assigned = sub.join(broadcast(cents), "m")
        .withColumn("d2",
          col("cn2") - lit(2.0) * dotd(col("sv"), col("centroid")))
        .groupBy(col("vec_id"), col("m"))
        .agg(min_by(struct(col("c_id"), col("sv")),
          struct(col("d2"), col("c_id"))).as("x"))
        .select(col("m"), col("x.c_id").as("c_id"), col("x.sv").as("sv"))
      cents = assigned
        .select(col("m"), col("c_id"),
          posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy("m", "c_id", "pos")
        .agg((sum(col("v").cast("decimal(27,10)")).cast("double") /
          count(lit(1))).as("cv"))
        .groupBy("m", "c_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
          .as("ps"))
        .select(col("m"), col("c_id"),
          transform(col("ps"), p => p.getField("cv")).as("centroid"))
        .withColumn("cn2", dotd(col("centroid"), col("centroid")))
        .localCheckpoint()
    }
    cents
  }

  /** Encode the corpus: (vec_id, codes: array<int> by subspace order,
    * rn2: reconstructed norm²). */
  def pqEncode(e: DataFrame, cents: DataFrame, m: Int, subDim: Int)
      : DataFrame =
    pqSubvectors(e, m, subDim).join(broadcast(cents), "m")
      .withColumn("d2",
        col("cn2") - lit(2.0) * dotd(col("sv"), col("centroid")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(struct(col("c_id"), col("cn2")),
        struct(col("d2"), col("c_id"))).as("x"))
      .groupBy("vec_id")
      .agg(
        array_sort(collect_list(struct(col("m"), col("x.c_id").as("c"))))
          .as("mc"),
        sum(col("x.cn2")).as("rn2"))
      .select(col("vec_id"),
        transform(col("mc"), p => p.getField("c")).as("codes"),
        col("rn2"))

  // Build-once PQ index per (session, corpus dir): codebook + encoded
  // corpus, checkpointed — probed many times, deterministic, so the
  // cache is semantics-free (same discipline as centroidCache).
  private val pqIndexCache = graft.AppCache[(DataFrame, DataFrame)]()

  private def pqIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    pqIndexCache.get(s, d)({
      val e = prepared(s, d).filter(col("vec_id") =!= 0L)
      val subDim = 64 / PqM
      val cents = pqCodebook(e, PqM, PqKsub, subDim, iters = 3)
        .localCheckpoint()
      val codes = pqEncode(e, cents, PqM, subDim).localCheckpoint()
      (cents, codes)
    })

  /** Per-code mean centroids of `er`'s subvectors under an EXISTING
    * code assignment — the Lloyd's mean half-step in isolation. The
    * non-parametric OPQ alternation uses it to transport a codebook
    * into a freshly rotated space: keeping the codes and re-meaning the
    * (rotated) subvectors minimizes the fixed-assignment objective, so
    * the alternation's objective never increases. Codes a vector no
    * longer uses simply vanish (standard empty-cluster drop). */
  def centroidsFromCodes(er: DataFrame, codes: DataFrame, m: Int,
      subDim: Int): DataFrame =
    pqSubvectors(er, m, subDim)
      .join(codes.select(col("vec_id"), col("codes")), "vec_id")
      .withColumn("c_id", element_at(col("codes"), col("m") + 1))
      .select(col("m"), col("c_id"),
        posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy("m", "c_id", "pos")
      .agg((sum(col("v").cast("decimal(27,10)")).cast("double") /
        count(lit(1))).as("cv"))
      .groupBy("m", "c_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv"))))
        .as("ps"))
      .select(col("m"), col("c_id"),
        transform(col("ps"), p => p.getField("cv")).as("centroid"))
      .withColumn("cn2", dotd(col("centroid"), col("centroid")))

  /** ADC scores for query `queryId` over the encoded corpus: map-only
    * scan of the codes table against the driver-built LUT literal.
    * Approximate cosine = LUT-summed inner product / (|q|·|x̂|). */
  private def pqAdcScores(s: SparkSession, d: String): DataFrame = {
    val (cents, codes) = pqIndex(s, d)
    val subDim = 64 / PqM
    val q = prepared(s, d).filter(col("vec_id") === 0L)
      .select(col("ce"), col("n2")).head()
    val qv = q.getSeq[Double](0)
    val qn = math.sqrt(q.getDouble(1))
    // LUT[m*ksub + c] = <q_m, centroid(m,c)>; centroids may be fewer
    // than ksub if a cluster emptied — absent slots keep 0.0 and are
    // never referenced by codes (codes only name surviving centroids)
    val lut = Array.fill(PqM * PqKsub)(0.0)
    cents.select("m", "c_id", "centroid").collect().foreach { r =>
      val m = r.getInt(0)
      val c = r.getInt(1)
      val cv = r.getSeq[Double](2)
      var acc = 0.0
      var i = 0
      while (i < subDim) { acc += qv(m * subDim + i) * cv(i); i += 1 }
      lut(m * PqKsub + c) = acc
    }
    val lutCol = typedlit(lut.toSeq)
    val ip = aggregate(
      zip_with(col("codes"),
        sequence(lit(0), lit(PqM - 1)),
        (c, m) => element_at(lutCol, m * PqKsub + c + 1)),
      lit(0.0), (a, x) => a + x)
    codes.withColumn("adc_sim", ip / (lit(qn) * sqrt(col("rn2"))))
  }

  /** PQ search: ADC top-`shortlist` candidates, then exact cosine
    * re-rank to top-k (shortlist ≥ corpus ⇒ exactly brute force — the
    * hard-oracle twin q_ann_pq_exhaustive). */
  def pqSearch(s: SparkSession, d: String, k: Int, shortlist: Int)
      : DataFrame = {
    val cand = pqAdcScores(s, d)
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
      .limit(shortlist)
      .select("vec_id")
    val e = prepared(s, d)
    val qv = e.filter(col("vec_id") === 0L)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    e.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // --- q_ann_pq: compressed-domain ADC top-10, no refine — what a pure
  // in-memory code scan returns. Rows-only (approximation quality is a
  // property of the index; IvfPqSpec pins recall).
  val qAnnPq: (SparkSession, String) => DataFrame = (s, d) =>
    pqAdcScores(s, d)
      .select(col("vec_id"), round(col("adc_sim"), 6).as("adc_sim"))
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
      .limit(10)

  // --- q_ann_pq_rerank: the serving configuration — ADC shortlist of
  // 50, exact re-rank to top-10. Rows-only; IvfPqSpec proves its recall
  // beats the raw ADC list and the int8-reconstructed search.
  val qAnnPqRerank: (SparkSession, String) => DataFrame = (s, d) =>
    pqSearch(s, d, k = 10, shortlist = 50)

  // --- q_ann_pq_exhaustive: shortlist = whole corpus, so the exact
  // re-rank IS brute force — the PQ plumbing (codebook, encode, LUT
  // scan, refine join) under the SAME hard oracle as q_cosine_topk.
  val qAnnPqExhaustive: (SparkSession, String) => DataFrame = (s, d) =>
    pqSearch(s, d, k = 10, shortlist = Int.MaxValue)

  // --- IVFADC: the composed deployed shape — IVF coarse lists + PQ
  // over RESIDUALS (x − coarse centroid), the FAISS-style index a
  // trillion-vector serving fleet actually runs. Residual PQ beats
  // plain PQ at equal bits because residuals concentrate near zero
  // (IvfPqSpec measures the reconstruction-error gap). Probe shape:
  //   dot(q, x̂) = dot(q, c_list) + dot(q, r̂)
  // — the first term is one constant per probed list (computed on the
  // driver from the ≤nlist collected coarse centroids, the same
  // partition-selection collect ivfSearchBatch already does), the
  // second is the residual-codebook LUT scan. Norms use one stored
  // float per vector (the true |x|², kept beside the codes — standard
  // PQ-index practice), so approximate cosine needs no cross-LUT. At
  // 100 TB the codes table is partitioned by list id on disk and a
  // probe reads nprobe partitions of 8 B codes — both pruning stories
  // (partition + compression) in one index.

  private val ivfPqCache = graft.AppCache[(DataFrame, DataFrame, DataFrame)]()

  /** IVFADC index construction from a prepared corpus frame and a
    * trained coarse quantizer — the [[ivfPqIndex]] body, parametrized
    * on the corpus so scale probes can build over synthesized waves
    * (tools/AnnScaleProbe) while the declared (session, dir) path
    * keeps its cached composition bit-for-bit. */
  private[graft] def buildIvfPq(e: DataFrame, coarse: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
      val subDim = 64 / PqM
      val assigned = e.crossJoin(broadcast(coarse))
        .withColumn("d2",
          col("cn2") - lit(2.0) * dotd(col("ce"), col("centroid")))
        .groupBy(col("vec_id"))
        .agg(min_by(
          struct(col("ce"), col("n2"), col("c_id"), col("centroid")),
          struct(col("d2"), col("c_id"))).as("m"))
        .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
          col("m.c_id").as("a_id"),
          zip_with(col("m.ce"), col("m.centroid"), (a, b) => a - b)
            .as("res"))
        .localCheckpoint()
      val resDf = assigned.select(col("vec_id"), col("res").as("ce"))
      val cb = pqCodebook(resDf, PqM, PqKsub, subDim, iters = 3)
        .localCheckpoint()
      val codes = pqEncode(resDf, cb, PqM, subDim)
        .join(assigned.select(col("vec_id"), col("a_id"), col("n2")),
          "vec_id")
        .localCheckpoint()
      (coarse, cb, codes)
  }

  /** (coarse centroids, residual PQ codebook, codes table
    * (vec_id, a_id, codes, rn2=|r̂|², n2=true |x|²)). */
  private[graft] def ivfPqIndex(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) =
    ivfPqCache.get(s, d)(buildIvfPq(
      prepared(s, d).filter(col("vec_id") =!= 0L),
      ivfCentroids(s, d, 10, 3)))

  /** IVFADC search for vec_id=0: probe the `nprobe` nearest coarse
    * lists, score their codes by LUT-ADC, exact-re-rank the top
    * `shortlist`. nprobe ≥ nlist AND shortlist ≥ corpus ⇒ exactly
    * brute force (q_ann_ivfpq_exhaustive's hard oracle). */
  def ivfPqSearch(s: SparkSession, d: String, k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    val (coarse, cb, codes) = ivfPqIndex(s, d)
    val subDim = 64 / PqM
    val e = prepared(s, d)
    val q = e.filter(col("vec_id") === 0L).select(col("ce"), col("n2"))
      .head()
    val qv = q.getSeq[Double](0)
    val qn = math.sqrt(q.getDouble(1))
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    // probed lists: nearest coarse centroids by cosine, plus each
    // list's constant dot(q, c) — driver math over ≤nlist rows
    val lists = coarse.select("c_id", "centroid", "cn2").collect()
      .map { r =>
        val c = r.getSeq[Double](1)
        val qc = dot(qv, c)
        (r.getInt(0), qc, qc / (qn * math.sqrt(r.getDouble(2))))
      }
      .sortBy { case (cid, _, csim) => (-csim, cid) }
      .take(nprobe)
    import s.implicits._
    val probed = broadcast(
      lists.map { case (cid, qc, _) => (cid, qc) }.toSeq
        .toDF("a_id", "qc"))
    // residual LUT, same construction as pqAdcScores
    val lut = Array.fill(PqM * PqKsub)(0.0)
    cb.select("m", "c_id", "centroid").collect().foreach { r =>
      val m = r.getInt(0)
      val cv = r.getSeq[Double](2)
      var acc = 0.0; var i = 0
      while (i < subDim) { acc += qv(m * subDim + i) * cv(i); i += 1 }
      lut(m * PqKsub + r.getInt(1)) = acc
    }
    val lutCol = typedlit(lut.toSeq)
    val resIp = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m) => element_at(lutCol, m * PqKsub + c + 1)),
      lit(0.0), (a, x) => a + x)
    val cand = codes.join(probed, "a_id")
      .withColumn("adc_sim",
        (col("qc") + resIp) / (lit(qn) * sqrt(col("n2"))))
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
      .limit(shortlist)
      .select("vec_id")
    val qvDf = e.filter(col("vec_id") === 0L)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    e.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(qvDf))
      .select(col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // --- q_ann_ivfpq: the serving configuration — 3 of 10 lists probed,
  // ADC shortlist 50, exact re-rank. Rows-only; IvfPqSpec pins recall.
  val qAnnIvfPq: (SparkSession, String) => DataFrame = (s, d) =>
    ivfPqSearch(s, d, k = 10, nprobe = 3, shortlist = 50)

  // --- q_ann_ivfpq_exhaustive: all lists + corpus shortlist ⇒ the
  // exact re-rank IS brute force — the composed IVFADC plumbing
  // (coarse assign, residual codebook, per-list constants, LUT scan,
  // refine) under the SAME hard oracle as q_cosine_topk.
  val qAnnIvfPqExhaustive: (SparkSession, String) => DataFrame = (s, d) =>
    ivfPqSearch(s, d, k = 10, nprobe = Int.MaxValue,
      shortlist = Int.MaxValue)

  // --- q_ann_ivfpq_recall: self-validating recall row for the pruned
  // configuration (truth size + hits + recall in the row).
  val qAnnIvfPqRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val brute = qCosineTopk(s, d).select(col("vec_id"))
    val got = qAnnIvfPq(s, d).select(col("vec_id"))
      .withColumn("hit", lit(1))
    brute.join(got, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("brute_k"), count(col("hit")).as("hits"))
      .withColumn("recall",
        col("hits").cast("double") / col("brute_k"))
  }

  /** Batched IVFADC — the deployed SERVING shape: one corpus scan of
    * the codes table answers a whole query batch. All per-query math
    * is driver metadata (coarse ranking over ≤nlist centroids, one
    * M×ksub LUT per query) shipped as ONE broadcast frame of
    * (q_id, probed list, per-list constant, |q|, LUT) rows — a few MB
    * for 16 queries × nprobe lists; the codes ⨯ probed equi-join on
    * the list id touches each probed list once for ALL queries
    * probing it, the per-query shortlist is a WindowGroupLimit, and
    * the exact re-rank joins the shortlist union back to the vectors
    * (the ivfSearchBatch discipline applied to IVFADC). nprobe ≥
    * nlist and shortlist ≥ corpus ⇒ exactly per-query brute force
    * (q_ann_ivfpq_batch_exhaustive's hard oracle). */
  def ivfPqSearchBatch(s: SparkSession, d: String, queryIds: Seq[Long],
      k: Int, nprobe: Int, shortlist: Int): DataFrame =
    ivfPqSearchBatchOn(s, prepared(s, d), ivfPqIndex(s, d), queryIds,
      k, nprobe, shortlist)

  /** The [[ivfPqSearchBatch]] body over a caller-supplied prepared
    * corpus and index triple — lets scale probes search synthesized
    * waves with the exact declared plan shape. */
  private[graft] def ivfPqSearchBatchOn(s: SparkSession, e: DataFrame,
      idx: (DataFrame, DataFrame, DataFrame), queryIds: Seq[Long],
      k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val (coarse, cb, codes) = idx
    val subDim = 64 / PqM
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val qrows = e.filter(col("vec_id").isin(queryIds: _*))
      .select("vec_id", "ce", "n2").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        math.sqrt(r.getDouble(2))))
      .sortBy(_._1)
    val cents = coarse.select("c_id", "centroid", "cn2").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val cbRows = cb.select("m", "c_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val probeRows = qrows.toSeq.flatMap { case (qid, qv, qn) =>
      val ranked = cents.map { case (cid, c, cn2) =>
        val qc = dot(qv, c); (cid, qc, qc / (qn * math.sqrt(cn2)))
      }.sortBy { case (cid, _, csim) => (-csim, cid) }.take(nprobe)
      val lut = Array.fill(PqM * PqKsub)(0.0)
      cbRows.foreach { case (m0, c0, cv) =>
        var acc = 0.0; var i = 0
        while (i < subDim) { acc += qv(m0 * subDim + i) * cv(i); i += 1 }
        lut(m0 * PqKsub + c0) = acc
      }
      ranked.map { case (cid, qc, _) => (qid, cid, qc, qn, lut.toSeq) }
    }
    import s.implicits._
    val probed = broadcast(probeRows
      .toDF("q_id", "a_id", "qc", "qn", "lut"))
    val ip = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m0) => element_at(col("lut"), m0 * PqKsub + c + 1)),
      lit(0.0), (a, x) => a + x)
    val wSl = Window.partitionBy("q_id")
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
    val cand = codes.join(probed, "a_id")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc_sim",
        (col("qc") + ip) / (col("qn") * sqrt(col("n2"))))
      .withColumn("__r", row_number().over(wSl))
      .filter(col("__r") <= shortlist)
      .select("q_id", "vec_id")
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("ce").as("qe"),
        col("n2").as("qn2"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    e.join(broadcast(cand), "vec_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .withColumn("__rnk", row_number().over(wTop))
      .filter(col("__rnk") <= k)
      .select("q_id", "vec_id", "sim")
      .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
  }

  // queries 1..16: the IVFPQ codes corpus excludes vec_id 0 (the
  // single-query probe), so the batch family keys on the 1..16 ids the
  // OPQ recall batch already uses — the oracle mirrors both exclusions.
  private val ivfPqBatchIds: Seq[Long] = (1L to 16L)

  // --- q_ann_ivfpq_batch: the batched serving configuration — 3 lists
  // probed per query, ADC shortlist 50, exact re-rank to top-10, ONE
  // codes scan for the 16-query batch. Rows-only; the batch recall row
  // self-validates per query.
  val qAnnIvfPqBatch: (SparkSession, String) => DataFrame = (s, d) =>
    ivfPqSearchBatch(s, d, ivfPqBatchIds, k = 10, nprobe = 3,
      shortlist = 50)

  // --- q_ann_ivfpq_batch_exhaustive: all lists + corpus shortlist ⇒
  // per-query brute force — the batched IVFADC plumbing under a hard
  // 16-query DuckDB oracle.
  val qAnnIvfPqBatchExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => ivfPqSearchBatch(s, d, ivfPqBatchIds, k = 10,
      nprobe = Int.MaxValue, shortlist = Int.MaxValue)

  // --- q_ann_ivfpq_batch_recall: per-query self-validating recall rows
  // for the pruned batch configuration (truth size, hits, recall@10).
  val qAnnIvfPqBatchRecall: (SparkSession, String) => DataFrame =
    (s, d) => {
      val truth = cosineTopKBatch(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0L),
        ivfPqBatchIds, 10)
        .select(col("q_id"), col("vec_id"))
      val got = qAnnIvfPqBatch(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      truth.join(got, Seq("q_id", "vec_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("truth_k"),
          sum(coalesce(col("hit"), lit(0))).as("hits"))
        .withColumn("recall",
          round(col("hits").cast("double") / col("truth_k"), 4))
        .orderBy("q_id")
    }

  // --- q_ann_pq_recall: self-validating recall row (q_ann_recall
  // style): ground-truth size, ADC-only hits, re-ranked hits. A
  // collapsed codebook (recall→0) is visible in the output itself.
  val qAnnPqRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val brute = qCosineTopk(s, d).select(col("vec_id"))
    val adc = qAnnPq(s, d).select(col("vec_id"))
      .withColumn("hit_adc", lit(1))
    val rr = qAnnPqRerank(s, d).select(col("vec_id"))
      .withColumn("hit_rr", lit(1))
    brute.join(adc, Seq("vec_id"), "left")
      .join(rr, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("brute_k"),
        count(col("hit_adc")).as("adc_hits"),
        count(col("hit_rr")).as("rerank_hits"))
      .withColumn("recall_adc",
        col("adc_hits").cast("double") / col("brute_k"))
      .withColumn("recall_rerank",
        col("rerank_hits").cast("double") / col("brute_k"))
  }

  // --- OPQ: optimized product quantization (Ge et al., CVPR 2013 —
  // the parametric / eigenvalue-allocation variant): PQ quantizes M
  // fixed coordinate blocks independently, so its error depends on how
  // variance and correlation happen to fall across blocks. An
  // orthonormal rotation R applied before PQ decorrelates coordinates
  // (PCA basis) and BALANCES variance across the M blocks — greedy
  // eigenvalue allocation assigns each eigenvector, in descending-λ
  // order, to the block with the smallest current λ product — after
  // which the unchanged pqCodebook/pqEncode machinery quantizes a
  // strictly easier distribution (IvfPqSpec measures the
  // reconstruction-error gap on anisotropic data). Rotation preserves
  // dot products and norms, so ADC in rotated space approximates the
  // SAME cosine (the query rotates once, on the driver) and the exact
  // re-rank runs untouched in the original space. Scale shape: the
  // covariance is one dim²-row partial-aggregated shuffle with
  // exact-decimal sums; the eigendecomposition is driver math on a
  // dim×dim matrix (index metadata, same class as the collected
  // codebook); the rotation itself is a codegen'd dim² fused map pass —
  // no extra shuffle anywhere.

  private val OpqDim = 64
  private[graft] val OpqTrainCap = 1024L

  /** Deterministic hash-sampled training view for rotation fitting:
    * the covariance pass explodes |input|·dim² product rows, so at
    * 100 TB it must run on a bounded sample, not the corpus — FAISS
    * trains OPQ on a fixed-size sample for exactly this reason, and
    * the rotation is index METADATA whose quality saturates long
    * before corpus scale (IvfPqSpec measures sampled ≈ full recall).
    * Salted xxhash64 of vec_id thresholded at cap/n: deterministic
    * across runs and partition layouts (the salted-sample discipline),
    * corpus-size-independent output size. */
  private[graft] def opqTrainSample(e: DataFrame,
      cap: Long = OpqTrainCap): DataFrame = {
    val n = e.count()
    if (n <= cap) e
    else {
      val den = 1000000L
      val num = cap * den / n
      e.filter(
        pmod(xxhash64(lit("opqcov"), col("vec_id")), lit(den)) < num)
    }
  }

  /** Covariance of the corpus embeddings, row-major flattened dim².
    * Mean and products use exact DECIMAL sums — bit-stable across
    * partition layouts (the kmeansCentroids discipline). */
  def covarianceMatrix(e: DataFrame, dim: Int): Array[Double] = {
    val n = e.count().toDouble
    val mean = e.select(posexplode(col("ce")).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(col("x").cast("decimal(30,12)")).cast("double") / n)
        .as("mu"))
      .orderBy("i").collect().map(_.getDouble(1))
    val muCol = typedlit(mean.toSeq)
    val centered = e.select(
      zip_with(col("ce"), muCol, (a, b) => a - b).as("cx"))
    val upper = centered
      .select(posexplode(col("cx")).as(Seq("i", "xi")), col("cx"))
      .select(col("i"), col("xi"),
        posexplode(col("cx")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg((sum((col("xi") * col("xj")).cast("decimal(30,12)"))
        .cast("double") / n).as("c"))
      .collect()
    val cov = Array.fill(dim * dim)(0.0)
    upper.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val v = r.getDouble(2)
      cov(i * dim + j) = v; cov(j * dim + i) = v
    }
    cov
  }

  /** Orthonormal OPQ rotation (row-major dim²) from a covariance
    * matrix: PCA basis + greedy balanced eigenvalue allocation to the
    * M blocks. Deterministic: eigenpairs sorted by λ descending,
    * eigenvector signs canonicalized (largest-|component| entry made
    * positive), allocation ties broken by lowest block id. */
  def opqRotation(cov: Array[Double], dim: Int, m: Int): Array[Double] = {
    val subDim = dim / m
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(dim, dim, cov))
    val pairs = (0 until dim).map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      val mi = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val canon = if (v(mi) < 0) v.map(-_) else v
      (es.eigenvalues(c), canon)
    }.sortBy { case (l, _) => -l }
    val logProd = Array.fill(m)(0.0)
    val fill = Array.fill(m)(0)
    val rot = Array.fill(dim * dim)(0.0)
    pairs.foreach { case (l, v) =>
      val b = (0 until m).filter(fill(_) < subDim)
        .minBy(b => (logProd(b), b))
      val row = b * subDim + fill(b)
      System.arraycopy(v, 0, rot, row * dim, dim)
      logProd(b) += math.log(math.max(l, 1e-12))
      fill(b) += 1
    }
    rot
  }

  /** R·x as a codegen'd HOF pass over a literal row-major rotation —
    * dim² multiplies per row, fused into the scan stage. */
  def rotated(e: DataFrame, rot: Array[Double], dim: Int): DataFrame = {
    val rCol = typedlit(rot.toSeq)
    e.select(col("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        aggregate(zip_with(slice(rCol, i * dim + 1, lit(dim)), col("ce"),
          (r, v) => r * v), lit(0.0), (a, p) => a + p)).as("ce"))
  }

  /** Mean (per-vector) squared quantization error of a PQ codebook over
    * a corpus — the objective OPQ's rotation lowers. */
  def pqReconstructionMse(e: DataFrame, cents: DataFrame, m: Int,
      subDim: Int): Double =
    pqSubvectors(e, m, subDim).join(broadcast(cents), "m")
      .withColumn("d2", dotd(col("sv"), col("sv")) + col("cn2")
        - lit(2.0) * dotd(col("sv"), col("centroid")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("d2")).as("d2"))
      .groupBy("vec_id").agg(sum(col("d2")).as("e2"))
      .agg(avg(col("e2"))).head().getDouble(0)

  private val opqCache = graft.AppCache[(Array[Double], DataFrame, DataFrame)]()

  /** (rotation, codebook over the rotated space, codes table). */
  private def opqIndex(s: SparkSession, d: String)
      : (Array[Double], DataFrame, DataFrame) =
    opqCache.get(s, d)({
      val subDim = OpqDim / PqM
      val e = prepared(s, d).filter(col("vec_id") =!= 0L)
      val rot = opqRotation(
        covarianceMatrix(opqTrainSample(e), OpqDim), OpqDim, PqM)
      val er = rotated(e, rot, OpqDim).localCheckpoint()
      val cb = pqCodebook(er, PqM, PqKsub, subDim, iters = 3)
        .localCheckpoint()
      // keep the TRUE |x|² beside the codes (the ivfPqIndex discipline:
      // one stored float per vector) — ADC then divides by the exact
      // norm instead of the reconstructed one, a strictly tighter
      // cosine approximation at the same bit budget
      val codes = pqEncode(er, cb, PqM, subDim)
        .join(e.select(col("vec_id"), col("n2")), "vec_id")
        .localCheckpoint()
      (rot, cb, codes)
    })

  /** ADC scores in the rotated space: the query rotates ON THE DRIVER
    * (dim² flops on one vector), then the LUT scan is identical to
    * plain PQ. |q| and the re-rank stay in the original space —
    * rotation preserves both. */
  private def opqAdcScores(s: SparkSession, d: String,
      index: (Array[Double], DataFrame, DataFrame)): DataFrame = {
    val (rot, cents, codes) = index
    val subDim = OpqDim / PqM
    val q = prepared(s, d).filter(col("vec_id") === 0L)
      .select(col("ce"), col("n2")).head()
    val qv0 = q.getSeq[Double](0)
    val qn = math.sqrt(q.getDouble(1))
    val qv = Array.tabulate(OpqDim) { i =>
      var acc = 0.0; var j = 0
      while (j < OpqDim) { acc += rot(i * OpqDim + j) * qv0(j); j += 1 }
      acc
    }
    val lut = Array.fill(PqM * PqKsub)(0.0)
    cents.select("m", "c_id", "centroid").collect().foreach { r =>
      val m = r.getInt(0)
      val cv = r.getSeq[Double](2)
      var acc = 0.0; var i = 0
      while (i < subDim) { acc += qv(m * subDim + i) * cv(i); i += 1 }
      lut(m * PqKsub + r.getInt(1)) = acc
    }
    val lutCol = typedlit(lut.toSeq)
    val ip = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m) => element_at(lutCol, m * PqKsub + c + 1)),
      lit(0.0), (a, x) => a + x)
    codes.withColumn("adc_sim", ip / (lit(qn) * sqrt(col("n2"))))
  }

  /** OPQ search: rotated-space ADC shortlist, exact original-space
    * re-rank (shortlist ≥ corpus ⇒ exactly brute force — the hard
    * oracle twin q_ann_opq_exhaustive). */
  def opqSearch(s: SparkSession, d: String, k: Int, shortlist: Int,
      index: (SparkSession, String) => (Array[Double], DataFrame, DataFrame)
        = opqIndex): DataFrame = {
    val cand = opqAdcScores(s, d, index(s, d))
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
      .limit(shortlist)
      .select("vec_id")
    val e = prepared(s, d)
    val qv = e.filter(col("vec_id") === 0L)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    e.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // --- q_ann_opq: the serving configuration — rotated-space ADC
  // shortlist 50, exact re-rank to top-10. Rows-only; IvfPqSpec pins
  // the reconstruction-error win and q_ann_opq_recall self-validates.
  val qAnnOpq: (SparkSession, String) => DataFrame = (s, d) =>
    opqSearch(s, d, k = 10, shortlist = 50)

  // --- q_ann_opq_exhaustive: corpus-wide shortlist ⇒ the exact
  // re-rank IS brute force — the OPQ plumbing (covariance, rotation,
  // rotated codebook, rotated-query LUT, refine) under the SAME hard
  // oracle as q_cosine_topk.
  val qAnnOpqExhaustive: (SparkSession, String) => DataFrame = (s, d) =>
    opqSearch(s, d, k = 10, shortlist = Int.MaxValue)

  /** Orthogonal-Procrustes rotation update — the NON-PARAMETRIC OPQ
    * step (Ge et al., CVPR 2013, the alternating variant): given codes
    * trained in the current rotated space, the orthonormal R minimizing
    * Σ‖R·x_i − x̂_i‖² is R = U·Vᵀ from the SVD of the
    * reconstruction–input cross-covariance M = Σ x̂_i·x_iᵀ. M
    * accumulates as a dim²-cell exact-decimal aggregate (the
    * covarianceMatrix shape: one partial-aggregated shuffle, dim²
    * collected cells — index metadata); the SVD is driver math on a
    * dim×dim matrix; and the reconstruction x̂ decodes IN-PLAN from the
    * literal codebook (m·ksub·subDim doubles — broadcast-threshold
    * metadata), so the whole step adds no corpus shuffle beyond the
    * aggregate. R = U·Vᵀ is invariant to the SVD's paired column-sign
    * ambiguity, so the update is deterministic. */
  def procrustesRotation(e: DataFrame, codes: DataFrame,
      cents: DataFrame, dim: Int, m: Int): Array[Double] = {
    val subDim = dim / m
    val cbFlat = Array.fill(m * PqKsub * subDim)(0.0)
    cents.select("m", "c_id", "centroid").collect().foreach { r =>
      val mm = r.getInt(0); val c = r.getInt(1)
      val v = r.getSeq[Double](2)
      var i = 0
      while (i < subDim) {
        cbFlat((mm * PqKsub + c) * subDim + i) = v(i); i += 1
      }
    }
    val cbLit = typedlit(cbFlat.toSeq)
    val xhat = transform(sequence(lit(0), lit(dim - 1)), r => {
      val blk = (r / subDim).cast("int")
      element_at(cbLit,
        (blk * PqKsub + element_at(col("codes"), blk + 1)) * subDim
          + (r % subDim) + 1)
    })
    val cells = e.select(col("vec_id"), col("ce"))
      .join(codes.select(col("vec_id"), col("codes")), "vec_id")
      .select(xhat.as("xh"), col("ce"))
      .select(posexplode(col("xh")).as(Seq("i", "xi")), col("ce"))
      .select(col("i"), col("xi"),
        posexplode(col("ce")).as(Seq("j", "xj")))
      .groupBy("i", "j")
      .agg(sum((col("xi") * col("xj")).cast("decimal(30,12)"))
        .cast("double").as("v"))
      .collect()
    val mMat = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    cells.foreach(r => mMat(r.getInt(0), r.getInt(1)) = r.getDouble(2))
    val s = breeze.linalg.svd(mMat)
    val rMat = s.U * s.Vt
    Array.tabulate(dim * dim)(k => rMat(k / dim, k % dim))
  }

  private val npOpqCache =
    graft.AppCache[(Array[Double], DataFrame, DataFrame)]()

  /** Non-parametric OPQ index: parametric (eigenvalue-allocation) init,
    * then alternating codebook training and Procrustes rotation updates.
    * Each half-step is optimal for the other half held fixed (codebook:
    * Lloyd's over the rotated data; rotation: the Procrustes closed
    * form over the fixed codes), so the quantization objective is
    * non-increasing across alternations — IvfPqSpec measures the
    * resulting reconstruction-error win over the parametric rotation on
    * an anisotropic fixture. Artifact shape identical to [[opqIndex]]:
    * (rotation, codebook, codes table with true |x|²). */
  private def npOpqIndex(s: SparkSession, d: String)
      : (Array[Double], DataFrame, DataFrame) =
    npOpqCache.get(s, d)({
      val subDim = OpqDim / PqM
      val e = prepared(s, d).filter(col("vec_id") =!= 0L)
      var rot = opqRotation(
        covarianceMatrix(opqTrainSample(e), OpqDim), OpqDim, PqM)
      var cb: DataFrame = null
      var codes: DataFrame = null
      val rounds = 3
      for (it <- 1 to rounds) {
        val er = rotated(e, rot, OpqDim).localCheckpoint()
        // round 1 trains from the deterministic cold init; later rounds
        // warm-start from the previous codes' means in the new space,
        // keeping the alternation objective non-increasing end to end
        val init = Option(codes)
          .map(c => centroidsFromCodes(er, c, PqM, subDim))
        cb = pqCodebook(er, PqM, PqKsub, subDim, iters = 3, init)
          .localCheckpoint()
        codes = pqEncode(er, cb, PqM, subDim).localCheckpoint()
        if (it < rounds)
          // the Procrustes fit has the covarianceMatrix shape (corpus ×
          // dim² exploded cells) — fit it on the same bounded hash
          // sample so the whole rotation-training loop is
          // corpus-size-independent; codes/codebooks stay corpus-wide
          // (they ARE the index)
          rot = procrustesRotation(opqTrainSample(e), codes, cb,
            OpqDim, PqM)
      }
      val withN2 = codes
        .join(e.select(col("vec_id"), col("n2")), "vec_id")
        .localCheckpoint()
      (rot, cb, withN2)
    })

  // --- q_ann_opq_np: non-parametric OPQ serving configuration (ADC
  // shortlist 50, exact re-rank to top-10). Rows-only; IvfPqSpec pins
  // the refinement win and the recall row carries the batch average.
  val qAnnOpqNp: (SparkSession, String) => DataFrame = (s, d) =>
    opqSearch(s, d, k = 10, shortlist = 50, npOpqIndex)

  // --- q_ann_opq_np_exhaustive: corpus-wide shortlist ⇒ exact brute
  // force — the refined-rotation plumbing (Procrustes alternations,
  // rotated codebook, rotated-query LUT, refine) under the SAME hard
  // oracle as q_cosine_topk.
  val qAnnOpqNpExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => opqSearch(s, d, k = 10, shortlist = Int.MaxValue, npOpqIndex)

  // --- OPQ-IVFADC: the full FAISS serving stack ("OPQ64,IVF10,PQ8" in
  // factory-string terms) — the OPQ pretransform composed with the
  // IVF coarse quantizer and the residual PQ codebook. The rotation is
  // the NON-PARAMETRIC one (npOpqIndex's Procrustes alternation
  // artifact — trained once, shared via its cache); coarse k-means,
  // residual extraction, and codebook training then all run IN the
  // rotated space. An orthonormal rotation preserves norms and inner
  // products, so the stored |x|², the list-ranking cosines, and the
  // exact re-rank are unchanged semantics — the rotation only
  // redistributes variance so the residual sub-blocks quantize better.
  // Scale shape: identical to ivfPqIndex (one rotated map pass fused
  // into the scan, bucketed coarse assign, LUT scans, metadata-sized
  // collects); the rotation adds a dim² literal to the plan, nothing
  // else.
  private val opqIvfPqCache =
    graft.AppCache[(Array[Double], DataFrame, DataFrame, DataFrame)]()

  private[graft] def opqIvfPqIndex(s: SparkSession, d: String)
      : (Array[Double], DataFrame, DataFrame, DataFrame) =
    opqIvfPqCache.get(s, d)({
      val subDim = OpqDim / PqM
      val (rot, _, _) = npOpqIndex(s, d)
      val e = prepared(s, d).filter(col("vec_id") =!= 0L)
      val er = rotated(e, rot, OpqDim)
        .join(e.select(col("vec_id"), col("n2")), "vec_id")
        .localCheckpoint()
      val coarse = kmeansCentroids(er, 10, 3)
      val assigned = er.crossJoin(broadcast(coarse))
        .withColumn("d2",
          col("cn2") - lit(2.0) * dotd(col("ce"), col("centroid")))
        .groupBy(col("vec_id"))
        .agg(min_by(
          struct(col("ce"), col("n2"), col("c_id"), col("centroid")),
          struct(col("d2"), col("c_id"))).as("m"))
        .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
          col("m.c_id").as("a_id"),
          zip_with(col("m.ce"), col("m.centroid"), (a, b) => a - b)
            .as("res"))
        .localCheckpoint()
      val resDf = assigned.select(col("vec_id"), col("res").as("ce"))
      val cb = pqCodebook(resDf, PqM, PqKsub, subDim, iters = 3)
        .localCheckpoint()
      val codes = pqEncode(resDf, cb, PqM, subDim)
        .join(assigned.select(col("vec_id"), col("a_id"), col("n2")),
          "vec_id")
        .localCheckpoint()
      (rot, coarse, cb, codes)
    })

  /** OPQ-IVFADC search: rotate the query on the driver (dim² flops),
    * then the probe/LUT/shortlist path is exactly [[ivfPqSearch]]'s in
    * the rotated space; the re-rank scores the shortlist against the
    * ORIGINAL vectors. nprobe ≥ nlist and shortlist ≥ corpus ⇒ exactly
    * brute force (q_ann_opq_ivfpq_exhaustive's hard oracle). */
  def opqIvfPqSearch(s: SparkSession, d: String, k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    val (rot, coarse, cb, codes) = opqIvfPqIndex(s, d)
    val subDim = OpqDim / PqM
    val e = prepared(s, d)
    val q = e.filter(col("vec_id") === 0L).select(col("ce"), col("n2"))
      .head()
    val qv0 = q.getSeq[Double](0)
    val qn = math.sqrt(q.getDouble(1))
    val qv = Array.tabulate(OpqDim) { i =>
      var acc = 0.0; var j = 0
      while (j < OpqDim) { acc += rot(i * OpqDim + j) * qv0(j); j += 1 }
      acc
    }
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val lists = coarse.select("c_id", "centroid", "cn2").collect()
      .map { r =>
        val c = r.getSeq[Double](1)
        val qc = dot(qv, c)
        (r.getInt(0), qc, qc / (qn * math.sqrt(r.getDouble(2))))
      }
      .sortBy { case (cid, _, csim) => (-csim, cid) }
      .take(nprobe)
    import s.implicits._
    val probed = broadcast(
      lists.map { case (cid, qc, _) => (cid, qc) }.toSeq
        .toDF("a_id", "qc"))
    val lut = Array.fill(PqM * PqKsub)(0.0)
    cb.select("m", "c_id", "centroid").collect().foreach { r =>
      val m = r.getInt(0)
      val cv = r.getSeq[Double](2)
      var acc = 0.0; var i = 0
      while (i < subDim) { acc += qv(m * subDim + i) * cv(i); i += 1 }
      lut(m * PqKsub + r.getInt(1)) = acc
    }
    val lutCol = typedlit(lut.toSeq)
    val resIp = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m) => element_at(lutCol, m * PqKsub + c + 1)),
      lit(0.0), (a, x) => a + x)
    val cand = codes.join(probed, "a_id")
      .withColumn("adc_sim",
        (col("qc") + resIp) / (lit(qn) * sqrt(col("n2"))))
      .orderBy(col("adc_sim").desc, col("vec_id").asc)
      .limit(shortlist)
      .select("vec_id")
    val qvDf = e.filter(col("vec_id") === 0L)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    e.join(broadcast(cand), "vec_id")
      .crossJoin(broadcast(qvDf))
      .select(col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // --- q_ann_opq_ivfpq: the composed serving configuration — 3 of 10
  // rotated-space lists probed, ADC shortlist 50, exact re-rank.
  // Rows-only; the recall row and IvfPqSpec pin quality.
  val qAnnOpqIvfPq: (SparkSession, String) => DataFrame = (s, d) =>
    opqIvfPqSearch(s, d, k = 10, nprobe = 3, shortlist = 50)

  // --- q_ann_opq_ivfpq_exhaustive: all lists + corpus shortlist ⇒ the
  // exact re-rank IS brute force — the full composed stack (rotation,
  // rotated coarse assign, rotated-residual codebook, rotated-query
  // LUT, refine) under the SAME hard oracle as q_cosine_topk.
  val qAnnOpqIvfPqExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => opqIvfPqSearch(s, d, k = 10, nprobe = Int.MaxValue,
      shortlist = Int.MaxValue)

  // --- q_ann_opq_ivfpq_recall: self-validating recall row for the
  // composed serving configuration.
  val qAnnOpqIvfPqRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val brute = qCosineTopk(s, d).select(col("vec_id"))
    val got = qAnnOpqIvfPq(s, d).select(col("vec_id"))
      .withColumn("hit", lit(1))
    brute.join(got, Seq("vec_id"), "left")
      .agg(count(lit(1)).as("brute_k"), count(col("hit")).as("hits"))
      .withColumn("recall",
        col("hits").cast("double") / col("brute_k"))
  }

  /** Batch ADC shortlist over a PQ/OPQ codes table: the per-query LUTs
    * are driver metadata (|Q|·M·ksub doubles) shipped as ONE broadcast
    * frame; scoring is a codes ⨯ queries broadcast join with a
    * per-query WindowGroupLimit shortlist — one corpus scan for the
    * whole batch (the ivfSearchBatch discipline applied to codes). */
  private def adcBatchShortlist(s: SparkSession, codes: DataFrame,
      cents: DataFrame, queries: Seq[(Long, Array[Double])],
      normCol: String, shortlist: Int, subDim: Int): DataFrame = {
    val cb = cents.select("m", "c_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    import s.implicits._
    val qluts = queries.map { case (qid, qv) =>
      val lut = Array.fill(PqM * PqKsub)(0.0)
      cb.foreach { case ((m0, c0), cv) =>
        var acc = 0.0; var i = 0
        while (i < subDim) { acc += qv(m0 * subDim + i) * cv(i); i += 1 }
        lut(m0 * PqKsub + c0) = acc
      }
      (qid, lut.toSeq)
    }.toDF("q_id", "lut")
    val ip = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(PqM - 1)),
        (c, m0) => element_at(col("lut"), m0 * PqKsub + c + 1)),
      lit(0.0), (a, x) => a + x)
    val w = Window.partitionBy("q_id")
      .orderBy(col("adc").desc, col("vec_id").asc)
    codes.crossJoin(broadcast(qluts))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", ip / sqrt(col(normCol)))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= shortlist)
      .select("q_id", "vec_id")
  }

  // --- q_ann_opq_recall: one self-validating row — recall@10 after
  // shortlist-50 re-rank for plain PQ vs OPQ, AVERAGED over a 16-query
  // batch. A single query's recall on this near-isotropic fixture is
  // noise-dominated (one unlucky shortlist draw swings it ±0.2); the
  // batch average is the statistically meaningful comparison, and it is
  // where the rotation's error win shows up as recall.
  val qAnnOpqRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val qids = (1L to 16L)
    val subDim = OpqDim / PqM
    val e = prepared(s, d).filter(col("vec_id") =!= 0L)
      .localCheckpoint()
    val truth = cosineTopKBatch(
      Tables.embeddings(s, d).filter(col("vec_id") =!= 0L), qids, 10)
      .select(col("q_id"), col("vec_id"))
    val qvecs = e.filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "ce").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val (centsP, codesP) = pqIndex(s, d)
    val (rot, cbO, codesO) = opqIndex(s, d)
    val (rotN, cbN, codesN) = npOpqIndex(s, d)
    def rotQ(r: Array[Double]) = qvecs.map { case (qid, qv) =>
      qid -> Array.tabulate(OpqDim) { i =>
        var acc = 0.0; var j = 0
        while (j < OpqDim) { acc += r(i * OpqDim + j) * qv(j); j += 1 }
        acc
      }
    }
    val qvecsRot = rotQ(rot)
    val qvecsRotN = rotQ(rotN)
    def rerank(cand: DataFrame): DataFrame = {
      val q = e.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("q_id"), col("ce").as("qe"),
          col("n2").as("qn2"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      cand.join(e, "vec_id").join(broadcast(q), "q_id")
        .select(col("q_id"), col("vec_id"),
          sim(col("ce"), col("n2"), col("qe"), col("qn2")).as("sim"))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= 10)
        .select("q_id", "vec_id")
    }
    val pqTop = rerank(adcBatchShortlist(s, codesP, centsP, qvecs,
      "rn2", 50, subDim)).withColumn("hit_pq", lit(1))
    val opqTop = rerank(adcBatchShortlist(s, codesO, cbO, qvecsRot,
      "n2", 50, subDim)).withColumn("hit_opq", lit(1))
    val npTop = rerank(adcBatchShortlist(s, codesN, cbN, qvecsRotN,
      "n2", 50, subDim)).withColumn("hit_np", lit(1))
    truth.join(pqTop, Seq("q_id", "vec_id"), "left")
      .join(opqTop, Seq("q_id", "vec_id"), "left")
      .join(npTop, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("brute_k"),
        count(col("hit_pq")).as("pq_hits"),
        count(col("hit_opq")).as("opq_hits"),
        count(col("hit_np")).as("opq_np_hits"))
      .withColumn("recall_pq",
        col("pq_hits").cast("double") / col("brute_k"))
      .withColumn("recall_opq",
        col("opq_hits").cast("double") / col("brute_k"))
      .withColumn("recall_opq_np",
        col("opq_np_hits").cast("double") / col("brute_k"))
  }

  // --- rebalanced IVF: the hot-list-splitting quantizer SERVING search
  // (the IvfPqSpec rebalance probe promoted to the declared surface).
  // The coarse quantizer runs with a per-list cap deliberately below
  // the uniform list size, so splitting GENUINELY engages on the
  // fixture: over-cap lists re-cluster into sub-lists (quantizeCapped)
  // and the centroid table grows finer where the data is dense — the
  // maintenance move a skewed 100 TB index needs. Search is unchanged
  // in shape: rank the (rebalanced) centroids against the query on the
  // driver (metadata), read the probed lists, exact-score, top-k.
  // Probing ALL lists must reproduce brute force exactly — membership
  // survives split/reassign — which q_ann_ivf_rebalanced_exhaustive
  // hash-proves under q_cosine_topk's oracle.
  private val rebalancedIvfCache = graft.AppCache[(DataFrame, DataFrame)]()

  private[graft] def rebalancedIvfIndex(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    rebalancedIvfCache.get(s, d)({
      val embs = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
      // half the uniform list size: forces the split path to engage
      val cap = math.max(2, (embs.count() / 20L).toInt)
      val (assigned, cents) =
        quantizeCapped(embs, k = 10, iters = 3, cap = cap)
      (assigned.localCheckpoint(), cents.localCheckpoint())
    })

  def ivfRebalancedSearch(s: SparkSession, d: String, k: Int,
      nprobe: Int): DataFrame = {
    val (assigned, cents) = rebalancedIvfIndex(s, d)
    val e = prepared(s, d)
    val q = e.filter(col("vec_id") === 0L)
      .select(col("ce"), col("n2")).head()
    val qv = q.getSeq[Double](0)
    val qn = math.sqrt(q.getDouble(1))
    // probed lists: nearest rebalanced centroids by cosine — driver
    // math over the metadata-sized centroid table
    val lists = cents.select("c_id", "centroid", "cn2").collect()
      .map { r =>
        val c = r.getSeq[Double](1)
        var acc = 0.0; var i = 0
        while (i < c.length) { acc += qv(i) * c(i); i += 1 }
        (r.getInt(0), acc / (qn * math.sqrt(r.getDouble(2))))
      }
      .sortBy { case (cid, csim) => (-csim, cid) }
      .take(nprobe).map(_._1).toIndexedSeq
    val qvDf = e.filter(col("vec_id") === 0L)
      .select(col("ce").as("qe"), col("n2").as("qn2"))
    assigned.filter(col("c_id").isin(lists: _*))
      .select(col("vec_id"), col("ce"), col("n2"))
      .crossJoin(broadcast(qvDf))
      .select(col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  // serving config: 3 of the rebalanced lists — rows-only (recall is an
  // index property; the exhaustive twin is the hard oracle)
  val qAnnIvfRebalanced: (SparkSession, String) => DataFrame = (s, d) =>
    ivfRebalancedSearch(s, d, k = 10, nprobe = 3)

  val qAnnIvfRebalancedExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => ivfRebalancedSearch(s, d, k = 10, nprobe = Int.MaxValue)

  // --- persisted IVF index: the on-disk form of the 100 TB design ---
  // "The corpus is bucketed by centroid id so a probe reads one partition"
  // is not prose here: writeIvfIndex lays the assigned corpus out as
  // hive-partitioned parquet (c_id=K directories) plus a centroid table,
  // and probeIvfIndex reads ONLY the nprobe probed directories — the scan
  // is partition-pruned (PartitionFilters on c_id), asserted by spec.

  /** Nearest-centroid assignment with the min_by(d2, c_id) tie-break —
    * ONE definition shared by build, append, and the streaming segment
    * writer, so an incrementally-assigned vector lands in exactly the
    * partition a rebuild-with-the-same-centroids would put it in. */
  private[graft] def assignToCentroids(e: DataFrame, cents: DataFrame)
      : DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2",
        col("cn2") - lit(2.0) * dotd(col("ce"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("ce"), col("n2"), col("c_id")),
        struct(col("d2"), col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
        col("m.c_id").as("c_id"))

  /** Build and persist the IVF index for a corpus: centroids (k rows) and
    * the corpus assigned+partitioned by centroid id. */
  def writeIvfIndex(embs: DataFrame, path: String, k: Int, iters: Int)
      : Unit = {
    val e = prepare(embs)
    val cents = kmeansCentroids(e, k, iters)
    assignToCentroids(e, cents).write.mode("overwrite")
      .partitionBy("c_id").parquet(s"$path/corpus")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Train and persist ONLY the centroid table — an empty index root
    * for the streaming-ingest shape: at 100 TB centroids are trained
    * once on a historical sample, then vectors arrive by stream and
    * land via frozen-centroid assignment ([[ivfIngestSegment]]). */
  def writeIvfCentroids(embs: DataFrame, path: String, k: Int,
      iters: Int): Unit =
    kmeansCentroids(prepare(embs), k, iters)
      .write.mode("overwrite").parquet(s"$path/centroids")

  /** One micro-batch's index segment: assign against the root's FROZEN
    * centroids, land under `corpus/epoch=N/c_id=K` by EPOCH-OVERWRITE —
    * re-delivery replaces the segment (the bm25IngestSegment
    * discipline), and cross-segment partition discovery keeps the
    * probe's c_id pruning intact across every epoch. */
  def ivfIngestSegment(s: SparkSession, path: String, batch: DataFrame,
      id: Long): Unit = {
    val cents = s.read.parquet(s"$path/centroids")
    assignToCentroids(prepare(batch), cents).write.mode("overwrite")
      .partitionBy("c_id").parquet(s"$path/corpus/epoch=$id")
  }

  /** INCREMENTAL index maintenance: assign new vectors against the
    * index's FROZEN centroids and append them into the partitioned corpus
    * layout. The 100 TB shape: daily embeddings append into the existing
    * `c_id=` directories; centroids are retrained only when drift metrics
    * say so (a rebuild), never per-append. Assignment uses the identical
    * min_by tie-break as writeIvfIndex, so an appended row lands in
    * exactly the partition a rebuild-with-these-centroids would put it
    * in; IvfIndexSpec proves probe equivalence. */
  def appendToIvfIndex(s: SparkSession, path: String, newEmbs: DataFrame)
      : Unit = {
    val cents = s.read.parquet(s"$path/centroids")
    assignToCentroids(prepare(newEmbs), cents).write.mode("append")
      .partitionBy("c_id").parquet(s"$path/corpus")
  }

  private def hadoopExists(s: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(s.sparkContext.hadoopConfiguration).exists(path)
  }

  /** The LIVE view of a persisted index's corpus: without tombstones
    * the raw partitioned layout; with them, an anti-join on vec_id.
    * Cosine scores are per-vector — nothing global to correct (simpler
    * than the BM25 analog, which must re-derive df/N/avgdl), so a
    * deleted index probes bit-identically to a rebuild on the live
    * vectors with frozen centroids. */
  private def ivfLiveCorpus(s: SparkSession, path: String): DataFrame = {
    val corpus = s.read.parquet(s"$path/corpus")
    if (!hadoopExists(s, s"$path/tombstones")) corpus
    else corpus.join(s.read.parquet(s"$path/tombstones")
      .select("vec_id"), Seq("vec_id"), "left_anti")
  }

  /** Tombstone-delete vectors from the index: a metadata write of the
    * ids only (already-tombstoned ids are skipped — idempotent on
    * re-delivery). Postings stay on disk until [[compactIvfIndex]]. */
  def deleteFromIvfIndex(s: SparkSession, path: String,
      vecIds: DataFrame): Unit = {
    val tombPath = s"$path/tombstones"
    val fresh = vecIds.select("vec_id").distinct()
    val newTomb = if (!hadoopExists(s, tombPath)) fresh
      else fresh.join(s.read.parquet(tombPath).select("vec_id"),
        Seq("vec_id"), "left_anti")
    newTomb.write.mode("append").parquet(tombPath)
  }

  /** Physically reclaim tombstoned vectors: stage the live corpus (and
    * the frozen centroids unchanged) as a sibling index root, audit the
    * staged count, retire-then-swap the WHOLE root — same discipline as
    * TextAnalysis.compactBm25Index: corpus and absence-of-tombstones
    * must change together; crashes leave the old root intact or
    * recoverable at `.prev`. */
  def compactIvfIndex(s: SparkSession, path: String): Unit =
    replaceIndexRoot(s, path, "compactIvfIndex") { staging =>
      // canonical column set: a streaming-segmented source (corpus
      // under epoch=N/c_id=K) compacts into the batch layout; the
      // centroids are carried over FROZEN — compaction reclaims, it
      // never retrains
      val live = ivfLiveCorpus(s, path)
        .select(col("vec_id"), col("ce"), col("n2"), col("c_id"))
      live.write.partitionBy("c_id").parquet(s"$staging/corpus")
      s.read.parquet(s"$path/centroids").write
        .parquet(s"$staging/centroids")
      live.count()
    }

  /** The REBUILD the drift gate ([[ivfDriftReport]]) triggers: retrain
    * centroids on the CURRENT live corpus (tombstones applied, every
    * epoch segment included) and rewrite the whole root — the
    * explicitly data-sized op the frozen-centroid discipline defers
    * until drift evidence demands it. Same stage→audit→retire-swap
    * publication as compaction: corpus, centroids, and
    * absence-of-tombstones change together, and a crash leaves the old
    * root intact or recoverable at `.prev`. Probe-all over the rebuilt
    * index must still equal brute force over the live vectors (cosine
    * is per-vector — centroid QUALITY affects pruned-probe recall,
    * never probe-all correctness), which is exactly what the declared
    * key's oracle states. */
  def rebuildIvfIndex(s: SparkSession, path: String, k: Int,
      iters: Int): Unit =
    replaceIndexRoot(s, path, "rebuildIvfIndex") { staging =>
      val live = ivfLiveCorpus(s, path)
        .select(col("vec_id"), col("ce"), col("n2")).localCheckpoint()
      val cents = kmeansCentroids(live, k, iters)
      assignToCentroids(live, cents)
        .write.partitionBy("c_id").parquet(s"$staging/corpus")
      cents.write.parquet(s"$staging/centroids")
      live.count()
    }

  // --- INDEX PUBLICATION THROUGH THE REF LOG (round 13): index roots
  // become IMMUTABLE VERSIONS under <root>/versions/v=N with a named
  // "serving" ref (the table format's append-only ref log, reused
  // verbatim) pointing at the live one. A serving reader resolves the
  // ref ONCE and pins its version root; a rebuild STAGES v=N+1 from the
  // serving version's live vectors, audits the staged copy, and
  // fast-forwards the ref — the probe-during-rebuild race disappears
  // structurally (the old version is never retired in place, unlike the
  // whole-root retire-then-swap below, whose safety is
  // rollback-discipline-dependent). Old versions stay readable for
  // pinned readers until explicitly reclaimed. IvfIndexSpec pins a
  // reader mid-rebuild reading the old version, then the new after the
  // ref move.

  import graft.operators.Lakehouse.{getRef, setRef}

  /** Build version 1 under the log root and point the serving ref at
    * it. Returns the published version. */
  def writeIvfIndexVersioned(s: SparkSession, root: String,
      embs: DataFrame, k: Int, iters: Int): Int = {
    writeIvfIndex(embs, s"$root/versions/v=1", k, iters)
    setRef(s, root, "serving", 1)
    1
  }

  /** The serving version and its immutable root — a reader resolves
    * once (one metadata read) and probes the pinned root thereafter. */
  def servingIvfVersion(s: SparkSession, root: String): Int =
    getRef(s, root, "serving")
  def servingIvfRoot(s: SparkSession, root: String): String =
    s"$root/versions/v=${servingIvfVersion(s, root)}"

  /** STAGE the next index version: retrain over the SERVING version's
    * live vectors (appends and tombstones fold in), land the full index
    * under versions/v=N+1, audit the staged corpus count — and leave
    * the ref untouched: readers keep resolving v=N. Returns the staged
    * version number. */
  def stageIvfIndexVersion(s: SparkSession, root: String, k: Int,
      iters: Int): Int = {
    val cur = servingIvfVersion(s, root)
    val next = cur + 1
    val nextRoot = s"$root/versions/v=$next"
    val live = ivfLiveCorpus(s, s"$root/versions/v=$cur")
      .select(col("vec_id"), col("ce"), col("n2")).localCheckpoint()
    val cents = kmeansCentroids(live, k, iters)
    assignToCentroids(live, cents).write.mode("overwrite")
      .partitionBy("c_id").parquet(s"$nextRoot/corpus")
    cents.write.mode("overwrite").parquet(s"$nextRoot/centroids")
    val got = s.read.parquet(s"$nextRoot/corpus").count()
    require(got == live.count(),
      s"stageIvfIndexVersion: staged $got vectors, expected " +
        s"${live.count()}")
    next
  }

  /** Fast-forward the serving ref to a staged version (the
    * write-audit-publish move): verify the staged root is a complete
    * index, then one ref-log append. Pinned readers are untouched; new
    * resolutions see the staged version. */
  def publishIvfIndexVersion(s: SparkSession, root: String,
      v: Int): Unit = {
    val vr = s"$root/versions/v=$v"
    require(hadoopExists(s, s"$vr/corpus") &&
      hadoopExists(s, s"$vr/centroids") &&
      s.read.parquet(s"$vr/corpus").limit(1).count() > 0,
      s"publishIvfIndexVersion: $vr is not a complete index")
    setRef(s, root, "serving", v)
  }

  /** Retire-then-swap publication of a freshly-staged index root —
    * shared by [[compactIvfIndex]] (frozen centroids) and
    * [[rebuildIvfIndex]] (retrained): crash-recovery preamble (a prior
    * run that died between its renames leaves the index only at
    * `.prev` — roll it back before staging rather than failing on the
    * missing root), stage via `build(stagingDir)` (returns the
    * expected live count), audit the staged corpus against it, swap
    * with rollback on failure. */
  private def replaceIndexRoot(s: SparkSession, path: String,
      op: String)(build: String => Long): Unit = {
    val staging = path + ".staging"
    val conf = s.sparkContext.hadoopConfiguration
    val stg = new org.apache.hadoop.fs.Path(staging)
    val fs = stg.getFileSystem(conf)
    val pub0 = new org.apache.hadoop.fs.Path(path)
    val prev0 = new org.apache.hadoop.fs.Path(path + ".prev")
    if (!fs.exists(pub0) && fs.exists(prev0) && !fs.rename(prev0, pub0))
      throw new java.io.IOException(
        s"$op: failed to roll back $prev0 to $pub0")
    if (fs.exists(stg)) fs.delete(stg, true)
    val expected = build(staging)
    val got = s.read.parquet(s"$staging/corpus").count()
    require(got == expected,
      s"$op: staged $got vectors, expected $expected")
    val pub = new org.apache.hadoop.fs.Path(path)
    val prev = new org.apache.hadoop.fs.Path(path + ".prev")
    if (fs.exists(prev)) fs.delete(prev, true)
    if (!fs.rename(pub, prev))
      throw new java.io.IOException(s"$op: failed to retire $pub to $prev")
    if (!fs.rename(stg, pub)) {
      if (!fs.rename(prev, pub))
        throw new java.io.IOException(
          s"$op: swap AND rollback failed for $pub")
      throw new java.io.IOException(
        s"$op: failed to publish $stg (rolled back)")
    }
    fs.delete(prev, true)
  }

  /** BATCH probe of a persisted IVF index in ONE corpus pass: each
    * query's nprobe nearest lists come from the broadcast centroid
    * table (|batch|·k rows of metadata), the corpus scan
    * partition-prunes to the UNION of probed lists, and candidates key
    * on the list id — the ivfSearchBatch shape served from disk.
    * nprobe ≥ nlists probes everything, which is EXACT (≡ brute force
    * over the index corpus) — the configuration the oracle-gated
    * composition keys use. */
  def probeIvfIndexBatch(s: SparkSession, path: String,
      queryIds: Seq[Long], nprobe: Int, topK: Int): DataFrame = {
    val corpus = ivfLiveCorpus(s, path)
    val q = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("ce").as("qe"),
        col("n2").as("qn2"))
      .localCheckpoint()
    val cents = s.read.parquet(s"$path/centroids")
    val wp = Window.partitionBy("q_id")
      .orderBy(col("csim").desc, col("c_id").asc)
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("csim", dotd(col("centroid"), col("qe"))
        / (sqrt(col("cn2")) * sqrt(col("qn2"))))
      .withColumn("r", row_number().over(wp))
      .filter(col("r") <= nprobe)
      .select(col("q_id"), col("c_id"))
      .localCheckpoint()
    val lists = probed.select("c_id").distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    corpus.filter(col("c_id").isin(lists: _*))
      .join(broadcast(probed), Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(sim(col("ce"), col("n2"), col("qe"), col("qn2")), 6)
          .as("sim"))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= topK)
      .select("q_id", "vec_id", "sim")
      .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
  }

  /** Probe a persisted IVF index: pick the nprobe nearest centroids (a
    * k-row metadata decision — collecting k ids to the driver is partition
    * SELECTION, the same class of driver work as listing partitions), then
    * scan only those `c_id=` directories for the exact top-k. */
  def probeIvfIndex(s: SparkSession, path: String, query: Array[Double],
      nprobe: Int, topK: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qCol = typedlit(query)
    val probeIds = s.read.parquet(s"$path/centroids")
      .withColumn("csim",
        dotd(col("centroid"), qCol) / (sqrt(col("cn2")) * lit(qn)))
      .orderBy(col("csim").desc, col("c_id").asc)
      .limit(nprobe)
      .select("c_id").collect().map(_.getInt(0))
    ivfLiveCorpus(s, path)
      .filter(col("c_id").isin(probeIds.toIndexedSeq: _*))
      .select(col("vec_id"), col("c_id").as("cluster"),
        round(dotd(col("ce"), qCol) / (sqrt(col("n2")) * lit(qn)), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(topK)
  }

  // Index written once per (session, corpus dir) — the declared probe
  // query measures probing a PRECOMPUTED index, which is the deployed
  // shape (same rationale as the centroid cache above). The path is a pure
  // function of the cache KEY (applicationId + corpus dir), so two racing
  // first callers compute the same path and the overwrite-mode write is
  // idempotent — no orphaned index and no path collision, unlike a
  // cache-size suffix. Construction is synchronized so concurrent first
  // probes do not launch duplicate index-build jobs.
  private val ivfIndexCache = graft.AppCache[String]()

  private def ivfIndexPath(s: SparkSession, d: String): String =
    ivfIndexCache.synchronized {
      ivfIndexCache.get(s, d)({
        val key = Integer.toHexString(
          (s.sparkContext.applicationId + "|" + d).hashCode)
        val path =
          s"${sys.props("java.io.tmpdir")}/graft_ivf_index_$key"
        writeIvfIndex(Tables.embeddings(s, d).filter(col("vec_id") =!= 0L),
          path, k = 10, iters = 3)
        path
      })
    }

  // --- q_ann_index_probe: top-10 via the persisted partition-pruned
  // index, query = vec_id 0 (collected driver-side: it is the probe's
  // input parameter, not corpus data). Rows-only.
  val qAnnIndexProbe: (SparkSession, String) => DataFrame = (s, d) => {
    val q = prepared(s, d).filter(col("vec_id") === 0L)
      .select("ce").head().getSeq[Double](0).toArray
    probeIvfIndex(s, ivfIndexPath(s, d), q, nprobe = 1, topK = 10)
  }

  // --- q_ann_index_delete/compact_exhaustive: the index lifecycle
  // under the HARD oracle — tombstone vec_id ≡ 9 (mod 10), probe ALL
  // partitions, and the result must equal brute-force cosine top-10
  // over only the live vectors (centroids frozen; cosine is
  // per-vector, so deletion needs no score correction). Compact then
  // physically reclaims and must not change a row.
  private val ivfDeleteCache = graft.AppCache[String]()

  private def ivfDeletedIndexPath(s: SparkSession, d: String,
      compact: Boolean): String =
    ivfDeleteCache.synchronized {
      ivfDeleteCache.get(s, s"$d|compact=$compact")({
        val tag = if (compact) "cmp" else "del"
        val key = Integer.toHexString(
          (s.sparkContext.applicationId + s"|ivf$tag|" + d).hashCode)
        val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_${tag}_$key"
        val embs = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
        writeIvfIndex(embs, path, k = 10, iters = 3)
        deleteFromIvfIndex(s, path,
          embs.filter(pmod(col("vec_id"), lit(10L)) === 9)
            .select("vec_id"))
        if (compact) compactIvfIndex(s, path)
        path
      })
    }

  private def ivfLifecycleProbe(s: SparkSession, d: String,
      compact: Boolean): DataFrame = {
    val q = prepared(s, d).filter(col("vec_id") === 0L)
      .select("ce").head().getSeq[Double](0).toArray
    probeIvfIndex(s, ivfDeletedIndexPath(s, d, compact), q,
      nprobe = Int.MaxValue, topK = 10)
      .select(col("vec_id"), col("sim"))
  }

  val qAnnIndexDeleteExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => ivfLifecycleProbe(s, d, compact = false)

  val qAnnIndexCompactExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => ivfLifecycleProbe(s, d, compact = true)

  // --- q_ann_index_append_exhaustive: the append half of the lifecycle
  // under the SAME hard oracle — the index is built on the even vec_ids
  // only, the odds arrive by appendToIvfIndex (frozen-centroid
  // assignment, the daily-embeddings ingest shape), and a probe-all of
  // the appended index must equal brute-force cosine top-10 over the
  // whole corpus. Exactness needs no argument about centroid quality:
  // probe-all scans every list, and cosine is per-vector — the oracle
  // gates that no vector was lost, duplicated, or mis-scored on the
  // append path.
  private val ivfAppendCache = graft.AppCache[String]()

  private def ivfAppendIndexPath(s: SparkSession, d: String): String =
    ivfAppendCache.synchronized {
      ivfAppendCache.get(s, d)({
        val key = Integer.toHexString(
          (s.sparkContext.applicationId + "|ivfapp|" + d).hashCode)
        val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_app_$key"
        val embs = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
        writeIvfIndex(embs.filter(pmod(col("vec_id"), lit(2L)) === 0),
          path, k = 10, iters = 3)
        appendToIvfIndex(s, path,
          embs.filter(pmod(col("vec_id"), lit(2L)) === 1))
        path
      })
    }

  val qAnnIndexAppendExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => {
      val q = prepared(s, d).filter(col("vec_id") === 0L)
        .select("ce").head().getSeq[Double](0).toArray
      probeIvfIndex(s, ivfAppendIndexPath(s, d), q,
        nprobe = Int.MaxValue, topK = 10)
        .select(col("vec_id"), col("sim"))
    }

  // --- q_ann_index_rebuild_exhaustive: the drift gate's consequence
  // under the SAME hard oracle — the whole maintenance arc in one
  // index (build on evens → append odds under frozen centroids →
  // tombstone vec_id ≡ 9 (mod 10) → REBUILD: retrain on the live
  // corpus, reclaim tombstones, rewrite the root), and a probe-all of
  // the rebuilt index must equal brute-force cosine top-10 over only
  // the live vectors. Retraining cannot be argued away by probe-all
  // (correctness is centroid-independent there) — which is the point:
  // the oracle gates that the rebuild lost, duplicated, resurrected,
  // and mis-scored nothing; IvfIndexSpec separately pins that the
  // rebuild actually retrains (drift collapses after it).
  private val ivfRebuildCache = graft.AppCache[String]()

  private def ivfRebuiltIndexPath(s: SparkSession, d: String): String =
    ivfRebuildCache.synchronized {
      ivfRebuildCache.get(s, d)({
        val key = Integer.toHexString(
          (s.sparkContext.applicationId + "|ivfrb|" + d).hashCode)
        val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_rb_$key"
        val embs = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
        writeIvfIndex(embs.filter(pmod(col("vec_id"), lit(2L)) === 0),
          path, k = 10, iters = 3)
        appendToIvfIndex(s, path,
          embs.filter(pmod(col("vec_id"), lit(2L)) === 1))
        deleteFromIvfIndex(s, path,
          embs.filter(pmod(col("vec_id"), lit(10L)) === 9)
            .select("vec_id"))
        rebuildIvfIndex(s, path, k = 10, iters = 3)
        path
      })
    }

  val qAnnIndexRebuildExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => {
      val q = prepared(s, d).filter(col("vec_id") === 0L)
        .select("ce").head().getSeq[Double](0).toArray
      probeIvfIndex(s, ivfRebuiltIndexPath(s, d), q,
        nprobe = Int.MaxValue, topK = 10)
        .select(col("vec_id"), col("sim"))
    }

  // --- q_ann_index_drift: the gate that says WHEN the frozen-centroid
  // discipline must trigger a retrain. "Centroids retrain only as an
  // explicit rebuild" is the right 100 TB economics, but it needs an
  // evidence signal: per-list quantiles of the ASSIGNMENT DISTANCE
  // (squared euclidean to the owning centroid) for a candidate ingest
  // batch, against the same quantiles of the index's resident corpus —
  // the training distribution. A batch drawn from the training
  // distribution reproduces the baseline (ratio ≈ 1); a shifted batch
  // inflates it, and a deployment triggers the rebuild when the ratio
  // crosses its threshold. Rows-only by contract (an index property,
  // no relational oracle); IvfIndexSpec pins ratio ≈ 1 on the training
  // distribution and strictly > 1 on a deterministically shifted batch.

  /** Per-list drift report for `batch` against the index at `path`:
    * (c_id, n_train, p50/p95 of resident d2, n_batch, p50/p95 of batch
    * d2, drift_p95 = batch p95 / resident p95). One broadcast of k
    * centroids + one shuffle per cohort — the ingest batch's own
    * assignment pass, reused as telemetry. */
  private[graft] def ivfDriftReport(s: SparkSession, path: String,
      batch: DataFrame): DataFrame = {
    val cents = s.read.parquet(s"$path/centroids")
    def assignedD2(e: DataFrame): DataFrame =
      e.crossJoin(broadcast(cents))
        .withColumn("d2", col("n2") + col("cn2") -
          lit(2.0) * dotd(col("ce"), col("centroid")))
        .groupBy("vec_id")
        .agg(min_by(struct(col("d2"), col("c_id")),
          struct(col("d2"), col("c_id"))).as("m"))
        .select(col("m.c_id").as("c_id"), col("m.d2").as("d2"))
    def stats(e: DataFrame, tag: String): DataFrame =
      assignedD2(e).groupBy("c_id")
        .agg(count(lit(1)).as(s"n_$tag"),
          round(expr("percentile(d2, 0.5)"), 6).as(s"p50_$tag"),
          round(expr("percentile(d2, 0.95)"), 6).as(s"p95_$tag"))
    val train = stats(s.read.parquet(s"$path/corpus")
      .select("vec_id", "ce", "n2"), "train")
    // FULL outer: a batch cohort landing on a list with zero resident
    // vectors is the most off-distribution signal the gate exists to
    // catch — a left join keyed on resident lists would drop it. Such
    // lists surface as n_train=0 with null drift_p95 (no resident
    // baseline to ratio against), which the trigger treats as fire.
    train.join(stats(prepare(batch), "batch"), Seq("c_id"), "full")
      .na.fill(0L, Seq("n_train", "n_batch"))
      .withColumn("drift_p95",
        round(col("p95_batch") / col("p95_train"), 4))
      .orderBy("c_id")
  }

  /** The declared drift row set: the resident corpus re-presented as a
    * batch (baseline cohort — ratio ≈ 1 by construction) and a
    * deterministic element-wise shift of it (+0.25 per dimension —
    * off-distribution cohort), against the same cached index. */
  val qAnnIndexDrift: (SparkSession, String) => DataFrame = (s, d) => {
    val path = ivfIndexPath(s, d)
    val embs = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
    val shifted = embs.withColumn("embedding",
      transform(col("embedding"), x => x + lit(0.25f)))
    ivfDriftReport(s, path, embs)
      .select(lit("01_resident").as("cohort"), col("*"))
      .unionByName(ivfDriftReport(s, path, shifted)
        .select(lit("02_shifted").as("cohort"), col("*")))
      .orderBy("cohort", "c_id")
  }

  // --- q_stream_ivf_ingest probe: the one-pass batch probe over the
  // streaming-segmented corpus layout, declared from EventsStreaming
  // (which owns the replay machinery) — probe-all keeps it exact so the
  // key carries the brute-force batch oracle.
  private[graft] def probeIvfIngested(s: SparkSession, path: String)
      : DataFrame =
    probeIvfIndexBatch(s, path, (1L to 8L), nprobe = Int.MaxValue,
      topK = 10)

  /** Brute-force cosine batch (queries 1..8, top-10) over an arbitrary
    * embeddings source — the streaming-lifecycle keys replay it over
    * only the LIVE vectors. lazy: cosineSql initializes later in this
    * object's body. */
  private def ivfIngestOracleFrom(src: String) =
    s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM $src), q AS (SELECT vec_id AS q_id, ce AS qe FROM e WHERE vec_id BETWEEN 1 AND 8), s AS (SELECT q.q_id, e.vec_id, round($cosineSql, 6) AS sim FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id), r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk FROM s) SELECT q_id, vec_id, sim FROM r WHERE rnk <= 10 ORDER BY q_id, sim DESC, vec_id"

  private[graft] lazy val ivfIngestOracle = ivfIngestOracleFrom("embeddings")
  private[graft] lazy val ivfIngestLiveOracle = ivfIngestOracleFrom(
    "(SELECT * FROM embeddings WHERE vec_id % 10 <> 9)")

  // --- q_embed_clusters: near-dup collapse over EMBEDDING pairs ---
  // Cross-module composition: the bucketed exact ε-join feeds the same
  // pointer-jumping connected components the text path uses — the
  // "collapse semantic duplicates" step of an embedding-deduped corpus.
  // Oracle-able because the bucketed pairs are exact (≡ brute force), so
  // the DuckDB recursive-CTE over brute pairs is a structural match.
  val qEmbedClusters: (SparkSession, String) => DataFrame = (s, d) =>
    Dedup.connectedComponents(
      qEmbedNearDupBucketed(s, d)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("canonical"))
      .orderBy("vec_id")

  // --- SemDeDup: cluster-scoped semantic deduplication ---
  // The published SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540):
  // k-means the embedding space, compare pairs ONLY within a cluster,
  // drop every vector that has a smaller-id duplicate in its cluster
  // (keep-first-occurrence — deterministic, engine-replayable). The
  // scale trade is explicit and MEASURED: candidate volume falls from
  // n² to Σ|cluster|² (at 100 TB: k grows with the corpus so cluster
  // size stays bounded → linear pair volume, an equi-join on c_id that
  // shuffles each side once), paid for in recall against the EXACT
  // pair set — `q_semdedup` is rows-only by contract (the assignment
  // is engine-internal) with `q_semdedup_recall` self-validating it,
  // and the k=1 EXHAUSTIVE twin (one cluster ⇒ all pairs ⇒ brute-force
  // dedup) takes the hard DuckDB oracle.

  /** Corpus vectors assigned to the cached IVF centroids (the same
    * trained quantizer the ANN keys probe — zero extra training). */
  private def semAssigned(s: SparkSession, d: String): DataFrame = {
    val cents = ivfCentroids(s, d, 10, 3)
    prepared(s, d)
      .crossJoin(broadcast(cents))
      .withColumn("d2",
        col("cn2") - lit(2.0) * dotd(col("ce"), col("centroid")))
      .groupBy("vec_id")
      .agg(min_by(struct(col("ce"), col("n2"), col("c_id")),
        struct(col("d2"), col("c_id"))).as("m"))
      .select(col("vec_id"), col("m.ce").as("ce"), col("m.n2").as("n2"),
        col("m.c_id").as("c_id"))
  }

  /** CLUSTERED synthetic fixture for SemDeDup's ORGANIC regime — the
    * distribution the published recipe assumes (and the testdata
    * embeddings deliberately lack: their max pair cosine is 0.479, so
    * τ=0.4 sees only borderline pairs — the worst case, whose 0.39
    * recall floor SCALE.md documents). Here: `k` well-separated
    * uniform centers, per-vector noise inside each cluster, and a
    * planted near-identical duplicate for every third vector (its
    * base's embedding re-jittered at 1/10 the noise) — so true
    * duplicate pairs are ε-close, same-cluster non-duplicates sit at
    * intermediate cosine, and cross-cluster pairs are far. Fully
    * in-plan and deterministic (salted xxhash64 uniforms, the
    * OrganicProbe discipline); shape-compatible with [[prepare]]. */
  private[graft] def clusteredFixture(s: SparkSession, n: Int, k: Int,
      dim: Int, noise: Double, jitter: Double): DataFrame = {
    val half = (1L << 52).toDouble
    def u(seed: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(seed: _*), lit(1L << 52)).cast("double") +
        lit(0.5)) / lit(half)
    s.range(0, n.toLong).toDF("vec_id")
      // every third id duplicates its predecessor's base
      .withColumn("bid",
        when(pmod(col("vec_id"), lit(3)) === 1, col("vec_id") - 1)
          .otherwise(col("vec_id")))
      .withColumn("cl", pmod(xxhash64(lit("cl"), col("bid")), lit(k)))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), j =>
          ((u(lit("c"), col("cl"), j) * 2.0 - 1.0) +
            lit(noise) * (u(lit("n"), col("bid"), j) * 2.0 - 1.0) +
            lit(jitter) * (u(lit("j"), col("vec_id"), j) * 2.0 - 1.0))
            .cast("float")))
      .select(col("vec_id"), col("cl").cast("int").as("label"),
        col("embedding"))
  }

  /** Intra-cluster duplicate pairs at `threshold` — the candidate set
    * SemDeDup evaluates (an equi-join on the cluster id; the cosine
    * predicate refines inside the join so misses never materialize). */
  private[graft] def semDupPairs(assigned: DataFrame,
      threshold: Double): DataFrame = {
    val a = assigned.select(col("c_id"), col("vec_id").as("vec_a"),
      col("ce").as("ce_a"), col("n2").as("n2_a"))
    val b = assigned.select(col("c_id"), col("vec_id").as("vec_b"),
      col("ce").as("ce_b"), col("n2").as("n2_b"))
    a.join(b, Seq("c_id"))
      .filter(col("vec_a") < col("vec_b") &&
        sim(col("ce_a"), col("n2_a"), col("ce_b"), col("n2_b"))
          >= threshold)
      .select(col("vec_a"), col("vec_b"))
  }

  /** The kept corpus: every vector WITHOUT a smaller-id duplicate in
    * its own cluster survives. */
  private[graft] def semDedupKept(assigned: DataFrame,
      threshold: Double): DataFrame =
    assigned.join(
      semDupPairs(assigned, threshold)
        .select(col("vec_b").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("c_id"))
      .orderBy("vec_id")

  // deployed shape: k=10 clusters, rows-only (recall twin validates)
  val qSemDedup: (SparkSession, String) => DataFrame = (s, d) =>
    semDedupKept(semAssigned(s, d), threshold = 0.4)

  // k=1 exhaustive twin: one cluster = every pair considered = the
  // brute-force keep-first dedup — the hard oracle
  val qSemDedupExhaustive: (SparkSession, String) => DataFrame =
    (s, d) => semDedupKept(
      prepared(s, d).withColumn("c_id", lit(0)), threshold = 0.4)

  /** Recall of the cluster-scoped pass against the EXACT duplicate
    * pair set (the bucketed ε-join, ≡ brute force): the fraction of
    * true pairs that landed in the same cluster. Self-validating row;
    * SemDedupSpec pins the floor. */
  val qSemDedupRecall: (SparkSession, String) => DataFrame = (s, d) => {
    val truePairs = cachedEmbedPairs(s, d).select("vec_a", "vec_b")
    val caught = semDupPairs(semAssigned(s, d), threshold = 0.4)
    truePairs.join(caught, Seq("vec_a", "vec_b"), "left_semi")
      .agg(count(lit(1)).as("n_caught"))
      .crossJoin(truePairs.agg(count(lit(1)).as("n_true")))
      .select(col("n_true"), col("n_caught"),
        round(col("n_caught") / col("n_true"), 4).as("recall"))
  }

  // --- q_embed_norm_stats: per-label vector-norm profile ---
  // The embedding-quality screen a pipeline runs before indexing (norm
  // collapse / outlier labels). Norms are rounded to 9 decimals BEFORE the
  // exact-decimal sum so the average is order-independent and the decimal
  // cast is unambiguous cross-engine; min/max are order-independent as-is.
  val qEmbedNormStats: (SparkSession, String) => DataFrame = (s, d) => {
    val norm9 = round(sqrt(col("n2")), 9)
    prepare(Tables.embeddings(s, d))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(sum(norm9.cast("decimal(27,12)")).cast("double") /
          count(lit(1)), 6).as("avg_norm"),
        round(min(norm9), 6).as("min_norm"),
        round(max(norm9), 6).as("max_norm"))
      .orderBy("label")
  }

  private[graft] val cosineSql =
    "list_dot_product(ce, qe) / (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(qe, qe)))"

  /** Int8 symmetric quantization of the embedding column — the storage /
    * serving compression step (absmax scaling, the standard int8 scheme):
    * per-vector scale = max|v|/127, q_i = round(v_i/scale), plus the
    * reconstruction MSE the compression costs. Pure per-row HOF work in
    * one pass, no shuffle: at 100 TB this is a map-only rewrite of the
    * vector column (4× smaller payload for the ANN serving path).
    * Determinism: all math runs in double with the same expression shape
    * both engines evaluate left-to-right over the list in index order;
    * outputs round to 6 places (the corpus's float inputs are exact in
    * double, so both engines see bit-identical operands). */
  val qEmbedQuantize: (SparkSession, String) => DataFrame = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("amax",
        aggregate(col("e"), lit(0.0), (a, x) => greatest(a, abs(x))))
      .filter(col("amax") > 0)
      .withColumn("scale", col("amax") / 127)
      .withColumn("q",
        transform(col("e"), x => round(x / col("scale")).cast("int")))
      .withColumn("q_l1",
        aggregate(col("q"), lit(0L), (a, x) => a + abs(x).cast("long")))
      .withColumn("recon_mse", round(aggregate(
          zip_with(col("e"), col("q"), (x, qi) =>
            (x - qi.cast("double") * col("scale")) *
              (x - qi.cast("double") * col("scale"))),
          lit(0.0), (a, x) => a + x) / size(col("e")), 6))
      .select(col("vec_id"), size(col("e")).as("n_dims"),
        round(col("scale"), 6).as("scale_r"), col("q_l1"),
        col("recon_mse"))
      .orderBy("vec_id")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_embed_quantize", qEmbedQuantize, Some(
      "WITH a AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings), b AS (SELECT vec_id, e, list_aggregate(list_transform(e, x -> abs(x)), 'max') AS amax FROM a WHERE list_aggregate(list_transform(e, x -> abs(x)), 'max') > 0), c AS (SELECT vec_id, e, amax / 127 AS scale FROM b), d AS (SELECT vec_id, e, scale, list_transform(e, x -> CAST(round(x / scale) AS INT)) AS q FROM c) SELECT vec_id, CAST(len(e) AS INT) AS n_dims, round(scale, 6) AS scale_r, CAST(list_aggregate(list_transform(q, x -> CAST(abs(x) AS BIGINT)), 'sum') AS BIGINT) AS q_l1, round(list_aggregate(list_transform(range(len(e)), i -> (e[i+1] - q[i+1] * scale) * (e[i+1] - q[i+1] * scale)), 'sum') / len(e), 6) AS recon_mse FROM d ORDER BY vec_id")),
    QueryDef("q_cosine_topk", qCosineTopk, Some(
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_embed_near_dup", qEmbedNearDup, Some(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) SELECT vec_a, vec_b, round(sim, 4) AS sim FROM (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_dot_product(a.ce, b.ce) / (sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce))) AS sim FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id) WHERE sim >= 0.4 ORDER BY vec_a, vec_b")),
    QueryDef("q_embed_near_dup_bucketed", qEmbedNearDupBucketed, Some(
      // the SAME brute-force oracle: the bucketed plan is exact
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) SELECT vec_a, vec_b, round(sim, 4) AS sim FROM (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_dot_product(a.ce, b.ce) / (sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce))) AS sim FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id) WHERE sim >= 0.4 ORDER BY vec_a, vec_b")),
    QueryDef("q_ann_ivf", qAnnIvf, None),
    QueryDef("q_ann_multiprobe", qAnnMultiprobe, None),
    QueryDef("q_ann_ivf_exhaustive", qAnnIvfExhaustive, Some(
      // exhaustive probe ≡ brute force: the SAME oracle as q_cosine_topk
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_index_probe", qAnnIndexProbe, None),
    // rows-only by contract: per-list assignment-distance drift vs the
    // training distribution — the rebuild trigger; IvfIndexSpec pins
    // baseline ≈ 1 and shifted > 1
    QueryDef("q_ann_index_drift", qAnnIndexDrift, None),
    // index lifecycle under the hard oracle: probe-all of the
    // tombstoned index ≡ brute force over only the LIVE vectors
    QueryDef("q_ann_index_delete_exhaustive", qAnnIndexDeleteExhaustive,
      Some(
        s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings WHERE vec_id <> 0 AND vec_id % 10 <> 9) CROSS JOIN q ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    // compaction must not change a row — same live oracle BY REFERENCE
    QueryDef("q_ann_index_compact_exhaustive", qAnnIndexCompactExhaustive,
      Some(
        s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings WHERE vec_id <> 0 AND vec_id % 10 <> 9) CROSS JOIN q ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    // build(evens) + append(odds) with frozen centroids, probe-all ≡
    // brute force over the whole corpus — the append half of the
    // lifecycle under the hard oracle
    QueryDef("q_ann_index_append_exhaustive", qAnnIndexAppendExhaustive,
      Some(
        s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings WHERE vec_id <> 0) CROSS JOIN q ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    // build → append → delete → REBUILD (retrained centroids, reclaimed
    // tombstones): probe-all ≡ brute force over only the live vectors
    QueryDef("q_ann_index_rebuild_exhaustive", qAnnIndexRebuildExhaustive,
      Some(
        s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings WHERE vec_id <> 0 AND vec_id % 10 <> 9) CROSS JOIN q ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_batch", qAnnBatch, Some(
      s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings), q AS (SELECT vec_id AS q_id, ce AS qe FROM e WHERE vec_id < 8), s AS (SELECT q.q_id, e.vec_id, round($cosineSql, 6) AS sim FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id), r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk FROM s) SELECT q_id, vec_id, sim FROM r WHERE rnk <= 5 ORDER BY q_id, sim DESC, vec_id")),
    QueryDef("q_ann_batch_exhaustive", qAnnBatchExhaustive, Some(
      // exhaustive batch probe ≡ brute batch: the SAME oracle as q_ann_batch
      s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings), q AS (SELECT vec_id AS q_id, ce AS qe FROM e WHERE vec_id < 8), s AS (SELECT q.q_id, e.vec_id, round($cosineSql, 6) AS sim FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id), r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk FROM s) SELECT q_id, vec_id, sim FROM r WHERE rnk <= 5 ORDER BY q_id, sim DESC, vec_id")),
    QueryDef("q_ann_recall", qAnnRecall, None),
    QueryDef("q_ann_batch_recall", qAnnBatchRecall, None),
    QueryDef("q_ann_pq", qAnnPq, None),
    QueryDef("q_ann_pq_rerank", qAnnPqRerank, None),
    QueryDef("q_ann_pq_exhaustive", qAnnPqExhaustive, Some(
      // exhaustive shortlist + exact re-rank ≡ brute force: the SAME
      // oracle as q_cosine_topk
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_pq_recall", qAnnPqRecall, None),
    QueryDef("q_ann_ivf_rebalanced", qAnnIvfRebalanced, None),
    QueryDef("q_ann_ivf_rebalanced_exhaustive",
      qAnnIvfRebalancedExhaustive, Some(
        // probing every rebalanced list ≡ brute force: membership
        // survives split/reassign — the SAME oracle as q_cosine_topk
        s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_opq", qAnnOpq, None),
    QueryDef("q_ann_opq_exhaustive", qAnnOpqExhaustive, Some(
      // exhaustive shortlist ⇒ the exact re-rank is brute force: the
      // SAME oracle as q_cosine_topk
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_opq_np", qAnnOpqNp, None),
    QueryDef("q_ann_opq_np_exhaustive", qAnnOpqNpExhaustive, Some(
      // exhaustive shortlist ⇒ the exact re-rank is brute force: the
      // SAME oracle as q_cosine_topk
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_opq_recall", qAnnOpqRecall, None),
    QueryDef("q_ann_ivfpq", qAnnIvfPq, None),
    QueryDef("q_ann_ivfpq_exhaustive", qAnnIvfPqExhaustive, Some(
      // all lists probed + corpus shortlist + exact re-rank ≡ brute
      // force: the SAME oracle as q_cosine_topk
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_ivfpq_recall", qAnnIvfPqRecall, None),
    QueryDef("q_ann_opq_ivfpq", qAnnOpqIvfPq, None),
    QueryDef("q_ann_opq_ivfpq_exhaustive", qAnnOpqIvfPqExhaustive, Some(
      // all rotated-space lists + corpus shortlist + exact re-rank ≡
      // brute force: the SAME oracle as q_cosine_topk
      s"WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) SELECT vec_id, round($cosineSql, 6) AS sim FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) CROSS JOIN q WHERE vec_id <> 0 ORDER BY sim DESC, vec_id ASC LIMIT 10")),
    QueryDef("q_ann_opq_ivfpq_recall", qAnnOpqIvfPqRecall, None),
    QueryDef("q_ann_ivfpq_batch", qAnnIvfPqBatch, None),
    QueryDef("q_ann_ivfpq_batch_exhaustive", qAnnIvfPqBatchExhaustive,
      Some(
        // all lists + corpus shortlist + exact re-rank ≡ per-query brute
        // force over the 16-query batch; both sides exclude vec_id 0
        // (the single-query probe is not in the codes corpus)
        s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings), q AS (SELECT vec_id AS q_id, ce AS qe FROM e WHERE vec_id BETWEEN 1 AND 16), s AS (SELECT q.q_id, e.vec_id, round($cosineSql, 6) AS sim FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id AND e.vec_id <> 0), r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rnk FROM s) SELECT q_id, vec_id, sim FROM r WHERE rnk <= 10 ORDER BY q_id, sim DESC, vec_id")),
    QueryDef("q_ann_ivfpq_batch_recall", qAnnIvfPqBatchRecall, None),
    // SemDeDup deployed shape: cluster-scoped, rows-only by contract
    // (the k-means assignment is engine-internal); the recall twin and
    // SemDedupSpec validate it, the k=1 twin takes the hard oracle
    QueryDef("q_semdedup", qSemDedup, None),
    QueryDef("q_semdedup_recall", qSemDedupRecall, None),
    QueryDef("q_semdedup_exhaustive", qSemDedupExhaustive, Some(
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings), d AS (SELECT DISTINCT b.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id AND list_dot_product(a.ce, b.ce) / (sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce))) >= 0.4) SELECT vec_id, 0 AS c_id FROM e WHERE vec_id NOT IN (SELECT vec_id FROM d) ORDER BY vec_id")),
    QueryDef("q_embed_clusters", qEmbedClusters, Some(
      "WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings), pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id AND list_dot_product(a.ce, b.ce) / (sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce))) >= 0.4), edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION ALL SELECT doc_b, doc_a FROM pairs), reach(src, dst) AS (SELECT src, dst FROM edges UNION SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src) SELECT src AS vec_id, least(src, MIN(dst)) AS canonical FROM reach GROUP BY src ORDER BY vec_id")),
    QueryDef("q_embed_norm_stats", qEmbedNormStats, Some(
      "WITH e AS (SELECT label, round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 9) AS nrm FROM embeddings) SELECT label, COUNT(*) AS n, round(CAST(SUM(CAST(nrm AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*), 6) AS avg_norm, round(MIN(nrm), 6) AS min_norm, round(MAX(nrm), 6) AS max_norm FROM e GROUP BY label ORDER BY label"))
  )
}
