package graft

import graft.operators.Similarity

/** Property test for the triangle-inequality cluster-pair pruning in
  * nearDupPairsBucketed: on randomized vector corpora — clustered,
  * uniform, and adversarial (duplicate-heavy) — the bucketed result must
  * equal a naive in-memory O(n²) scan, proving the pruning bound
  * d(c_i,c_j) <= r_i + r_j + eps loses no qualifying pair under any
  * geometry the quantizer produces. */
class BucketedNearDupPropertySpec extends SparkSpec {

  private def naivePairs(vecs: Seq[(Long, Array[Double])], t: Double)
      : Set[(Long, Long)] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    (for {
      (ida, va) <- vecs; (idb, vb) <- vecs
      if ida < idb
      sim = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      if sim >= t
    } yield (ida, idb)).toSet
  }

  private def run(vecs: Seq[(Long, Array[Double])], t: Double, k: Int)
      : Set[(Long, Long)] = {
    import spark.implicits._
    val df = vecs.map { case (id, v) => (id, "x", v.map(_.toFloat)) }
      .toDF("vec_id", "label", "embedding")
    Similarity.nearDupPairsBucketed(df, t, k)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("clustered corpus: bucketed pairs equal the naive O(n²) scan") {
    val rnd = new scala.util.Random(42)
    val dims = 16
    // 4 well-separated centers + per-vector noise → quantizer should prune
    val centers = Array.fill(4)(Array.fill(dims)(rnd.nextGaussian() * 5))
    val vecs = (0L until 80L).map { i =>
      val c = centers(rnd.nextInt(4))
      (i, c.map(x => x + rnd.nextGaussian() * 0.5))
    }
    assert(run(vecs, 0.6, 4) === naivePairs(vecs, 0.6))
  }

  test("uniform corpus: pruning degrades but never drops a pair") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian())))
    val expected = naivePairs(vecs, 0.4)
    assert(run(vecs, 0.4, 5) === expected)
    assert(expected.nonEmpty, "uniform 8-dim corpus must have 0.4-pairs")
  }

  test("hot-cluster splitting: same pairs, bounded cluster populations") {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dims = 12
    // adversarial geometry for a k-way quantizer: one DENSE-but-spread
    // blob holding 75% of the corpus (one cluster swallows it → quadratic
    // verify fan-out without splitting) + scattered background
    val hub = Array.fill(dims)(rnd.nextGaussian() * 3)
    val vecs = (0L until 160L).map { i =>
      if (i < 120) (i, hub.map(x => x + rnd.nextGaussian() * 0.8))
      else (i, Array.fill(dims)(rnd.nextGaussian() * 3))
    }
    val df = vecs.map { case (id, v) => (id, "x", v.map(_.toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val capped = Similarity.nearDupPairsBucketedCapped(df, 0.6, k = 4,
        cap = 40)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactness: splitting must not change the result
    assert(capped === naivePairs(vecs, 0.6))
    // and the refined partition must actually break up the hot cluster
    val (assigned, cents) = Similarity.quantizeCapped(df, k = 4,
      iters = 2, cap = 40)
    val pops = assigned.groupBy("c_id").agg(count(lit(1)).as("cnt"))
    val maxPop = pops.agg(max(col("cnt"))).head().getLong(0)
    assert(maxPop < 120, s"hot blob not split: max population $maxPop")
    assert(cents.count() > 4, "splitting must add sub-centroids")
    // every vector still assigned exactly once
    assert(assigned.count() === 160)
    assert(assigned.select("vec_id").distinct().count() === 160)
  }

  test("duplicate-heavy corpus (every vector 3-way replicated)") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 20).map(_ => Array.fill(12)(rnd.nextGaussian()))
    val vecs = (0 until 3).flatMap(rep =>
      base.zipWithIndex.map { case (v, i) =>
        ((rep * 100 + i).toLong, v.clone())
      })
    val expected = naivePairs(vecs, 0.9)
    assert(run(vecs, 0.9, 3) === expected)
    assert(expected.size >= 60, "each replica triple must pair up")
  }
}
