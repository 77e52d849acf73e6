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
