package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions.{minhashSig, simhash64}
import graft.functions.VectorFunctions.{dotd, sortedIntersectCount}

/** Property tests (seeded-random, deterministic) for the native Catalyst
  * expressions against their built-in reference formulations. */
class ExpressionsSpec extends SparkSpec {

  test("DoubleArrayDot equals the zip_with/aggregate fold exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = (1 to 30).map { _ =>
      val n = rnd.nextInt(64)
      (Array.fill(n)(rnd.nextDouble() * 200 - 100),
        Array.fill(n)(rnd.nextDouble() * 200 - 100))
    }
    val df = cases.toDF("a", "b")
    df.select(
      dotd(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect().foreach { r =>
        // bit-identical, not just approximately equal
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
  }

  test("SortedLongIntersectCount equals size(array_intersect) on sorted distinct input") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = (1 to 50).map { _ =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextLong() % 50)
        .distinct.sorted
      (arr(), arr())
    }
    val df = cases.toDF("a", "b")
    df.select(
      sortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect().foreach { r =>
        assert(r.getInt(0) === r.getInt(1))
      }
  }

  test("MinHashSig: equal sets → equal signatures; signature agreement tracks Jaccard") {
    import spark.implicits._
    val base = (1L to 60L).toArray
    val overlap = ((1L to 48L) ++ (100L to 111L)).toArray // j = 48/72 ≈ 0.67
    val disjoint = (200L to 259L).toArray
    val a = Array(1234567L, 1234569L, 1234571L)
    val b = Array(7L, 11L, 13L)
    // widen to 32 permutations like the production config
    val (pa, pb) = (Array.tabulate(32)(i => a(i % 3) + 2 * i + 1),
      Array.tabulate(32)(i => b(i % 3) + i))
    val p = 2147483647L
    val df = Seq((base, base, overlap, disjoint))
      .toDF("x", "same", "near", "far")
    val row = df.select(
      minhashSig(col("x"), pa, pb, p).as("sx"),
      minhashSig(col("same"), pa, pb, p).as("ss"),
      minhashSig(col("near"), pa, pb, p).as("sn"),
      minhashSig(col("far"), pa, pb, p).as("sf")).head()
    val Seq(sx, ss, sn, sf) = (0 until 4).map(i =>
      row.getSeq[Long](i).toArray)
    assert(sx.sameElements(ss))
    def agree(u: Array[Long], v: Array[Long]): Int =
      u.zip(v).count { case (x, y) => x == y }
    assert(agree(sx, sn) > agree(sx, sf))
    assert(agree(sx, sf) <= 4) // disjoint sets agree rarely
  }

  test("SimHash64: identical token multisets → identical hash; similar docs closer than dissimilar") {
    import spark.implicits._
    def hashes(tokens: Seq[String]) = tokens.toArray
    val d1 = hashes(Seq.fill(10)("alpha") ++ Seq.fill(10)("beta") ++
      Seq("gamma", "delta"))
    val d2 = hashes(Seq.fill(10)("alpha") ++ Seq.fill(10)("beta") ++
      Seq("gamma", "epsilon"))
    val d3 = hashes(Seq("zeta", "eta", "theta", "iota", "kappa"))
    val df = Seq((d1, d1, d2, d3)).toDF("a", "same", "near", "far")
    def sh(c: String) =
      simhash64(transform(col(c), t => xxhash64(t))).as(c + "_h")
    val row = df.select(sh("a"), sh("same"), sh("near"), sh("far")).head()
    val Seq(ha, hsame, hnear, hfar) = (0 until 4).map(row.getLong)
    assert(ha === hsame)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(ha, hnear) < hamming(ha, hfar))
  }

  test("MinHashSig of empty input returns the sentinel, not null") {
    import spark.implicits._
    val df = Seq(Tuple1(Array.empty[Long])).toDF("x")
    val sig = df.select(minhashSig(col("x"), Array(3L, 5L), Array(1L, 2L),
      97L)).head().getSeq[Long](0)
    assert(sig === Seq(97L, 97L))
  }
}
