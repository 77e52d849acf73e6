package graft

import org.apache.spark.sql.functions._

import graft.functions.MinHashMergeAgg.minhashMerge
import graft.functions.SketchFunctions.minhashSig

/** The lattice property that makes MinHash a mergeable sketch: the merged
  * signature of a group equals the signature of the union of the group
  * members' shingle sets — exactly, not approximately. */
class MinHashMergeSpec extends SparkSpec {

  private val K = 8
  private val P = 2147483647L
  private val A = Array.tabulate(K)(i => 2L * i + 3)
  private val B = Array.tabulate(K)(i => 5L * i + 1)

  test("merged group signature == signature of the unioned set") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val groups = (1 to 5).map { g =>
      val sets = (1 to 4).map(_ =>
        Array.fill(rnd.nextInt(30) + 1)(rnd.nextLong().abs % 10000))
      (g, sets)
    }
    val rows = groups.flatMap { case (g, sets) =>
      sets.map(set => (g, set))
    }
    val df = rows.toDF("g", "set")
    val merged = df
      .select(col("g"), minhashSig(col("set"), A, B, P).as("sig"))
      .groupBy("g")
      .agg(minhashMerge(col("sig"), K, P).as("merged"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val unioned = groups.map { case (g, sets) =>
      g -> sets.flatten.distinct.toArray
    }.toDF("g", "u")
      .select(col("g"), minhashSig(col("u"), A, B, P).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    groups.foreach { case (g, _) =>
      assert(merged(g) === unioned(g), s"group $g")
    }
  }

  test("partial/final merge is layout-independent (repartition invariance)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map(i =>
      (i % 3, Array.fill(20)(rnd.nextLong().abs % 5000)))
    val df = rows.toDF("g", "set")
      .select(col("g"), minhashSig(col("set"), A, B, P).as("sig"))
    def agg(parts: Int) = df.repartition(parts)
      .groupBy("g").agg(minhashMerge(col("sig"), K, P).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(agg(1) === agg(7))
  }
}
