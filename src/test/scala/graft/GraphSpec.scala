package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph-metric semantics on hand-built graphs with known answers, plus
  * the orientation-invariance property the q_graph_triangles oracle
  * relies on (Spark counts over the degree-ordered orientation, DuckDB
  * over id order — the counts must be equal for ANY acyclic
  * orientation). */
class GraphSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("sa", "sb").withColumn("cnt", lit(1L))
  }

  test("triangle count: K4 has 4 triangles, a path has none") {
    val k4 = edgesDf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    val r = Graph.triangleCount(k4).head()
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 4L)

    val path = edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(Graph.triangleCount(path).head()
      .getAs[Long]("n_triangles") === 0L)
  }

  test("triangle count matches the id-ordered orientation (oracle form)") {
    // Skewed star+clique graph: hub 1 connected to everything, plus a
    // 4-clique among {2,3,4,5} — degree order orients AWAY from the hub,
    // id order TOWARD increasing ids; counts must agree regardless.
    val g = edgesDf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (2L, 4L), (2L, 5L), (3L, 4L), (3L, 5L), (4L, 5L)))
    val byDegree = Graph.triangleCount(g).head().getAs[Long]("n_triangles")
    // id orientation: edges already satisfy sa < sb
    val e = g.select(col("sa").as("x"), col("sb").as("y"))
    val idCount = e.join(e.select(col("x").as("y2"), col("y").as("z")),
        col("y") === col("y2"))
      .join(e.select(col("x").as("x3"), col("y").as("z3")),
        col("x") === col("x3") && col("z") === col("z3"))
      .count()
    assert(byDegree === idCount)
    // star+clique: triangles = C(4,2) hub triangles + C(4,3) clique ones
    assert(byDegree === 6L + 4L)
  }

  test("fixed-point pagerank: symmetry, conservation order, determinism") {
    // Star: hub 1 with 4 leaves. All leaves must get IDENTICAL ranks
    // (symmetry is exact in integer arithmetic), hub strictly higher.
    val star = edgesDf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    val r = Graph.pagerankFixedPoint(star, 3).collect()
      .map(x => x.getAs[Long]("s_suppkey") -> x.getAs[Long]("rank_fp"))
      .toMap
    val leafRanks = Seq(2L, 3L, 4L, 5L).map(r)
    assert(leafRanks.distinct.size === 1)
    assert(r(1L) > leafRanks.head)
    // a rerun is bit-identical (no rand(), no double sums)
    val r2 = Graph.pagerankFixedPoint(star, 3).collect()
      .map(x => x.getAs[Long]("s_suppkey") -> x.getAs[Long]("rank_fp"))
      .toMap
    assert(r === r2)
  }

  test("pagerank on a regular graph is uniform at every iteration") {
    // 4-cycle: every node has degree 2 — the fixed-point iteration must
    // keep all ranks exactly equal (rank div 2 contributions symmetric).
    val cycle = edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    val ranks = Graph.pagerankFixedPoint(cycle, 3).collect()
      .map(_.getAs[Long]("rank_fp")).toSeq
    assert(ranks.distinct.size === 1)
  }

  test("common-neighbor similarity: perfect twins score 1, exact counts") {
    // 1 and 2 have IDENTICAL neighborhoods {3,4,5} and no direct edge ->
    // jac = 1.0; node 6 hangs off 3 only, so its best overlap is 1
    // shared neighbor against a union of 3.
    val g = edgesDf(Seq((1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L), (2L, 4L),
      (2L, 5L), (3L, 6L)))
    val sims = Graph.commonNeighborSimilarity(g).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common"), r.getAs[Double]("jac"))).toMap
    assert(sims((1L, 2L)) === ((3L, 1.0)))
    // 3,4 share neighbors {1,2}: common=2, deg3=3 (1,2,6), deg4=2 ->
    // union=3, jac=2/3
    assert(sims((3L, 4L))._1 === 2L)
    assert(sims((3L, 4L))._2 === 0.666667)
    // 1,6 share only neighbor 3: jac = 1/3 — present but ranked low
    assert(sims((1L, 6L)) === ((1L, 0.333333)))
    // pairs with NO shared neighbor never become candidates
    assert(!sims.contains((5L, 6L)))
  }

  test("k-core: peels the tail, keeps the clique, properties hold") {
    // 4-clique {1,2,3,4} with a pendant chain 4-5-6: 3-core = the clique.
    val g = edgesDf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)))
    val core = Graph.kCore(g, 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(core.keySet === Set(1L, 2L, 3L, 4L))
    // every kept node has >= 3 neighbors inside the core
    assert(core.values.forall(_ >= 3L))
    // maximality: dropped nodes have < 3 neighbors in the core
    // (5 has one core neighbor: 4; 6 has none)
    val adj = Map(5L -> Seq(4L, 6L), 6L -> Seq(5L))
    assert(adj(5L).count(core.contains) < 3)
    assert(adj(6L).count(core.contains) < 3)
    // a graph that is entirely its own 3-core is untouched
    val k4 = edgesDf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(Graph.kCore(k4, 3).count() === 4L)
    // and an over-aggressive k empties it
    assert(Graph.kCore(k4, 4).count() === 0L)
  }

  test("incremental cooc merge reconstructs the full-build graph exactly") {
    import spark.implicits._
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val full = Graph.significantEdges(Graph.coSupplierCooc(li))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = Graph.coSupplierCooc(li.filter(col("l_orderkey") % 10 =!= 0))
    val delta = Graph.coSupplierCooc(li.filter(col("l_orderkey") % 10 === 0))
    val inc = Graph.significantEdges(Graph.mergeCooc(base, delta))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
    assert(full.nonEmpty)
  }

  test("significant-edges threshold keeps only >= mu + 2 sigma pairs") {
    import spark.implicits._
    // 9 background pairs at cnt=1, one hot pair at cnt=100:
    // mu = 10.9, sigma ~ 29.7 -> threshold ~ 70.3: only the hot survives.
    val cooc = ((1 to 9).map(i => (100L + i, 200L + i, 1L)) :+
      (1L, 2L, 100L)).toDF("sa", "sb", "cnt")
    val kept = Graph.significantEdges(cooc).collect()
    assert(kept.length === 1)
    assert(kept.head.getAs[Long]("sa") === 1L)
  }

  test("co-occurrence counts: orders sharing suppliers count distinctly") {
    import spark.implicits._
    // order 10: suppliers {1,2,3} -> pairs (1,2),(1,3),(2,3); order 20:
    // {1,2} again -> (1,2) reaches cnt 2; duplicate lineitems within an
    // order must NOT inflate counts (distinct first).
    val li = Seq((10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val cooc = Graph.coSupplierCooc(li).collect()
      .map(r => (r.getAs[Long]("sa"), r.getAs[Long]("sb")) ->
        r.getAs[Long]("cnt")).toMap
    assert(cooc((1L, 2L)) === 2L)
    assert(cooc((1L, 3L)) === 1L)
    assert(cooc((2L, 3L)) === 1L)
    assert(cooc.size === 3)
  }
}
