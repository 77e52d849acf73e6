package graft

import graft.operators.Dedup

/** Property test for BOTH connected-components paths: on randomized
  * graphs — sparse, chains (worst diameter), cliques, and forests with
  * isolated pairs — the distributed pointer-jumping loop (forced via
  * localMaxPairs = 0) AND the driver union-find fast path must each equal
  * a naive in-memory union-find, proving the label-of-label doubling hop
  * never under- or over-merges and the two regimes agree. */
class ConnectedComponentsPropertySpec extends SparkSpec {

  private def naiveComponents(edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    val expected = naiveComponents(edges)
    // distributed pointer-jumping loop, fast path forced off
    val distributed = Dedup.connectedComponents(df, localMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed === expected)
    // driver union-find fast path (the default at this size)
    val local = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === expected)
  }

  test("random sparse graph matches union-find") {
    val rnd = new scala.util.Random(2026)
    check(Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2))
  }

  test("long chain (worst-case diameter) converges and matches") {
    // 60-node chain: diameter 59 — linear propagation would need 59
    // rounds and hit the iteration cap; pointer jumping must finish.
    check((0L until 59L).map(i => (i, i + 1)))
  }

  test("cliques plus isolated pairs match") {
    val clique = for {
      a <- 0L until 12L; b <- 0L until 12L if a < b
    } yield (a + 100L, b + 100L)
    val pairs = (0 until 10).map(i => (1000L + 2 * i, 1001L + 2 * i))
    check(clique ++ pairs)
  }

  test("two stars joined by one bridge edge merge into one component") {
    val starA = (1L to 20L).map(i => (0L, i))
    val starB = (31L to 50L).map(i => (30L, i))
    check(starA ++ starB :+ ((10L, 40L)))
  }

  test("graft.cc.localMaxPairs conf steers the regime; labels identical") {
    import spark.implicits._
    val edges = (0L until 40L).map(i => (i, i + 1))
    val df = edges.toDF("doc_a", "doc_b")
    val expected = naiveComponents(edges)
    // conf low → distributed loop even though the default would go local
    spark.conf.set("graft.cc.localMaxPairs", "0")
    try {
      val viaConf = Dedup.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Dedup.lastCcPath === "distributed")
      assert(viaConf === expected)
    } finally spark.conf.unset("graft.cc.localMaxPairs")
    // conf unset → default bound, tiny graph, healthy heap → fast path
    val viaDefault = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Dedup.lastCcPath === "local")
    assert(viaDefault === expected)
  }
}
