package graft

import org.apache.spark.sql.functions._

/** Randomized equivalence lock for the trickiest decorrelation in the
  * repo: Olap2.waitingSuppliers collapses Q21's EXISTS + NOT EXISTS pair
  * into one aggregation. The oracle run proves it on the fixture; this
  * spec proves it on adversarial random line sets (multi-supplier
  * orders, all-late orders, single-supplier orders, duplicate lines)
  * against a direct quantifier-semantics reference computed with plain
  * Scala collections. Seeded generators — deterministic, no flakes.
  */
class Q21RewriteSpec extends SparkSpec {

  private def referenceWaiting(
      lines: Seq[(Long, Long, Boolean)]): Set[(Long, Long)] = {
    val byOrder = lines.groupBy(_._1)
    (for {
      (o, ls) <- byOrder.toSeq
      (_, s, late) <- ls.distinct
      if late
      // EXISTS another supplier on the order
      if ls.exists(l => l._2 != s)
      // NOT EXISTS another supplier late on the order
      if !ls.exists(l => l._2 != s && l._3)
    } yield (o, s)).toSet
  }

  test("one-pass rewrite == quantifier semantics on 3 random line sets") {
    import spark.implicits._
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val lines = Seq.fill(600) {
        (rnd.nextInt(80).toLong, // order key: forces multi-line orders
          rnd.nextInt(12).toLong, // supplier
          rnd.nextBoolean()) // late
      }
      // build (lineitem, orders) frames matching waitingSuppliers' input
      // contract: lateness is derived from shipdate > orderdate + 30d
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val lateTs = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
      val okTs = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
      val li = lines.map { case (o, s, late) =>
        (o, s, if (late) lateTs else okTs)
      }.toDF("l_orderkey", "l_suppkey", "l_shipdate")
      val ord = lines.map(_._1).distinct
        .map(o => (o, "F", base)).toDF("o_orderkey", "o_orderstatus",
          "o_orderdate")
      val got = operators.Olap2.waitingSuppliers(li, ord)
        .select("l_orderkey", "waiting_supp")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === referenceWaiting(lines), s"seed $seed")
    }
  }

  test("edge regimes: single-supplier orders never wait; two late " +
      "suppliers cancel each other") {
    import spark.implicits._
    val ts = (late: Boolean) => if (late)
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    else java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val li = Seq(
      (1L, 10L, ts(true)), // order 1: single supplier, late → excluded
      (2L, 10L, ts(true)), (2L, 11L, ts(false)), // order 2: 10 waits
      (3L, 10L, ts(true)), (3L, 11L, ts(true)), // order 3: both late → none
      (4L, 10L, ts(false)), (4L, 11L, ts(false)) // order 4: nobody late
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val ord = (1L to 4L).map(o => (o, "F",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val got = operators.Olap2.waitingSuppliers(li, ord)
      .select("l_orderkey", "waiting_supp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 10L)))
  }
}
