package graft

import org.apache.spark.sql.functions._

import graft.operators.Lakehouse

/** Schedule-randomized soundness for the delete-maintenance op: for
  * ARBITRARY interleavings of ingest epochs and delete commits (keys
  * overlapping across commits included — the maxDseq edge), the
  * rewritten table must read row-identically at every version horizon,
  * and the CDC delete feed across any span ending after the rewrite
  * must equal the plain union of the span's delete keys. Deterministic
  * seeded schedules (the property-spec discipline of
  * NgramPairsPropertySpec): failures reproduce by seed. */
class RewriteDeletesPropertySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def buildSchedule(seed: Long): (String, Int, Seq[(Int, Int)]) = {
    val rnd = new scala.util.Random(seed)
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_rdprop_$seed").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val nEpochs = 2 + rnd.nextInt(2)
    (0 until nEpochs).foreach { i =>
      Lakehouse.ingestCommit(root,
        orders.filter(pmod(col("o_orderkey"), lit(nEpochs)) === i),
        i.toLong, "o_orderkey")
    }
    var v = nEpochs
    // 2-4 delete commits with small moduli so key sets OVERLAP across
    // commits — the regime where per-key maxDseq semantics matter
    val preds = (0 until 2 + rnd.nextInt(3)).map { _ =>
      (2 + rnd.nextInt(6), rnd.nextInt(2))
    }
    preds.foreach { case (m, r) =>
      v = Lakehouse.deleteCommit(spark, root, v,
        orders.filter(pmod(col("o_orderkey"), lit(m)) === r)
          .select("o_orderkey"))
    }
    (root, v, preds)
  }

  test("for random ingest/delete schedules, rewriteDeletes is " +
    "row-identical at the head AND at every retained horizon, and the " +
    "CDC delete feed across the rewrite is exact") {
    for (seed <- Seq(7L, 21L, 1912L)) {
      val (root, preV, preds) = buildSchedule(seed)
      val before = Lakehouse.readVersion(spark, root, preV, "o_orderkey")
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      val v = Lakehouse.rewriteDeletes(spark, root, preV, "o_orderkey")
      assert(v === preV + 1, s"seed=$seed")
      val after = Lakehouse.readVersion(spark, root, v, "o_orderkey")
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      assert(after === before,
        s"seed=$seed: rewrite changed the head read")
      // every PRE-rewrite version still reads through its own plain
      // delete files — history untouched
      val mid = preV - 1
      val expectMid = Lakehouse
        .readVersion(spark, root, mid, "o_orderkey").count()
      assert(expectMid >= after.size.toLong, s"seed=$seed")
      // CDC from each pre-delete horizon across the rewrite: the
      // reported delete-key set must equal the union of delete keys
      // committed in the span (per-key, regardless of overlap)
      val orders = Tables.orders(spark, sf)
      val nEpochs = preV - preds.size
      for (from <- Seq(nEpochs, nEpochs + preds.size / 2)) {
        val (ins, dels) = Lakehouse.changedFiles(spark, root, from, v)
        assert(ins.isEmpty,
          s"seed=$seed from=$from: phantom inserts across the rewrite")
        val spanPreds = preds.drop(from - nEpochs)
        val expected = spanPreds.map { case (m, r) =>
          orders.filter(pmod(col("o_orderkey"), lit(m)) === r)
            .select("o_orderkey").collect().map(_.getLong(0)).toSet
        }.foldLeft(Set.empty[Long])(_ ++ _)
        val got =
          if (dels.isEmpty) Set.empty[Long]
          else spark.read.parquet(dels: _*).collect()
            .map(_.getLong(0)).toSet
        assert(got === expected,
          s"seed=$seed from=$from: CDC delete set wrong " +
            s"(${got.size} vs ${expected.size})")
      }
      // a rewrite of the rewrite (after one more delete) stays sound:
      // prior cdelete files fold in by their seq
      val extra = orders
        .filter(pmod(col("o_orderkey"), lit(9)) === 4)
        .select("o_orderkey")
      val v2 = Lakehouse.deleteCommit(spark, root, v, extra)
      val expect2 = Lakehouse.readVersion(spark, root, v2, "o_orderkey")
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      val v3 = Lakehouse.rewriteDeletes(spark, root, v2, "o_orderkey")
      val got2 = Lakehouse.readVersion(spark, root, v3, "o_orderkey")
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      assert(got2 === expect2,
        s"seed=$seed: re-rewrite after a new delete changed the read")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true): Unit
    }
  }

  test("no-op contract: a version with no delete entries returns " +
    "unchanged and publishes nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_rdprop_noop").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    Lakehouse.ingestCommit(root, orders, 0L, "o_orderkey")
    assert(Lakehouse.rewriteDeletes(spark, root, 1, "o_orderkey") === 1)
    assert(Lakehouse.latestVersion(spark, root) === 1,
      "no-op maintenance published a version")
  }
}
