package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Reliable checkpointing for the distributed CC loop (VERDICT r7 item
  * 8): `localCheckpoint` dies with the session's executors, so a cluster
  * run sets `graft.cc.checkpointDir` and every round cut goes to durable
  * storage instead. This spec forces the distributed pointer-jumping
  * path with reliable checkpointing on and asserts (1) labels identical
  * to the default-mode run, (2) round artifacts actually landed under
  * the configured directory.
  */
class CcCheckpointSpec extends SparkSpec {

  test("distributed CC with graft.cc.checkpointDir produces identical " +
      "labels and writes durable round artifacts") {
    import spark.implicits._
    // a path-shaped graph (needs real pointer-jumping rounds) plus
    // disjoint cliques
    val pairs = ((1L to 400L).sliding(2).map(w => (w.head, w.last)).toSeq ++
      Seq((1000L, 1001L), (1001L, 1002L), (2000L, 2001L)))
      .toDF("doc_a", "doc_b")
    val expected = Dedup.connectedComponents(pairs, localMaxPairs = 0L)
      .collect().map(_.toSeq).toSeq
    assert(Dedup.lastCcPath === "distributed")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cc_ckpt").toString
    try {
      spark.conf.set("graft.cc.checkpointDir", dir)
      val rows = Dedup.connectedComponents(pairs, localMaxPairs = 0L)
        .collect().map(_.toSeq).toSeq
      assert(Dedup.lastCcPath === "distributed")
      assert(rows === expected)
      // durable evidence: the reliable checkpoints landed under dir
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      val landed = files(new java.io.File(dir)).filter(_.isFile)
      assert(landed.nonEmpty, s"no checkpoint files under $dir")
    } finally spark.conf.unset("graft.cc.checkpointDir")
  }
}
