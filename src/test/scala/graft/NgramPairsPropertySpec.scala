package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property test for the size-key equi-join candidate generation in
  * ngramJaccardPairs: on randomized corpora with planted near-dups, the
  * distributed result must equal a naive in-memory O(n²) scan — proving
  * the 5·min >= 4·max size-bucket emission loses no qualifying pair. */
class NgramPairsPropertySpec extends SparkSpec {

  private def bigrams(text: String): Set[String] = {
    val t = text.trim.split("\\s+")
    t.zip(t.tail).map { case (a, b) => s"$a $b" }.toSet
  }

  private def naivePairs(docs: Seq[(Long, String)]): Set[(Long, Long)] =
    (for {
      (ida, ta) <- docs; (idb, tb) <- docs
      if ida < idb
      sa = bigrams(ta); sb = bigrams(tb)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa intersect sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= 0.8
    } yield (ida, idb)).toSet

  test("equi-join candidate generation finds exactly the naive O(n²) pairs") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(2026)
    def doc(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def perturb(t: String): String = {
      val w = t.split(" ").toBuffer
      // light edit: change ~5% of tokens
      (1 to math.max(1, w.size / 20)).foreach { _ =>
        w(rnd.nextInt(w.size)) = vocab(rnd.nextInt(vocab.size))
      }
      w.mkString(" ")
    }
    val base = (0L until 40L).map(i => (i, doc(30 + rnd.nextInt(40))))
    // plant near-dups: copies and light perturbations of existing docs
    val planted = (0 until 15).map { i =>
      val (srcId, t) = base(rnd.nextInt(base.size))
      (100L + i, if (i % 3 == 0) t else perturb(t))
    }
    val docs = base ++ planted
    val expected = naivePairs(docs)
    val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "test corpus must contain near-dups")
  }
}
