package graft

import org.apache.spark.sql.functions._

/** Locks for the BPE training loop (TextAnalysis.bpeTrain /
  * q_bpe_encode) — iterative-fixpoint semantics DuckDB cannot oracle.
  */
class BpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bpeTrain learns the hand-computed merge sequence and stops when " +
      "every word is fully merged") {
    import spark.implicits._
    // vocabulary: "ab" ×4, "abc" ×3 → symbol table
    //   [a,b,</w>] ×4, [a,b,c,</w>] ×3
    // round 1: (a,b)=7 wins → ab
    // round 2: (ab,</w>)=4 beats (ab,c)=3 and (c,</w>)=3 → ab</w>
    // round 3: (ab,c)=3 ties (c,</w>)=3; tie-break pair asc → abc
    // round 4: (abc,</w>)=3 → abc</w>; then no pairs remain
    val words = Seq(("ab", 4L), ("abc", 3L)).toDF("word", "freq")
    val merges = operators.TextAnalysis.bpeTrain(words, rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.toSeq === Seq(
      (1, "a b", 7L), (2, "ab </w>", 4L), (3, "ab c", 3L),
      (4, "abc </w>", 3L)))
  }

  test("greedy left-to-right merge application is non-overlapping: " +
      "[a,a,a] under (a,a) yields [aa,a]") {
    import spark.implicits._
    // one word "aaa": pairs (a,a)=2 (adjacent occurrences, the Sennrich
    // get_stats convention), but application merges only the FIRST →
    // [aa,a,</w>]. Round 2 is a count tie between (aa,a) and (a,</w>);
    // the lexicographic tie-break picks (a,</w>) → [aa,a</w>]; round 3
    // merges the remaining pair.
    val words = Seq(("aaa", 1L)).toDF("word", "freq")
    val merges = operators.TextAnalysis.bpeTrain(words, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.toSeq === Seq(
      (1, "a a", 2L), (2, "a </w>", 1L), (3, "aa a</w>", 1L)))
  }

  test("q_bpe_encode on the fixture: 8 merges, monotone non-increasing " +
      "win counts, every merged pair concatenates its parts") {
    val rows = SparkEntry.queries("q_bpe_encode")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.length === 8)
    assert(rows.map(_._1).toSeq === (1 to 8))
    // each round's winner can't beat an earlier round's count: earlier
    // rounds saw a superset of merge opportunities... not strictly true in
    // general BPE (a merge can CREATE a more frequent pair), so assert the
    // weaker invariant that counts are positive and the trace is
    // deterministic across two runs.
    assert(rows.forall(_._3 > 0))
    val rows2 = SparkEntry.queries("q_bpe_encode")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows2.toSeq === rows.toSeq)
  }

  test("bpeTrainFull's encoded vocab: the toy corpus fully merges to " +
      "one symbol per word") {
    import spark.implicits._
    val words = Seq(("ab", 4L), ("abc", 3L)).toDF("word", "freq")
    val (_, syms) = operators.TextAnalysis.bpeTrainFull(words, rounds = 8)
    val m = syms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(m("ab") === Seq("ab</w>"))
    assert(m("abc") === Seq("abc</w>"))
  }

  test("q_bpe_apply invariants on the fixture: symbols bounded by " +
      "tokens and characters, totals conserve, rerun-deterministic") {
    val sfDocs = Tables.documents(spark, sf)
    val out = SparkEntry.queries("q_bpe_apply")(spark, sf)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every word encodes to between 1 and len(word)+1 symbols
    assert(rows.forall { case (_, t, s) => s >= t }, "symbols >= tokens")
    // total ws tokens across docs == corpus token count
    val corpusToks = sfDocs
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_._2).sum === corpusToks)
    // merges actually compress: fewer symbols than raw chars+1 per word
    val rawSyms = sfDocs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .select((length(col("w")) + 1).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_._3).sum < rawSyms,
      s"${rows.map(_._3).sum} vs raw $rawSyms")
    val rows2 = SparkEntry.queries("q_bpe_apply")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows2.toSeq === rows.toSeq)
  }

  test("batched BPE with batchCap=1 is exactly pure greedy") {
    import spark.implicits._
    val words = Seq(("ab", 4L), ("abc", 3L), ("bcd", 2L), ("dd", 5L))
      .toDF("word", "freq")
    val (g, gs) = operators.TextAnalysis.bpeTrainFull(words, rounds = 6)
    val (b, bs) = operators.TextAnalysis.bpeTrainBatched(words,
      totalMerges = 6, batchCap = 1)
    assert(b.map(x => (x._2, x._3)).toSeq ===
      g.map(x => (x._2, x._3)).toSeq)
    assert(bs.orderBy("word").collect().map(_.toSeq).toSeq ===
      gs.orderBy("word").collect().map(_.toSeq).toSeq)
  }

  test("batched BPE: deterministic, symbol-disjoint batches, and " +
      "compression within 10% of pure greedy at equal merge count") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val merges = 24
    val (b1, syms1) = operators.TextAnalysis.bpeTrainBatched(words,
      merges, batchCap = 8)
    val (b2, _) = operators.TextAnalysis.bpeTrainBatched(words,
      merges, batchCap = 8)
    assert(b1 === b2) // two builds learn the identical trace
    assert(b1.size === merges)
    // within every applied batch (same round index), symbols — incl.
    // merged outputs — are disjoint: the property that makes one-fold
    // application exact
    b1.groupBy(_._1).values.foreach { batch =>
      val symsOf = batch.flatMap { case (_, pair, _) =>
        val Array(a, b) = pair.split(" ", 2); Seq(a, b, a + b)
      }
      assert(symsOf.distinct.size === symsOf.size, batch.toString)
    }
    val (_, symsG) = operators.TextAnalysis.bpeTrainFull(words, merges)
    def totalSymbols(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(size(col("sym")) * col("freq"))).head().getLong(0)
    val tb = totalSymbols(syms1); val tg = totalSymbols(symsG)
    assert(tb <= tg * 1.10,
      s"batched compression $tb vs greedy $tg exceeds 10% gap")
  }

  test("q_bpe_encode_batched: 8 merges in 2 cap-4 rounds, " +
      "count-ordered within each batch, rerun-deterministic") {
    val rows = SparkEntry.queries("q_bpe_encode_batched")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.length === 8)
    assert(rows.map(_._1).toSeq === (1 to 8))
    // cap=4 → the 8 merges span exactly 2 batch rounds
    assert(rows.map(_._2).distinct.toSeq === Seq(1, 2))
    // within a batch, admission order is (count desc, pair asc)
    rows.groupBy(_._2).values.foreach { b =>
      val cnts = b.map(_._4).toSeq
      assert(cnts === cnts.sorted.reverse, b.toString)
    }
    val again = SparkEntry.queries("q_bpe_encode_batched")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("training-horizon prefix stability at realistic merge counts: " +
      "a 1000-merge run opens with the same rounds as a short run, and " +
      "its cap=1 prefix is exactly greedy") {
    // The BpeScaleProbe evidence (SCALE §11c) runs 1,000 merges at
    // cap=64 over the Zipf corpus; this pins the semantic side on the
    // live corpus: (a) the merge horizon cannot change what is learned
    // first — the long run's opening rounds equal the short run's
    // (each round is a pure function of the current symbol table);
    // (b) the long-run trainer degenerated to cap=1 opens with exactly
    // the greedy trace (the declared-oracle equivalence, held at depth).
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val (long, _) = operators.TextAnalysis.bpeTrainBatched(words,
      totalMerges = 64, batchCap = 8)
    val (short, _) = operators.TextAnalysis.bpeTrainBatched(words,
      totalMerges = 16, batchCap = 8)
    assert(long.take(short.size) === short,
      "merge horizon changed the opening rounds")
    val (cap1, _) = operators.TextAnalysis.bpeTrainBatched(words,
      totalMerges = 16, batchCap = 1)
    val (greedy, _) = operators.TextAnalysis.bpeTrainFull(words, 16)
    assert(cap1.map(x => (x._2, x._3)).toSeq ===
      greedy.map(x => (x._2, x._3)).toSeq)
  }

  test("rollup reuse: monthly answer from the daily rollup is " +
      "bit-identical to the direct fact scan") {
    val fromRollup = SparkEntry.queries("q_rollup_reuse")(spark, sf)
      .collect().toSeq
    val one = lit(1).cast("decimal(4,2)")
    val disc = col("l_extendedprice").cast("decimal(12,2)") *
      (one - col("l_discount").cast("decimal(4,2)"))
    val direct = Tables.lineitem(spark, sf)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
        sum(disc).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("month", "l_returnflag")
      .collect().toSeq
    assert(fromRollup === direct)
    assert(fromRollup.nonEmpty)
  }
}
