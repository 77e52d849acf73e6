package graft

import org.apache.spark.sql.functions._

import graft.operators.Entity

/** Blocked fuzzy-join correctness: the neighborhood blocking must be
  * COMPLETE for levenshtein ≤ 1 (equal to the brute-force cross join on
  * a corpus exercising substitution, insertion, deletion, and unrelated
  * names), and the plan must not contain a cartesian product. */
class EntitySpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha"), (2L, "alpga"),   // substitution
      (3L, "alph"),                   // deletion of 1
      (4L, "alphax"),                 // insertion on 1
      (5L, "beta"), (6L, "beta"),     // exact duplicate
      (7L, "gamma"),                  // unrelated
      (8L, "bexta")                   // dist 1 from beta (insertion)
    ).toDF("id", "name")
  }

  test("blocked pairs equal the brute-force levenshtein join") {
    val blocked = Entity.fuzzyPairs(corpus, 1)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = corpus.select(col("id").as("idb"), col("name").as("nb"))
    val brute = corpus.join(n, col("id") < col("idb") &&
        levenshtein(col("name"), col("nb")) <= 1)
      .select("id", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === brute)
    // sanity: the corpus exercises all three edit kinds + a dup
    assert(brute.contains((1L, 2L)))  // substitution
    assert(brute.contains((1L, 3L)))  // deletion
    assert(brute.contains((1L, 4L)))  // insertion
    assert(brute.contains((5L, 6L)))  // exact dup (dist 0)
    assert(brute.contains((5L, 8L)) && brute.contains((6L, 8L)))
    assert(!brute.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("candidate generation is an equi-join, never a cartesian") {
    val plan = Entity.fuzzyPairs(corpus, 1).queryExecution.executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"),
      s"fuzzy join planned a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join planned a nested loop:\n$plan")
  }

  test("declared query finds the one-digit supplier typo neighborhood") {
    val out = operators.Entity.qFuzzyJoin(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // all reported pairs really are within distance 1, ordered
    assert(rows.forall(_.getAs[Int]("dist") <= 1))
    assert(rows.forall(r => r.getAs[Long]("s_a") < r.getAs[Long]("s_b")))
  }
}
