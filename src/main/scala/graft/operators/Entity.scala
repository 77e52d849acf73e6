package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Entity resolution: the blocked fuzzy (edit-distance) self-join — the
  * record-linkage staple that a naive implementation writes as a
  * corpus × corpus cross join with a levenshtein predicate, which is the
  * canonical 100 TB scale-killer (Spark would plan exactly that cartesian
  * from `a.join(b, levenshtein(...) <= 1)`).
  *
  * The scale-safe composition is NEIGHBORHOOD BLOCKING: every record
  * emits O(L) deterministic keys — the name itself, each single-character
  * DELETION, and each single-position SUBSTITUTION wildcard — such that
  * any two names within levenshtein distance 1 MUST share at least one
  * key (equal names share the identity key; a substitution pair shares
  * the wildcard at the differing position; an insert/delete pair shares
  * the longer side's deletion key = the shorter side's identity key).
  * Candidate generation is then a plain equi-join on the key — a hash
  * shuffle, never a cartesian — and every candidate is verified with the
  * exact levenshtein predicate, so the result EQUALS the brute-force
  * join (the oracle replays the same blocking in SQL; false candidates
  * from colliding deletion keys are killed by the verify, never
  * surfaced).
  *
  * Scale notes: key volume is L+1 deletion + L substitution keys per
  * record — linear in corpus × name length. Bucket width per
  * substitution key is bounded by the alphabet (≤|Σ| names share
  * `Supplier#0000001*`); the hot-bucket hazard is EXACT-DUPLICATE names
  * piling on one identity key, which degrades to the same
  * star-candidate cap as Dedup.HotBucketCap if a corpus needs it. */
object Entity {

  private def sub(name: Column, i: Column, marker: String): Column =
    concat(name.substr(lit(1), i - 1), lit(marker),
      name.substr(i + 1, length(name)))

  /** (id, name, key) — identity, deletion and substitution keys. */
  def blockingKeys(records: DataFrame): DataFrame = {
    val pos = records.select(col("id"), col("name"),
      explode(sequence(lit(1), length(col("name")))).as("i"))
    records.select(col("id"), col("name"), col("name").as("key"))
      .unionByName(pos.select(col("id"), col("name"),
        sub(col("name"), col("i"), "*").as("key")))
      .unionByName(pos.select(col("id"), col("name"),
        sub(col("name"), col("i"), "").as("key")))
  }

  /** All pairs with levenshtein(name_a, name_b) ≤ maxDist (=1): blocked
    * candidates, deduped, then exact-verified. */
  def fuzzyPairs(records: DataFrame, maxDist: Int): DataFrame = {
    // The blocking keys (identity / one-char deletion / one-char
    // substitution) are COMPLETE only for edit distance ≤ 1: a pair at
    // distance 2 need not share any key, so a larger maxDist would
    // silently drop pairs while still looking exact-verified.
    require(maxDist <= 1,
      s"fuzzyPairs: blocking is complete only for maxDist <= 1 " +
        s"(got $maxDist); wider distances need k-deletion blocking")
    val k = blockingKeys(records)
    val a = k.select(col("id").as("ida"), col("name").as("na"), col("key"))
    val b = k.select(col("id").as("idb"), col("name").as("nb"),
      col("key").as("kb"))
    a.join(b, col("key") === col("kb") && col("ida") < col("idb"))
      .select("ida", "na", "idb", "nb").distinct()
      .withColumn("dist", levenshtein(col("na"), col("nb")))
      .filter(col("dist") <= maxDist)
  }

  /** Near-identical supplier names (one-digit typos in this fixture). */
  val qFuzzyJoin: (SparkSession, String) => DataFrame = (s, d) =>
    fuzzyPairs(Tables.supplier(s, d)
        .select(col("s_suppkey").as("id"), col("s_name").as("name")), 1)
      .select(col("ida").as("s_a"), col("idb").as("s_b"), col("dist"))
      .orderBy("s_a", "s_b")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_fuzzy_join", qFuzzyJoin, Some(
      "WITH s AS (SELECT s_suppkey AS id, s_name AS name FROM supplier), " +
        "pos AS (SELECT id, name, CAST(UNNEST(range(1, length(name) + 1)) AS INT) AS i FROM s), " +
        "keys AS (SELECT id, name, name AS key FROM s " +
        "UNION ALL SELECT id, name, substr(name, 1, i - 1) || '*' || substr(name, i + 1) FROM pos " +
        "UNION ALL SELECT id, name, substr(name, 1, i - 1) || substr(name, i + 1) FROM pos), " +
        "cand AS (SELECT DISTINCT a.id AS ida, a.name AS na, b.id AS idb, b.name AS nb " +
        "FROM keys a JOIN keys b ON a.key = b.key AND a.id < b.id) " +
        "SELECT ida AS s_a, idb AS s_b, CAST(levenshtein(na, nb) AS INT) AS dist " +
        "FROM cand WHERE levenshtein(na, nb) <= 1 ORDER BY s_a, s_b"))
  )
}
