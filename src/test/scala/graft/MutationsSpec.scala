package graft

import org.apache.spark.sql.functions._

import graft.functions.ScalePatterns
import graft.sources.Sources

/** upsertByKey (the scale form of the reference's store rewrite) and the
  * partitioned sink layout. */
class MutationsSpec extends SparkSpec {

  test("upsertByKey replaces matched keys and appends new ones") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "B2", 21.0), (9L, "new", 90.0))
      .toDF("id", "name", "v")
    val out = ScalePatterns.upsertByKey(base, updates, "id")
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 9L))
    assert(out(1).getString(1) === "B2" && out(1).getDouble(2) === 21.0)
    assert(out(0).getString(1) === "a")
    assert(out(3).getString(1) === "new")
  }

  test("upsertByKey replaces matched rows WHOLE, including NULL columns") {
    // Delta MERGE matched-update semantics: an update row with a NULL
    // value must overwrite the base value with NULL, not keep the stale
    // base value (a per-column coalesce would).
    import spark.implicits._
    val base = Seq((1L, Option("keepme"), 10.0)).toDF("id", "name", "v")
    val updates = Seq((1L, Option.empty[String], 11.0))
      .toDF("id", "name", "v")
    val out = ScalePatterns.upsertByKey(base, updates, "id").collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(1), "NULL in the update row must win")
    assert(out(0).getDouble(2) === 11.0)
  }

  test("upsertByKey mirrors the reference cancel overlay (golden store)") {
    // cancel user 102 == upsert of the overlaid row (ref :236-242)
    val updates = subsFixture
      .filter(col("subscription_id") === 1002L)
      .withColumn("subscription_status", lit("inactive"))
    val out = ScalePatterns.upsertByKey(subsFixture, updates,
      "subscription_id")
    val flow = graft.operators.SubscriptionFlow
      .run(spark, "cancel", 102L, "", plansFixture, subsFixture).store
    assert(out.orderBy("subscription_id").collect().toSeq ===
      flow.orderBy("subscription_id").collect().toSeq)
  }

  test("partitioned sink lays out hive-style dirs and reads back pruned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_part").toString + "/docs"
    Sources.writePartitioned(
      Tables.documents(spark, "/root/testdata/sf0.001"), dir, "lang")
    val langs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(langs.forall(_.startsWith("lang=")))
    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    val p = en.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p.take(700))
    assert(en.count() ===
      Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(col("lang") === "en").count())
  }
}
