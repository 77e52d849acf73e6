package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{SubscriptionFlow, TextAnalysis}
import graft.sources.Sources

/** Full reference-DAG simulation including persistence: scan the JSON
  * store, run the flow, rewrite the store, read it back — the complete
  * create path of dags/subscription_flow.py, golden-checked. */
class GoldenPipelineSpec extends SparkSpec {

  private val subsSchema = StructType(Seq(
    StructField("subscription_id", LongType),
    StructField("user_id", LongType),
    StructField("subscription_plan_id", LongType),
    StructField("subscription_status", StringType),
    StructField("start_date", StringType),
    StructField("end_date", StringType),
    StructField("payment_status", StringType)))

  test("create intent end-to-end through the JSON store") {
    val dir = Files.createTempDirectory("graft_golden").toString
    // seed the store in the reference's format (S2 write, then the flow)
    Sources.writeJsonTable(subsFixture, s"$dir/subs")
    val store0 = Sources.readJsonLines(spark, s"$dir/subs", subsSchema)
    val r = SubscriptionFlow.run(spark, "create", 101L, "Pro",
      plansFixture, store0)
    Sources.writeJsonTable(r.store, s"$dir/subs2")
    val store1 = Sources.readJsonLines(spark, s"$dir/subs2", subsSchema)
    assert(store1.count() === 3)
    val created = store1.filter(col("subscription_id") === 1003L).head()
    assert(created.getAs[Long]("user_id") === 101L)
    assert(created.getAs[Long]("subscription_plan_id") === 2L)
    assert(created.getAs[String]("payment_status") === "Paid")
    // Follow-up cancel against the REWRITTEN store: 1001 and the new 1003
    // TIE on start_date (both "2025-01-01"), and the reference's Python
    // max keeps the FIRST maximal element in file order (ref :102) — so
    // cancel hits 1001, not the newer 1003. The engine reproduces that
    // quirk exactly (store order survives the JSON rewrite).
    val r2 = SubscriptionFlow.run(spark, "cancel", 101L, "", plansFixture,
      store1)
    val byId = r2.store.collect().map(x =>
      x.getAs[Long]("subscription_id") ->
        x.getAs[String]("subscription_status")).toMap
    assert(byId(1001L) === "inactive")
    assert(byId(1003L) === "active")
  }

  test("notify text byte-matches the reference's notify_logs.png record") {
    // docs/screens/notify_logs.png, create intent on the seed store:
    // json.dumps(new_sub, indent=2) under the [NOTIFY] banner.
    val r = SubscriptionFlow.run(spark, "create", 101L, "Pro",
      plansFixture, subsFixture)
    val txt = SubscriptionFlow.notifyText("create", r.notifyRecord)
      .head().getString(0)
    val golden =
      "[NOTIFY] Intent=create → Result:\n" +
        "{\n" +
        "  \"subscription_id\": 1003,\n" +
        "  \"user_id\": 101,\n" +
        "  \"subscription_plan_id\": 2,\n" +
        "  \"subscription_status\": \"active\",\n" +
        "  \"start_date\": \"2025-01-01\",\n" +
        "  \"end_date\": \"2025-12-31\",\n" +
        "  \"payment_status\": \"Paid\"\n" +
        "}"
    assert(txt === golden)
  }

  test("reference plan display strings render JSON ints without decimals") {
    import spark.implicits._
    // `Pro - $29`, not `Pro - $29.00` (dags/subscription_flow.py:88-91)
    val out = plansFixture
      .select(col("subscription_plan_id").as("p_partkey"),
        col("subscription_plan_name").as("p_name"),
        col("subscription_price").as("p_retailprice"))
      .select(
        when(col("p_retailprice") === floor(col("p_retailprice")),
          format_string("%s - $%d", col("p_name"),
            col("p_retailprice").cast("long")))
          .otherwise(format_string("%s - $%.2f", col("p_name"),
            col("p_retailprice"))).as("display"))
      .orderBy("display").as[String].collect()
    assert(out.toSeq === Seq("Free - $0", "Pro - $29", "Team - $99"))
  }

  test("withTextFeatures annotates any text frame in one pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "der schnelle braune fuchs und der faule hund"),
      (3L, "xyzzy"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.withTextFeatures(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("lang_pred") === "en")
    assert(out(1).getAs[String]("lang_pred") === "de")
    assert(out(2).getAs[String]("lang_pred") === "und")
    assert(out(0).getAs[Int]("n_tokens") === 8)
    assert(out.forall(_.getAs[String]("fingerprint").length === 32))
    assert(out(0).getAs[Double]("quality") > out(2).getAs[Double]("quality"))
  }
}
