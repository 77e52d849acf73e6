package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-side mirror of the reference pipeline's four intents
  * (`dags/subscription_flow.py:192-246`, DAG wiring `:342-358`) as pure
  * DataFrame plan composition: Airflow keeps orchestrating in the north
  * star; here intent routing is Scala control flow (SURVEY.md §2.11), all
  * row transformation is Spark.
  *
  * Semantics preserved from the reference (with citations):
  *  - latest-active selection: status == "active", argmax start_date with
  *    FIRST-row tie-break (`:93-103`; Python max keeps the first maximal
  *    element — modeled by ordering on a stable input row index).
  *  - id allocation: max(ids ∪ {1000}) + 1 (`:214`).
  *  - payment classification: "Paid" iff price > 0 else "Free" (`:222`).
  *  - plan-date defaults "2025-01-01"/"2025-12-31" (`:220-221`).
  *  - change: overlay subscription_plan_id on the latest-active row
  *    (`:228-234`); cancel: overlay status = "inactive" (`:236-242`) —
  *    both as join + when/otherwise (J6), never in-place mutation.
  *  - unknown plan / no active subscription → error (`:108-109,178-179`).
  */
object SubscriptionFlow {

  final case class FlowResult(store: DataFrame, notifyRecord: DataFrame)

  private val SubCols = Seq("subscription_id", "user_id",
    "subscription_plan_id", "subscription_status", "start_date", "end_date",
    "payment_status")

  /** Latest active subscription rows for a user: filter + rank with the
    * reference's first-occurrence tie-break (`:93-103`). The input order
    * column `__ord` stands in for Python list order. */
  private def latestActive(subs: DataFrame, userId: Long): DataFrame = {
    val ordered = subs.withColumn("__ord", monotonically_increasing_id())
    val w = Window.partitionBy("user_id")
      .orderBy(col("start_date").desc, col("__ord").asc)
    ordered
      .filter(coalesce(col("user_id").cast("long"), lit(0L)) === userId &&
        col("subscription_status") === "active")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__ord")
  }

  /** `create` arm (`:213-226`): allocate id, build the new record from the
    * chosen plan, append, and return (new store, notify record). */
  def create(spark: SparkSession, plans: DataFrame, subs: DataFrame,
      userId: Long, selectedPlanName: String): FlowResult = {
    val chosen = plans
      .filter(col("subscription_plan_name") === selectedPlanName)
      .limit(1)
    require(!chosen.isEmpty, s"Plan '$selectedPlanName' not found") // :208-209
    // :214 is max(ids ∪ {1000}) + 1 — the 1000 floor applies even when the
    // table is non-empty (existing ids below 1000 still allocate 1001), so
    // the floor goes through greatest(), not just the empty-table coalesce.
    val newRow = subs
      .agg((greatest(coalesce(max(col("subscription_id")), lit(1000L)),
        lit(1000L)) + 1L)
        .as("subscription_id")) // :214
      .crossJoin(chosen)
      .select(
        col("subscription_id"),
        lit(userId).as("user_id"),
        col("subscription_plan_id"),
        lit("active").as("subscription_status"),
        coalesce(col("subscription_plan_start_date"), lit("2025-01-01"))
          .as("start_date"), // :220
        coalesce(col("subscription_plan_end_date"), lit("2025-12-31"))
          .as("end_date"), // :221
        when(col("subscription_price").cast("double") > 0d, "Paid")
          .otherwise("Free").as("payment_status")) // :222
    val store = subs.select(SubCols.map(col): _*)
      .unionByName(newRow.select(SubCols.map(col): _*)) // :224
    FlowResult(store, newRow)
  }

  /** `change` arm (`:228-234`): overlay the chosen plan id onto the user's
    * latest active subscription. */
  def change(spark: SparkSession, plans: DataFrame, subs: DataFrame,
      userId: Long, selectedPlanName: String): FlowResult = {
    val chosen = plans
      .filter(col("subscription_plan_name") === selectedPlanName)
      .limit(1)
    require(!chosen.isEmpty, s"Plan '$selectedPlanName' not found") // :178-179
    val target = latestActive(subs, userId)
    require(!target.isEmpty, s"No active subscription for user $userId") // :230-231
    val targetKeys = target.select(col("subscription_id").as("__target_id"))
    // The new plan id stays IN the plan (broadcast 1-row dim) rather than
    // being collected driver-side — the overlay composes lazily into any
    // downstream plan.
    val store = subs
      .join(broadcast(targetKeys),
        col("subscription_id") === col("__target_id"), "left")
      .crossJoin(broadcast(chosen
        .select(col("subscription_plan_id").as("__new_plan_id"))))
      .withColumn("subscription_plan_id",
        when(col("__target_id").isNotNull, col("__new_plan_id"))
          .otherwise(col("subscription_plan_id"))) // :232 overlay
      .drop("__target_id", "__new_plan_id")
    val notify = store
      .join(broadcast(targetKeys),
        col("subscription_id") === col("__target_id"), "left_semi")
    FlowResult(store, notify)
  }

  /** `cancel` arm (`:236-242`): overlay status="inactive" on the latest
    * active subscription. */
  def cancel(spark: SparkSession, plans: DataFrame, subs: DataFrame,
      userId: Long): FlowResult = {
    val target = latestActive(subs, userId)
    require(!target.isEmpty, s"No active subscription for user $userId") // :238-239
    val targetKeys = target.select(col("subscription_id").as("__target_id"))
    val store = subs
      .join(broadcast(targetKeys),
        col("subscription_id") === col("__target_id"), "left")
      .withColumn("subscription_status",
        when(col("__target_id").isNotNull, lit("inactive"))
          .otherwise(col("subscription_status"))) // :240 overlay
      .drop("__target_id")
    val notify = store
      .join(broadcast(targetKeys),
        col("subscription_id") === col("__target_id"), "left_semi")
    FlowResult(store, notify)
  }

  /** `view` (`:136-146`, graph edge `:352`): read-only — the store is
    * unchanged, notify is the latest active subscription. */
  def view(spark: SparkSession, plans: DataFrame, subs: DataFrame,
      userId: Long): FlowResult =
    FlowResult(subs, latestActive(subs, userId))

  /** Reference-faithful notify text (`dags/subscription_flow.py:256`,
    * proven by docs/screens/notify_logs.png): the result record rendered
    * exactly as Python's `json.dumps(res, indent=2)` under the `[NOTIFY]`
    * banner — ids as bare ints, strings quoted, two-space indent. Built as
    * one codegen'd concat so the sink text needs no driver-side
    * formatting; GoldenPipelineSpec byte-compares it against the
    * screenshot's record. */
  def notifyText(intent: String, record: DataFrame): DataFrame =
    record.select(concat(
      lit(s"[NOTIFY] Intent=$intent → Result:\n{\n"),
      lit("  \"subscription_id\": "),
      col("subscription_id").cast("string"), lit(",\n"),
      lit("  \"user_id\": "), col("user_id").cast("string"), lit(",\n"),
      lit("  \"subscription_plan_id\": "),
      col("subscription_plan_id").cast("string"), lit(",\n"),
      lit("  \"subscription_status\": \""),
      col("subscription_status"), lit("\",\n"),
      lit("  \"start_date\": \""), col("start_date"), lit("\",\n"),
      lit("  \"end_date\": \""), col("end_date"), lit("\",\n"),
      lit("  \"payment_status\": \""), col("payment_status"), lit("\"\n}"))
      .as("notify"))

  /** Intent router (`:69-76,258-267`): validates the enum (`:62-63`) and
    * dispatches — the BranchPythonOperator re-expressed as control flow. */
  def run(spark: SparkSession, intent: String, userId: Long,
      selectedPlanName: String, plans: DataFrame, subs: DataFrame)
      : FlowResult = intent match {
    case "create" => create(spark, plans, subs, userId, selectedPlanName)
    case "change" => change(spark, plans, subs, userId, selectedPlanName)
    case "cancel" => cancel(spark, plans, subs, userId)
    case "view" => view(spark, plans, subs, userId)
    case other =>
      throw new IllegalArgumentException(s"Invalid intent: $other") // :62-63
  }
}
