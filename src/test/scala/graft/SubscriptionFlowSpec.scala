package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.SubscriptionFlow

/** Golden end-to-end + semantics-trap tests for the reference flow mirror
  * (SURVEY.md §5.2-5.3; reference citations in SubscriptionFlow.scala). */
class SubscriptionFlowSpec extends SparkSpec {

  test("golden create: reproduces the notify_logs.png record") {
    // docs/screens/notify_logs.png: create intent, defaults user 101 / Pro
    val r = SubscriptionFlow.run(spark, "create", 101L, "Pro",
      plansFixture, subsFixture)
    val row = r.notifyRecord.head()
    assert(row.getAs[Long]("subscription_id") === 1003L)
    assert(row.getAs[Long]("user_id") === 101L)
    assert(row.getAs[Long]("subscription_plan_id") === 2L)
    assert(row.getAs[String]("subscription_status") === "active")
    assert(row.getAs[String]("start_date") === "2025-01-01")
    assert(row.getAs[String]("end_date") === "2025-12-31")
    assert(row.getAs[String]("payment_status") === "Paid")
    assert(r.store.count() === 3)
  }

  test("create on empty store allocates id 1001 (ref :214 default)") {
    val empty = subsFixture.filter(lit(false))
    val r = SubscriptionFlow.run(spark, "create", 7L, "Free", plansFixture,
      empty)
    assert(r.notifyRecord.head().getAs[Long]("subscription_id") === 1001L)
  }

  test("create with existing ids below 1000 still floors at 1001 (ref :214)") {
    // max(ids ∪ {1000}) + 1: the floor applies to NON-empty tables too —
    // with max id 10 the reference allocates 1001, not 11.
    import spark.implicits._
    val lowIds = Seq(
      (10L, 101L, 1L, "active", "2025-01-01", "2025-12-31",
        Option.empty[String]))
      .toDF("subscription_id", "user_id", "subscription_plan_id",
        "subscription_status", "start_date", "end_date", "payment_status")
    val r = SubscriptionFlow.run(spark, "create", 7L, "Pro", plansFixture,
      lowIds)
    assert(r.notifyRecord.head().getAs[Long]("subscription_id") === 1001L)
  }

  test("create of a zero-price plan is Free (ref :222 boundary)") {
    val r = SubscriptionFlow.run(spark, "create", 101L, "Free",
      plansFixture, subsFixture)
    assert(r.notifyRecord.head().getAs[String]("payment_status") === "Free")
  }

  test("create with unknown plan errors (ref :208-209)") {
    assertThrows[IllegalArgumentException] {
      SubscriptionFlow.run(spark, "create", 101L, "Platinum", plansFixture,
        subsFixture)
    }
  }

  test("invalid intent errors (ref :62-63)") {
    assertThrows[IllegalArgumentException] {
      SubscriptionFlow.run(spark, "upgrade", 101L, "Pro", plansFixture,
        subsFixture)
    }
  }

  test("change overlays plan id on exactly the latest active row (ref :228-234)") {
    val r = SubscriptionFlow.run(spark, "change", 101L, "Team",
      plansFixture, subsFixture)
    val store = r.store.orderBy("subscription_id").collect()
    assert(store.length === 2)
    assert(store(0).getAs[Long]("subscription_plan_id") === 3L) // changed
    assert(store(1).getAs[Long]("subscription_plan_id") === 2L) // untouched
  }

  test("cancel overlays status=inactive on the latest active row (ref :236-242)") {
    val r = SubscriptionFlow.run(spark, "cancel", 102L, "", plansFixture,
      subsFixture)
    val byId = r.store.collect().map(x =>
      x.getAs[Long]("subscription_id") -> x.getAs[String]("subscription_status"))
      .toMap
    assert(byId(1002L) === "inactive")
    assert(byId(1001L) === "active")
  }

  test("cancel with no active subscription errors (ref :108-109,238-239)") {
    val inactiveOnly = subsFixture
      .withColumn("subscription_status", lit("inactive"))
    assertThrows[IllegalArgumentException] {
      SubscriptionFlow.run(spark, "cancel", 101L, "", plansFixture,
        inactiveOnly)
    }
  }

  test("view leaves the store untouched and notifies latest active") {
    val r = SubscriptionFlow.run(spark, "view", 102L, "", plansFixture,
      subsFixture)
    assert(r.store.count() === 2)
    assert(r.notifyRecord.head().getAs[Long]("subscription_id") === 1002L)
  }

  test("latest-active tie on start_date keeps the FIRST row (ref :102)") {
    import spark.implicits._
    // two active rows, same user, same start_date — Python max keeps the
    // first maximal element (file order)
    val tied = Seq(
      (2001L, 7L, 1L, "active", "2025-03-01", "2025-12-31",
        Option.empty[String]),
      (2002L, 7L, 2L, "active", "2025-03-01", "2025-12-31",
        Option.empty[String]))
      .toDF("subscription_id", "user_id", "subscription_plan_id",
        "subscription_status", "start_date", "end_date", "payment_status")
    val r = SubscriptionFlow.run(spark, "view", 7L, "", plansFixture, tied)
    assert(r.notifyRecord.head().getAs[Long]("subscription_id") === 2001L)
  }

  test("missing user_id is treated as 0, not null (ref :97)") {
    import spark.implicits._
    val withNullUser = Seq(
      (3001L, Option.empty[Long], 1L, "active", "2025-01-01",
        "2025-12-31", Option.empty[String]))
      .toDF("subscription_id", "user_id", "subscription_plan_id",
        "subscription_status", "start_date", "end_date", "payment_status")
    val r = SubscriptionFlow.run(spark, "view", 0L, "", plansFixture,
      withNullUser)
    assert(r.notifyRecord.count() === 1) // null user_id matches lookup of 0
  }
}
