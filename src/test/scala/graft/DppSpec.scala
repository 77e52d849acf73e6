package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dynamic partition pruning on the day-partitioned events layout
  * (VERDICT r7 item 3) — the partitioned-layout complement of
  * BloomRuntimeFilterSpec: q_join_dpp's fact scan must carry a
  * DynamicPruningExpression in its PartitionFilters and actually read
  * FEWER partitions than the layout holds, with results identical to
  * the pruning-disabled run (DPP is execution-layer only).
  */
class DppSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    collectFileScans(p)

  /** Run q_join_dpp, return (rows, executed plan string, partitions
    * actually read by the day-partitioned fact scan). */
  private def run(): (Seq[String], String, Long) = {
    val df: DataFrame = SparkEntry.queries("q_join_dpp")(spark, sf)
    val rows = df.collect().map(_.toString).toSeq
    val plan = df.queryExecution.executedPlan
    val factScans = scans(plan)
      .filter(_.relation.partitionSchema.fieldNames.contains("day"))
    assert(factScans.nonEmpty, plan.toString.take(1200))
    (rows, plan.toString, factScans.map(_.metrics("numPartitions").value).sum)
  }

  test("q_join_dpp: fact scan carries DynamicPruningExpression and reads " +
      "only the dim-selected partitions; results identical without DPP") {
    val (rows, plan, partsRead) = run()
    assert(plan.contains("dynamicpruning"),
      plan.linesIterator.filter(_.contains("PartitionFilters"))
        .mkString("\n"))
    // the dim picks the even-count days at runtime — strictly fewer than
    // the layout's full day count (sanity-checked below), so a correct
    // DPP run cannot have opened every partition
    val allDays = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd"))
      .distinct().count()
    val pickedDays = rows.size.toLong
    assert(pickedDays > 0 && pickedDays < allDays,
      s"degenerate fixture: $pickedDays of $allDays days picked — the " +
        "even-count filter must select a strict subset for this spec")
    assert(partsRead === pickedDays,
      s"DPP scan read $partsRead partitions, dim selected $pickedDays")
    // pruning off: same rows, full layout read
    val prev = spark.conf
      .get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try {
      spark.conf
        .set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
      val (rowsOff, planOff, partsOff) = run()
      assert(!planOff.contains("dynamicpruning"))
      assert(partsOff === allDays,
        s"non-DPP scan read $partsOff of $allDays partitions")
      assert(rowsOff === rows)
    } finally spark.conf
      .set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
  }
}
