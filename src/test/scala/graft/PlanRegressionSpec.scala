package graft

import org.apache.spark.sql.functions._

/** Locks in the physical-plan properties the 100 TB design depends on —
  * a regression guard against plan drift (e.g. a lost broadcast hint or a
  * filter that stops reaching the scan). */
class PlanRegressionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("dim join broadcasts the dimension (no fact shuffle)") {
    val p = plan("q_join_equi_inner")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("top-1 plans TakeOrderedAndProject, not a full sort") {
    val p = plan("q_sort_limit_top1")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("filters are pushed to the parquet scan") {
    val p = plan("q_filter_eq_and")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    assert(p.contains("EqualTo(o_orderstatus,O)"), p.take(800))
  }

  test("scans are column-pruned to the projected schema") {
    val p = plan("q_project_subset")
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("p_name") && readSchema.contains("p_partkey"),
      readSchema)
    // the unprojected columns must NOT be read
    assert(!readSchema.contains("p_retailprice") &&
      !readSchema.contains("p_brand"), readSchema)
  }

  test("grouped aggregation runs partial then final") {
    val p = plan("q_agg_groupby_sum")
    assert(p.contains("partial_sum"), p.take(800))
    assert(p.split("HashAggregate").length >= 3, p.take(800))
  }

  test("argmax-per-group uses the WindowGroupLimit top-k path") {
    val p = plan("q_argmax_per_group")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("near-dup similarity predicates stay inside join conditions") {
    val pj = plan("q_dedup_ngram_jaccard")
    assert(pj.contains("BroadcastHashJoin") &&
      pj.contains("sorted_long_intersect_count"), pj.take(900))
    val pe = plan("q_embed_near_dup")
    assert(pe.contains("BroadcastNestedLoopJoin") &&
      pe.contains("double_array_dot"), pe.take(900))
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti, not inner+distinct") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }
}
