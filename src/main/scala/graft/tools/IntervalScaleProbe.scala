package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Interval-overlap join: bucketed exactly-once equi-join vs the naive
  * inequality join (which Spark plans as BroadcastNestedLoop — every
  * left row against every right row). Synthetic day-line intervals with
  * density held constant (span grows with n, window count m = n/10), so
  * the OUTPUT stays ~proportional to m while the naive predicate-eval
  * count grows as n·m — the quadratic the bucketing exists to kill.
  * Naive is measured only while it is measurable; the bucketed path is
  * swept a decade further. */
object IntervalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](f: => T): (T, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def intervals(n: Long, salt: Int, maxLen: Int, span: Long) = {
      val a0 = pmod(col("id") * 2654435761L + salt, lit(span))
      spark.range(n).select(col("id"),
          a0.as("x0"),
          (a0 + pmod(col("id") * 40503L + salt * 7, lit(maxLen + 1)))
            .as("x1"))
        .localCheckpoint()
    }
    println("== interval-overlap: bucketed vs nested-loop, density-held ==")
    for (n <- Seq(30000L, 100000L, 300000L, 1000000L, 3000000L)) {
      val span = n // one interval start per day on average
      val m = n / 10
      val l = intervals(n, 1, 40, span)
        .withColumnRenamed("x0", "a0").withColumnRenamed("x1", "a1")
        .withColumnRenamed("id", "lid")
      val r = intervals(m, 99, 14, span)
        .withColumnRenamed("x0", "b0").withColumnRenamed("x1", "b1")
        .withColumnRenamed("id", "rid")
      val (nb, tB) = time {
        Temporal.intervalOverlapPairs(l, "a0", "a1", r, "b0", "b1", 16)
          .count()
      }
      // best-of-two for the bucketed path (first pays codegen)
      val (_, tB2) = time {
        Temporal.intervalOverlapPairs(l, "a0", "a1", r, "b0", "b1", 16)
          .count()
      }
      def naiveRun() = time {
        l.crossJoin(r)
          .filter(col("a0") <= col("b1") && col("b0") <= col("a1"))
          .count()
      }
      val naive = if (n <= 300000L) {
        val (nn, t1) = naiveRun()
        val (_, t2) = naiveRun() // best-of-two: first run pays codegen
        require(nn == nb, s"pair sets diverge: naive $nn vs bucketed $nb")
        f"naive=${math.min(t1, t2)}%7.2fs (equal pairs)"
      } else if (n <= 1000000L) {
        val (nn, t1) = naiveRun() // single shot — already minutes-scale
        require(nn == nb, s"pair sets diverge: naive $nn vs bucketed $nb")
        f"naive=$t1%7.2fs (equal pairs, single shot)"
      } else "naive=skipped (n·m beyond measurable)"
      println(f"n=$n%8d m=$m%7d pairs=$nb%9d " +
        f"bucketed=${math.min(tB, tB2)}%6.2fs $naive")
    }
    spark.stop()
  }
}
