package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cost of widening the LR trainer's gradient accumulators from
  * SUM(LONG) (exact to ~9.2M docs, then silent wrap) to
  * SUM(DECIMAL(38,0)) (exact to ~1e26 docs): both variants run the
  * same 24-iteration GD loop over the same checkpointed features and
  * must produce BIT-IDENTICAL weight traces in the non-wrapping regime
  * — the probe asserts that, then reports the per-variant wall-clock.
  * The decimal add lives in the map-side partial aggregate of a
  * 5-column reduce, so the delta prices the whole per-iteration pass. */
object LrWidthProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = graft.operators.TextAnalysis
      .lrFeaturesForProbe(Tables.documents(spark, d)).localCheckpoint()
    val n = f.count().toDouble
    def lrZ(w: Array[Double]): Column =
      lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
    def train(decimal: Boolean): (Seq[Array[Double]], Double) = {
      var w = Array.fill(5)(0.0)
      val t0 = System.nanoTime()
      val trace = (1 to 24).map { _ =>
        val z = lrZ(w)
        val p = lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))
        val den = (lit(1.0) + abs(z)) * (lit(1.0) + abs(z))
        val contribs = Seq[Column]((p - col("y")) / den,
          ((p - col("y")) * col("x1")) / den,
          ((p - col("y")) * col("x2")) / den,
          ((p - col("y")) * col("x3")) / den,
          ((p - col("y")) * col("x4")) / den)
        val aggs = contribs.zipWithIndex.map { case (c, j) =>
          val q = floor(c * lit(1e12))
          sum(if (decimal) q.cast("decimal(38,0)") else q).as(s"g$j")
        }
        val r = f.agg(aggs.head, aggs.tail: _*).head()
        def g(j: Int): Double =
          if (decimal) r.getDecimal(j).doubleValue else r.getLong(j).toDouble
        w = w.indices.map(j => w(j) - 2.0 * ((g(j) / 1e12) / n)).toArray
        w
      }
      (trace, (System.nanoTime() - t0) / 1e9)
    }
    train(decimal = true) // warm
    val (traceL, tLong) = train(decimal = false)
    val (traceD, tDec) = train(decimal = true)
    val (traceD2, tDec2) = train(decimal = true)
    val (traceL2, tLong2) = train(decimal = false)
    require(traceL.flatten == traceD.flatten &&
      traceD.flatten == traceD2.flatten &&
      traceL.flatten == traceL2.flatten,
      "long and decimal accumulators diverged in the non-wrapping regime")
    val lMin = math.min(tLong, tLong2)
    val dMin = math.min(tDec, tDec2)
    println(f"n=$n%.0f docs, 24 iters: sum(long)=$lMin%6.2fs " +
      f"sum(decimal(38,0))=$dMin%6.2fs ratio=${dMin / lMin}%4.2fx " +
      "(traces bit-identical)")
    spark.stop()
  }
}
