package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Lakehouse

/** Bloom file-skipping at a few hundred files (VERDICT r11 item 1):
  * the point-lookup read's PLANNING step probes one fixed-size bloom
  * sidecar per data file. Round 12 moved the probe executor-side —
  * the driver now collects only (path, hit) strings, never the
  * serialized filters — so the probe prices exactly that: total
  * sidecar bytes on disk (the payload the OLD driver-side probe
  * collected per lookup) vs the planning rows collected now, plus the
  * end-to-end lookup wall for a present and an absent key, at 64 /
  * 256 / 512 files. The lookup wall should stay flat-ish (the probe
  * job is one small parquet scan regardless of file count; the data
  * scan reads ~1 file either way). */
object BloomSkipProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .localCheckpoint()
    for (files <- Seq(64, 256, 512)) {
      val root = s"${sys.props("java.io.tmpdir")}/graft_bloomskip_$files"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      base.repartition(files, col("o_custkey"))
        .write.mode("overwrite").parquet(s"$root/data/w=1")
      Lakehouse.writeBloomStats(spark, root, "data/w=1", "o_custkey")
      Lakehouse.publishVersion(spark, root, 1, Seq.empty,
        Lakehouse.listDataFiles(spark, root, s"$root/data/w=1")
          .map(("data", _, 1)))
      val sidecarBytes = {
        val it = fs.listFiles(
          new org.apache.hadoop.fs.Path(s"$root/_blooms"), true)
        var b = 0L
        while (it.hasNext) b += it.next().getLen
        b
      }
      def lookup(v: Long): Double = {
        def run() = time {
          Lakehouse.readVersionBloomLookup(
            spark, root, 1, "o_orderkey", "o_custkey", v).count()
        }._2
        run(); math.min(run(), run())
      }
      val tHit = lookup(7L)
      val tMiss = lookup(99999999L)
      println(f"files=$files%-4d sidecarOnDisk=${sidecarBytes / 1024}%7d KB " +
        f"(= old per-lookup driver payload; now ${files * 40}%7d B of " +
        f"planning rows)  lookupHit=$tHit%5.2fs lookupMiss=$tMiss%5.2fs")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    spark.stop()
  }
}
