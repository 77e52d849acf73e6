package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Lakehouse

/** Versioned-table operation costs across table decades: which commits
  * are metadata and which are data-sized. The orders table is replicated
  * k× (key-offset copies), the four-commit history is built, then the
  * two claims are measured directly:
  *   - a key-list DELETE commit (keys known upstream, the CDC shape) —
  *     writes the key file + manifest only, so its wall must stay FLAT
  *     as the table grows;
  *   - the CDC read between versions (manifest diff → only added files)
  *     vs the snapshot-diff alternative (read both versions, except) —
  *     the former scales with the CHANGE, the latter with the table.
  * Compaction is the one deliberately data-sized op — reported to show
  * the contrast, not to defend it. */
object LakehouseScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](f: => T): (T, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .localCheckpoint()
    val baseN = base.count()
    println(s"== versioned-table ops across decades (base=$baseN rows) ==")
    for (k <- Seq(1, 4, 16, 64)) {
      val big = (0 until k).map(i => base.withColumn("o_orderkey",
          col("o_orderkey") + lit(i.toLong * 100000000L)))
        .reduce(_.unionAll(_)).localCheckpoint()
      val n = big.count()
      val root = s"${sys.props("java.io.tmpdir")}/graft_lh_probe_$k"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      // v1: full load (data-sized, the one-time landing)
      val (_, tLoad) = time {
        big.repartition(32, col("o_orderkey"))
          .write.mode("overwrite").parquet(s"$root/data/w=1")
        Lakehouse.commitVersion(spark, root, 1,
          Lakehouse.listDataFiles(spark, root, s"$root/data/w=1")
            .map(("data", _, 1)))
      }
      // v2: key-list delete commit — 1000 keys KNOWN upstream (CDC/GDPR
      // shape): write the key file + manifest, touch no data
      val keys = (0L until 1000L).map(i => i * 32L + 1L).toDF("o_orderkey")
        .localCheckpoint()
      val (_, tDel) = time {
        keys.coalesce(1).write.mode("overwrite")
          .parquet(s"$root/deletes/w=2")
        Lakehouse.commitVersion(spark, root, 2,
          Lakehouse.manifestEntries(spark, root, 1) ++
            Lakehouse.listDataFiles(spark, root, s"$root/deletes/w=2")
              .map(("delete", _, 2)))
      }
      // v3: a small append (the daily-increment shape)
      val (_, tApp) = time {
        base.limit(5000).withColumn("o_orderkey",
            col("o_orderkey") + lit(900000000000L))
          .repartition(2, col("o_orderkey"))
          .write.mode("overwrite").parquet(s"$root/data/w=3")
        Lakehouse.commitVersion(spark, root, 3,
          Lakehouse.manifestEntries(spark, root, 2) ++
            Lakehouse.listDataFiles(spark, root, s"$root/data/w=3")
              .map(("data", _, 3)))
      }
      // CDC v2→v3 (manifest diff, reads only w=3) vs snapshot diff
      val (cdcN, tCdc) = time {
        val (ins, _) = Lakehouse.changedFiles(spark, root, 2, 3)
        spark.read.parquet(ins: _*).count()
      }
      val (diffN, tDiff) = time {
        Lakehouse.readVersion(spark, root, 3, "o_orderkey")
          .except(Lakehouse.readVersion(spark, root, 2, "o_orderkey"))
          .count()
      }
      require(cdcN == diffN, s"CDC $cdcN != snapshot diff $diffN")
      // compaction: the explicit data-sized reclaim
      val (_, tCompact) = time {
        Lakehouse.readVersion(spark, root, 3, "o_orderkey")
          .repartition(32, col("o_orderkey"))
          .write.mode("overwrite").parquet(s"$root/data/w=4")
        Lakehouse.commitVersion(spark, root, 4,
          Lakehouse.listDataFiles(spark, root, s"$root/data/w=4")
            .map(("data", _, 4)))
      }
      println(f"k=$k%-3d rows=$n%9d load=$tLoad%6.2fs " +
        f"deleteCommit=$tDel%5.2fs appendCommit=$tApp%5.2fs " +
        f"cdcRead=$tCdc%5.2fs snapshotDiff=$tDiff%6.2fs " +
        f"compact=$tCompact%6.2fs")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    spark.stop()
  }
}
