package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.streaming.EventsStreaming

/** RocksDB state observability for the transformWithState family
  * (VERDICT r9 item 8): q_stream_profiles_tws (ValueState) and
  * q_stream_recent_events (ListState + ValueState) are result-oracled,
  * but nothing recorded how their STATE behaves as events scale. This
  * probe drives both processors over three stagings —
  *   1×            the sf events table,
  *   ×10 events    10 id-shifted copies, SAME user population,
  *   ×10 users     10 id-shifted copies, DISTINCT user population —
  * with the RocksDB provider, and prints per-batch state-operator
  * telemetry from StreamingQueryProgress: state rows, state bytes
  * (memoryUsedBytes; for RocksDB this is the loaded-version memory),
  * bytes/row, update and commit latency, plus the RocksDB custom
  * metrics for on-disk SST size. The contract being verified:
  *   - per-key state is CONSTANT-SIZE (ValueState) or BOUNDED-N
  *     (pruned ListState), so ×10 events over the same users grows
  *     state rows and bytes/row by ~0× — only commit counts rise;
  *   - ×10 users grows state rows ~10× at flat bytes/row — state
  *     scales with keys, never with events.
  * Run: SPARK_GRAFT_SF_DIR=... tools/java_run.sh graft.tools.TwsStateProbe
  */
object TwsStateProbe {

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    val ev = Tables.events(spark, d).localCheckpoint()
    val nUsers = ev.select("user_id").distinct().count()

    def replicate(shiftUsers: Boolean): DataFrame =
      (0 until 10).map { k =>
        ev.withColumn("event_id", col("event_id") + lit(k * 1000000000L))
          .withColumn("ts", col("ts") + expr(s"INTERVAL $k SECONDS"))
          .withColumn("user_id",
            if (shiftUsers) col("user_id") + lit(k * 1000000000L)
            else col("user_id"))
      }.reduce(_ unionByName _)

    def stage(df: DataFrame, name: String): String = {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_twsprobe_$name"
      df.repartition(3).write.mode("overwrite").parquet(dir)
      dir
    }

    val stagings = Seq(
      ("1x", stage(ev, "base"), nUsers),
      ("x10_events", stage(replicate(shiftUsers = false), "ev10"), nUsers),
      ("x10_users", stage(replicate(shiftUsers = true), "us10"),
        nUsers * 10))

    def drive(label: String, sinkName: String,
        plan: String => DataFrame, dir: String, users: Long): Unit = {
      import org.apache.spark.sql.streaming.Trigger
      val q = plan(dir).writeStream
        .format("memory").queryName(sinkName).outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), s"$label timed out")
      q.stop()
      println(s"== $label  (distinct users: $users) ==")
      q.recentProgress.foreach { p =>
        p.stateOperators.foreach { so =>
          val rows = so.numRowsTotal
          val mem = so.memoryUsedBytes
          val perKey = if (rows > 0) mem.toDouble / rows else 0.0
          val sst: Long = Option(so.customMetrics)
            .flatMap(m => Option(m.get("rocksdbSstFileSize")))
            .map(_.longValue).getOrElse(-1L)
          println(f"  batch=${p.batchId}%3d in=${p.numInputRows}%9d " +
            f"stateRows=$rows%9d stateMem=$mem%12d B " +
            f"(${perKey}%8.1f B/key) sst=$sst%10d B " +
            f"updateMs=${so.allUpdatesTimeMs}%6d " +
            f"commitMs=${so.commitTimeMs}%6d")
        }
      }
      spark.sql(s"DROP TABLE IF EXISTS $sinkName")
    }

    // SPARK_GRAFT_TWS_SECTION=ttl skips the staging sweeps (local
    // iteration on the retention section alone)
    val ttlOnly = sys.env.get("SPARK_GRAFT_TWS_SECTION").contains("ttl")
    if (!ttlOnly) stagings.foreach { case (tag, dir, users) =>
      drive(s"profiles_tws (ValueState) $tag", s"tws_probe_p_$tag",
        dd => EventsStreaming.runningProfilesTws(spark,
          EventsStreaming.readEventsStream(spark, dd)).toDF(),
        dir, users)
      drive(s"recent_events (ListState) $tag", s"tws_probe_r_$tag",
        dd => EventsStreaming.recentEvents(spark,
          EventsStreaming.readEventsStream(spark, dd), 3)
          .toDF("user_id", "rows_seen", "recent_ids"),
        dir, users)
    }

    // --- TTL retention (round 11): the one state behavior the three
    // stagings above do NOT measure — expired keys leaving the store.
    // A 3 s TTL'd profile query idles past the horizon on a 1 s
    // processing-time trigger (no-data batches still run the stateful
    // operator, so per-batch TTL cleanup fires), then a second landing
    // touches 1/10th of the users. Expected trace: stateRows = all
    // users after landing A, DECAYS TO 0 while idle past the TTL, and
    // holds at ~users/10 after landing B — retention bounded by the
    // horizon, never by history.
    {
      import org.apache.spark.sql.streaming.Trigger
      val base = s"${sys.props("java.io.tmpdir")}/graft_twsprobe_ttl"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val dataDir = s"$base/data"
      new java.io.File(dataDir).mkdirs()
      def landOne(df: DataFrame, name: String): Long = {
        val stg = s"$base/stg_$name"
        df.coalesce(1).write.mode("overwrite").parquet(stg)
        val part = new java.io.File(stg).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          new java.io.File(dataDir, s"$name.parquet").toPath)
        df.count()
      }
      val evB = ev.filter(col("user_id") % 10 === 0)
      val nB = evB.select("user_id").distinct().count()
      val q = EventsStreaming.runningProfilesTws(spark,
          EventsStreaming.readEventsStream(spark, dataDir), ttlMs = 3000L)
        .toDF().writeStream
        .format("memory").queryName("tws_probe_ttl").outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
      def consumed: Long = {
        val seen = scala.collection.mutable.Map.empty[Long, Long]
        q.recentProgress.foreach(p => seen(p.batchId) = p.numInputRows)
        seen.values.sum
      }
      def waitFor(target: Long): Unit = {
        val dl = System.nanoTime + 120L * 1000 * 1000 * 1000
        while (consumed < target && System.nanoTime < dl) Thread.sleep(100)
        require(consumed >= target, s"ttl probe stalled at $consumed/$target")
      }
      def stateRows: Long = q.recentProgress.toSeq
        .sortBy(_.batchId).reverse
        .flatMap(_.stateOperators.headOption).headOption
        .map(_.numRowsTotal).getOrElse(-1L)
      println(s"== TTL retention (3s TTL, ValueState, " +
        s"$nUsers users in A, $nB in B) ==")
      val cA = landOne(ev, "00_a")
      waitFor(cA)
      println(s"  after landing A: stateRows=$stateRows")
      Thread.sleep(8000) // idle past the horizon; cleanup runs per batch
      println(s"  after 8s idle  : stateRows=$stateRows")
      val cB = landOne(evB, "01_b")
      waitFor(cA + cB)
      println(s"  after landing B: stateRows=$stateRows")
      q.stop()
    }
    spark.stop()
  }
}
