package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** JSON/CSV source+sink roundtrips (SURVEY.md §2.1 S1/S2): the reference's
  * JSON-array store format must read back exactly, including the golden
  * fixture data. */
class SourcesSpec extends SparkSpec {

  private val plansSchema = StructType(Seq(
    StructField("subscription_plan_id", LongType),
    StructField("subscription_plan_name", StringType),
    StructField("subscription_price", DoubleType),
    StructField("subscription_plan_start_date", StringType),
    StructField("subscription_plan_end_date", StringType)))

  test("S1: multiLine JSON array file reads with explicit schema") {
    // write a JSON-array file in the reference's store format
    val dir = Files.createTempDirectory("graft_json").toString
    val f = s"$dir/plans.json"
    Files.writeString(java.nio.file.Paths.get(f),
      """[
        |  {"subscription_plan_id": 1, "subscription_plan_name": "Free", "subscription_price": 0, "subscription_plan_start_date": "2025-01-01", "subscription_plan_end_date": "2025-12-31"},
        |  {"subscription_plan_id": 2, "subscription_plan_name": "Pro", "subscription_price": 29, "subscription_plan_start_date": "2025-01-01", "subscription_plan_end_date": "2025-12-31"}
        |]""".stripMargin)
    val df = Sources.readJsonTable(spark, f, plansSchema)
    assert(df.count() === 2)
    val pro = df.filter(col("subscription_plan_name") === "Pro").head()
    assert(pro.getAs[Long]("subscription_plan_id") === 2L)
    assert(pro.getAs[Double]("subscription_price") === 29.0)
  }

  test("schema-inferred JSON reads mirror the reference's implicit load") {
    // _load_json (dags/subscription_flow.py:27-29) never declares a schema;
    // the inferred convenience read must recover the same rows and usable
    // types (JSON ints infer as LongType) from the array-file store.
    val dir = Files.createTempDirectory("graft_json_inf").toString
    val f = s"$dir/plans.json"
    Files.writeString(java.nio.file.Paths.get(f),
      """[
        |  {"subscription_plan_id": 1, "subscription_plan_name": "Free", "subscription_price": 0},
        |  {"subscription_plan_id": 2, "subscription_plan_name": "Pro", "subscription_price": 29}
        |]""".stripMargin)
    val df = Sources.readJsonTableInferred(spark, f)
    assert(df.count() === 2)
    assert(df.schema("subscription_plan_id").dataType === LongType)
    assert(df.filter(col("subscription_plan_name") === "Pro").head()
      .getAs[Long]("subscription_price") === 29L)
    // line-delimited inferred variant over the fixture write
    val dir2 = Files.createTempDirectory("graft_jsonl_inf").toString + "/s"
    Sources.writeJsonTable(plansFixture, dir2)
    val back = Sources.readJsonLinesInferred(spark, dir2)
    assert(back.count() === 3)
    assert(back.columns.sorted.toSeq ===
      plansFixture.columns.sorted.toSeq)
  }

  test("S2 + S1: JSON sink then line-delimited scan roundtrips the store") {
    val dir = Files.createTempDirectory("graft_json_rt").toString + "/store"
    Sources.writeJsonTable(plansFixture, dir)
    val back = Sources.readJsonLines(spark, dir, plansSchema)
    assert(back.orderBy("subscription_plan_id").collect().toSeq ===
      plansFixture.orderBy("subscription_plan_id").collect().toSeq)
  }

  test("partitioned layout prunes: the week query reads 7 of 30 day " +
      "directories via PartitionFilters, not a full scan") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val df = SparkEntry
        .queries("q_scan_partition_pruned")(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      val scanLine = p.linesIterator
        .find(_.contains("PartitionFilters:")).getOrElse("")
      assert(scanLine.contains("day"), p.take(2000))
      // the day bounds must be partition filters (pruned at planning),
      // NOT data filters pushed into row groups
      assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*>=[^\\]]*\\].*"),
        scanLine)
      assert(df.collect().length === 7)
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("partition evolution: hour layout prunes at hour granularity; " +
      "both layouts serve the transition union exactly") {
    import graft.operators.Relational2
    val sf = "/root/testdata/sf0.001"
    val dir = Relational2.eventsEvolvedDir(spark, sf)
    // both layouts exist and split at the cutover
    val days = new java.io.File(s"$dir/day_layout").listFiles()
      .map(_.getName).filter(_.startsWith("day=")).sorted
    val newDays = new java.io.File(s"$dir/hour_layout").listFiles()
      .map(_.getName).filter(_.startsWith("day=")).sorted
    assert(days.nonEmpty && days.last < s"day=${Relational2.evolutionCutover}")
    assert(newDays.nonEmpty &&
      newDays.head >= s"day=${Relational2.evolutionCutover}")
    // hour dirs exist under the new layout
    assert(new java.io.File(s"$dir/hour_layout/${newDays.head}")
      .listFiles().exists(_.getName.startsWith("hour=")))
    // the union serves the whole table exactly (per-row, not just counts)
    val union = Relational2.evolvedEvents(spark, dir)
    val raw = Tables.events(spark, sf)
    assert(union.count() === raw.count())
    assert(union.select("event_id").distinct().count() === raw.count())
    // hour-range query prunes at HOUR granularity: PartitionFilters
    // carries the hour bounds, and only the matching dirs are read
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try {
      val hq = Relational2.evolvedHourRange(spark, dir,
        "2024-01-25", "06", "11")
      val p = hq.queryExecution.executedPlan.toString
      val scanLine = p.linesIterator
        .find(_.contains("PartitionFilters:")).getOrElse("")
      assert(scanLine.contains("hour"), p.take(2000))
      assert(scanLine.matches(".*PartitionFilters: \\[[^\\]]*>=[^\\]]*\\].*"),
        scanLine)
      // row-level truth: equals the raw-events hour filter
      val expected = raw
        .filter(org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd") ===
          "2024-01-25")
        .filter(org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "HH")
          .between("06", "11"))
        .count()
      assert(hq.count() === expected)
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
  }

  test("day-to-hour migration is crash-safe: every crash-window state " +
      "serves the table exactly once through the precedence reader") {
    import graft.operators.Relational2
    import org.apache.spark.sql.functions.{col, date_format, lit}
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files
      .createTempDirectory("graft_migrate_spec").toString
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Sources.writePartitioned(ev, s"$dir/day_layout", "day")
    ev.filter(lit(false))
      .withColumn("hour", date_format(col("ts"), "HH"))
      .write.mode("overwrite").partitionBy("day", "hour")
      .parquet(s"$dir/hour_layout")
    val total = ev.count()
    val day = "2024-01-10"
    def served(): Long = Relational2.evolvedEvents(spark, dir).count()
    // pre-migration baseline
    assert(served() === total)
    // keep a copy of the day's old-layout dir to recreate the
    // "renamed but not yet deleted" crash window afterwards
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
        ()
      }
    }
    val dayDir = java.nio.file.Paths.get(s"$dir/day_layout/day=$day")
    val snapshot = java.nio.file.Paths.get(s"$dir/day_snapshot")
    copyTree(dayDir, snapshot)
    // full migration (stage → audit → rename → delete)
    assert(Relational2.migrateDayToHourly(spark, dir, day))
    assert(served() === total) // post-migration: still exactly once
    // the migrated day prunes at hour granularity
    val hq = Relational2.evolvedHourRange(spark, dir, day, "06", "11")
    val expect = ev.filter(col("day") === day)
      .filter(date_format(col("ts"), "HH").between("06", "11")).count()
    assert(hq.count() === expect && expect > 0)
    // CRASH WINDOW: the day exists in BOTH layouts (rename done, delete
    // not yet) — the precedence rule must serve it once, from the hour
    // layout
    copyTree(snapshot, dayDir)
    assert(served() === total)
    // re-running the migrator in this state RECOVERS the interrupted
    // migration: it detects the already-published day and completes
    // only the retire step — never a double-publish
    assert(Relational2.migrateDayToHourly(spark, dir, day))
    assert(!java.nio.file.Files.exists(dayDir))
    assert(served() === total)
    // a day that was never in either layout is a no-op false
    assert(!Relational2.migrateDayToHourly(spark, dir, "1999-01-01"))
  }

  test("hour-day compaction is crash-safe: dot-hidden staging/prev stay " +
      "invisible to discovery, every crash window recovers, and the " +
      "compacted day collapses to one file per hour") {
    import graft.operators.Relational2
    import org.apache.spark.sql.functions.{col, date_format}
    import java.nio.file.{Files => NF, Paths, StandardCopyOption}
    val sf = "/root/testdata/sf0.001"
    val dir = NF.createTempDirectory("graft_compact_spec").toString
    val ev = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Sources.writePartitioned(
      ev.filter(col("day") < Relational2.evolutionCutover),
      s"$dir/day_layout", "day")
    // FRAGMENTED hour side: round-robin repartition lands a file per
    // task in every hour directory — the post-ingest small-files state
    ev.filter(col("day") >= Relational2.evolutionCutover)
      .withColumn("hour", date_format(col("ts"), "HH"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("day", "hour")
      .parquet(s"$dir/hour_layout")
    val total = ev.count()
    val day = "2024-01-25"
    val dayRows = ev.filter(col("day") === day).count()
    assert(dayRows > 0)
    def served(): Long = Relational2.evolvedEvents(spark, dir).count()
    def servedIds(): Set[Long] = Relational2.evolvedEvents(spark, dir)
      .filter(col("day").cast("string") === day)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val wantIds = ev.filter(col("day") === day)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val dayPath = Paths.get(s"$dir/hour_layout/day=$day")
    val prevPath = Paths.get(s"$dir/hour_layout/.compact_day_$day.prev")
    val stgPath = Paths.get(s"$dir/hour_layout/.compact_day_$day.staging")
    def filesPerHour(): Seq[Int] = {
      val root = dayPath.toFile
      root.listFiles.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("hour="))
        .map(_.listFiles.count(_.getName.endsWith(".parquet")))
    }
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      NF.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (NF.isDirectory(p)) NF.createDirectories(t)
        else NF.copy(p, t)
        ()
      }
    }
    // pre-compaction: fragmented (some hour dir holds >1 file), served once
    assert(filesPerHour().exists(_ > 1))
    assert(served() === total)
    val snapshot = Paths.get(s"$dir/day_snapshot")
    copyTree(dayPath, snapshot)
    // full compaction: audit → retire → publish → clear; content identical
    assert(Relational2.compactHourlyDay(spark, dir, day))
    assert(filesPerHour().nonEmpty && filesPerHour().forall(_ === 1))
    assert(served() === total)
    assert(servedIds() === wantIds)
    assert(!NF.exists(prevPath) && !NF.exists(stgPath))
    // CRASH A — staging written, swap not begun: the dot-hidden staging
    // is invisible to partition discovery, and a re-run just recompacts
    copyTree(snapshot, stgPath)
    assert(served() === total)
    assert(Relational2.compactHourlyDay(spark, dir, day))
    assert(served() === total && !NF.exists(stgPath))
    // CRASH B — retired but not yet published (the swap instant): the
    // day is temporarily absent; a re-run ROLLS THE RETIRED COPY BACK
    // and completes the compaction
    NF.move(dayPath, prevPath, StandardCopyOption.ATOMIC_MOVE)
    assert(served() === total - dayRows)
    assert(Relational2.compactHourlyDay(spark, dir, day))
    assert(served() === total)
    assert(servedIds() === wantIds)
    assert(filesPerHour().forall(_ === 1))
    // CRASH C — published but retired copy not yet cleared: readers
    // already serve the compacted day; the stale hidden prev is cleared
    // by the next run
    copyTree(snapshot, prevPath)
    assert(served() === total)
    assert(Relational2.compactHourlyDay(spark, dir, day))
    assert(served() === total && !NF.exists(prevPath))
    // a day that is in neither layout is a no-op false
    assert(!Relational2.compactHourlyDay(spark, dir, "1999-01-01"))
  }

  test("malformed JSON rows: PERMISSIVE nulls + captures, DROPMALFORMED " +
      "skips, FAILFAST throws") {
    // Robustness contract for dirty landings — a 100 TB ingest ALWAYS
    // contains broken records, and the engine must offer all three
    // dispositions without failing the healthy rows.
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty_json")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"id": 1, "name": "ok"}
        |{"id": 2 "name": "missing comma"}
        |{"id": 3, "name": "fine"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    try {
      assert(permissive.count() === 4)
      assert(permissive.filter(col("_corrupt_record").isNotNull)
        .count() === 2)
      assert(permissive.filter(col("_corrupt_record").isNull)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 3L))
    } finally { permissive.unpersist(); () }
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir.toString)
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    val failfast = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
    assert(failfast.getMessage.toLowerCase.contains("malformed") ||
      failfast.getCause != null)
  }

  test("permissive scan splits one file read into clean stream + " +
      "quarantine with raw lines preserved") {
    // the dead-letter contract behind q_scan_json_corrupt: the declared
    // query's oracle proves the clean side ≡ nation; this pins the
    // quarantine side — every injected corrupt line lands there verbatim
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files
      .createTempDirectory("graft_quarantine").toString
    val nation = Tables.nation(spark, sf)
    val good = nation.select(
      to_json(struct(col("n_nationkey"), col("n_name"))).as("value"))
    val bad = nation.filter(col("n_nationkey") % 5 === 0)
      .select(concat(lit("{\"n_nationkey\": "), col("n_nationkey"),
        lit(", \"n_name\": \"broken")).as("value"))
    good.union(bad).coalesce(1).write.mode("overwrite").text(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType)))
    val scanned = Sources.readJsonLinesPermissive(spark, dir, schema)
    val nBad = nation.filter(col("n_nationkey") % 5 === 0).count()
    val quarantined = Sources.quarantineRows(scanned)
      .collect().map(_.getString(0))
    assert(quarantined.length.toLong === nBad)
    // raw text preserved byte-for-byte (replayable after a parser fix)
    assert(quarantined.forall(_.startsWith("{\"n_nationkey\": ")))
    assert(quarantined.forall(_.endsWith(", \"n_name\": \"broken")))
    // the split is a partition of the scan: valid + quarantine = input
    assert(Sources.validRows(scanned).count() + nBad ===
      nation.count() + nBad)
    // clean stream carries no phantom rows from the corrupt lines
    assert(Sources.validRows(scanned)
      .select("n_nationkey").exceptAll(nation.select("n_nationkey"))
      .isEmpty)
  }

  test("schema evolution: mergeSchema unions columns across parquet " +
      "file generations") {
    // The other standing ingest reality: a column added upstream must not
    // break readers of the mixed directory — old files surface NULL for
    // the new column, new files carry it.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve")
      .toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    assert(merged.count() === 4)
    assert(merged.filter(col("score").isNull).count() === 2)
    assert(merged.filter(col("score").isNotNull)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 4L))
  }

  test("CSV sink + scan roundtrips with schema") {
    val subsSchema = StructType(Seq(
      StructField("subscription_id", LongType),
      StructField("user_id", LongType),
      StructField("subscription_plan_id", LongType),
      StructField("subscription_status", StringType),
      StructField("start_date", StringType),
      StructField("end_date", StringType),
      StructField("payment_status", StringType)))
    val dir = Files.createTempDirectory("graft_csv").toString + "/subs"
    Sources.writeCsvTable(subsFixture, dir)
    val back = Sources.readCsvTable(spark, dir, subsSchema)
    assert(back.orderBy("subscription_id").collect().toSeq ===
      subsFixture.orderBy("subscription_id").collect().toSeq)
  }

  test("write-audit-publish: a failing audit never publishes and leaves " +
      "the previous version readable; a passing one swaps atomically") {
    import org.apache.spark.sql.functions._
    val pub = Files.createTempDirectory("graft_wap").toString + "/orders"
    val sf = "/root/testdata/sf0.001"
    val v1 = Tables.orders(spark, sf).filter(col("o_orderkey") <= 500)
    // audit: no null keys and at least one row
    def audit(df: org.apache.spark.sql.DataFrame): Boolean = {
      val r = df.agg(count(lit(1)).as("n"),
        count(when(col("o_orderkey").isNull, 1)).as("nulls")).head()
      r.getLong(0) > 0 && r.getLong(1) === 0L
    }
    assert(Sources.writeAuditPublish(v1, pub, audit))
    val n1 = spark.read.parquet(pub).count()
    assert(n1 === v1.count())
    // v2 fails its audit (row-count gate unmet) → publish refused,
    // published table still serves v1, staging kept for forensics
    val v2 = Tables.orders(spark, sf).filter(col("o_orderkey") < 0)
    assert(!Sources.writeAuditPublish(v2, pub,
      df => df.count() > 0))
    assert(spark.read.parquet(pub).count() === n1)
    val fs = new org.apache.hadoop.fs.Path(pub)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(pub + ".staging")))
    // v3 passes → the published content is v3, staging consumed
    val v3 = Tables.orders(spark, sf).filter(col("o_orderkey") <= 100)
    assert(Sources.writeAuditPublish(v3, pub, audit))
    assert(spark.read.parquet(pub).count() === v3.count())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pub + ".staging")))
    // retire-then-swap: the successful re-publish over an existing
    // version leaves no .prev residue (retired copy deleted only AFTER
    // the swap landed) — the delete-then-rename window is gone
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pub + ".prev")))
    // crash recovery (round 11): a PRIOR run that died between its two
    // renames leaves the ONLY copy at .prev — the next cycle must not
    // delete it, and must leave the new version published with no
    // residue. Simulate the window, then publish v1 again.
    assert(fs.rename(new org.apache.hadoop.fs.Path(pub),
      new org.apache.hadoop.fs.Path(pub + ".prev")))
    assert(Sources.writeAuditPublish(v1, pub, audit))
    assert(spark.read.parquet(pub).count() === n1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pub + ".prev")))
  }
}
