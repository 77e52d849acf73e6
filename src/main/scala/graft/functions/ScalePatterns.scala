package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns as reusable library functions: skew-resistant salted
  * aggregation and bucketed co-located joins. These are the techniques the
  * 100 TB deployment reaches for when a key distribution or a repeated
  * join makes the default shuffle the bottleneck; each has an
  * equivalence/no-shuffle test in ScalePatternsSpec.
  */
object ScalePatterns {

  /** Two-stage salted sum/count: stage 1 aggregates on (key, salt) so a
    * hot key's rows spread over `buckets` reducers; stage 2 merges the
    * partials per key. Result is identical to a direct groupBy-sum for
    * decimal/long values (order-independent aggregates).
    *
    * With AQE's skew handling this is rarely needed for joins, but
    * aggregation skew (one giant group) still wants the salt. */
  def saltedSum(df: DataFrame, key: Column, value: Column, buckets: Int)
      : DataFrame = {
    // Salt from row CONTENT (all columns + a seed), never from
    // monotonically_increasing_id(): a nondeterministic expression feeding a
    // shuffle key re-salts rows differently on task retry, so reducers that
    // already fetched old map output double-count or drop rows. Hashing the
    // row itself makes recomputation reproduce identical shuffle output.
    // LIMITATION: identical-content rows hash to the SAME salt bucket, so a
    // hot key made of duplicate (key, value) rows still lands on one
    // reducer. Content hashing cannot fix that while staying
    // retry-deterministic with nothing but the row to hash; when the input
    // carries a stable provenance column (file name + row offset, a kafka
    // (partition, offset), an event id), include it in `df` and it becomes
    // part of the salt, spreading duplicates for free.
    val salted = df
      .withColumn("__salt", pmod(
        xxhash64(lit("graft_salt") +: df.columns.toIndexedSeq.map(col): _*),
        lit(buckets.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__partial"), count(lit(1)).as("__pcnt"))
    salted
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("sum"), sum(col("__pcnt")).as("cnt"))
  }

  /** Delta-style MERGE emulation over immutable tables (the scale form of
    * the reference's whole-file rewrite, SURVEY §2 J6): rows in `updates`
    * replace same-key rows in `base`; new keys are appended. Column sets
    * must match. One shuffle on the key (or none, if both sides are
    * bucketed by it via writeBucketed). */
  def upsertByKey(base: DataFrame, updates: DataFrame, key: String)
      : DataFrame = {
    val cols = base.columns
    require(updates.columns.sameElements(cols),
      "upsertByKey requires identical column sets")
    val u = updates.columns.foldLeft(updates)((df, c) =>
      df.withColumnRenamed(c, s"__u_$c"))
    // Row-level replacement, not per-column coalesce: a matched update row
    // replaces the base row WHOLE, including its NULL columns (Delta MERGE
    // matched-update semantics). Presence of the update row is keyed on its
    // key column, which is non-null by construction for matched rows.
    base.join(u, base(key) === u(s"__u_$key"), "full_outer")
      .select(cols.toIndexedSeq.map(c =>
        when(col(s"__u_$key").isNotNull, col(s"__u_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Small-file compaction — the standing maintenance job every
    * streaming/incremental landing needs: micro-batch writers accumulate
    * files far below the scan-optimal size, and at 100 TB the resulting
    * per-file open/footer cost dominates the read. Rewrites the layout at
    * the target file count into a fresh directory (an atomic swap is a
    * table format's job; versioned directories keep readers consistent).
    * `coalesce`, never `repartition`: compaction concatenates existing
    * partitions without a shuffle — the job is IO-bound by design. */
  def compactTo(src: DataFrame, dstDir: String, targetFiles: Int): Unit =
    src.coalesce(targetFiles).write.mode("overwrite").parquet(dstDir)

  /** 16-bit Morton (Z-order) interleave of two dimension columns — the
    * multi-dimensional clustering key behind lakehouse Z-ORDER layout
    * jobs: rows sorted by z keep BOTH dimensions locally bounded inside
    * any contiguous range, so per-file min/max zone maps prune reads
    * filtered on EITHER dimension (a single-column sort layout prunes
    * only its own column). Pure codegen'd bit arithmetic via the classic
    * magic-number spread — no UDF, identical operator set exists in
    * DuckDB for the oracle. Inputs are masked to 16 bits; callers map
    * their dimensions into that range (bucket coarse dimensions first). */
  def zValue(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      val v0 = x.bitwiseAND(lit(0xFFFFL))
      val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
      v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order layout writer: range-partition on the z key (equal-count
    * boundaries from a sample, Spark's RangePartitioner) and sort within
    * each file, so every file covers one contiguous z range — the layout
    * a daily clustering job produces. At 100 TB this replaces the
    * single-dimension sort layout wholesale; the write is one extra
    * shuffle paid at landing time. */
  def writeZOrdered(df: DataFrame, dir: String, zCol: Column,
      nFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  /** Write both sides bucketed+sorted by the join key so subsequent joins
    * are exchange-free (co-located sort-merge). Returns the table names.
    * The write cost is paid once; every later join on `key` skips its
    * shuffle — the standard layout for a fact table joined daily. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): String = {
    val spark = df.sparkSession
    // The in-memory catalog forgets tables across JVM runs while the
    // warehouse directory persists — clear both so overwrite is reliable.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = if (wh.startsWith("file:")) new java.net.URI(wh).getPath
      else wh
    val loc = new java.io.File(whPath, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (loc.exists()) rm(loc)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    table
  }
}
