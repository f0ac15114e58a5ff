package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import graft.functions.HiveText

/** Sink surface — SURVEY.md §2.2 (K1-K10).
  *
  * The reference hand-rolls staging temp files + byte-concat merge
  * (`utils/fs.py:33-46`); Spark's FileOutputCommitter is the same
  * task-temp → commit protocol, so only the *formats* need code here.
  * Retry/reset lifecycle (K6) and multi-part commit (K5) are the
  * committer's job; fan-out (K9) persists once and writes N times.
  */
object Sink {

  final case class CsvOptions(
      header: Boolean = false,
      delimiter: String = ",",
      quoteAll: Boolean = true, // reference default QUOTE_ALL, csv_handler.py:31
      nullValue: String = "",
      encoding: String = "UTF-8",
      singleFile: Boolean = false)

  /** K1 — CSV sink with the reference's knobs. */
  def csv(df: DataFrame, path: String, opts: CsvOptions = CsvOptions()): Unit = {
    val out = if (opts.singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter)
      .option("quoteAll", opts.quoteAll.toString)
      .option("nullValue", opts.nullValue)
      .option("encoding", opts.encoding)
      .csv(path)
  }

  /** K2-K4 — Hive-text sink: `\u0001` delimiter, no quoting, `\N` nulls,
    * JSON containers, escape table — encoded by expression (HiveText)
    * then written as single-column text so the bytes are exactly the
    * reference's, not Spark-CSV's approximation.
    */
  def hiveText(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val encoded = df.select(HiveText.encodeRow(df.schema).as("value"))
    val out = if (singleFile) encoded.coalesce(1) else encoded
    out.write.mode(SaveMode.Overwrite).text(path)
  }

  /** Const.py:19-26 format map — parquet/orc/avro/text. */
  def format(df: DataFrame, path: String, fmt: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format(fmt).save(path)

  /** Bucketed catalog table: co-locates the given keys at WRITE time so
    * later equi-joins and aggregations on them read pre-partitioned
    * buckets with NO exchange — the write-once-shuffle-never posture for
    * fact tables joined repeatedly on the same key at 100 TB. Optional
    * sortBy pre-sorts within buckets (sort-merge joins then skip the
    * sort too). Pinned in StorageSpec: a join of two co-bucketed tables
    * plans zero Exchange operators.
    */
  def bucketTable(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketing requires at least one column")
    val w = df.write.mode(mode).bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** K7 — JDBC bulk load (the LOAD DATA INFILE equivalent). */
  def jdbc(df: DataFrame, url: String, table: String, mode: SaveMode,
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** K9 — multi-sink fan-out: materialize once, write N times. */
  def fanOut(df: DataFrame, writes: Seq[DataFrame => Unit]): Unit = {
    val cached = df.persist()
    try { cached.count(); writes.foreach(_(cached)) }
    finally cached.unpersist()
  }

  /** K10 — null sink (benchmarking): forces full computation, writes
    * nothing.
    */
  /** The range-clustering policy shared by clusteredParquet and
    * Loader's clusterBy publish: repartitionByRange + in-partition sort
    * on the cluster key. `partitions > 0` pins the partition count
    * (bypasses AQE coalescing); 0 lets AQE size the ranges.
    */
  def rangeCluster(df: DataFrame, clusterCols: Seq[String], partitions: Int = 0): DataFrame = {
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, cols: _*)
      else df.repartitionByRange(cols: _*)
    ranged.sortWithinPartitions(cols: _*)
  }

  /** Range-clustered parquet write: each output file covers a DISJOINT
    * range of the cluster key (rangeCluster + optional
    * maxRecordsPerFile), so parquet min/max footer stats prune whole
    * files for range/equality predicates — the data-layout lever that
    * makes scan cost track a predicate's selectivity instead of table
    * size at 100 TB.
    */
  def clusteredParquet(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      partitions: Int = 0,
      maxRecordsPerFile: Long = 0): Unit = {
    val writer = rangeCluster(df, clusterCols, partitions).write.mode(SaveMode.Overwrite)
    val bounded =
      if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      else writer
    bounded.parquet(path)
  }

  /** Morton z-value: the two columns are normalized to a `bits`-bit
    * lattice over [lo, hi] and their bits interleaved (a on even
    * positions, b on odd). Nearby (a, b) points get nearby z-values, so
    * range-clustering on z bounds EVERY file in BOTH dimensions — the
    * multi-column data-skipping layout range clustering on one key
    * cannot provide. Pure codegen'd integer arithmetic.
    */
  def zValue(a: Column, b: Column,
      aLo: Double, aHi: Double, bLo: Double, bHi: Double,
      bits: Int = 16): Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val scale = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else round((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(scale.toDouble))
        .cast("long")
    val na = norm(a, aLo, aHi)
    val nb = norm(b, bLo, bHi)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(na, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(nb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-order-clustered parquet write: bounds for both columns come from
    * one bounded min/max probe (4 scalars to the driver), rows are
    * range-partitioned and sorted on the interleaved z-value, so each
    * output file's parquet footer carries TIGHT min/max on BOTH columns
    * — predicates on either prune files. The standard lakehouse layout
    * (Delta/Iceberg OPTIMIZE ZORDER) expressed as a plain Spark write.
    */
  def zOrderParquet(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      partitions: Int = 0,
      maxRecordsPerFile: Long = 0): Unit = {
    import org.apache.spark.sql.functions._
    val r = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    // empty input, or either column entirely null: no usable bounds on
    // one axis, so nothing to interleave — plain write
    if ((0 to 3).exists(r.isNullAt)) {
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val z = zValue(col(colA), col(colB),
      r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val writer = rangeCluster(df.withColumn("__z", z), Seq("__z"), partitions)
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
    val bounded =
      if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      else writer
    bounded.parquet(path)
  }

  /** Restore a table directory stranded by a crash between swapInDir's
    * two renames: if `target` is missing and `<target>__old` exists,
    * rename it back. MUST run before anything READS the target (the
    * swap-based writers here call it first; long-lived services should
    * call it once at startup for each swap-managed directory). Errors
    * loudly — it never deletes anything.
    */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, targetPath: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val old = new org.apache.hadoop.fs.Path(targetPath + "__old")
    if (!fs.exists(target) && fs.exists(old) && !fs.rename(old, target))
      sys.error(s"recoverSwap: could not restore $targetPath from ${old} — data intact there, fix manually")
  }

  /** Swap a fully-written staging directory into place of `target`,
    * RECOVERABLY (not atomically — a filesystem has no two-directory
    * atomic swap): target → __old, staging → target, drop __old. A
    * crash between the two renames leaves the data parked at
    * `<target>__old`; recoverSwap (run here and by every swap-based
    * writer before it reads the target) restores it, so the data is
    * never lost — the table is only briefly absent. Same contract as
    * the Loader's reference-parity table swap (`hive_loader.py:
    * 176-178`). The `__old` backup is only ever deleted when `target`
    * verifiably exists.
    */
  def swapInDir(fs: org.apache.hadoop.fs.FileSystem, stagingPath: String, targetPath: String): Unit = {
    val staging = new org.apache.hadoop.fs.Path(stagingPath)
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val old = new org.apache.hadoop.fs.Path(targetPath + "__old")
    recoverSwap(fs, targetPath)
    // any __old surviving past recovery is a stale backup from a crash
    // AFTER a completed swap (target exists) — safe to clear
    if (fs.exists(target) && fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      sys.error(s"swapInDir: cannot stage-out $targetPath")
    if (!fs.rename(staging, target)) {
      if (!fs.rename(old, target))
        sys.error(s"swapInDir: swap AND rollback failed — data intact at ${old}")
      sys.error(s"swapInDir: swap failed for $targetPath (rolled back)")
    }
    fs.delete(old, true)
  }

  /** Compact a parquet directory's many small files into `target`
    * right-sized ones — the maintenance remedy for streaming-sink and
    * over-parallel-writer output. Runs recoverSwap first (a previous
    * mid-swap crash must be healed before the directory is read), then
    * rewrites into `<path>__compacting` and swaps in via swapInDir.
    * Readers racing the brief swap window should go through a catalog
    * table, where the Loader's RENAME-based publish applies.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String, target: Int): Unit = {
    require(target > 0, "target file count must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    recoverSwap(fs, path)
    val staging = path + "__compacting"
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    spark.read.parquet(path).coalesce(target)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    swapInDir(fs, staging, path)
  }

  def noop(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format("noop").save()
}
