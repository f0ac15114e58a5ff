package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
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
  /** Range-clustered parquet write: repartitionByRange on the cluster
    * key + in-partition sort + (optionally) maxRecordsPerFile. Each
    * output file then covers a DISJOINT range of the key, so parquet
    * min/max footer stats prune whole files for range/equality
    * predicates — the data-layout lever that makes scan cost track a
    * predicate's selectivity instead of table size at 100 TB.
    * `partitions = 0` lets AQE/defaultParallelism choose.
    */
  def clusteredParquet(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      partitions: Int = 0,
      maxRecordsPerFile: Long = 0): Unit = {
    val cols = clusterCols.map(org.apache.spark.sql.functions.col)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, cols: _*)
      else df.repartitionByRange(cols: _*)
    val writer = ranged.sortWithinPartitions(cols: _*).write.mode(SaveMode.Overwrite)
    val bounded =
      if (maxRecordsPerFile > 0) writer.option("maxRecordsPerFile", maxRecordsPerFile.toString)
      else writer
    bounded.parquet(path)
  }

  /** Compact a parquet directory's many small files into `target`
    * right-sized ones — the maintenance remedy for streaming-sink and
    * over-parallel-writer output. Staged like the Loader's swap: the
    * rewrite lands in `<path>__compacting`, then swaps in atomically
    * (old data is live until the instant of the rename).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String, target: Int): Unit = {
    require(target > 0, "target file count must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(staging, true); fs.delete(old, true)
    spark.read.parquet(path).coalesce(target)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!fs.rename(p, old)) sys.error(s"compact: cannot stage-out $path")
    if (!fs.rename(staging, p)) { fs.rename(old, p); sys.error(s"compact: swap failed for $path") }
    fs.delete(old, true)
  }

  def noop(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).format("noop").save()
}
