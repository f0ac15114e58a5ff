package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source surface — SURVEY.md §2.1 (S1-S11), re-expressed Spark-first.
  *
  * The reference builds SQL strings by hand (`dumper/sql.py:32-57`) and
  * splits scans into per-process ranges (`dumper/sql.py:70-97,132-159`).
  * Here every scan is a declarative DataFrame: Catalyst does column
  * pruning (S1), predicate pushdown into the parquet/JDBC scan (S2), and
  * file-split parallelism (S5) natively; `jdbcPartitioned` reproduces the
  * reference's range-split protocol exactly via Spark's JDBC partition
  * options when the source really is a remote DB.
  */
object Source {

  /** S1/S2/S3 — projected, filtered table scan over a parquet table dir.
    * `columns = Nil` means `*` (reference default, `dumper/sql.py:36`).
    * The projection and filter land in the scan: `PushedFilters` +
    * pruned `ReadSchema` (verify with .explain("formatted")).
    */
  def table(
      spark: SparkSession,
      dir: String,
      name: String,
      columns: Seq[String] = Nil,
      where: Option[String] = None): DataFrame = {
    val base = spark.read.parquet(s"$dir/$name.parquet")
    val filtered = where.fold(base)(w => base.filter(expr(w)))
    if (columns.isEmpty) filtered else filtered.select(columns.map(col): _*)
  }

  /** Batch file read over csv/json/parquet/orc/avro directories — the
    * batch face of StreamOps.fromFiles and the intake for the
    * reference's staged-CSV handoff (`handler/csv_handler.py:50-52`).
    * Pass an explicit schema for csv/json so the scan stays
    * projection-prunable and free of an inference pre-pass (a schema
    * inference job reads the whole input once before the real one).
    */
  def files(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format(format).options(options)
    schema.fold(reader)(reader.schema).load(path)
  }

  /** S3 — arbitrary SQL over registered temp views. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Register every table in a scale-factor dir as a temp view so S3/
    * `spark.sql` queries can reference them by name.
    */
  def registerAll(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))

  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S4 — min/max boundary probe. The reference issues two
    * `ORDER BY … LIMIT 1` queries (`dumper/sql.py:59-68`); a single
    * partial+final aggregate is strictly cheaper (one scan, no sort).
    */
  def boundary(df: DataFrame, column: String): DataFrame =
    df.agg(min(col(column)).as("lower"), max(col(column)).as("upper"))

  /** S5 — range-partitioned parallel scan of a JDBC source: the exact
    * Spark-native equivalent of the reference's ProcessPoolExecutor range
    * split (`dumper/sql.py:132-159`). Each executor task gets one
    * `[lower + i*stride, lower + (i+1)*stride)` slice of `splitBy`.
    * For file sources this is unnecessary — Spark splits parquet by
    * row-group natively — so this path exists only for genuine JDBC.
    */
  def jdbcPartitioned(
      spark: SparkSession,
      url: String,
      tbl: String,
      splitBy: String,
      lower: Long,
      upper: Long,
      splits: Int,
      props: java.util.Properties = new java.util.Properties(),
      fetchSize: Int = DefaultFetchSize): DataFrame =
    spark.read.option("fetchsize", fetchSize.toString)
      .jdbc(url, tbl, splitBy, lower, upper, splits, props)

  /** S6 — default JDBC fetch size: the reference streams MySQL results
    * through an unbuffered server-side cursor (`connector/mysql.py:17-25`,
    * SSCursor) for constant memory; Spark's equivalent knob is the
    * driver-level `fetchsize` batch, applied to every JDBC scan here.
    */
  val DefaultFetchSize = 10000

  /** S10 — plain JDBC read (reference `get_pandas_df`,
    * `connector/dbapi.py:138-139`): ad-hoc table-or-dbtable query into a
    * DataFrame, no partitioning.
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      tableOrQuery: String,
      props: java.util.Properties = new java.util.Properties(),
      fetchSize: Int = DefaultFetchSize): DataFrame =
    spark.read.option("fetchsize", fetchSize.toString).jdbc(url, tableOrQuery, props)

  /** R10 — identifier quoting (reference `connector/dbapi.py:188-195`):
    * dotted names split per part, stripped of existing backticks,
    * re-quoted.
    */
  def quoteIdentifier(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "") + "`").mkString(".")

  /** S5 (file flavor) — reproduce the reference's half-open range split
    * semantics over an already-loaded DataFrame: `splits` contiguous
    * ranges over `[min, max]` of `splitCol`, last range closed, others
    * `>= AND <` (`dumper/sql.py:141-155`). Returns the per-range frames;
    * their union must equal the full scan (pinned in SplitScanSpec).
    * NULL bounds (empty input) fall back to a single full scan, matching
    * `dumper/sql.py:135-137`.
    *
    * Integral columns use integral stride arithmetic: with 64-bit keys a
    * double stride accumulates FP error across boundaries and can
    * duplicate or drop boundary rows at scale. The floored stride makes
    * the last (closed) range absorb the remainder.
    */
  def splitRanges(df: DataFrame, splitCol: String, splits: Int): Seq[DataFrame] = {
    val Array(lo, hi) = df.agg(min(col(splitCol)), max(col(splitCol))).head().toSeq.toArray
    if (lo == null || hi == null || splits <= 1) return Seq(df)
    def frames[T](starts: Seq[T], ends: Seq[T], hiB: T): Seq[DataFrame] =
      starts.indices.map { i =>
        if (i == starts.size - 1)
          df.filter(col(splitCol) >= lit(starts(i)) && col(splitCol) <= lit(hiB))
        else
          df.filter(col(splitCol) >= lit(starts(i)) && col(splitCol) < lit(ends(i)))
      }
    (lo, hi) match {
      case (l: Byte, _) => integralSplit(df, splitCol, l.toLong, hi.asInstanceOf[Byte].toLong, splits)
      case (l: Short, _) => integralSplit(df, splitCol, l.toLong, hi.asInstanceOf[Short].toLong, splits)
      case (l: Int, _) => integralSplit(df, splitCol, l.toLong, hi.asInstanceOf[Int].toLong, splits)
      case (l: Long, _) => integralSplit(df, splitCol, l, hi.asInstanceOf[Long], splits)
      case (l: java.sql.Timestamp, h: java.sql.Timestamp) =>
        // split on epoch-millis, integral; rebuild Timestamp bounds
        val s = integralBounds(l.getTime, h.getTime, splits)
        if (s.isEmpty) Seq(df)
        else frames(s.map(new java.sql.Timestamp(_)), s.drop(1).map(new java.sql.Timestamp(_)), h)
      case (l: java.sql.Date, h: java.sql.Date) =>
        val s = integralBounds(l.getTime, h.getTime, splits)
        if (s.isEmpty) Seq(df)
        else frames(s.map(new java.sql.Date(_)), s.drop(1).map(new java.sql.Date(_)), h)
      case (l: Number, h: Number) => // fractional types keep double stride
        val (lod, hid) = (l.doubleValue(), h.doubleValue())
        val stride = (hid - lod) / splits
        if (stride <= 0) Seq(df)
        else {
          val starts = (0 until splits).map(i => lod + i * stride)
          frames(starts, starts.drop(1) :+ hid, hid)
        }
      case (other, _) => throw new IllegalArgumentException(s"non-splittable bound: $other")
    }
  }

  /** Start boundaries for an integral split; empty when the span is too
    * small to split (reference collapses to serial, `dumper/sql.py:86-87`).
    */
  private def integralBounds(lo: Long, hi: Long, splits: Int): Seq[Long] = {
    val stride = (hi - lo) / splits
    if (stride <= 0) Seq.empty else (0 until splits).map(i => lo + i * stride)
  }

  private def integralSplit(df: DataFrame, splitCol: String, lo: Long, hi: Long, splits: Int): Seq[DataFrame] = {
    val starts = integralBounds(lo, hi, splits)
    if (starts.isEmpty) return Seq(df)
    starts.indices.map { i =>
      if (i == starts.size - 1)
        df.filter(col(splitCol) >= lit(starts(i)) && col(splitCol) <= lit(hi))
      else
        df.filter(col(splitCol) >= lit(starts(i)) && col(splitCol) < lit(starts(i + 1)))
    }
  }

  /** S9 — catalog probes. */
  def hasTable(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  def columnsOf(df: DataFrame, exclude: Seq[String] = Nil): Seq[String] =
    df.schema.fieldNames.toSeq.filterNot(exclude.contains)

  /** S11 — dry-run: return the formatted physical plan instead of rows
    * (reference: NullCursor logs interpolated SQL, fetches nothing,
    * `connector/dbapi.py:10-44`).
    */
  def dryRun(df: DataFrame): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
}
