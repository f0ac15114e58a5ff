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
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, tbl, splitBy, lower, upper, splits, props)

  /** S5 (file flavor) — reproduce the reference's half-open range split
    * semantics over an already-loaded DataFrame: `splits` contiguous
    * ranges over `[min, max]` of `splitCol`, last range closed, others
    * `>= AND <` (`dumper/sql.py:141-155`). Returns the per-range frames;
    * their union must equal the full scan (tested in SplitScanSpec).
    * NULL bounds (empty input) fall back to a single full scan, matching
    * `dumper/sql.py:135-137`.
    */
  def splitRanges(df: DataFrame, splitCol: String, splits: Int): Seq[DataFrame] = {
    val Array(lo, hi) = df.agg(min(col(splitCol)), max(col(splitCol))).head().toSeq.toArray
    if (lo == null || hi == null || splits <= 1) return Seq(df)
    val (lod, hid) = (toDouble(lo), toDouble(hi))
    val stride = (hid - lod) / splits
    if (stride <= 0) return Seq(df)
    (0 until splits).map { i =>
      val start = lod + i * stride
      val end = lod + (i + 1) * stride
      if (i == splits - 1)
        df.filter(col(splitCol) >= lit(start) && col(splitCol) <= lit(hid))
      else
        df.filter(col(splitCol) >= lit(start) && col(splitCol) < lit(end))
    }
  }

  private def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case t: java.sql.Timestamp => t.getTime.toDouble
    case d: java.sql.Date => d.getTime.toDouble
    case other => throw new IllegalArgumentException(s"non-splittable bound: $other")
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
