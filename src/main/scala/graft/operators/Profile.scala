package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the null/distinct/range health report run over
  * every freshly-ingested table. ONE scan: all per-column aggregates
  * evaluate in a single wide aggregation (k columns → 4k agg
  * expressions, one job), and the 1×4k result row is reshaped on the
  * driver to the long form — a bounded collect of scalars, same
  * posture as the min/max boundary probe (S4).
  *
  * Distinct counts are EXACT (the oracle-checkable contract); Spark
  * plans multiple distinct aggregates via expand, which multiplies the
  * shuffled rows by the distinct-column count — fine for a diagnostic
  * pass. Swap `count_distinct` for `approx_count_distinct` when
  * profiling interactively at full corpus scale.
  */
object Profile {

  /** Output: one row per input column —
    * (col_name, n_nulls, n_distinct, min_num, max_num); min/max are
    * null for non-numeric columns (cross-engine string/date formatting
    * is not part of the contract).
    */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val numeric = f.dataType.isInstanceOf[NumericType]
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        count_distinct(c).as(s"${f.name}__nd"),
        (if (numeric) min(c.cast("double")) else lit(null).cast("double"))
          .as(s"${f.name}__min"),
        (if (numeric) max(c.cast("double")) else lit(null).cast("double"))
          .as(s"${f.name}__max"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = fields.zipWithIndex.map { case (f, i) =>
      Row(f.name,
        if (r.isNullAt(4 * i)) 0L else r.getLong(4 * i),
        r.getLong(4 * i + 1),
        if (r.isNullAt(4 * i + 2)) null else r.getDouble(4 * i + 2),
        if (r.isNullAt(4 * i + 3)) null else r.getDouble(4 * i + 3))
    }
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min_num", DoubleType, nullable = true),
      StructField("max_num", DoubleType, nullable = true)))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), schema)
  }
}
