package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream to a fixed daily
  * grid per key and carry the last observed aggregate forward across
  * gap days — the standard prep step before per-entity time-series
  * modeling or window features over sparse activity.
  *
  * Scale shape: one shuffle builds the per-(key, day) aggregate; the
  * per-key spans come from a second partial-aggregated pass over that
  * (already day-granular, so ~corpus-days-sized) frame, not the raw
  * input; the day grid explodes from per-key (min, max) spans so it is
  * OUTPUT-sized; and the forward fill is a single (key, day) window —
  * the grid join and the window share the same key partitioning, so the
  * whole tail runs in one exchange.
  */
object TimeSeries {

  /** One row per (key, day) of each key's observed [min, max] day span:
    * `n_events` (0 on gap days), `day_value` (the day's `sum(valueCol)`,
    * null on gap days), `filled_value` (last non-null `day_value` at or
    * before the row — forward fill).
    */
  def resampleDailyFill(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"), round(sum(col(valueCol)), 6).as("day_value"))
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    // sequence on dates steps 1 day by default; spans are bounded by the
    // corpus' date range, so the explode is grid-sized
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value", last(col("day_value"), ignoreNulls = true).over(w))
  }

  /** Exponential moving average over the trailing `lookback` rows per
    * key (seeded with the oldest row in the frame, folded toward the
    * current one): EMA_i = (1-α)·EMA_{i-1} + α·x_i. A bounded-window
    * EMA rather than the full-history recurrence: the recurrence is
    * inherently sequential per key, the bounded form is one window
    * collect + an O(lookback) fold per row — embarrassingly parallel
    * and numerically identical once (1-α)^lookback is below noise.
    *
    * Scale shape: a single (key, time) window, rows-bounded frame —
    * state per row is `lookback` doubles, independent of history
    * length. Order ties are broken by `tieCol` so the fold order (and
    * thus the FP result) is deterministic. Null values are EXCLUDED
    * from the fold (collect_list drops them) — rows keep their own
    * EMA over the surviving frame; filter upstream if null should
    * mean "gap".
    */
  def ema(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double = 0.25,
      lookback: Int = 20): DataFrame = {
    require(lookback >= 1, "lookback must be >= 1")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(lookback - 1L), 0L)
    val arr = collect_list(col(valueCol).cast("double")).over(w)
    df.withColumn("__w", arr)
      .withColumn("ema",
        aggregate(
          slice(col("__w"), lit(2), size(col("__w")) - 1),
          element_at(col("__w"), 1),
          (acc, x) => (lit(1.0) - lit(alpha)) * acc + lit(alpha) * x))
      .drop("__w")
  }

  /** Coalesce overlapping-or-touching [start, end] intervals per key
    * (gaps-and-islands): one row per merged island with its bounds and
    * the number of source intervals it absorbed. `start == previous
    * end` MERGES (closed intervals); pass `end - 1` upstream for
    * half-open semantics. Interval columns must be a numeric/date/
    * timestamp type with a total order; rows with a null start or end
    * are dropped (they order nowhere).
    *
    * Scale shape: a single (key)-partitioned window ordered by (start,
    * end) computes the running max of `end` over STRICTLY EARLIER rows;
    * an island opens where the current start exceeds it. The island id
    * (running count of opens) and the final per-island aggregate reuse
    * the same key partitioning — one exchange end to end, no self-join
    * and nothing quadratic in intervals-per-key.
    */
  def mergeIntervals(
      df: DataFrame, keyCol: String, startCol: String, endCol: String): DataFrame = {
    Seq("island", "n_merged").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L)
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("island",
        sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_merged"))
  }
}
