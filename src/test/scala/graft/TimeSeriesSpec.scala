package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Daily resample + forward fill: every day of each key's span appears,
  * gap days carry n_events=0 / null day_value / the last observed sum.
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap days materialize with zero events and forward-filled value") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 12:00:00"), 1.0),
      (1L, ts("2024-01-04 09:00:00"), 2.5), // 2-day gap before this
      (2L, ts("2024-03-10 00:00:00"), 7.0)  // single-day key
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleDailyFill(df, "k", "t", "v")
      .select(col("k"), col("day"), col("n_events"), col("day_value"), col("filled_value"))
      .as[(Long, Date, Long, Option[Double], Double)].collect()
      .sortBy(r => (r._1, r._2.toString))
    assert(out.toSeq == Seq(
      (1L, Date.valueOf("2024-01-01"), 2L, Some(6.0), 6.0),
      (1L, Date.valueOf("2024-01-02"), 0L, None, 6.0),
      (1L, Date.valueOf("2024-01-03"), 0L, None, 6.0),
      (1L, Date.valueOf("2024-01-04"), 1L, Some(2.5), 2.5),
      (2L, Date.valueOf("2024-03-10"), 1L, Some(7.0), 7.0)))
  }

  test("no gaps in the span means the grid equals the observed days") {
    val df = Seq(
      (9L, ts("2024-06-01 01:00:00"), 1.0),
      (9L, ts("2024-06-02 01:00:00"), 2.0)).toDF("k", "t", "v")
    val out = TimeSeries.resampleDailyFill(df, "k", "t", "v")
    assert(out.count() == 2 && out.filter(col("n_events") === 0).count() == 0)
  }

  test("ema folds the recurrence within the lookback, seeded at the frame's oldest row") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:01"), 1, 8.0),
      (1L, ts("2024-01-01 00:00:02"), 2, 4.0),
      (1L, ts("2024-01-01 00:00:03"), 3, 0.0),
      (2L, ts("2024-01-01 00:00:01"), 4, 100.0) // other key: isolated
    ).toDF("k", "t", "id", "v")
    val got = TimeSeries.ema(df, "k", "t", "id", "v", alpha = 0.25, lookback = 20)
      .select(col("id"), col("ema")).as[(Int, Double)].collect().toMap
    assert(got(1) == 8.0)                           // seed = first value
    assert(got(2) == 0.75 * 8.0 + 0.25 * 4.0)       // 7.0
    assert(got(3) == 0.75 * 7.0 + 0.25 * 0.0)       // 5.25
    assert(got(4) == 100.0)                         // key 2 never sees key 1
  }

  test("mergeIntervals coalesces overlap and touch, keeps gaps apart, drops null bounds") {
    val df = Seq(
      (1L, 0L, 10L),    // island 1: [0,10]
      (1L, 2L, 3L),     //   nested
      (1L, 10L, 15L),   //   touching (start == running max end) merges
      (1L, 17L, 20L),   // island 2: gap of 1 after 15
      (2L, 5L, 6L),     // other key: isolated
      (2L, 100L, 101L)
    ).toDF("k", "s", "e")
      .union(Seq((3L, Option.empty[Long], Option(1L))).toDF("k", "s", "e"))
    val out = TimeSeries.mergeIntervals(df, "k", "s", "e")
      .select(col("k"), col("s"), col("e"), col("n_merged"))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 15L, 3L), (1L, 17L, 20L, 1L),
      (2L, 5L, 6L, 1L), (2L, 100L, 101L, 1L)))
  }

  test("mergeIntervals: an early long interval swallows later short ones (running max, not lag)") {
    // the classic gaps-and-islands trap: comparing against lag(e) instead
    // of max(e) over preceding rows would split [0,100] ∪ [5,6] ∪ [50,60]
    val df = Seq((1L, 0L, 100L), (1L, 5L, 6L), (1L, 50L, 60L), (1L, 101L, 102L))
      .toDF("k", "s", "e")
    val out = TimeSeries.mergeIntervals(df, "k", "s", "e")
      .select(col("s"), col("e"), col("n_merged"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 100L, 3L), (101L, 102L, 1L)))
  }

  test("ema lookback bounds the frame: rows beyond it stop influencing the fold") {
    val df = (1 to 5).map(i => (1L, ts(f"2024-01-01 00:00:0$i"), i, if (i == 1) 1000.0 else 2.0))
      .toDF("k", "t", "id", "v")
    // lookback=2: row 3 onward sees only constant-2 history -> ema exactly 2
    val got = TimeSeries.ema(df, "k", "t", "id", "v", alpha = 0.25, lookback = 2)
      .select(col("id"), col("ema")).as[(Int, Double)].collect().toMap
    assert(got(3) == 2.0 && got(5) == 2.0)
    assert(got(2) == 0.75 * 1000.0 + 0.25 * 2.0) // row 2 still sees the spike
  }
}
