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
}
