package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Source

/** S5 split-scan semantics (reference `dumper/sql.py:70-97,132-159`,
  * intended — not buggy — behavior per SURVEY.md §2.6): half-open ranges,
  * closed last range, NULL-bounds fallback, small-span collapse, and
  * integral stride arithmetic for integral keys.
  */
class SplitScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assertLossless(df: org.apache.spark.sql.DataFrame, colName: String, splits: Int): Unit = {
    val parts = Source.splitRanges(df, colName, splits)
    val total = parts.map(_.count()).sum
    assert(total == df.count(), s"split union lost/duplicated rows: $total vs ${df.count()}")
  }

  test("integral split covers every row exactly once (incl. boundary values)") {
    val df = (0L to 1000L).toDF("k")
    assertLossless(df, "k", 7)
    val parts = Source.splitRanges(df, "k", 7)
    assert(parts.size == 7)
    // ranges are disjoint: pairwise intersection empty
    val ids = parts.map(_.as[Long].collect().toSet)
    for (i <- ids.indices; j <- ids.indices if i < j)
      assert(ids(i).intersect(ids(j)).isEmpty, s"ranges $i and $j overlap")
  }

  test("large 64-bit keys split losslessly (integral stride, no FP rounding)") {
    val base = Long.MaxValue - 10000
    val df = (0L until 1000L).map(base + _).toDF("k")
    assertLossless(df, "k", 4)
  }

  test("span smaller than splits collapses to a single full scan") {
    val df = Seq(5L, 6L, 7L).toDF("k")
    val parts = Source.splitRanges(df, "k", 10)
    assert(parts.size == 1)
    assert(parts.head.count() == 3)
  }

  test("empty input (NULL bounds) falls back to single scan") {
    val df = Seq.empty[Long].toDF("k")
    val parts = Source.splitRanges(df, "k", 4)
    assert(parts.size == 1 && parts.head.count() == 0)
  }

  test("splits <= 1 returns the frame unsplit") {
    val df = (1L to 10L).toDF("k")
    assert(Source.splitRanges(df, "k", 1).size == 1)
  }

  test("timestamp split is lossless") {
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val df = (0 until 500).map(i => new Timestamp(t0.getTime + i * 60000L)).toDF("ts")
    assertLossless(df, "ts", 5)
  }

  test("date split is lossless") {
    val d0 = Date.valueOf("2026-01-01")
    val df = (0 until 365).map(i => new Date(d0.getTime + i * 86400000L)).toDF("d")
    assertLossless(df, "d", 6)
  }

  test("fractional (double) split is lossless") {
    val df = (0 until 1000).map(_ * 0.37).toDF("x")
    assertLossless(df, "x", 8)
  }

  test("boundary probe returns true min/max") {
    val df = Seq(3L, -7L, 42L).toDF("k")
    val r = Source.boundary(df, "k").head()
    assert(r.getLong(0) == -7L && r.getLong(1) == 42L)
  }
}
