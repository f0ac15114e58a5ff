package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

/** As-of and range join edge semantics. */
class JoinOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOf: latest prior right row wins; equal timestamps match inclusively") {
    val left = Seq((1L, ts(100), "e1"), (1L, ts(200), "e2"), (1L, ts(50), "e0"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, ts(100), "r100"), (1L, ts(150), "r150"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("ev", "rv").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("e0") == null) // before any right row
    assert(out("e1") == "r100") // equal timestamp matches (inclusive)
    assert(out("e2") == "r150") // latest prior, not just any prior
  }

  test("asOf: keys never leak matches across groups") {
    val left = Seq((1L, ts(100), "a"), (2L, ts(100), "b")).toDF("k", "t", "ev")
    val right = Seq((1L, ts(50), "only-k1")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("ev", "rv").collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("a").contains("only-k1") && out("b").isEmpty)
  }

  test("asOf rejects colliding right value column names") {
    val l = Seq((1L, ts(1), "x")).toDF("k", "t", "v")
    val r = Seq((1L, ts(1), "y")).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "t", "rt", Seq("v"))
    }
  }

  test("range join: half-open boundaries, equals brute-force inequality join") {
    val points = Seq(0.0, 9.99, 10.0, 15.0, 20.0, 25.0, 35.0).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    val intervals = Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0))
      .toDF("band", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 7.0)
      .select("id", "band").as[(Long, Int)].collect().toSet
    val exp = points.crossJoin(intervals)
      .filter($"x" >= $"lo" && $"x" < $"hi")
      .select("id", "band").as[(Long, Int)].collect().toSet
    assert(got == exp)
    // boundary pins: 10.0 is in band 1 not band 0; 35.0 matches nothing
    assert(got.contains((2L, 1)) && !got.contains((2L, 0)))
    assert(!got.exists(_._1 == 6L))
  }

  test("range join handles overlapping intervals (a point can match several)") {
    val points = Seq((1L, 5.0)).toDF("id", "x")
    val intervals = Seq((10, 0.0, 10.0), (20, 4.0, 6.0)).toDF("band", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 3.0)
      .select("band").as[Int].collect().toSet
    assert(got == Set(10, 20))
  }
}
