package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** Bounded-memory exact quantiles vs the sort-the-group ground truth —
  * tiny buckets/collectLimit force multiple refinement rounds, mass
  * points must resolve via the min==max cell exit.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def truthQuantile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val h = (s.length - 1) * p
    val k0 = math.floor(h).toInt
    val k1 = math.ceil(h).toInt
    // the weighted form — bit-identical to Spark's percentile and
    // DuckDB's quantile_cont (v0 + f·(v1−v0) differs in the last ulp)
    if (k0 == k1) s(k0) else (k1 - h) * s(k0) + (h - k0) * s(k1)
  }

  test("exactQuantiles equals the sorted ground truth under forced refinement") {
    val rng = new scala.util.Random(11)
    val a = Seq.fill(5000)(rng.nextDouble() * 1000.0)
    val b = Seq.fill(3000)(rng.nextGaussian() * 50.0 - 10.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val ps = Seq(0.01, 0.5, 0.9, 0.999)
    // buckets=8, collectLimit=16: thousands of values per group cannot
    // resolve in one round — the walk must recurse several times
    val got = Quantiles.exactQuantiles(df, "g", "v", ps, buckets = 8, collectLimit = 16)
    ps.foreach { p =>
      assert(got("a")(p) == truthQuantile(a, p), s"group a p=$p")
      assert(got("b")(p) == truthQuantile(b, p), s"group b p=$p")
    }
  }

  test("mass points resolve through the min==max cell, never collected") {
    // 10k copies of 7.25 around sparse outliers: the median cell stops
    // shrinking by width but min==max short-circuits it
    val xs = Seq.fill(10000)(7.25) ++ Seq(-1e9, 1e9, 3.0, 11.0)
    val df = xs.map(("m", _)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, "g", "v", Seq(0.5, 0.1),
      buckets = 4, collectLimit = 2) // collectLimit below the mass size
    assert(got("m")(0.5) == 7.25 && got("m")(0.1) == 7.25)
  }

  test("interpolated ranks straddling two values match percentile exactly") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0) // p=0.5 -> h=1.5 -> 2 + 0.5*(4-2) = 3
    val df = xs.map(("s", _)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, "g", "v", Seq(0.5), buckets = 4, collectLimit = 1)
    assert(got("s")(0.5) == 3.0)
    // tiny group, rank at the ends
    val ends = Quantiles.exactQuantiles(df, "g", "v", Seq(0.0, 1.0), buckets = 4, collectLimit = 1)
    assert(ends("s")(0.0) == 1.0 && ends("s")(1.0) == 8.0)
  }

  test("nulls are excluded like percentile/quantile_cont") {
    val df = (Seq(Some(1.0), None, Some(3.0), None, Some(5.0)).map(("n", _))).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, "g", "v", Seq(0.5), buckets = 4, collectLimit = 8)
    assert(got("n")(0.5) == 3.0)
  }
}
