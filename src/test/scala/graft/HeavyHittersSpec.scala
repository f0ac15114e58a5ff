package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** Misra-Gries + exact recount: result must equal the brute-force
  * groupBy at every k above the losslessness bound, even when k is far
  * smaller than the distinct-item count (the sketch's whole point).
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2000 rows of "noise" singletons + planted hitters with known counts
  private lazy val items = (
    (1 to 2000).map(i => s"noise_$i") ++
    Seq.fill(300)("alpha") ++ Seq.fill(150)("beta") ++
    Seq.fill(40)("gamma") ++ Seq.fill(10)("delta")
  ).toDF("item")

  private def brute(frac: Double): Set[(String, Long)] = {
    val n = items.count()
    val thr = math.ceil(frac * n).toLong
    items.groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr).as[(String, Long)].collect().toSet
  }

  test("matches brute force with k far below the distinct count") {
    // 2504 distinct items, k=64 counters; frac=0.02 > 1/65
    val got = HeavyHitters.exact(items, "item", frac = 0.02, k = 64)
      .as[(String, Long)].collect().toSet
    assert(got == brute(0.02))
    assert(got == Set(("alpha", 300L), ("beta", 150L))) // gamma/delta below 2%
  }

  test("lower threshold with adequate k still exact") {
    // frac=0.004 needs k > 250
    val got = HeavyHitters.exact(items, "item", frac = 0.004, k = 512)
      .as[(String, Long)].collect().toSet
    assert(got == brute(0.004))
    // thr = ceil(0.004 * 2500) = 10; delta sits exactly on the floor
    assert(got.map(_._1) == Set("alpha", "beta", "gamma", "delta"))
  }

  test("frac below the MG guarantee is rejected, not silently lossy") {
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(items, "item", frac = 0.001, k = 64)
    }
  }

  test("null items are skipped, not counted") {
    val withNulls = items.union(Seq.fill(5)(null.asInstanceOf[String]).toDF("item"))
    val got = HeavyHitters.exact(withNulls, "item", frac = 0.02, k = 64)
      .as[(String, Long)].collect().toSet
    // N includes only non-null rows (2505 -> threshold unchanged at 51)
    assert(got == Set(("alpha", 300L), ("beta", 150L)))
  }
}
