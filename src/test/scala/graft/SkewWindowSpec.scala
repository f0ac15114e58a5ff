package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewWindow

/** Two-phase global running sum: must equal the single-partition
  * window exactly (decimal accumulation is grouping-invariant) while
  * planning a CHUNK-partitioned window instead of the one-task sort.
  */
class SkewWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 5000)
    .map(i => (i.toLong, (i % 97).toDouble + 0.25)).toDF("k", "v")

  test("chunked running sum equals the sequential window exactly") {
    val naive = df.withColumn("running",
        sum(col("v").cast("decimal(28,6)")).over(
          Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("decimal(38,6)"))
      .select("k", "running").as[(Long, BigDecimal)].collect().toMap
    val chunked = SkewWindow.globalRunningSum(df, "k", "v", chunks = 16)
      .select("k", "running").as[(Long, BigDecimal)].collect().toMap
    assert(chunked == naive)
  }

  test("the window partitions by chunk — no single-partition global sort") {
    val plan = SkewWindow.globalRunningSum(df, "k", "v", chunks = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__chunk"),
      s"expected a chunk-partitioned window exchange:\n${plan.take(2000)}")
  }

  test("degenerate cases: one chunk, and more chunks than distinct values") {
    val tiny = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
    for (c <- Seq(1, 8)) {
      val got = SkewWindow.globalRunningSum(tiny, "k", "v", chunks = c)
        .select("k", "running").as[(Long, BigDecimal)].collect().toMap
      assert(got.view.mapValues(_.toDouble).toMap ==
        Map(1L -> 1.0, 2L -> 3.0, 3L -> 6.0), s"chunks=$c")
    }
  }
}
