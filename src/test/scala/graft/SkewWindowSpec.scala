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

  test("null values match the sequential window: skipped, with a null leading prefix") {
    // nulls at the head (incl. a WHOLE leading chunk of nulls at high
    // chunk counts) and in the middle; compare against the naive window
    val dfn = Seq[(Long, Option[Double])](
      (1L, None), (2L, None), (3L, Some(1.5)), (4L, None), (5L, Some(2.5)), (6L, Some(3.0))
    ).toDF("k", "v")
    val naive = dfn.withColumn("running",
        sum(col("v").cast("decimal(28,6)")).over(
          Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("decimal(38,6)"))
      .select("k", "running").as[(Long, Option[BigDecimal])].collect().toMap
    for (c <- Seq(1, 3, 8)) {
      val got = SkewWindow.globalRunningSum(dfn, "k", "v", chunks = c)
        .select("k", "running").as[(Long, Option[BigDecimal])].collect().toMap
      assert(got == naive, s"chunks=$c")
    }
  }

  test("input frames already using an output/work column name are rejected") {
    val bad = Seq((1L, 1.0, 0.0)).toDF("k", "v", "running")
    intercept[IllegalArgumentException] {
      SkewWindow.globalRunningSum(bad, "k", "v")
    }
  }

  test("non-numeric order keys are rejected with a clear contract error") {
    val ts = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0)).toDF("t", "v")
    intercept[IllegalArgumentException] {
      SkewWindow.globalRunningSum(ts, "t", "v")
    }
  }

  test("globalRank equals row_number over the one-task window, asc and desc with ties") {
    // duplicate primary values force the tie-break path; 7 chunks on
    // 200 rows forces boundary ties into shared chunks
    val dft = (1 to 200).map(i => (i.toLong, (i % 13).toDouble)).toDF("id", "p")
    for (desc <- Seq(false, true)) {
      val primary = if (desc) col("p").desc else col("p").asc
      val naive = dft.withColumn("rank",
          row_number().over(Window.orderBy(primary, col("id").asc)))
        .select("id", "rank").as[(Long, Long)].collect().toMap
      val chunked = SkewWindow.globalRank(dft, "p", descending = desc,
          tieBreak = Seq(col("id").asc), chunks = 7)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(chunked == naive, s"desc=$desc")
    }
  }

  test("globalNtile equals the ntile window incl. uneven buckets and n > N") {
    val dft = (1 to 103).map(i => (i.toLong, (i * 37 % 103).toDouble)).toDF("id", "p")
    for (n <- Seq(1, 4, 10, 200)) {
      val naive = dft.withColumn("nt",
          ntile(n).over(Window.orderBy(col("p").asc, col("id").asc)))
        .select("id", "nt").as[(Long, Int)].collect().toMap
      val chunked = SkewWindow.globalNtile(dft, "p", n,
          tieBreak = Seq(col("id").asc), chunks = 5)
        .select(col("id"), col("ntile")).as[(Long, Int)].collect().toMap
      assert(chunked == naive, s"n=$n")
    }
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

  test("no persisted blocks outlive a call — probe caches are released (round-6 verdict)") {
    val dft = (1 to 300).map(i => (i.toLong, (i % 13).toDouble)).toDF("id", "p")
    val dfs = (1L to 300L).map(i => (i, s"k${i % 7}")).toDF("id", "k")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SkewWindow.globalRunningSum(dft, "id", "p", chunks = 8).count()
    SkewWindow.globalRank(dft, "p", tieBreak = Seq(col("id").asc), chunks = 8).count()
    SkewWindow.globalRankBySample(dfs, "k", Seq(col("id").asc), chunks = 8).count()
    SkewWindow.globalNtile(dft, "p", 4, tieBreak = Seq(col("id").asc), chunks = 8).count()
    SkewWindow.globalRunningMax(dft, "id", "p", chunks = 8).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("globalRunningMax equals the sequential strictly-earlier range window") {
    // heavy order-value ties (day-like key: 200 rows over 23 distinct
    // days) so boundary ties and same-day groups are both exercised
    val dfm = (1 to 200).map(i => (i.toLong, (i % 23).toLong, (i * 37 % 101).toDouble))
      .toDF("id", "day", "price")
    val naive = dfm.withColumn("running_max",
        max("price").over(Window.orderBy("day")
          .rangeBetween(Window.unboundedPreceding, -1)))
      .select("id", "running_max").as[(Long, Option[Double])].collect().toMap
    for (c <- Seq(1, 7, 32)) {
      val got = SkewWindow.globalRunningMax(dfm, "day", "price", chunks = c)
        .select("id", "running_max").as[(Long, Option[Double])].collect().toMap
      assert(got == naive, s"chunks=$c")
    }
  }

  test("globalRunningMax: null values are skipped, incl. an all-null leading chunk") {
    val dfn = Seq[(Long, Long, Option[Double])](
      (1L, 0L, None), (2L, 1L, None), (3L, 2L, Some(5.0)),
      (4L, 3L, None), (5L, 4L, Some(2.0)), (6L, 5L, Some(9.0)), (7L, 6L, None)
    ).toDF("id", "day", "price")
    val naive = dfn.withColumn("running_max",
        max("price").over(Window.orderBy("day")
          .rangeBetween(Window.unboundedPreceding, -1)))
      .select("id", "running_max").as[(Long, Option[Double])].collect().toMap
    for (c <- Seq(1, 3, 8)) {
      val got = SkewWindow.globalRunningMax(dfn, "day", "price", chunks = c)
        .select("id", "running_max").as[(Long, Option[Double])].collect().toMap
      assert(got == naive, s"chunks=$c")
    }
  }

  test("globalRunningMax partitions the window by chunk — no one-task global sort") {
    val dfm = (1 to 5000).map(i => (i.toLong, (i % 365).toLong, i.toDouble)).toDF("id", "day", "price")
    val plan = SkewWindow.globalRunningMax(dfm, "day", "price", chunks = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__chunk"),
      s"expected a chunk-partitioned window exchange:\n${plan.take(2000)}")
  }

  test("globalRunningMax rejects non-integral order keys and name collisions") {
    val bad = Seq((1.5, 1.0)).toDF("day", "price")
    intercept[IllegalArgumentException] {
      SkewWindow.globalRunningMax(bad, "day", "price")
    }
    val clash = Seq((1L, 1.0, 0.0)).toDF("day", "price", "running_max")
    intercept[IllegalArgumentException] {
      SkewWindow.globalRunningMax(clash, "day", "price")
    }
  }

  test("globalRankBySample equals the one-task row_number on string keys with heavy ties") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 500L).map(i =>
        (i, (0 until 3).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)) // 64 keys, ~8x ties
      .toDF("id", "k")
    val naive = df.withColumn("r",
        row_number().over(Window.orderBy(col("k").asc, col("id").asc)))
      .select("id", "r").as[(Long, Int)].collect().toMap
    for (c <- Seq(1, 7, 32, 600)) {
      val got = SkewWindow.globalRankBySample(df, "k", Seq(col("id").asc), chunks = c)
        .select(col("id"), col("rank")).as[(Long, Long)].collect().toMap
      assert(got == naive.view.mapValues(_.toLong).toMap, s"chunks=$c")
    }
  }
}
