package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sink

/** Physical-layout features that matter at scale: bucketed co-located
  * joins (no exchange) and partition pruning on partitioned writes.
  */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of two co-bucketed tables plans ZERO exchanges") {
    spark.sql("DROP TABLE IF EXISTS bk_a"); spark.sql("DROP TABLE IF EXISTS bk_b")
    Sink.bucketTable((1 to 1000).map(i => (i.toLong % 100, s"a$i")).toDF("k", "va"),
      "bk_a", Seq("k"), nBuckets = 8, sortCols = Seq("k"))
    Sink.bucketTable((1 to 500).map(i => (i.toLong % 100, s"b$i")).toDF("k", "vb"),
      "bk_b", Seq("k"), nBuckets = 8, sortCols = Seq("k"))
    // force sort-merge (broadcast would hide the bucketing effect)
    val joined = spark.table("bk_a").hint("merge")
      .join(spark.table("bk_b").hint("merge"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000 * 5) // each k has 10 a-rows x 5 b-rows
    spark.sql("DROP TABLE bk_a"); spark.sql("DROP TABLE bk_b")
  }

  test("aggregation on the bucket key plans zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS bk_g")
    Sink.bucketTable((1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v"),
      "bk_g", Seq("k"), nBuckets = 4)
    val agg = spark.table("bk_g").groupBy("k").agg(sum("v").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg should not shuffle:\n$plan")
    assert(agg.count() == 50)
    spark.sql("DROP TABLE bk_g")
  }

  test("partitioned write prunes partitions on read (PartitionFilters)") {
    val dir = Files.createTempDirectory("part").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"2026-0${i % 3 + 1}", i * 1.0)).toDF("id", "month", "x")
      .write.partitionBy("month").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("month") === "2026-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2026-01"))
    assert(pruned.count() == (1 to 100).count(_ % 3 == 0))
  }
}
