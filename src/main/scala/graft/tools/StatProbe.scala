package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{NativeHash, Text}
import graft.operators.Par

/** Throwaway decomposition of the route probe's statAgg (r18): which
  * of count / HLL(sets) / HLL(band buckets) costs the 3.3 s. Delete
  * when measured.
  */
object StatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hashed = Par.widen(docs)
      .select(col("doc_id").as("id"),
        NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
      .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n"))
      .persist(MEMORY_AND_DISK)
    val nonEmpty = hashed.where(col("n") > 0)
    hashed.count()

    def time(name: String)(body: => Any): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val r = body
      println(f"[stat] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }

    time("count only")(nonEmpty.agg(count(lit(1))).head())
    time("hll xxhash64(__sh) rsd=0.01")(
      nonEmpty.agg(approx_count_distinct(xxhash64(col("__sh")), 0.01)).head())
    time("hll xxhash64(__sh) rsd=0.05")(
      nonEmpty.agg(approx_count_distinct(xxhash64(col("__sh")), 0.05)).head())
    time("hll band-bucket rsd=0.01")(
      nonEmpty.agg(approx_count_distinct(element_at(
        NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1), 0.01)).head())
    time("band-bucket compute only (max)")(
      nonEmpty.agg(max(element_at(
        NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1))).head())
    time("xxhash64(__sh) compute only (max)")(
      nonEmpty.agg(max(xxhash64(col("__sh")))).head())
    time("hll band-bucket rsd=0.02")(
      nonEmpty.agg(approx_count_distinct(element_at(
        NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1), 0.02)).head())
    time("all three fused (the real statAgg)")(
      nonEmpty.agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.01),
        approx_count_distinct(element_at(
          NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1), 0.01)).head())
    time("fused, rsd=0.05")(
      nonEmpty.agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.05),
        approx_count_distinct(element_at(
          NativeHash.minhashBandBucketsHashed(col("__sh"), 4, 1), 1), 0.05)).head())
    spark.stop()
  }
}
