package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}
import graft.functions.{NativeHash, Text}
import graft.operators.Par

/** Throwaway micro-bench of the dedup pipelines' shared passes at
  * SPARK_GRAFT_SF_DIR — times each sub-pipeline twice and prints the
  * second (warm) wall. Delete when the round's measurements are done.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(body: => Unit): Unit = {
      body // warm
      spark.catalog.clearCache(); Par.sweepBlocks(spark)
      val t0 = System.nanoTime()
      body
      println(f"[micro] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      spark.catalog.clearCache(); Par.sweepBlocks(spark)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println(s"[micro] docs rows = ${docs.count()}")

    time("scan text only")(noop(docs.select("doc_id", "text")))
    time("scan+widen")(noop(Par.widen(docs.select("doc_id", "text"))))
    time("scan+widen+tokens")(noop(Par.widen(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))))
    time("scan+widen+shingle2")(noop(Par.widen(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))))
    time("hashed CUT+HLL probe") {
      val hashed = Par.cut(Par.widen(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id").as("id"),
          NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
        .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n")))
      hashed.where(col("n") > 0).agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.01)).head()
      Par.free(hashed)
    }
    time("hashed persist(uncompressed)+HLL probe") {
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
      val hashed = Par.widen(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id").as("id"),
          NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
        .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n"))
        .persist(MEMORY_AND_DISK)
      hashed.where(col("n") > 0).agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.01)).head()
      hashed.unpersist(false)
      spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    }
    time("hashed persist+HLL probe") {
      val hashed = Par.widen(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id").as("id"),
          NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
        .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n"))
        .persist(MEMORY_AND_DISK)
      hashed.where(col("n") > 0).agg(count(lit(1)),
        approx_count_distinct(xxhash64(col("__sh")), 0.01)).head()
      hashed.unpersist(false)
    }
    time("prefix index build+persist+candvol") {
      val hashed = Par.widen(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id").as("id"),
          NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
        .select(col("id"), col("__sh"), coalesce(size(col("__sh")), lit(0)).as("n"))
        .persist(MEMORY_AND_DISK)
      val idx = hashed.where(col("n") > 0)
        .select(col("id"), explode(col("__sh")).as("s"), col("n"))
      val prefix = graft.operators.JaccardDedup.prefixIndex(idx, "id", 0.3)
        .persist(MEMORY_AND_DISK)
      prefix.groupBy("s").agg(count(lit(1)).as("c"))
        .agg(sum(col("c").cast("double") * col("c").cast("double"))).head()
      hashed.unpersist(false); prefix.unpersist(false)
    }
    time("plain nearDupPairs+noop")(noop(
      graft.operators.JaccardDedup.nearDupPairs(
        Par.widen(docs), "doc_id", "text", 2, 0.3)))
    time("components adaptive+noop")(noop(
      graft.operators.ClusterDedup.components(
        Par.widen(docs), "doc_id", "text", 2, 0.3)))
    spark.stop()
  }
}
