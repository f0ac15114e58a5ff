package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{NativeHash, Text}
import graft.operators.{ClusterDedup, OverlapJoin, Par}

/** Same-JVM interleaved A/B of the adaptive route vs the forced
  * clustered arm — one JVM, alternating reps, so host drift hits both
  * arms equally. Throwaway measurement tool for the r17 round.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def zh = docs.filter(col("lang") === "zh")
    def tok1(df: DataFrame) = df.select(col("doc_id"), col("text"))

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "overlap_join A" -> (() => OverlapJoin.pairsClustered(tok1(docs), "doc_id",
        NativeHash.shingleHashes(Text.tokens(col("text")), 1), 30)),
      "overlap_join C" -> (() => OverlapJoin.pairsClustered(tok1(docs), "doc_id",
        NativeHash.shingleHashes(Text.tokens(col("text")), 1), 30, adaptive = false)),
      "overlap_topk A" -> (() => OverlapJoin.topK(tok1(docs), "doc_id",
        NativeHash.shingleHashes(Text.tokens(col("text")), 1), 30, 5)),
      "overlap_topk C" -> (() => OverlapJoin.topK(tok1(docs), "doc_id",
        NativeHash.shingleHashes(Text.tokens(col("text")), 1), 30, 5, adaptive = false)),
      "chargram_cl  A" -> (() => ClusterDedup.pairsClusteredBy(zh, "doc_id",
        NativeHash.charShingleHashes(col("text"), 3), 0.6)),
      "chargram_cl  C" -> (() => ClusterDedup.pairsClusteredBy(zh, "doc_id",
        NativeHash.charShingleHashes(col("text"), 3), 0.6, adaptive = false)),
      "jaccard_topk A" -> (() => ClusterDedup.topKBy(zh, "doc_id",
        NativeHash.charShingleHashes(col("text"), 3), 0.6, 3)),
      "jaccard_topk C" -> (() => ClusterDedup.topKBy(zh, "doc_id",
        NativeHash.charShingleHashes(col("text"), 3), 0.6, 3, adaptive = false)),
    )
    // warm every arm once
    arms.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache(); Par.sweepBlocks(spark)
    }
    val walls = scala.collection.mutable.Map.empty[String, List[Double]]
    for (rep <- 1 to 3; (name, f) <- arms) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      walls(name) = s :: walls.getOrElse(name, Nil)
      spark.catalog.clearCache(); Par.sweepBlocks(spark)
    }
    arms.foreach { case (name, _) =>
      val ws = walls(name).sorted
      println(f"[ab] $name%-15s median=${ws(ws.size / 2)}%6.2f reps=${ws.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
