package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{NativeHash, Text}
import graft.operators.JaccardDedup

/** Stage-by-stage profile of the dedup_clusters PPJoin on the soak
  * corpus (/tmp/graft_sf1): where do the 300+ seconds go — prefix
  * index, candidate join, or merge-walk verify?
  */
object ClustersProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(
        SparkSession.builder().master("local[16]"), "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val hashed = docs.select(col("doc_id"),
        NativeHash.shingleHashes(Text.tokens(col("text")), 2).as("__sh"))
      .select(col("doc_id"), col("__sh"), size(col("__sh")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = timed("shingle+persist")(hashed.count())
    val stats = hashed.agg(avg("n"), max("n")).collect().head
    println(s"PROF docs=$nDocs avgShingles=${stats.getDouble(0)} maxShingles=${stats.getInt(1)}")

    val index = hashed.select(col("doc_id"), explode(col("__sh")).as("s"), col("n"))
    val prefix = timed("prefixIndex")(
      JaccardDedup.prefixIndex(index, "doc_id", 0.3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    println(s"PROF prefixRows=${prefix.count()}")

    val cands = timed("prefixCandidates+distinct")(
      JaccardDedup.prefixCandidates(index, "doc_id", 0.3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    println(s"PROF candidates=${cands.count()}")

    def joined = cands
      .join(hashed.select(col("doc_id").as("id_a"), col("__sh").as("__sha"), col("n").as("n_a")), Seq("id_a"))
      .join(hashed.select(col("doc_id").as("id_b"), col("__sh").as("__shb"), col("n").as("n_b")), Seq("id_b"))
    val verified = timed("verify full-walk")(
      joined
        .withColumn("c", NativeHash.sortedIntersectCount(col("__sha"), col("__shb")))
        .withColumn("jaccard", col("c") / (col("n_a") + col("n_b") - col("c")))
        .filter(col("jaccard") >= 0.3)
        .count())
    println(s"PROF truePairs=$verified")
    val alpha = ceil((col("n_a") + col("n_b")) * (0.3 / 1.3) - lit(1e-9)).cast("int")
    val verified2 = timed("verify early-exit")(
      joined
        .withColumn("c", NativeHash.sortedIntersectAtLeast(col("__sha"), col("__shb"), alpha))
        .filter(col("c") >= 0)
        .withColumn("jaccard", col("c") / (col("n_a") + col("n_b") - col("c")))
        .filter(col("jaccard") >= 0.3)
        .count())
    println(s"PROF truePairsEarlyExit=$verified2")

    // raw (pre-distinct) candidate stream: how much multiplicity does
    // the distinct exchange remove, and is verify-then-distinct cheaper?
    val pfx = JaccardDedup.prefixIndex(index, "doc_id", 0.3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pfx.count()
    val a = pfx.select(col("s").as("__sa"), col("doc_id").as("id_a"),
      col("n").as("__na"), col("pos").as("__pa"))
    val b = pfx.select(col("s").as("__sb"), col("doc_id").as("id_b"),
      col("n").as("__nb"), col("pos").as("__pb"))
    val alphaJ = ceil((col("__na") + col("__nb")) * (0.3 / 1.3) - lit(1e-9))
    def raw = a.join(b,
      col("__sa") === col("__sb") && col("id_a") < col("id_b") &&
      greatest(col("__na"), col("__nb")) * 0.3 <= least(col("__na"), col("__nb")) + lit(1e-9) &&
      lit(1) + least(col("__na") - col("__pa"), col("__nb") - col("__pb")) >= alphaJ)
      .select("id_a", "id_b")
    val nRaw = timed("raw candidates count")(raw.count())
    println(s"PROF rawCandidates=$nRaw multiplicity=${nRaw.toDouble / 634292644L}")
    val t0 = System.nanoTime()
    val d = timed("distinct materialize")(raw.distinct().count())
    val v3 = timed("verify raw, distinct after")(
      raw
        .join(hashed.select(col("doc_id").as("id_a"), col("__sh").as("__sha"), col("n").as("n_a")), Seq("id_a"))
        .join(hashed.select(col("doc_id").as("id_b"), col("__sh").as("__shb"), col("n").as("n_b")), Seq("id_b"))
        .withColumn("c", NativeHash.sortedIntersectAtLeast(col("__sha"), col("__shb"),
          ceil((col("n_a") + col("n_b")) * (0.3 / 1.3) - lit(1e-9)).cast("int")))
        .filter(col("c") >= 0)
        .select(col("id_a"), col("id_b"), col("c"), col("n_a"), col("n_b"))
        .distinct()
        .count())
    println(s"PROF distinctCands=$d verifyRawPairs=$v3 (t=${(System.nanoTime()-t0)/1e9})")
    spark.stop()
  }
}

/** End-to-end split of the soak's dedup_clusters body: pair pipeline
  * materialization vs connected-components, timed separately.
  */
object ClustersSplit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(
        SparkSession.builder().master("local[16]"), "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SPLIT $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    val pairs = JaccardDedup.nearDupPairs(docs, "doc_id", "text",
        nGram = 2, threshold = 0.3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = timed("pairs materialize")(pairs.count())
    println(s"SPLIT pairs=$n")
    val cc = timed("connectedComponents")(
      graft.operators.Components.connectedComponents(pairs, "id_a", "id_b",
        Some(docs.select(col("doc_id")))).count())
    println(s"SPLIT ccRows=$cc")
    spark.stop()
  }
}
