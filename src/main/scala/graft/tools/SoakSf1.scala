package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Text
import graft.operators._

/** One-shot sf1 soak (r10 verdict task #3): replicate the sf0.1
  * documents/embeddings 10× (≈sf1 for the LLM-pipeline tables), run
  * the dedup / ANN / clustering operators ONCE each, and print per-op
  * wall-time + shuffle-write bytes. The goal is measured scaling
  * evidence beyond sf0.1 for the 100-TB plan-shape arguments — not an
  * oracle check (sf0.01 correctness covers that).
  *
  * Replicas: doc_id*10+r; r=0 keeps the exact text (exact-dup load),
  * r>0 appends a 2-token marker (near-dup load for MinHash/winnow).
  * Embeddings are scaled by (1 + r/1000): cosine-identical copies —
  * throughput soak, recall is pinned elsewhere.
  *
  *   SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.tools.SoakSf1"
  */
object SoakSf1 {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SOAK_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // ---- build the 10× corpus (written once, reused on re-runs) ----
    val docsPath = s"$out/documents.parquet"
    val embPath = s"$out/embeddings.parquet"
    if (!new java.io.File(docsPath).exists()) {
      val reps = spark.range(10).select(col("id").as("r"))
      spark.read.parquet(s"$src/documents.parquet").crossJoin(reps)
        .select((col("doc_id") * 10 + col("r")).as("doc_id"),
          when(col("r") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" rep "), col("r"))).as("text"),
          col("lang"), col("source"))
        .repartition(32).write.mode("overwrite").parquet(docsPath)
      spark.read.parquet(s"$src/embeddings.parquet").crossJoin(reps)
        .select((col("vec_id") * 10 + col("r")).as("vec_id"),
          transform(col("embedding"),
            x => (x * (lit(1.0f) + col("r").cast("float") / 1000f)).cast("float"))
            .as("embedding"),
          col("label"))
        .repartition(32).write.mode("overwrite").parquet(embPath)
    }
    val docs = spark.read.parquet(docsPath)
    val emb = spark.read.parquet(embPath)
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    println(s"corpus: ${docs.count()} docs, ${emb.count()} vectors")

    val only = args.toSet // run everything when no names given
    def soak(name: String)(body: => Long): Unit = if (only.isEmpty || only(name)) {
      val sb0 = shuffleBytes.get(); val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = (shuffleBytes.get() - sb0) / 1e6
      println(f"SOAK $name%-22s ${sec}%8.1f s  $rows%10d rows  shuffleWrite ${mb}%9.1f MB")
    }

    soak("dedup_minhash") {
      MinHashDedup.nearDupPairs(docs, "doc_id", "text", nGram = 2, threshold = 0.8).count()
    }
    soak("dedup_simhash") {
      val sigs = docs.select(col("doc_id"),
        graft.functions.NativeHash.portableSimhash60(Text.tokens(col("text"))).as("sig"))
      SimHashDedup.nearDupPairsFromSigs(sigs, "doc_id", "sig", maxDist = 7).count()
    }
    soak("dedup_winnow") {
      SubstringDedup.winnowedSpans(docs, "doc_id", "text",
        window = 30, guard = 8, minDocs = 2, portable = false).count()
    }
    soak("dedup_substring") {
      SubstringDedup.duplicatedSpans(docs, "doc_id", "text",
        window = 40, sampleMod = 4, minDocs = 2, portable = false).count()
    }
    soak("dedup_clusters_scalable") {
      ClusterDedup.components(docs, "doc_id", "text",
        nGram = 2, threshold = 0.3).count()
    }
    // the direct pipeline (the `dedup_clusters` driver row), kept
    // measurable for the comparison — the g² candidate pathology:
    // 331.8 s in the r11 soak, 244 s same-host r12
    soak("dedup_clusters") {
      val pairs = JaccardDedup.nearDupPairs(docs, "doc_id", "text",
        nGram = 2, threshold = 0.3)
      Components.connectedComponents(pairs, "id_a", "id_b",
        Some(docs.select(col("doc_id")))).count()
    }
    soak("ann_bruteforce") {
      SimilaritySearch.bruteForceTopK(corpus, queries, 10).count()
    }
    soak("ann_srp") {
      SimilaritySearch.srpTopK(corpus, queries, 10, dim = 64).count()
    }
    soak("ann_ivf") {
      IvfSearch.ivfTopK(corpus, queries, 10, nLists = 64, nProbe = 16).count()
    }
    soak("ann_ivfpq") {
      val c = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = c.count()
      val r = PqSearch.ivfPqTopK(c, queries, 10, dim = 64, corpusSize = Some(n)).count()
      c.unpersist(); r
    }
    println("SOAK done")
    spark.stop()
  }
}
