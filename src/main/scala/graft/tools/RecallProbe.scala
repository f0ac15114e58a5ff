package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{GraphAnn, IvfSearch, SimilaritySearch}

/** One-shot probe: per-SF recall of the production-knob ANN arms over
  * the natural embeddings fixture — picks the gate knobs for
  * ann_hnsw_recall / ann_ivf_recall (delete before commit if temporary;
  * kept while tuning).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .persist()
      val n = corpus.count()
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val exact = SimilaritySearch.bruteForceTopK(corpus, queries, 5)
        .persist()
      exact.count()
      for (ef <- Seq(16, 32, 64)) {
        val r = SimilaritySearch.recall(exact,
            GraphAnn.hnswTopK(corpus, queries, 5, m = 8, efConstruction = 32,
              efSearch = ef, nShards = 4), 5)
          .agg(sum("recalled"), count(lit(1))).head()
        println(s"[recall] $sf n=$n hnsw ef=$ef -> ${r.getLong(0)}/${r.getLong(1) * 5}")
      }
      for ((nl, np) <- Seq((16, 8), (16, 12), (16, 14), (8, 6), (32, 24))) {
        val r = SimilaritySearch.recall(exact,
            IvfSearch.ivfTopK(corpus, queries, 5, nLists = nl, nProbe = np), 5)
          .agg(sum("recalled"), count(lit(1))).head()
        println(s"[recall] $sf n=$n ivf $np/$nl -> ${r.getLong(0)}/${r.getLong(1) * 5}")
      }
      corpus.unpersist(); exact.unpersist()
    }
    spark.stop()
  }
}
