package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Embeddings

/** One-shot measurement probe for the SemDeDup scale knob: run
  * `semanticDedup` on a (possibly replicated) embeddings table with a
  * caller-chosen seed-cluster count, print wall + kept count as one
  * JSON line. Exists to measure the Σ|c|² → Σ|c|²/k recovery of
  * growing k with the corpus (the paper's operating rule); delete-able
  * once the round's table is recorded.
  *
  *   SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=48g \
  *     sbt -batch "runMain graft.tools.SemProbe /tmp/graft_soak10x 25"
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val kSeeds = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val t0 = System.nanoTime()
    val seed = vecs.filter(col("vec_id") < kSeeds)
      .select(col("vec_id"), transform(col("v"), x => round(x, 6)).as("c"))
      .collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq
    val c1 = Embeddings.lloydIterExact(vecs, "v", seed)
    val kept = Embeddings.semanticDedup(vecs, "vec_id", "v", c1, threshold = 0.35)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"sem_probe":{"dir":"$dir","k_seeds":$kSeeds,"k_final":${c1.size},"kept":$kept,"sec":$sec%.3f}}""")
    spark.stop()
  }
}
