package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Bpe

/** One-shot scale probe for the BPE dictionary plan (r15 verdict item
  * 5): the `text_bpe_tokens` join is occurrence-sized while the merge
  * loop is vocabulary-bounded — verify BOTH claims at replication
  * scale, including the UNFAVORABLE case the standard soak cannot
  * produce (its replicas share a vocabulary):
  *
  *   - shared-vocab arm: documents replicated g× with a ` rep r`
  *     suffix (the Soak shape) — vocabulary ~constant, occurrences ×g;
  *   - vocab-growing arm: every token salted with its replica index
  *     (`word` → `word<r>`) — vocabulary ×g AND occurrences ×g, the
  *     worst case for the dictionary side.
  *
  * Prints wall + distinct-word count per (arm, g). Cold-ish walls in
  * one JVM; compare ratios within a run, not across runs.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tuned(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    def replicated(g: Int, growVocab: Boolean): DataFrame =
      (0 until g).map { r =>
        val d = docs.select((col("doc_id") + lit(r * 10_000_000L)).as("doc_id"),
          col("text"))
        if (r == 0) d
        else if (!growVocab) d.withColumn("text", concat(col("text"), lit(s" rep $r")))
        // salt EVERY alphabetic token with a LETTERS-ONLY key derived
        // from the replica index AND the doc id (digits would split
        // under the [a-z]+ tokenizer and collapse all salts to one):
        // vocabulary grows ~ base_vocab × g × 1000 — the genuine
        // dictionary-side stress the shared-vocab soak cannot produce
        else {
          val rep = "" + ('a' + r % 26).toChar + ('a' + (r / 26) % 26).toChar
          d.withColumn("text", regexp_replace(
            concat(col("text"), lit(" ")), // uniform boundary
            "([A-Za-z]+) ",
            s"$$1x$rep%s "))
            .withColumn("text", expr(
              "replace(text, '%s', " +
              "  concat(chr(97 + cast(doc_id % 10 as int)), " +
              "         chr(97 + cast((doc_id div 10) % 10 as int)), " +
              "         chr(97 + cast((doc_id div 100) % 10 as int))))"))
        }
      }.reduce(_ unionByName _)

    def run(name: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = Bpe.tokenCounts(df, "doc_id", "text")
        .agg(sum("n_words"), sum("n_bpe")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val vocab = df.select(explode(
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
        .agg(countDistinct("w")).head().getLong(0)
      println(f"[bpe] $name wall=$sec%.1f s vocab=$vocab words=${out.getLong(0)} bpe=${out.getLong(1)}")
    }

    for (g <- args.headOption.map(_.toInt).map(Seq(_)).getOrElse(Seq(1, 10, 100))) {
      run(s"shared_vocab g=$g", replicated(g, growVocab = false))
      run(s"grow_vocab   g=$g", replicated(g, growVocab = true))
    }
    spark.stop()
  }
}
