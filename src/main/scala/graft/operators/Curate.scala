package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Training-data curation operators: deterministic split assignment,
  * stratified sampling, and sequence packing — the bookkeeping layer of
  * an LLM data pipeline that sits between dedup/quality filtering and
  * the trainer.
  *
  * All randomness is CONTENT-KEYED (an md5 bucket of the row id), never
  * drawn from an RNG: membership is stable under re-partitioning,
  * re-ordering, re-ingestion, cluster resizing, and even engine changes
  * (md5 is universal — the DuckDB oracle reproduces every assignment
  * byte-for-byte). That is the property that makes train/test splits
  * auditable and leak-checkable long after the job that produced them.
  */
object Curate {

  /** Deterministic bucket in [0, 65536): the first 16 bits of
    * md5(id-as-string). Uniform enough for percent-level sampling, and
    * computable in any engine with an md5 function.
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** Train/val/test assignment by hash bucket: `testPct` of mass to
    * "test", the next `valPct` to "val", the rest to "train". Adds
    * `bucket` and `split` columns. Thresholds are in 65536ths, rounded
    * down — exact, not probabilistic.
    */
  def splitAssign(df: DataFrame, idCol: String, testPct: Double = 0.1, valPct: Double = 0.1): DataFrame = {
    val b = hashBucket(col(idCol))
    val testUb = math.floor(65536 * testPct).toInt
    val valUb = math.floor(65536 * (testPct + valPct)).toInt
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < testUb, "test")
          .when(col("bucket") < valUb, "val")
          .otherwise("train"))
  }

  /** Stratified sample: per-stratum keep rates (e.g. downsample the
    * dominant language, keep the long tail whole) with a default for
    * unlisted strata. Same deterministic bucket — a doc's membership
    * never flickers between runs, so downstream caches stay valid.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val b = hashBucket(col(idCol))
    val ub = rates.foldLeft(lit(math.floor(65536 * defaultRate).toInt)) {
      case (acc, (k, r)) => when(col(strataCol) === k, math.floor(65536 * r).toInt).otherwise(acc)
    }
    df.filter(b < ub)
  }

  /** Weighted Bernoulli sample: keep a row with probability `weight`
    * (a per-row Column in [0,1], clamped) — quality-weighted corpus
    * downsampling, temperature-style language re-balancing, etc. Same
    * content-keyed bucket as splitAssign, so membership is deterministic
    * and engine-reproducible; the weight expression must itself be
    * deterministic for the oracle to agree.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val ub = floor(lit(65536) * least(lit(1.0), greatest(lit(0.0), weight)))
      .cast("int")
    df.filter(hashBucket(col(idCol)) < ub)
  }

  /** Uniform k-per-group sample: the k rows with the smallest md5 of
    * their id within each group (ties broken by id) — a deterministic
    * stand-in for per-group reservoir sampling. Balanced per-language
    * subsets, eval slices, etc.; same content-keyed stability story as
    * the operators above.
    */
  def sampleKPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Concat-and-chunk sequence packing (the GPT-style pretraining
    * layout): documents are laid end-to-end in a deterministic order and
    * cut into `budget`-token context windows; a document's `pack_id` is
    * the window its first token lands in.
    *
    * Packing is SHARD-LOCAL: a global ordered cumulative sum would be a
    * single-partition window (one task sees every row — dead at corpus
    * scale), so documents are first hashed into `shards` independent
    * streams and packed within each. Each shard's window is an
    * independent partition of the shuffle — embarrassingly parallel,
    * which is how packing is actually run over large corpora. Output:
    * (id, shard, n_tokens, pack_id).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int,
      shards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), pmod(col(idCol), lit(shards)).as("shard"),
        Text.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
  }
}
