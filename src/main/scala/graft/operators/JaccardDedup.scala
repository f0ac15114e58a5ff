package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Exact n-gram Jaccard near-duplicate pairs WITHOUT an all-pairs join.
  *
  * Candidate generation uses PREFIX FILTERING on a global rarity order
  * (the PPJoin family — Xiao, Wang, Lin & Yu, "Efficient Similarity
  * Joins for Near Duplicate Detection", WWW 2008): J(a,b) ≥ t implies
  * an overlap c ≥ ⌈t·|a|⌉ (and ≥ ⌈t·|b|⌉), and if sets are sorted by a
  * global order, any pair with overlap ≥ α must share an element within
  * the first |x| − α + 1 elements of EACH side. So only each document's
  * rarest n − ⌈t·n⌉ + 1 shingles (by corpus document frequency, ties on
  * hash) enter the candidate self-join. Candidates are then verified
  * with an exact intersection count through the full index:
  *     J = c / (n_a + n_b − c)
  * — lossless at every threshold, no arrays through any shuffle.
  *
  * Scale shape: the naive inverted-index join costs Σ_s df(s)² over
  * shingle document-frequencies, and one viral shingle ("of the",
  * df = 10⁶) alone contributes 10¹² join rows. Under prefix filtering a
  * viral shingle ranks LAST in the rarity order and falls out of almost
  * every prefix, so the candidate join costs Σ_s dfP(s)² over prefix
  * frequencies — the hot tail self-prunes, with zero recall loss (the
  * `hot-shingle corpus` DedupSpec case pins candidates = 0 where the
  * naive join would produce all pairs). A size filter
  * (t·max(|a|,|b|) ≤ min(|a|,|b|)) further prunes before dedup.
  * `maxDocFreq` remains as an OPTIONAL extra cap for adversarial
  * corpora; unlike prefix filtering it can lose pairs, so it stays off
  * by default.
  */
object JaccardDedup {

  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.3,
      maxDocFreq: Option[Long] = None): DataFrame =
    nearDupPairsBy(df, idCol,
      Text.shingles(Text.tokens(col(textCol)), nGram), threshold, maxDocFreq)

  /** Char-n-gram flavor — for short or unsegmented text (e.g. zh) where
    * word tokenization is meaningless (Text.charShingles).
    */
  def nearDupPairsByChars(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nChars: Int = 3,
      threshold: Double = 0.3): DataFrame =
    nearDupPairsBy(df, idCol, Text.charShingles(col(textCol), nChars), threshold, None)

  /** Prefix index: each document's rarest n − ⌈t·n⌉ + 1 shingle hashes
    * under the global (document-frequency asc, hash asc) order. Any pair
    * with J ≥ t shares at least one shingle in BOTH prefixes (see object
    * doc), so a self-join on this index is a lossless candidate
    * generator. Exposed package-private so DedupSpec can pin the
    * hot-shingle fan-out bound directly.
    */
  private[graft] def prefixIndex(index: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val dfreq = index.groupBy("s").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("df").asc, col("s").asc)
    index.join(dfreq, Seq("s"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold) + 1)
      .select(col("s"), col(idCol), col("n"))
  }

  /** Candidate (id_a < id_b) pairs from the prefix self-join, with the
    * size filter t·max(n_a,n_b) ≤ min(n_a,n_b) applied before dedup.
    */
  private[graft] def prefixCandidates(index: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val prefix = prefixIndex(index, idCol, threshold)
    prefix.select(col("s"), col(idCol).as("id_a"), col("n").as("__na"))
      .join(prefix.select(col("s"), col(idCol).as("id_b"), col("n").as("__nb")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .filter(greatest(col("__na"), col("__nb")) * threshold <= least(col("__na"), col("__nb")))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Core: exact Jaccard over any shingle-array expression. */
  def nearDupPairsBy(
      df: DataFrame,
      idCol: String,
      shingleExpr: Column,
      threshold: Double,
      maxDocFreq: Option[Long]): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (candidate generation relies on a shared shingle)")
    val sh = Par.widen(df)
      .select(col(idCol), array_distinct(shingleExpr).as("sh"))
      // index on the 64-bit shingle hash, not the string: joins shuffle
      // fixed-width long keys instead of variable-length strings; a
      // 64-bit collision (≈2⁻⁶⁴ per shingle pair) could only merge two
      // shingle identities — far below the result's 6-decimal resolution
      .select(col(idCol), explode(col("sh")).as("s0"), size(col("sh")).as("n"))
      .select(col(idCol), xxhash64(col("s0")).as("s"), col("n"))
      // the index feeds the df count, the prefix join and both verify
      // sides; persist so the tokenize/shingle/explode pass runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = maxDocFreq.fold(sh) { cap =>
      // OPTIONAL document-frequency cap (can lose pairs — off by
      // default; prefix filtering below already bounds the fan-out
      // losslessly): broadcast anti-join of the tiny hot tail
      val hot = sh.groupBy("s").count().filter(col("count") > cap).select("s")
      sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
    // verification: exact intersection count for candidate pairs only,
    // through the full index — bare (id_a, id_b, s) rows, no arrays.
    // Join 1 expands each pair to a's shingles; join 2 on (id_b, s)
    // keeps exactly the shared ones, so count == |a ∩ b|
    val counts = prefixCandidates(index, idCol, threshold)
      .join(index.select(col(idCol).as("id_a"), col("s")), Seq("id_a"))
      .join(index.select(col(idCol).as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("c"))
    // no broadcast hint: at corpus scale the size table (one row per doc)
    // outgrows broadcast — AQE picks broadcast-hash automatically while
    // it fits and falls back to a shuffled join beyond that
    val sizes = index.select(col(idCol), col("n")).distinct()
    counts
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", col("c") / (col("n_a") + col("n_b") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Dedup: drop every doc that near-dups an earlier (lower-id) doc. */
  def dedup(df: DataFrame, idCol: String, textCol: String,
      nGram: Int = 2, threshold: Double = 0.3): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, nGram, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Cross-corpus contamination pairs: (left_id, right_id, jaccard) for
    * every left doc sharing ≥ threshold n-gram Jaccard with a right doc
    * — the train-vs-benchmark decontamination check of LLM pipelines.
    * Same lossless inverted-index shape as the self-join variant; the
    * (usually much smaller) right corpus indexes once and the join is
    * left-index ⋈ right-index on the shingle hash.
    */
  def crossPairs(
      left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.3): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    def indexOf(df: DataFrame, idCol: String, outId: String) = df
      .select(col(idCol).as(outId), array_distinct(Text.shingles(Text.tokens(col(textCol)), nGram)).as("sh"))
      .select(col(outId), explode(col("sh")).as("s0"), size(col("sh")).as(s"n_$outId"))
      .select(col(outId), xxhash64(col("s0")).as("s"), col(s"n_$outId"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val li = indexOf(Par.widen(left), leftId, "left_id")
    val ri = indexOf(Par.widen(right), rightId, "right_id")
    // benchmark corpora are small by nature (that is the decontamination
    // use case), so the right index is broadcast: the train index — the
    // 100 TB side — streams map-side and never shuffles for this join;
    // only the candidate pairs reach the groupBy exchange
    val counts = li.select(col("s"), col("left_id"))
      .join(broadcast(ri.select(col("s"), col("right_id"))), Seq("s"))
      .groupBy("left_id", "right_id").agg(count(lit(1)).as("c"))
    counts
      .join(li.select(col("left_id"), col("n_left_id")).distinct(), Seq("left_id"))
      .join(ri.select(col("right_id"), col("n_right_id")).distinct(), Seq("right_id"))
      .withColumn("jaccard", col("c") / (col("n_left_id") + col("n_right_id") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** Decontaminate: drop every left (train) doc contaminated by the
    * right (benchmark) corpus at the given similarity.
    */
  def decontaminate(
      train: DataFrame, trainId: String,
      benchmark: DataFrame, benchId: String,
      textCol: String,
      nGram: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val dirty = crossPairs(train, trainId, benchmark, benchId, textCol, nGram, threshold)
      .select(col("left_id").as(trainId)).distinct()
    train.join(dirty, Seq(trainId), "left_anti")
  }
}
