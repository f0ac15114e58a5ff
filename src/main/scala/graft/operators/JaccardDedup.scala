package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Exact n-gram Jaccard near-duplicate pairs WITHOUT an all-pairs join.
  *
  * Candidate generation is lossless for any threshold > 0: J(a,b) ≥ t > 0
  * requires at least one shared shingle, so an inverted index —
  * `explode(shingles)` → self-equi-join on the shingle — reaches every
  * qualifying pair. Counting the join hits per (id_a, id_b) gives the
  * intersection size c directly, and with each side's set size attached,
  *     J = c / (n_a + n_b − c)
  * — no second pass over the shingle arrays, no array shipping through
  * the pair shuffle.
  *
  * Scale shape: cost is Σ_s df(s)² over shingle document-frequencies
  * instead of n² over documents. For web-scale corpora the tail risk is
  * ultra-common shingles ("of the"); `maxDocFreq` caps them — any shingle
  * shared by more than that many docs is dropped from the index. That cap
  * trades exactness for a bound on the join fan-out (a pair sharing ONLY
  * ultra-common shingles can be missed), so it is off by default and the
  * default path stays exact; at 100 TB the principled refinement is
  * PPJoin-style prefix filtering on a global rarity order, which this
  * index layout extends to directly.
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
      // join on the 64-bit shingle hash, not the string: the self-join
      // shuffles Σ df(s) index rows and compares Σ df(s)² key pairs, so
      // fixed-width long keys beat variable-length strings; a 64-bit
      // collision (≈2⁻⁶⁴ per shingle pair) could only merge two shingle
      // identities — far below the result's 6-decimal resolution
      .select(col(idCol), explode(col("sh")).as("s0"), size(col("sh")).as("n"))
      .select(col(idCol), xxhash64(col("s0")).as("s"), col("n"))
      // both sides of the self-join read this index; persist so the
      // tokenize/shingle/explode pass runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = maxDocFreq.fold(sh) { cap =>
      // document-frequency cap: one extra groupBy on the shingle, then a
      // broadcast-size anti set of banned shingles (the hot tail is tiny)
      val hot = sh.groupBy("s").count().filter(col("count") > cap).select("s")
      sh.join(broadcast(hot), Seq("s"), "left_anti")
    }
    // the pair-count aggregation is the big shuffle (Σ df(s)² rows): keep
    // its rows minimal — bare (id_a, id_b). The set sizes are functions
    // of the ids, re-attached AFTER aggregation from the tiny per-doc
    // size table (one row per doc, broadcast), not carried through the
    // join — this halves the shuffled bytes
    val a = index.select(col("s"), col(idCol).as("id_a"))
    val b = index.select(col("s"), col(idCol).as("id_b"))
    val counts = a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
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
