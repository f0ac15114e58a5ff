package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{NativeHash, Text}

/** Sorted-neighborhood near-duplicate detection (Hernández & Stolfo,
  * SIGMOD 1995): sort the corpus by a normalization key, compare each
  * record only to the `window-1` records after it in sort order, verify
  * candidates with exact n-gram Jaccard. The classic bounded-cost
  * blocking method — O(n·window) comparisons regardless of cluster
  * sizes, trading recall (near-dups whose keys sort far apart are
  * missed) for a hard cost ceiling; complements the lossless PPJoin
  * path (JaccardDedup) when a corpus has viral shingles AND a usable
  * sort key.
  *
  * Scale shape: the global sort position comes from
  * SkewWindow.globalRankBySample — sampled string boundaries, chunk-
  * partitioned windows, broadcast offsets — so there is NO one-task
  * global sort. Neighbor candidates are an equi-join on position
  * (each row explodes `window-1` target positions); the Jaccard verify
  * runs on sorted shingle-hash arrays carried alongside, one
  * intersection per candidate pair.
  */
object SnmDedup {

  /** Near-dup pairs among sort-neighbors. Output: (id_a, id_b, jaccard)
    * with id_a < id_b (canonicalized — position order is key order, not
    * id order). Null-text rows are dropped (no sort key).
    */
  def pairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keyLen: Int = 16,
      window: Int = 4,
      nGram: Int = 2,
      threshold: Double = 0.3,
      chunks: Int = 32): DataFrame = {
    require(window >= 2, "window must cover at least one neighbor")
    val base = Par.widen(df.filter(col(textCol).isNotNull))
      .select(col(idCol).as("id"),
        lower(substring(col(textCol), 1, keyLen)).as("k"),
        NativeHash.shingleHashes(Text.tokens(col(textCol)), nGram).as("sh"))
    val pos = SkewWindow.globalRankBySample(base, "k", Seq(col("id").asc), chunks)
      .select(col("id"), col("sh"), col("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the neighbor join
    val a = pos.select(col("id").as("ia"), col("sh").as("sha"), col("rank").as("pa"))
      .withColumn("pb", explode(sequence(col("pa") + 1, col("pa") + (window - 1))))
    val b = pos.select(col("id").as("ib"), col("sh").as("shb"), col("rank").as("pb"))
    val inter = size(array_intersect(col("sha"), col("shb")))
    val union = size(array_union(col("sha"), col("shb")))
    a.join(b, "pb")
      .withColumn("jaccard", inter.cast("double") / union.cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        col("jaccard"))
  }
}
