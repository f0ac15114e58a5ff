package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via symmetric-delete blocking (the
  * SymSpell scheme): two strings within Levenshtein distance d share at
  * least one variant obtained by deleting ≤ d characters from each, so
  * an equi-join on the deletion variants is a LOSSLESS candidate
  * generator — no O(n²) cross product, no blocking key that can miss a
  * first-character substitution (a naive "block on prefix" filter is
  * NOT lossless; deletes are).
  *
  * Scale shape: the exploded index has n·(len+1) rows for d=1 (O(n·len²)
  * for d=2) and hash-partitions on the variant string, so the join is a
  * plain shuffled equi-join that scales out; the expensive levenshtein()
  * verify runs only on candidates that share a variant. Very short or
  * highly repetitive strings can make a variant hot — AQE skew-join
  * handles the residual imbalance, and a minimum-length filter is the
  * usual prefilter upstream.
  */
object EditDistanceJoin {

  /** All strings obtained by deleting exactly one character (plus the
    * string itself). Builtin-only (codegen'd) — no UDF in the explode
    * path. Empty strings map to just themselves: `sequence` would
    * otherwise generate a DESCENDING range for (0, -1).
    */
  private def deleteVariants(c: Column): Column = {
    val dels = transform(sequence(lit(0), length(c) - 1),
      i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c))))
    when(length(c) === 0, array(c)).otherwise(array_union(array(c), dels))
  }

  /** Deletion neighborhood of radius `maxDist` (1 or 2). */
  private def variants(c: Column, maxDist: Int): Column = maxDist match {
    case 1 => deleteVariants(c)
    case 2 => array_distinct(flatten(transform(deleteVariants(c), v => deleteVariants(v))))
    case d => throw new IllegalArgumentException(s"maxDist must be 1 or 2, got $d")
  }

  /** All pairs (id_a < id_b) whose strings are within Levenshtein
    * distance `maxDist`. Output: (id_a, id_b, dist). Null strings are
    * dropped (no defined distance).
    */
  def typoPairs(df: DataFrame, idCol: String, strCol: String, maxDist: Int = 1): DataFrame = {
    val base = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
    // both join sides read the same exploded index: persist so the
    // variant generation runs one pass, not one per side
    val idx = base.select(col("id"), col("s"),
        explode(variants(col("s"), maxDist)).as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = idx.toDF("id_a", "s_a", "key")
    val b = idx.toDF("id_b", "s_b", "key_b")
    // candidates sharing ≥1 variant collapse to one row BEFORE the
    // levenshtein verify — one distance computation per candidate pair
    val cand = a.join(b, col("key") === col("key_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("s_a"), col("id_b"), col("s_b"))
      .distinct()
    // threshold form early-exits the DP once the band is exceeded
    // (O(maxDist·len) per pair, not O(len²)) and returns -1 above it
    cand.withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
