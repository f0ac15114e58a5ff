package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** SimHash near-dup detection: 64-bit locality-sensitive fingerprint
  * (Charikar). Token hashes vote per bit position; docs within a small
  * Hamming distance are near-dups.
  *
  * All-native expressions: one `aggregate` pass builds the 64 bit-votes,
  * a second folds them into the i64 fingerprint. Candidate pairing uses
  * the pigeonhole trick — split the fingerprint into (maxDist+1) chunks;
  * any pair within maxDist Hamming shares ≥1 exact chunk — an equi-join
  * on (chunk_id, chunk_value), never a cross join.
  */
object SimHashDedup {

  /** 64-bit SimHash of an array-of-token column: per-bit votes over the
    * token xxhash64s, bit set iff votes > 0. Native codegen'd expression
    * (NativeHash.SimHash64Expr) — one compiled loop per row instead of
    * an interpreted 64-wide zip per token.
    */
  def simhash(toks: Column): Column = graft.functions.NativeHash.simhash64(toks)

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pairs (id_a < id_b) with Hamming(simhash) <= maxDist. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    // the 64-vote simhash is the expensive branch and feeds both join
    // sides; persist so it is computed once per doc
    val sigs = Par.widen(df).select(col(idCol), simhash(Text.tokens(col(textCol))).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunked = sigs.select(
      col(idCol), col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)), i =>
        call_function("shiftright", col("sig"), i * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1)))).as(Seq("chunk_id", "chunk_val")))
    val a = chunked.select(col("chunk_id"), col("chunk_val"), col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk_id"), col("chunk_val"), col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
