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

  /** Engine-PORTABLE 60-bit token hash: the first 15 hex chars of md5
    * folded as base-16 — every SQL engine with md5() reproduces it
    * exactly (15 chars keeps the fold inside a signed 64-bit range on
    * engines whose BIGINT overflow errors rather than wraps).
    * This is the interpreted REFERENCE formulation (it is literally the
    * SQL the oracle runs, in Column form); production code uses the
    * bit-identical compiled twin [[graft.functions.NativeHash.fold60]]
    * — NativeHashSpec pins the two equal.
    */
  def portableTokenHash(tok: Column): Column =
    aggregate(
      split(substring(md5(tok.cast("binary")), 1, 15), ""),
      lit(0L),
      (acc, ch) => acc * 16 +
        when(ascii(ch) >= 97, ascii(ch) - 87).otherwise(ascii(ch) - 48).cast("long"))

  /** SimHash over PORTABLE token hashes (see `portableTokenHash`): the
    * same Charikar bit-vote construction as `simhash`, limited to the
    * hash's 60 usable bits (61-64 are always 0 — harmless: both sides
    * of any differential compare zero them identically). Expects the
    * ALREADY-HASHED token array so the per-token hash is computed once,
    * not once per bit position. Interpreted REFERENCE formulation —
    * production code uses the fused compiled twin
    * [[graft.functions.NativeHash.portableSimhash60]] (token fold +
    * bit votes in one pass; NativeHashSpec pins the two equal).
    */
  def portableSimhash(tokenHashes: Column, bits: Int = 60): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) => {
      val vote = aggregate(tokenHashes, lit(0L), (a, h) =>
        a + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      acc + when(vote > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
    })

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pairs (id_a < id_b) with Hamming(simhash) <= maxDist. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    // the 64-vote simhash is the expensive branch and feeds both join
    // sides; persist so it is computed once per doc, materialize the
    // (small) pair result, and RELEASE the cache instead of leaking it
    // for the session (lineage-cut caveat: Components.scala)
    val sigs = Par.widen(df).select(col(idCol), simhash(Text.tokens(col(textCol))).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try Par.cut(nearDupPairsFromSigs(sigs, idCol, "sig", maxDist))
    finally sigs.unpersist()
  }

  /** The pigeonhole candidate join on PRECOMPUTED signatures: split the
    * 64-bit sig into (maxDist+1) chunks — any pair within maxDist
    * Hamming agrees on ≥1 whole chunk (lossless, not probabilistic) —
    * equi-join on (chunk_id, chunk_value), pair-distinct, exact
    * Hamming verify. Callers choose the signature family (`simhash`
    * for the fast native path, `portableSimhash` for differential
    * testing against another engine).
    */
  def nearDupPairsFromSigs(
      sigs: DataFrame, idCol: String, sigCol: String, maxDist: Int): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    // normalize the sig column name in its OWN projection: aliasing and
    // referencing it in the same select would resolve the posexplode's
    // reference as a lateral column alias (illegal under Generate)
    val base = sigs.select(col(idCol), col(sigCol).as("sig"))
    val chunked = base.select(
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
