package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.8): group-level MinHash sketches.
  *
  * Element-wise min over per-row minhash signatures IS the signature of
  * the UNION of the rows' shingle sets — min commutes with set union —
  * so per-group (or whole-corpus) sketches compose associatively from
  * per-doc signatures: partial-aggregatable map-side, mergeable across
  * partitions, O(k) state per group. Build once, then estimate the
  * Jaccard similarity of any two groups as the fraction of matching
  * signature coordinates (standard error ≈ 1/√k) — e.g. corpus overlap
  * between languages/sources/snapshots without ever co-shuffling their
  * shingles. Exactness of the union law (not the estimate) is pinned in
  * SketchSpec against a directly-computed union signature.
  */
object MinHashAgg {

  /** Aggregator over per-row signature arrays (NativeHash.minhashSig
    * output). All inputs must share (k, seed).
    */
  final class UnionSketch(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(b: Array[Long], row: Seq[Long]): Array[Long] = {
      if (row == null) return b // null text ⇒ null signature: skip, don't NPE the group
      require(row.length == k, s"signature width ${row.length} != aggregator k=$k")
      var i = 0
      while (i < k) { if (row(i) < b(i)) b(i) = row(i); i += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `df.groupBy(g).agg(MinHashAgg.unionSketch(sigCol, k))`. */
  def unionSketch(sig: Column, k: Int = 64): Column =
    org.apache.spark.sql.functions.udaf(new UnionSketch(k)).apply(sig)

  /** Estimated Jaccard of the two sketched sets: matching-coordinate
    * fraction of equal-length signatures. Long.MaxValue coordinates are
    * the untouched empty-set sentinel, NOT hashes — they never count as
    * matches, so two empty (or all-null-doc) groups estimate 0.0 rather
    * than a spurious 1.0.
    */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty, "signatures must be same nonzero length")
    a.iterator.zip(b.iterator)
      .count { case (x, y) => x == y && x != Long.MaxValue }.toDouble / a.length
  }
}
