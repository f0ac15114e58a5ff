package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory streaming top-k neighbors: the partial-aggregating
  * alternative to a `row_number() <= k` window for per-key top-k over a
  * huge stream.
  *
  * Why it exists (measured, r14 100× soak): the window plan's partial
  * WindowGroupLimit still needs a per-task LOCAL SORT of the full
  * input — Ω(rows·log rows) — which on the 100×-replicated pair stream
  * cost 2.9× the pair LISTING's wall (1,380 s vs 475 s). A top-k
  * AGGREGATE does the same bounding work in one hash pass:
  * Ω(rows·log k) inserts into a k-bounded sorted buffer, map-side
  * combined (each task emits ≤ k rows per key it saw), merged
  * associatively after a shuffle of only the per-task survivors. No
  * sort of the stream, ever. State is O(k) per key — at 100 TB the
  * per-partition hash map holds (distinct keys in partition) × O(k)
  * entries, and ObjectHashAggregate's sort-based fallback (threshold
  * raised in GraftSession — the default 128 groups would abandon
  * hashing immediately on any real corpus) still bounds memory if a
  * pathological partition concentrates billions of keys.
  *
  * Ordering contract: entries rank by (score DESC, id ASC) — the same
  * deterministic tie-break as the window formulation, so the two plans
  * are row-identical and share one oracle.
  */
object TopKAgg {

  /** Aggregator keeping the top `k` (id, score) pairs per group.
    * Buffer: parallel arrays sorted by (score DESC, id ASC), length ≤ k.
    */
  final class TopNeighbors(k: Int)
      extends Aggregator[(Long, Double), (Array[Long], Array[Double]), Seq[(Long, Double)]] {
    require(k >= 1, "k must be >= 1")

    override def zero: (Array[Long], Array[Double]) =
      (Array.emptyLongArray, Array.emptyDoubleArray)

    /** True iff (idA, sA) ranks strictly before (idB, sB). */
    @inline private def before(idA: Long, sA: Double, idB: Long, sB: Double): Boolean =
      sA > sB || (sA == sB && idA < idB)

    override def reduce(
        b: (Array[Long], Array[Double]),
        row: (Long, Double)): (Array[Long], Array[Double]) = {
      val (ids, scores) = b
      val n = ids.length
      val (id, s) = row
      if (n == k && !before(id, s, ids(n - 1), scores(n - 1))) return b
      // insertion point by linear scan — k is small (single digits);
      // a binary search would save nothing against the copy below
      var pos = 0
      while (pos < n && before(ids(pos), scores(pos), id, s)) pos += 1
      val m = math.min(n + 1, k)
      val nIds = new Array[Long](m); val nScores = new Array[Double](m)
      System.arraycopy(ids, 0, nIds, 0, pos)
      System.arraycopy(scores, 0, nScores, 0, pos)
      nIds(pos) = id; nScores(pos) = s
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(ids, pos, nIds, pos + 1, tail)
        System.arraycopy(scores, pos, nScores, pos + 1, tail)
      }
      (nIds, nScores)
    }

    override def merge(
        a: (Array[Long], Array[Double]),
        b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
      val (ia, sa) = a; val (ib, sb) = b
      if (ib.isEmpty) return a
      if (ia.isEmpty) return b
      val m = math.min(ia.length + ib.length, k)
      val ids = new Array[Long](m); val scores = new Array[Double](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= ib.length ||
          (i < ia.length && before(ia(i), sa(i), ib(j), sb(j)))
        if (takeA) { ids(o) = ia(i); scores(o) = sa(i); i += 1 }
        else { ids(o) = ib(j); scores(o) = sb(j); j += 1 }
        o += 1
      }
      (ids, scores)
    }

    override def finish(r: (Array[Long], Array[Double])): Seq[(Long, Double)] =
      r._1.toSeq.zip(r._2.toSeq)

    override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
      ExpressionEncoder[(Array[Long], Array[Double])]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Column form: array<struct<_1: id, _2: score>> of the group's top-k
    * by (score DESC, id ASC) — posexplode it for (rank-1, entry) rows.
    */
  def topNeighbors(id: Column, score: Column, k: Int): Column =
    org.apache.spark.sql.functions
      .udaf(new TopNeighbors(k), ExpressionEncoder[(Long, Double)]())
      .apply(id, score)
}
