package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded-cardinality column in one
  * sketch pass + one candidate recount — without ever shuffling the
  * full item cardinality.
  *
  * The plain `groupBy(item).count().filter(n >= T)` shuffles every
  * distinct item; over 100 TB of n-gram/token data the vocabulary
  * itself is shuffle-hostile. Misra-Gries with k counters is the
  * classic fix: per-partition summaries are O(k), partial-aggregatable
  * map-side, and MERGEABLE with only additive undercount (Agarwal et
  * al., "Mergeable Summaries", PODS'12) — total undercount < N/(k+1).
  * So for a frequency floor T > N/(k+1) every true heavy hitter is
  * still in the merged summary: the ≤ k candidates are a guaranteed
  * superset. A broadcast semi-join recount then produces EXACT counts
  * for just those candidates — the only full-cardinality shuffle the
  * naive plan had is gone, replaced by a ≤ k-row broadcast.
  */
object HeavyHitters {

  /** Misra-Gries summary state: (counters, rows processed). */
  final class MisraGries(k: Int)
      extends Aggregator[String, (Map[String, Long], Long), (Seq[String], Long)] {
    require(k >= 1, "need at least one counter")
    override def zero: (Map[String, Long], Long) = (Map.empty, 0L)
    override def reduce(b: (Map[String, Long], Long), x: String): (Map[String, Long], Long) = {
      val (m, n) = b
      if (x == null) b
      else m.get(x) match {
        case Some(c) => (m.updated(x, c + 1), n + 1)
        case None if m.size < k => (m.updated(x, 1L), n + 1)
        case None =>
          // decrement-all absorbs the unseen item; zeroed counters drop.
          // Each such event burns k+1 units of count mass, so across a
          // partition this is O(N) total work despite the O(k) step
          val dec = m.iterator.collect { case (key, c) if c > 1 => key -> (c - 1) }.toMap
          (dec, n + 1)
      }
    }
    override def merge(
        a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
      val u = (a._1.keySet ++ b._1.keySet).iterator
        .map(key => key -> (a._1.getOrElse(key, 0L) + b._1.getOrElse(key, 0L))).toMap
      val n = a._2 + b._2
      if (u.size <= k) (u, n)
      else {
        // subtract the (k+1)-th largest count from all — the mergeable-
        // summaries rule; ≤ k survivors, undercounts stay additive
        val counts = u.values.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - (k + 1))
        (u.iterator.collect { case (key, c) if c > cut => key -> (c - cut) }.toMap, n)
      }
    }
    override def finish(r: (Map[String, Long], Long)): (Seq[String], Long) =
      (r._1.keys.toSeq.sorted, r._2)
    override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Long)]()
    override def outputEncoder: Encoder[(Seq[String], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[String], Long)]()
  }

  /** Column form of the summary: one struct<candidates, n_rows> row.
    * Because the buffer is mergeable state, this same udaf runs as a
    * STREAMING aggregation (complete/update mode) — a continuous
    * heavy-hitter candidate sketch over an unbounded stream, pinned in
    * StreamingSpec.
    */
  def mgSummary(item: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(item)

  /** All items of `itemCol` with count ≥ ceil(frac · N) as exact
    * (item, n) rows. Lossless requires frac > 1/(k+1) — enforced — so
    * the MG summary provably contains every qualifying item at ANY
    * data size.
    */
  def exact(df: DataFrame, itemCol: String, frac: Double, k: Int = 4096): DataFrame = {
    require(frac > 1.0 / (k + 1),
      s"frac=$frac is below the MG guarantee 1/(k+1)=${1.0 / (k + 1)}; raise k")
    val spark = df.sparkSession
    import spark.implicits._
    val (cands, n) = df.select(mgSummary(col(itemCol), k).as("s"))
      .select(col("s._1"), col("s._2")).as[(Seq[String], Long)].head()
    val threshold = math.ceil(frac * n).toLong
    val candDf = cands.toDF(itemCol)
    df.join(broadcast(candDf), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
