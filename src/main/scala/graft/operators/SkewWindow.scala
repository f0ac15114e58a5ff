package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe global running aggregates.
  *
  * `sum(x) OVER (ORDER BY o)` with no PARTITION BY moves EVERY row to
  * one task (Spark logs the "No Partition Defined for Window" warning
  * and serializes) — the classic scale cliff of global cumulative
  * metrics. The standard fix, expressed Spark-first: split the order
  * domain into chunks at sampled quantile boundaries, run the running
  * sum WITHIN each chunk in parallel (ordinary partitioned window),
  * then add each chunk's prefix offset — the cumulative total of all
  * earlier chunks, a ≤`chunks`-row driver computation broadcast back.
  * Total cost: one approx-quantile pass, one chunk-partitioned
  * window, one tiny aggregate — no single-task sort of the corpus.
  *
  * Chunk assignment is order-monotone (count of boundaries strictly
  * below the row's order value), so within-chunk rank + offset equals
  * the global running sum EXACTLY; rows tied on a boundary value land
  * in the same chunk. `orderCol` must totally order rows (pass a
  * unique key, like any deterministic running sum).
  */
object SkewWindow {

  /** Output adds a `running` decimal(38,6) column. Accumulation is
    * exact decimal throughout — double addition is grouping-sensitive,
    * and the two-phase sum MUST equal the sequential sum bit-for-bit
    * for the differential gate (same reason as SparkEntry's dsum).
    */
  def globalRunningSum(
      df: DataFrame, orderCol: String, valueCol: String, chunks: Int = 32): DataFrame = {
    require(chunks >= 1, "need at least one chunk")
    val probs = (1 until chunks).map(_.toDouble / chunks).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // monotone map-side chunk id: #boundaries strictly below the value
    val chunkId = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    val dec = col(valueCol).cast("decimal(28,6)")
    val chunked = df.withColumn("__chunk", chunkId)
    val w = Window.partitionBy("__chunk").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = chunked.withColumn("__run", sum(dec).over(w))
    // prefix offsets: cumulative totals of earlier chunks (bounded rows)
    val totals = chunked.groupBy("__chunk").agg(sum(dec).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).sortBy(_._1)
    val zero = java.math.BigDecimal.ZERO
    val offsets = totals.scanLeft(zero) { case (acc, (_, t)) => acc.add(t) }.init
    val offCol = totals.map(_._1).zip(offsets).foldLeft(lit(zero)) { case (acc, (c, o)) =>
      when(col("__chunk") === c, lit(o)).otherwise(acc)
    }
    within.withColumn("running", (col("__run") + offCol).cast("decimal(38,6)"))
      .drop("__chunk", "__run")
  }
}
