package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match left points to right intervals:
  * l.x ∈ [r.lo, r.hi). Spark plans a bare inequality join as a
  * broadcast-nested-loop (all pairs); the scalable composition bins the
  * domain: intervals explode into the fixed-width bins they overlap,
  * points compute their bin, and the match becomes an equi-join on the
  * bin plus an exact residual filter. Cost scales with
  * Σ intervals × (width/binWidth) instead of |points| × |intervals|.
  *
  * Pick binWidth near the typical interval width: narrower bins inflate
  * the interval explosion, wider bins inflate per-bin candidate pairs.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, // with xCol
      intervals: DataFrame, // with loCol, hiCol (half-open [lo, hi))
      xCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(xCol)))
    // explode every bin the interval touches; the hi-boundary bin may be
    // a spurious candidate when hi sits exactly on a bin edge — the
    // exact residual filter below removes it, so correctness never
    // depends on boundary arithmetic
    val iv = intervals
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, Seq("__bin"))
      .filter(col(xCol) >= col(loCol) && col(xCol) < col(hiCol))
      .drop("__bin")
  }
}
