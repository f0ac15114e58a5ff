package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the single right row with the
  * greatest rightTime ≤ leftTime in the same key group (the time-series
  * "latest prior record" join: trades→quotes, events→profile versions).
  *
  * Spark has no built-in as-of join; the naive formulation (inequality
  * join + per-left-row max) is a cross-join-shaped disaster. This is the
  * scalable composition: tag and union both sides, hash-shuffle ONCE on
  * the key for a window ordered by (time, side), carry the right-side
  * values forward with last(ignoreNulls), keep left rows. Cost is one
  * shuffle + one sort — identical shape to a groupBy on the key, at any
  * corpus size; no custom SparkPlan needed.
  *
  * Right rows sort BEFORE left rows at equal times, so the match is
  * inclusive (rightTime == leftTime matches), like DuckDB/Pandas as-of.
  * The right side should be unique per (keys, rightTime) — pre-aggregate
  * otherwise, or ties resolve arbitrarily.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val lCols = left.columns.toSeq
    require(rightVals.intersect(lCols).isEmpty,
      s"right value columns ${rightVals.intersect(lCols).mkString(",")} collide with left columns")

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(lCols.map(col) ++ Seq(col("__t"), col("__side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(lCols.map(c =>
          if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__side")) ++
        rightVals.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++ rightVals.map(c => col(s"__r_$c").as(c)): _*)
  }
}
