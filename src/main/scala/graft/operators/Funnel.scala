package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how far each user progresses through a
  * sequence of event types, where step k counts only if it happens
  * STRICTLY after an occurrence that completed step k−1 (the classic
  * product-analytics view → click → purchase funnel).
  *
  * Scale shape: one hash shuffle + one sort on (user, time). Step k's
  * "completed by now" marker is a conditional running min over the
  * strictly-prior frame; the chained markers all share the same window
  * partitioning/ordering, so Catalyst plans them as stacked Window
  * operators over a single exchange — no joins, no per-user event
  * buffering, state per row is k timestamps. The final per-user rollup
  * reuses the same hash partitioning.
  */
object Funnel {

  /** Per-user funnel progression. Output: (userCol, step1_ts …
    * stepK_ts, steps_completed) where stepI_ts is the earliest
    * completion time of step I (null if never reached) and
    * steps_completed is the deepest step reached.
    *
    * "Strictly after" is strict in TIME: the prior-frame running min is
    * compared with `<` against the current timestamp, so equal-time
    * events never chain and tie ordering inside the sort cannot change
    * the result.
    */
  def progression(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val prior = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)

    // __sI_here = tsCol when THIS row completes step I (right type, and
    // some strictly-earlier row already completed step I−1)
    val withMarkers = steps.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val cond =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st &&
          min(col(s"__s${i - 1}_here")).over(prior) < col(tsCol)
      df.withColumn(s"__s${i}_here", when(cond, col(tsCol)))
    }

    val aggs = steps.indices.map(i => min(col(s"__s${i}_here")).as(s"step${i + 1}_ts"))
    // deepest-step check must end up outermost, so fold ascending
    val completed = steps.indices.foldLeft(lit(0): Column) { (acc, i) =>
      when(col(s"step${i + 1}_ts").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withMarkers
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("steps_completed", completed)
  }
}
