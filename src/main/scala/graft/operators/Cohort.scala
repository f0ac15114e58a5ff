package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users are grouped by their
  * first-seen week, and each cohort's activity is counted in the weeks
  * that follow — the standard product-analytics retention triangle.
  *
  * Scale shape: two narrow aggregations (per-user first week; distinct
  * user-weeks) plus an equi-join on the user id — every exchange
  * carries (user, week)-sized rows, never events. The distinct
  * collapses event volume BEFORE the join, so a user with millions of
  * events contributes one row per active week.
  */
object Cohort {

  /** Output: (cohort_week, week_offset, n_active, n_cohort, retention)
    * — one row per cohort × offset with at least one active user;
    * offset 0 is the cohort's own week (retention 1.0 by construction).
    */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val wk = date_trunc("week", col(tsCol)).cast("date")
    val firstWeek = events
      .groupBy(col(userCol))
      .agg(min(wk).as("cohort_week"))
    val cohortSize = firstWeek
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    val activeWeeks = events
      .select(col(userCol), wk.as("week"))
      .distinct()
    activeWeeks
      .join(firstWeek, userCol)
      .groupBy(col("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7.0).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(cohortSize, "cohort_week")
      .withColumn("retention",
        round(col("n_active").cast("double") / col("n_cohort"), 6))
  }
}
