package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R1 — dedup via ranking window (reference: `loader/hive_loader.py:127-145`,
  * `ROW_NUMBER() OVER (PARTITION BY uniq_keys ORDER BY orderby) rnk … rnk=1`).
  *
  * Scale notes: `row_number` over `partitionBy(keys)` is a single hash
  * shuffle on the dedup keys — the same shuffle a groupBy would take, so
  * this is optimal. When ordering is irrelevant the cheaper
  * `dropDuplicates(keys)` (partial map-side dedup, no sort) is exposed as
  * `exact`. Skewed keys are AQE's problem (skew-join/partition split are
  * enabled in GraftSession).
  */
object Dedup {

  /** Keep the first row per `uniqKeys` group under `orderBy`. The
    * reference's ordering is non-deterministic on ties; we append the
    * full ordering the caller gives (callers should include a tiebreaker —
    * see DedupSpec) so results are stable.
    * Default orderBy = the uniq keys themselves (`hive_loader.py:81-82`).
    */
  def byRank(df: DataFrame, uniqKeys: Seq[String], orderBy: Seq[Column] = Nil): DataFrame = {
    val ord = if (orderBy.nonEmpty) orderBy else uniqKeys.map(col)
    val w = Window.partitionBy(uniqKeys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") === 1)
      .drop("__rnk")
  }

  /** Order-agnostic exact dedup — map-side partial dedup then shuffle,
    * cheaper than the window when any survivor will do.
    */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.isEmpty) df.dropDuplicates() else df.dropDuplicates(keys)
}
