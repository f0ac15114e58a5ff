package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Market-basket co-occurrence mining: which items appear together in
  * the same basket more often than chance (association-rule support +
  * lift, the counting core of Apriori's first pass).
  *
  * Scale shape: the pair explosion is bounded by basket size — the
  * self-join on the basket key emits C(k,2) rows per k-item basket, so
  * a corpus of bounded baskets grows linearly, never O(n²). Everything
  * downstream is hash-partitioned aggregation on the pair key (partial
  * aggregation applies), the per-item counts join on the item key, and
  * the one-row basket total is a broadcast cross join — no driver-side
  * collection. A pathological mega-basket would explode quadratically;
  * cap basket size upstream if the domain allows one.
  */
object Associations {

  /** Co-occurring item pairs with support count and lift.
    * Output: (item_a, item_b, n_pair, lift) with item_a < item_b,
    * lift = P(a,b) / (P(a)·P(b)) over baskets. Duplicate (basket, item)
    * rows count once.
    */
  def coOccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairs: Long = 1L): DataFrame = {
    // widen single-split scans so the map-side partial distinct
    // parallelizes (no-op on real multi-split tables)
    val items = Par.widen(
        df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
          .filter(col("basket").isNotNull && col("item").isNotNull))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds 3 consumers: totals, item counts, pair join
    val totals = items.agg(countDistinct(col("basket")).as("n_baskets"))
    val itemCnt = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val a = items.toDF("basket", "item_a")
    val b = items.toDF("basket_b", "item_b")
    val pairs = a.join(b, col("basket") === col("basket_b") && col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    pairs
      .join(itemCnt.toDF("item_a", "n_a"), "item_a")
      .join(itemCnt.toDF("item_b", "n_b"), "item_b")
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        col("n_pair").cast("double") * col("n_baskets").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("lift"))
  }
}
