package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R2 — merge/upsert: *staging wins on primary key*.
  *
  * Reference semantics (`loader/hive_loader.py:162-182`, MySQL twin
  * `loader/mysql_loader.py:92-113`): keep target rows whose key has no
  * match in staging (`LEFT OUTER JOIN … WHERE b.k IS NULL`), then
  * `UNION ALL` the whole staging set. We use `left_anti`, which is the
  * same plan Catalyst derives from the reference's join+filter, but with
  * clean NULL-key semantics: a NULL-keyed target row never "matches"
  * staging and is retained (SURVEY.md §7.4; pinned in MergeSpec).
  *
  * Scale notes: Catalyst picks broadcast-hash when staging is small
  * (the common incremental-load case — staging is the delta), else
  * shuffled hash / sort-merge; AQE can switch at runtime. No custom
  * join code needed or wanted.
  */
object Merge {

  def upsert(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires primary keys (reference: hive_loader.py:66-72)")
    target.join(staging, keys, "left_anti").unionByName(staging)
  }

  /** Merge with an explicit broadcast hint on the staging (delta) side —
    * for incremental loads where the delta is known-small relative to the
    * target. The anti-join then needs NO shuffle of the (huge) target.
    */
  def upsertSmallDelta(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires primary keys")
    target.join(broadcast(staging), keys, "left_anti").unionByName(staging)
  }
}
