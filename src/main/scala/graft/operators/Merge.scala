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

  /** SCD Type-2 apply — dimension history with full audit trail. The
    * history table carries (keys…, attrs…, validFrom, validTo) where a
    * null validTo marks the current version. One batch of updates
    * (keys…, attrs…, all rows effective at `effective`) is applied as:
    *   - matched + any attr changed (null-safe): current row closes at
    *     `effective`, a new version opens at `effective`
    *   - matched + unchanged: current row kept as-is (idempotent replay)
    *   - unmatched update key: a first version opens
    *   - already-closed rows are never touched
    *
    * Scale shape: ONE full-outer equi-join of current rows against the
    * batch on the keys (closed history is a filter, not a join side),
    * evaluated ONCE — each joined row explodes into its 0–2 output
    * versions (kept / closed+reopened / first-open), so the join subtree
    * is not re-planned per output class. AQE is free to broadcast the
    * delta. Updates must be key-unique (pre-aggregate otherwise).
    */
  def scd2(
      history: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      effective: org.apache.spark.sql.Column,
      validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "scd2 requires keys")
    require(attrs.nonEmpty, "scd2 requires tracked attribute columns")
    val closed = history.filter(col(validTo).isNotNull)
    // explicit presence markers — inferring presence from a data column
    // (e.g. validFrom.isNotNull) would silently drop a current row whose
    // validFrom happens to be null (MergeSpec pins this)
    val current = history.filter(col(validTo).isNull).withColumn("__cur", lit(true))
    val u = updates.select(
      keys.map(col) ++ attrs.map(c => col(c).as(s"__u_$c")) :+
        effective.as("__eff") :+ lit(true).as("__upd"): _*)
    val j = current.join(u, keys, "full_outer")
    val curPresent = col("__cur").isNotNull
    val updPresent = col("__upd").isNotNull
    val changed = attrs.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    val histCols = history.columns.toSeq
    val keptRow = struct(histCols.map(col): _*)
    val closedRow = struct(histCols.map(c =>
      if (c == validTo) col("__eff").as(validTo) else col(c)): _*)
    val openedRow = struct(histCols.map {
      case c if c == validFrom => col("__eff").as(validFrom)
      case c if c == validTo =>
        lit(null).cast(history.schema(validTo).dataType).as(validTo)
      case c if attrs.contains(c) => col(s"__u_$c").as(c)
      case c => col(c)
    }: _*)
    val versions = array_compact(array(
      when(curPresent && (!updPresent || !changed), keptRow),
      when(curPresent && updPresent && changed, closedRow),
      when(updPresent && (!curPresent || changed), openedRow)))
    val applied = j.select(explode(versions).as("__r")).select(col("__r.*"))
    closed.unionByName(applied)
  }
}
