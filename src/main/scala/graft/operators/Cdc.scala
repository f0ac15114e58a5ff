package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture changelog apply: collapse an (op, key, payload)
  * event log to final table state — the ingestion step between a CDC
  * feed (Debezium-style I/U/D records) and a queryable snapshot.
  *
  * Last write wins per key under the given ordering; a delete as the
  * last operation removes the key entirely. One hash shuffle on the
  * keys, one window pass — same scale shape as the R1 dedup window
  * (rank-1 selection never buffers a key's history). The ordering
  * columns must totally order each key's changes (ts + a sequence
  * column for same-timestamp commits — pinned in CdcSpec).
  */
object Cdc {

  def applyChangelog(
      log: DataFrame,
      keys: Seq[String],
      ordering: Seq[Column],
      opCol: String = "op",
      deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "changelog apply requires key columns")
    require(ordering.nonEmpty, "changelog apply requires ordering columns")
    // same rank-1 selection as R1 dedup; null-safe delete test so a
    // malformed NULL op on the winning record is retained as an upsert
    // (a plain =!= would null out and silently DELETE the key)
    Dedup.byRank(log, keys, ordering.map(_.desc))
      .filter(!(col(opCol) <=> lit(deleteOp)))
  }
}
