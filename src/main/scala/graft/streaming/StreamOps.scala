package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators. The reference's "stream" is a DB
  * cursor (SURVEY.md §2.5 — no watermarks/windows/state exist there);
  * these are the genuine streaming counterparts a Spark-native engine
  * owes its users: windowed aggregation, streaming dedup, and stateful
  * sessionization. Batch DataFrames run through the same code (the
  * transformations are mode-agnostic), which is how the oracle checks
  * them.
  */
object StreamOps {

  /** Tumbling-window event counts/sums with a watermark bounding state. */
  def windowedAgg(events: DataFrame, tsCol: String, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on keys; watermark bounds the dedup state. */
  def dedup(events: DataFrame, tsCol: String, watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(keys :+ tsCol)

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long, sum_value: Double)
  private final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  /** Sessionization via flatMapGroupsWithState: events for a user belong
    * to one session until a `gapMs` silence; timeout flushes the session.
    * State per key is O(1) (no event buffering) — the shape that survives
    * 100 TB of events: state size scales with active users, not volume.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s => state.update(s); state.setTimeoutDuration(gapMs) }
            closed.result().iterator
          }
      }
  }
}
