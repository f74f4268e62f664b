package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom per-key streaming state via `flatMapGroupsWithState` — the
 * Structured Streaming primitive for semantics the built-in windows can't
 * express (the reference has no analog; this extends SURVEY §2.11's
 * event-time superset with arbitrary-state operators).
 *
 * `sessions` is the canonical instance: inactivity-gap sessionization with
 * EVENT-TIME timeouts. Unlike `session_window` aggregation (q36), the
 * state here is explicit and arbitrary — the same harness carries any
 * accumulator a pipeline needs (dedup-within-session, per-user rate
 * tracking, conversation stitching). State is O(active keys), evicted by
 * the watermark-driven timeout — the bounded-state shape 100 TB streams
 * require.
 */
object Stateful {

  /** Open session accumulator for one key. */
  final case class SessionState(start: Long, last: Long, count: Long)

  /** A closed session: [session_start, session_end] with its event count. */
  final case class Session(
      key: String,
      session_start: Timestamp,
      session_end: Timestamp,
      events: Long)

  /**
   * Sessionize a (key, ts) stream: a session closes after `gapMs` of
   * inactivity (event-time, driven by the watermark) OR when a later
   * event arrives more than `gapMs` past the previous one in the same
   * micro-batch. Emits closed sessions only (append mode downstream).
   *
   * @param events    streaming Dataset of (key, event time)
   * @param gapMs     inactivity gap that closes a session
   * @param watermark event-time watermark (bounds state + lateness)
   */
  def sessions(
      events: Dataset[(String, Timestamp)],
      gapMs: Long,
      watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("key", "ts")
      .withWatermark("ts", watermark)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close + evict
            val s = state.get
            state.remove()
            Iterator.single(Session(key, new Timestamp(s.start), new Timestamp(s.last), s.count))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = List.newBuilder[Session]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some(s) if t > s.last + gapMs => // forward gap: close
                  closed += Session(key, new Timestamp(s.start), new Timestamp(s.last), s.count)
                  Some(SessionState(t, t, 1))
                case Some(s) if t < s.start - gapMs =>
                  // watermark-admitted straggler older than the open session
                  // by more than the gap: its own (already-complete) session
                  // — the sorted batch twin would isolate it the same way
                  closed += Session(key, new Timestamp(t), new Timestamp(t), 1)
                  Some(s)
                case Some(s) => // within gap of the open session, either side:
                  // out-of-order arrivals EXTEND the window both directions
                  // (start = min, not the first-seen start — batch parity)
                  Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.count + 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch (non-streaming) sessionization with identical semantics — the
    * offline twin used for spec cross-checks and backfills: sort each
    * key's events, split on gaps, one pass per key partition. */
  def sessionsBatch(events: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // new session whenever the gap from the previous event exceeds gapMs
    val marked = events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new_session",
        (col("__prev").isNull ||
          (unix_millis(col(tsCol)) - unix_millis(col("__prev"))) > gapMs)
          .cast("int"))
      .withColumn("__session_id", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col(keyCol).as("key"), col("__session_id"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("events"))
      .drop("__session_id")
  }
}
