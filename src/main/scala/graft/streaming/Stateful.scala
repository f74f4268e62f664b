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

  /** Per-key state: the current open session plus at most one OLDER open
    * session fed by watermark-admitted stragglers. Two slots give exact
    * batch parity for the common late-data shape (a burst of stragglers
    * that form one earlier session); a third concurrent straggler session
    * overflows to an eager singleton emission (documented in `sessions`). */
  final case class KeyState(older: Option[SessionState], open: SessionState)

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
   * Stragglers (watermark-admitted events older than the open session by
   * more than the gap) accumulate in a second OLDER session slot, so a
   * burst of late events that belong together closes as ONE merged session
   * — the same answer `sessionsBatch` gives. Only a THIRD concurrent
   * straggler session (two distinct older-than-older gaps open at once)
   * overflows to an eager singleton emission; bounded state requires some
   * cap, and two slots is the exact-parity sweet spot for real late data.
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
    def toSession(key: String, s: SessionState): Session =
      Session(key, new Timestamp(s.start), new Timestamp(s.last), s.count)
    events.toDF("key", "ts")
      .withWatermark("ts", watermark)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KeyState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            // watermark passed the earliest open session's last+gap: close
            // every expired session, keep the rest with a fresh timeout
            val st = state.get
            val wm = state.getCurrentWatermarkMs()
            val all = st.older.toList :+ st.open
            val (dead, live) = all.partition(s => s.last + gapMs <= wm)
            live match {
              case Nil => state.remove()
              case one :: Nil =>
                state.update(KeyState(None, one))
                state.setTimeoutTimestamp(one.last + gapMs)
              case two =>
                state.update(KeyState(Some(two.head), two.last))
                state.setTimeoutTimestamp(two.head.last + gapMs)
            }
            dead.iterator.map(toSession(key, _))
          } else {
            val ts = rows.map(_._2.getTime).toArray.sorted
            val closed = List.newBuilder[Session]
            var older: Option[SessionState] = state.getOption.flatMap(_.older)
            var open: Option[SessionState] = state.getOption.map(_.open)
            def within(s: SessionState, t: Long): Boolean =
              t >= s.start - gapMs && t <= s.last + gapMs
            ts.foreach { t =>
              open match {
                case None => open = Some(SessionState(t, t, 1))
                case Some(o) if within(o, t) =>
                  // out-of-order arrivals EXTEND the window both directions
                  // (start = min, not the first-seen start — batch parity)
                  open = Some(SessionState(math.min(o.start, t), math.max(o.last, t), o.count + 1))
                case Some(o) if t > o.last + gapMs => // forward gap: close open
                  closed += toSession(key, o)
                  open = Some(SessionState(t, t, 1))
                case Some(_) => // straggler: route into the older slot
                  older match {
                    case None => older = Some(SessionState(t, t, 1))
                    case Some(d) if within(d, t) =>
                      older = Some(SessionState(math.min(d.start, t), math.max(d.last, t), d.count + 1))
                    case Some(d) if t > d.last + gapMs =>
                      // a session strictly between older and open: the older
                      // one can no longer grow from sorted-later input this
                      // batch and is nearest the watermark — close it
                      closed += toSession(key, d)
                      older = Some(SessionState(t, t, 1))
                    case Some(_) =>
                      // third concurrent session (older than `older` by a
                      // gap): slot overflow — eager singleton (documented)
                      closed += Session(key, new Timestamp(t), new Timestamp(t), 1)
                  }
              }
              // an extension may have pulled older and open within one gap
              // of each other — they are one session now
              (older, open) match {
                case (Some(d), Some(o)) if o.start - d.last <= gapMs =>
                  open = Some(SessionState(d.start, o.last, d.count + o.count))
                  older = None
                case _ => ()
              }
            }
            // evict sessions the watermark has ALREADY passed before
            // persisting: a key that keeps receiving data never enters the
            // hasTimedOut branch, so a stale older session would (a) never
            // close and (b) poison setTimeoutTimestamp with a timestamp
            // below the watermark — which throws and kills the query.
            // Admitted events satisfy t >= watermark, so the new open
            // session always survives this partition.
            val wm = state.getCurrentWatermarkMs()
            val (dead, live) = (older.toList ++ open.toList)
              .partition(s => s.last + gapMs <= wm)
            dead.foreach(s => closed += toSession(key, s))
            live match {
              case Nil => state.remove()
              case one :: Nil =>
                state.update(KeyState(None, one))
                state.setTimeoutTimestamp(one.last + gapMs)
              case two =>
                state.update(KeyState(Some(two.head), two.last))
                state.setTimeoutTimestamp(two.head.last + gapMs)
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

  /** EWMA monitor state for one key: exactly
    * [[graft.operators.TimeSeries.ewmaChart]]'s integer (m, d) pair plus
    * the last-seen event time and a processed count. */
  final case class EwmaState(m: Long, d: Long, lastT: Long, n: Long)

  /** One scored bucket: the pre-update prediction/deviation the alarm
    * compared against (the batch chart's exact row shape). */
  final case class EwmaAlarm(key: String, ts: Timestamp, x: Long,
      pred: Long, dev: Long, alarm: Boolean)

  /**
   * STREAMING twin of [[graft.operators.TimeSeries.ewmaChart]]: the same
   * integer α=1/2 truncating-div recursion (Scala `Long./` truncates
   * toward zero — the identical `div`), carried as O(1) per-key state
   * across micro-batches, scoring each bucket as it arrives. Within a
   * micro-batch rows fold in (event-time, value) order; a row older than
   * the key's last processed time CANNOT be folded into an
   * order-sensitive recursion and is DROPPED (the documented late-data
   * contract — deliver per-key in order, e.g. bucketed upstream, for
   * exact batch parity; the gate replays a single-file feed where parity
   * is exact). The seed bucket emits no row, exactly like the batch
   * chart.
   *
   * State: 4 longs per key, forever bounded; emission is append-mode.
   */
  final case class GapState(lastI: Long, n: Long)
  final case class GapAlarm(key: String, gap_start: Long, gap_end: Long,
    missed: Long)

  /**
   * Streaming missing-bucket (heartbeat) alarms — the STREAMING twin of
   * `TimeSeries.coverageReport`: per key, carry the last seen bucket
   * index across micro-batches (2 longs, bounded forever) and emit one
   * alarm row per hole the moment the first bucket AFTER it arrives
   * ("days 12–13 never reported" fires as day 14 lands). Within a batch
   * rows sort by bucket index (the ewmaAlarms in-order discipline);
   * late or duplicate buckets (i ≤ last) are DROPPED by the same
   * contract. Replayed as a single-file feed the output equals the
   * batch lag-gap computation row for row — which is what the oracle
   * computes.
   *
   * Output (append): (key, gap_start, gap_end, missed) per hole.
   */
  def gapAlarms(buckets: Dataset[(String, Long)]): Dataset[GapAlarm] = {
    val spark = buckets.sparkSession
    import spark.implicits._
    buckets.groupByKey(_._1)
      .flatMapGroupsWithState[GapState, GapAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[GapState]) =>
          val sorted = rows.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(GapState(Long.MinValue, 0L))
          val out = List.newBuilder[GapAlarm]
          sorted.foreach { i =>
            if (st.n == 0L) st = GapState(i, 1L)
            else if (i > st.lastI) {
              if (i > st.lastI + 1L)
                out += GapAlarm(key, st.lastI + 1L, i - 1L, i - 1L - st.lastI)
              st = GapState(i, st.n + 1L)
            } // i <= lastI: late or duplicate — dropped by contract
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Page-Hinkley streaming state: exact prefix sum + count, and the
    * (m, min m) pair in PICOUNITS — the batch operator's DECIMAL(·,12)
    * running sums are exact integer picounit sums, so 2 longs carry the
    * batch arithmetic bit-for-bit (exactness bound: |m|·1e12 < 2^63,
    * i.e. cumulative deviation mass < ~9.2e6 units — far above any
    * chart-scale series; the deviations telescope toward 0 by
    * construction). */
  final case class PhState(sumX: Long, n: Long, mPico: Long,
    mMinPico: Long, lastT: String)
  /** One scored bucket: ph in exact MICRO-units (truncating pico→micro
    * division — floor, both sides non-negative), so the batch-replay
    * oracle compares integers, never floats. */
  final case class PhScore(key: String, t: String, x: Long,
    ph_micro: Long, alarm: Boolean)

  /**
   * STREAMING twin of [[graft.operators.TimeSeries.pageHinkley]]: the
   * same running-mean deviation recursion mₜ = Σᵢ(xᵢ − x̄₁..ᵢ − δ),
   * PHₜ = mₜ − min mₛ, carried as O(1) per-key state across
   * micro-batches and scoring each bucket as it arrives — upward mean
   * drift alarms the moment the bucket lands instead of at the next
   * batch replay. Each deviation term is the batch side's exact 12dp
   * rounding (BigDecimal HALF_UP — the same rational Spark's
   * round(·,12) → DECIMAL cast produces) accumulated as picounit longs.
   * Within a micro-batch rows fold in bucket order; a bucket ≤ the
   * key's last processed CANNOT be folded into an order-sensitive
   * recursion and is DROPPED (the [[ewmaAlarms]] late-data contract).
   * λ and δ arrive as exact micro-units so the alarm compare is pure
   * integer arithmetic.
   *
   * Output (append), one row per accepted bucket: (key, t, x,
   * ph_micro, alarm).
   */
  def phAlarms(buckets: Dataset[(String, String, Long)],
      lambdaMicro: Long, deltaMicro: Long = 0L): Dataset[PhScore] = {
    require(lambdaMicro > 0, "lambdaMicro > 0")
    val spark = buckets.sparkSession
    import spark.implicits._
    val delta = deltaMicro.toDouble / 1e6
    buckets.groupByKey(_._1)
      .flatMapGroupsWithState[PhState, PhScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String, Long)],
         state: GroupState[PhState]) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(PhState(0L, 0L, 0L, 0L, ""))
          val out = List.newBuilder[PhScore]
          sorted.foreach { case (_, t, x) =>
            if (st.n == 0L || t > st.lastT) {
              val sum2 = st.sumX + x
              val n2 = st.n + 1L
              val dev = x.toDouble - sum2.toDouble / n2 - delta
              val devPico = BigDecimal(dev)
                .setScale(12, BigDecimal.RoundingMode.HALF_UP)
                .bigDecimal.movePointRight(12).longValueExact()
              val m2 = st.mPico + devPico
              val mMin2 = if (st.n == 0L) m2 else math.min(st.mMinPico, m2)
              val phMicro = (m2 - mMin2) / 1000000L
              out += PhScore(key, t, x, phMicro, phMicro >= lambdaMicro)
              st = PhState(sum2, n2, m2, mMin2, t)
            } // t <= lastT: late or duplicate bucket — dropped by contract
          }
          state.update(st)
          out.result().iterator
      }
  }

  def ewmaAlarms(events: Dataset[(String, Timestamp, Long)],
      k: Int = 3): Dataset[EwmaAlarm] = {
    require(k >= 1 && k <= 10, s"k in [1,10]: $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Long)],
         state: GroupState[EwmaState]) =>
          val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
          var st = state.getOption.getOrElse(EwmaState(0L, 0L, Long.MinValue, 0L))
          val out = List.newBuilder[EwmaAlarm]
          sorted.foreach { case (_, ts, x) =>
            val t = ts.getTime
            if (st.n == 0L) st = EwmaState(x, 0L, t, 1L)
            else if (t > st.lastT) {
              val resid = x - st.m
              out += EwmaAlarm(key, ts, x, st.m, st.d,
                st.d > 0L && math.abs(resid) > k.toLong * st.d)
              st = EwmaState((x + st.m) / 2L, (math.abs(resid) + st.d) / 2L,
                t, st.n + 1L)
            } // t <= lastT: late or duplicate bucket — dropped by contract
          }
          state.update(st)
          out.result().iterator
      }
  }
}
