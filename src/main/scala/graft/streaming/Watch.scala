package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.query.QueryBuilder

/**
 * Reactive layer — the reference's `watch()` / change-event machinery
 * (/root/reference/lib/src/chain/query_builder.dart:480-543,
 * lib/src/core/notification_manager.dart:9,
 * lib/src/model/change_event.dart:2-27).
 *
 * Semantics preserved:
 *  - subscribe emits the full current result immediately;
 *  - every matching change event re-runs the query and emits the new full
 *    result (output mode "complete");
 *  - bursts coalesce: while a re-run is in flight new events only mark a
 *    dirty flag — the reference's in-flight-absorbs-bursts debounce.
 *
 * Two transports:
 *  - `WatchHub`: in-process listener registry (the reference's
 *    NotificationManager shape) — `publish` is called by the write path;
 *  - `ChangeFeed`: the same events as a Structured Streaming source over a
 *    parquet change-feed directory, for cross-process CDC at scale
 *    (SURVEY.md §2.11: source schema (op, table, before, after, ts)).
 */
object ChangeEvent {
  /** CDC schema: op ∈ insert|update|delete|clear; before/after are JSON
    * blobs of the row (schema-free transport, typed at the consumer). */
  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("before", StringType, nullable = true),
    StructField("after", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)))
}

final case class ChangeEvent(
    op: String,
    table: String,
    before: Option[String],
    after: Option[String],
    ts: java.sql.Timestamp)

/** One active watch: re-runs `compute` on matching events, pushes the full
  * result list to `onData`. */
final class WatchSubscription(
    private[streaming] val table: String,
    compute: () => Seq[Row],
    onData: Seq[Row] => Unit,
    hub: WatchHub) {

  private val running = new AtomicBoolean(false)
  private val dirty = new AtomicBoolean(false)
  @volatile private var closed = false

  private[streaming] def fire(): Unit = {
    if (closed) return
    // coalescing debounce: in-flight query absorbs bursts
    // (query_builder.dart:480-543)
    if (!running.compareAndSet(false, true)) { dirty.set(true); return }
    try {
      var again = true
      while (again && !closed) {
        dirty.set(false)
        onData(compute())
        again = dirty.get()
      }
    } finally running.set(false)
    // lost-wakeup guard: an event published between the loop's final
    // dirty check and running.set(false) set dirty but could not enter —
    // re-fire so the last write is never silently dropped
    if (dirty.get() && !closed) fire()
  }

  def close(): Unit = { closed = true; hub.unsubscribe(this) }
}

/** In-process notification hub (reference NotificationManager). The write
  * path calls `publish`; watches on that table re-execute. */
final class WatchHub {
  private val subs = ConcurrentHashMap.newKeySet[WatchSubscription]()

  /** Subscribe; emits the initial full result synchronously
    * (watch() initial emission, query_builder.dart:480-543).
    *
    * Result-size bound: each emission COLLECTS the full result to the
    * subscriber (reference semantics — watch delivers complete lists).
    * Watched queries inherit the builder's default 1000-row limit unless
    * `noDefaultLimit` is set; keep watched results bounded (aggregates or
    * limited queries) — an unbounded watch over a fact table would collect
    * it per change event. */
  def watch(query: QueryBuilder)(onData: Seq[Row] => Unit): WatchSubscription =
    watchCompute(query.table, () => query.toDF.collect().toSeq)(onData)

  /** Generic watch over any recomputable result keyed to a table name
    * (used by KV watchValue and custom sources). */
  def watchCompute(table: String, compute: () => Seq[Row])
      (onData: Seq[Row] => Unit): WatchSubscription = {
    val sub = new WatchSubscription(table, compute, onData, this)
    subs.add(sub)
    sub.fire()
    sub
  }

  def publish(event: ChangeEvent): Unit =
    subs.forEach(s => if (s.table == event.table) s.fire())

  private[streaming] def unsubscribe(s: WatchSubscription): Unit = subs.remove(s)

  def activeCount: Int = subs.size()
}

/**
 * File-backed change feed: append-only parquet event log usable both as a
 * batch DataFrame and as a Structured Streaming source. At scale this is
 * the Kafka-topic shape with a directory standing in for the broker.
 *
 * The session passed here owns every stream's state layout — for the
 * stateful consumers ([[watchAggregate]]'s windowed state), construct
 * with [[StreamTuning.sizedSession]] so state partitions are sized to
 * state, not inherited from the batch shuffle width (the measured
 * per-batch fsync floor in StreamTuning's Scaladoc).
 */
final class ChangeFeed(spark: SparkSession, dir: String) {

  def append(events: Seq[ChangeEvent]): Unit = {
    val rows = events.map(e => Row(e.op, e.table, e.before.orNull, e.after.orNull, e.ts))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ChangeEvent.schema)
      .write.mode("append").parquet(dir)
  }

  def batch: DataFrame = spark.read.schema(ChangeEvent.schema).parquet(dir)

  /** Streaming view — compose with watermarks/windows downstream:
    * `feed.stream.withWatermark("ts","10 minutes").groupBy(window($"ts",...))`. */
  def stream: DataFrame = spark.readStream.schema(ChangeEvent.schema).parquet(dir)

  /**
   * Streaming watch: re-run `query` per micro-batch containing events for
   * its table (foreachBatch recomputation — the watch() semantics mapped
   * onto Structured Streaming, SURVEY.md §3.3).
   * Returns the StreamingQuery; results accumulate via `onData`.
   */
  def watchStream(query: QueryBuilder)(onData: Seq[Row] => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    stream.where(col("table") === query.table)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) onData(query.toDF.collect().toSeq)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /**
   * Incremental aggregate watch — the bounded-state alternative to
   * `watchStream`'s full-query recompute: a windowed per-key aggregate
   * over the feed runs in UPDATE output mode, so each micro-batch emits
   * only the (window, key) rows that changed, and the watermark evicts
   * finalized windows from the state store. This is the watch shape that
   * survives 100 TB: state is O(active windows × keys), emissions are
   * O(changed keys), and nothing recomputes the base query.
   *
   * `keyExpr` extracts the grouping key from the event (typically
   * `get_json_object(col("after"), "$.field")`); `aggs` aggregate over the
   * events themselves. State lives in `checkpoint` — reuse the same
   * directory across (AvailableNow) runs to keep accumulating.
   */
  def watchAggregate(
      tableName: String,
      keyExpr: org.apache.spark.sql.Column,
      aggs: Seq[org.apache.spark.sql.Column],
      checkpoint: String,
      windowWidth: String = "1 hour",
      watermark: String = "10 minutes")(onUpdate: Seq[Row] => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    stream.where(col("table") === tableName)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowWidth).as("w"), keyExpr.as("key"))
      .agg(aggs.head, aggs.tail: _*)
      .writeStream
      .outputMode("update") // changed (window, key) rows only — no full recompute
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().toSeq
        if (rows.nonEmpty) onUpdate(rows)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}

/** Event-time windowed aggregation helpers over any (ts, ...) stream —
  * Spark superset ops the reference lacks (SURVEY.md §2.11: no event-time
  * semantics exist there; watermark/tumbling/sliding/session come free). */
object EventTime {
  def tumbling(df: DataFrame, tsCol: String, width: String,
      watermark: String, keys: Seq[String], aggs: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    wm.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
      watermark: String, keys: Seq[String], aggs: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    wm.groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  def session(df: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[String], aggs: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    wm.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
