package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.query.Agg
import graft.streaming._

/** Reactive watch + change feed (SURVEY.md §2.11, §3.3). */
class StreamingSpec extends SparkSpec {

  test("watch emits initial result on subscribe (query_builder.dart:480-543)") {
    val hub = new WatchHub
    val emissions = new AtomicInteger(0)
    @volatile var last: Seq[org.apache.spark.sql.Row] = Nil
    val sub = hub.watch(engine.query("region").orderByAsc("r_regionkey")) { rows =>
      emissions.incrementAndGet(); last = rows
    }
    assert(emissions.get() == 1)
    assert(last.size == 5)
    sub.close()
  }

  test("watch re-runs on matching table event only; closed watch is silent") {
    val hub = new WatchHub
    val emissions = new AtomicInteger(0)
    val sub = hub.watch(engine.query("nation").limit(3)) { _ => emissions.incrementAndGet() }
    assert(emissions.get() == 1)
    hub.publish(ChangeEvent("insert", "nation", None, None, new Timestamp(0)))
    assert(emissions.get() == 2)
    hub.publish(ChangeEvent("insert", "orders", None, None, new Timestamp(0)))
    assert(emissions.get() == 2) // other table: no re-run
    sub.close()
    hub.publish(ChangeEvent("delete", "nation", None, None, new Timestamp(0)))
    assert(emissions.get() == 2)
    assert(hub.activeCount == 0)
  }

  test("watch coalescing: a 50-write burst during one in-flight compute collapses to ≤2 more emissions, last one complete") {
    val hub = new WatchHub
    val gate = new java.util.concurrent.Semaphore(1)
    val computes = new AtomicInteger(0)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var state = 0L
    val sub = hub.watchCompute("t", () => {
      computes.incrementAndGet()
      gate.acquire(); gate.release() // blocks while the test holds the permit
      Seq(org.apache.spark.sql.Row(state))
    })(rows => { emitted.add(rows.head.getLong(0)); () })
    assert(computes.get() == 1 && emitted.size == 1) // initial emission
    def ev = ChangeEvent("insert", "t", None, None, new Timestamp(0))
    // hold the gate, start one publish on another thread → compute #2 is
    // IN FLIGHT and blocked
    gate.acquire()
    val inflight = new Thread(() => hub.publish(ev))
    inflight.start()
    val deadline = System.currentTimeMillis() + 10000
    while (computes.get() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(5)
    assert(computes.get() == 2, "in-flight compute started")
    // burst: 50 rapid writes while the compute is in flight — every one
    // returns immediately (publish is non-blocking under coalescing) and
    // they all collapse into ONE dirty flag
    (1 to 50).foreach { i => state = i; hub.publish(ev) }
    gate.release()
    inflight.join(10000)
    // quiesce: the loop drains dirty with ONE more compute (plus at most
    // one lost-wakeup re-fire)
    while (computes.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(5)
    Thread.sleep(150) // nothing further may arrive after the drain
    val total = emitted.size
    assert(total <= 4, s"51 publishes must coalesce, saw $total emissions")
    assert(computes.get() == total, "every compute emits exactly once")
    assert(emitted.toArray.last == 50L,
      "the LAST emission must reflect the final write (never dropped)")
    sub.close()
  }

  test("watched engine: writes notify watchers automatically (notification_manager.dart:9)") {
    val wh = Files.createTempDirectory("graft_watched").toString
    val hub = new WatchHub
    val e = Graft.withWarehouse(spark, sfDir, wh).watched(hub)
    import graft.schema._
    e.createTable(TableSchema("wt", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("v", GType.GInteger))))
    val counts = new AtomicInteger(0)
    @volatile var last = -1L
    // chain-level spelling (query_builder.dart:480) — same machinery
    val sub = e.query("wt").watch { rows => counts.incrementAndGet(); last = rows.size }
    assert(counts.get() == 1 && last == 0) // initial emission, empty table
    e.batchInsert("wt", Seq(Map("id" -> "1", "v" -> 5))) // append → notify
    assert(counts.get() >= 2 && last == 1)
    e.update("wt").set("v", 9).where("id", "=", "1").apply() // overwrite → notify
    assert(last == 1 && counts.get() >= 3)
    e.delete("wt").where("id", "=", "1").apply()
    assert(last == 0)
    sub.close()
    // an un-hubbed engine copy stays silent (no hub, no notifications)
    val silent = counts.get()
    Graft.withWarehouse(spark, sfDir, wh).batchInsert("wt",
      Seq(Map("id" -> "2", "v" -> 1)))
    assert(counts.get() == silent)
  }

  test("change feed: append/batch roundtrip with CDC schema (change_event.dart:2-27)") {
    val dir = Files.createTempDirectory("graft_feed").toString + "/feed"
    val feed = new ChangeFeed(spark, dir)
    feed.append(Seq(
      ChangeEvent("insert", "t1", None, Some("""{"id":1}"""), new Timestamp(1000)),
      ChangeEvent("update", "t1", Some("""{"id":1}"""), Some("""{"id":2}"""), new Timestamp(2000)),
      ChangeEvent("delete", "t2", Some("""{"id":9}"""), None, new Timestamp(3000))))
    val rows = feed.batch.orderBy("ts").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == Seq("insert", "update", "delete"))
    assert(feed.batch.schema.fieldNames.toSeq ==
      Seq("op", "table", "before", "after", "ts"))
  }

  test("watchStream: foreachBatch recomputation over the feed (Structured Streaming)") {
    val dir = Files.createTempDirectory("graft_feed2").toString + "/feed"
    val feed = new ChangeFeed(spark, dir)
    feed.append(Seq(ChangeEvent("insert", "region", None, None, new Timestamp(1000))))
    @volatile var captured: Seq[org.apache.spark.sql.Row] = Nil
    val q = feed.watchStream(
      engine.query("region").groupBy("r_regionkey").agg(Agg.count(alias = "cnt"))) {
      rows => captured = rows
    }
    q.awaitTermination(60000)
    assert(captured.size == 5)
  }

  test("watchAggregate: update-mode emits only changed keys, no full recompute") {
    val base = Files.createTempDirectory("graft_feed3").toString
    val feed = new ChangeFeed(spark, base + "/feed")
    val ckpt = base + "/ckpt"
    def ev(user: String, ts: Long) = ChangeEvent("insert", "events",
      None, Some(s"""{"user":"$user"}"""), new Timestamp(ts))
    feed.append(Seq(ev("alice", 1000), ev("alice", 2000), ev("bob", 3000)))
    @volatile var updates: Seq[Seq[org.apache.spark.sql.Row]] = Nil
    def run(): Unit = {
      val q = feed.watchAggregate("events",
        get_json_object(col("after"), "$.user"),
        Seq(count(lit(1)).as("cnt")), ckpt) { rows => updates = updates :+ rows }
      q.awaitTermination(60000)
    }
    run()
    val first = updates.flatten.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(first == Map("alice" -> 2L, "bob" -> 1L))
    // second batch touches ONLY alice → the update-mode emission carries
    // alice's new running count and nothing for bob (incremental, state
    // carried in the checkpoint — not a recompute of the base query)
    updates = Nil
    feed.append(Seq(ev("alice", 4000)))
    run()
    val second = updates.flatten.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(second == Map("alice" -> 3L))
  }

  test("event-time windows: tumbling batch counts match manual bucketing") {
    val events = engine.table("events").limit(500).cache()
    val windowed = EventTime.tumbling(events, "ts", "1 hour", "0 seconds",
      Seq("event_type"), Seq(count(lit(1)).as("cnt")))
    val total = windowed.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == events.count())
    val manual = events.groupBy(date_trunc("hour", col("ts")), col("event_type")).count().count()
    assert(windowed.count() == manual)
    events.unpersist()
  }

  test("streaming watermark drops late data past the threshold (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = EventTime.tumbling(mem.toDF.toDF("ts", "k"), "ts",
      "10 minutes", "10 minutes", Seq("k"), Seq(count(lit(1)).as("cnt")))
    val q = agg.writeStream.format("memory").queryName("wmtest")
      .outputMode("append").start()
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    try {
      mem.addData((ts(5), "a"), (ts(7), "a")) // window [0,10)
      q.processAllAvailable()
      mem.addData((ts(35), "a")) // watermark → 25: [0,10) closes, emits cnt=2
      q.processAllAvailable()
      mem.addData((ts(6), "a")) // LATE (6 < watermark 25) → dropped
      mem.addData((ts(65), "a")) // watermark → 55: [30,40) closes
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("wmtest")
        .select(col("window.start").cast("long").as("ws"), col("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows(0L) == 2L) // late event did NOT resurrect the closed window
      assert(rows(1800L) == 1L) // [30,40)
    } finally q.stop()
  }

  test("Stateful.sessions: custom flatMapGroupsWithState state closes on event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = Stateful.sessions(mem.toDS(), gapMs = 10 * 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sesstest").outputMode("append").start()
    try {
      // key a: events at 1,6 (one session); key b: event at 2. (Times sit
      // strictly above the initial watermark 0 — an event AT the watermark
      // is dropped by the pre-stateful late filter.)
      mem.addData(("a", ts(1)), ("a", ts(6)), ("b", ts(2)))
      q.processAllAvailable()
      // watermark jumps past a's last+gap (6+10=16) and b's (2+10=12):
      // both sessions time out and emit
      mem.addData(("c", ts(40)))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("sesstest")
        .select("key", "session_start", "session_end", "events").collect()
        .map(r => r.getString(0) -> ((r.getTimestamp(1).getTime / 60000L,
          r.getTimestamp(2).getTime / 60000L, r.getLong(3)))).toMap
      assert(rows("a") == ((1L, 6L, 2L)), s"a: ${rows.get("a")}")
      assert(rows("b") == ((2L, 2L, 1L)))
      assert(!rows.contains("c")) // still open (no watermark past 50)
      // in-batch gap split: two sessions for one key in a single batch
      mem.addData(("d", ts(100)), ("d", ts(120)))
      mem.addData(("e", ts(200))) // push watermark way past d's sessions
      q.processAllAvailable()
      q.processAllAvailable()
      val d = spark.table("sesstest").where(col("key") === "d")
        .select("session_start", "events").collect()
        .map(r => r.getTimestamp(0).getTime / 60000L -> r.getLong(1)).toMap
      assert(d == Map(100L -> 1L, 120L -> 1L))
    } finally q.stop()
    // batch twin agrees on the closed sessions
    val batch = Seq(("a", ts(1)), ("a", ts(6)), ("b", ts(2)), ("d", ts(100)), ("d", ts(120)))
      .toDF("k", "t")
    val off = Stateful.sessionsBatch(batch, "k", "t", gapMs = 10 * 60000L)
      .select(col("key"), col("session_start"), col("events")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000L) -> r.getLong(2)).toMap
    assert(off == Map(("a", 1L) -> 2L, ("b", 2L) -> 1L, ("d", 100L) -> 1L, ("d", 120L) -> 1L))
  }

  test("Stateful.sessions: watermark-admitted out-of-order events keep batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = Stateful.sessions(mem.toDS(), gapMs = 10 * 60000L, watermark = "1 hour")
      .writeStream.format("memory").queryName("sessoo").outputMode("append").start()
    try {
      mem.addData(("f", ts(300))); q.processAllAvailable()
      // out-of-order but within gap: extends the session START backward
      mem.addData(("f", ts(295))); q.processAllAvailable()
      // admitted straggler older than start-gap: its own singleton session
      mem.addData(("f", ts(250))); q.processAllAvailable()
      // push watermark past last+gap: the open session times out
      mem.addData(("g", ts(600))); q.processAllAvailable(); q.processAllAvailable()
      val f = spark.table("sessoo").where(col("key") === "f")
        .select("session_start", "session_end", "events").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L,
          r.getTimestamp(1).getTime / 60000L, r.getLong(2))).toSet
      assert(f == Set((250L, 250L, 1L), (295L, 300L, 2L)), f.toString)
    } finally q.stop()
  }

  test("Stateful.sessions: stragglers within gap of EACH OTHER merge (batch parity)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = Stateful.sessions(mem.toDS(), gapMs = 10 * 60000L, watermark = "2 hours")
      .writeStream.format("memory").queryName("sessmerge").outputMode("append").start()
    try {
      mem.addData(("h", ts(300))); q.processAllAvailable()
      // two stragglers in DIFFERENT micro-batches, within one gap of each
      // other: they must close as ONE 2-event session, not two singletons
      mem.addData(("h", ts(250))); q.processAllAvailable()
      mem.addData(("h", ts(255))); q.processAllAvailable()
      mem.addData(("i", ts(600))); q.processAllAvailable(); q.processAllAvailable()
      val h = spark.table("sessmerge").where(col("key") === "h")
        .select("session_start", "session_end", "events").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L,
          r.getTimestamp(1).getTime / 60000L, r.getLong(2))).toSet
      assert(h == Set((250L, 255L, 2L), (300L, 300L, 1L)), h.toString)
      // and the batch twin gives the identical split
      val batch = Seq(("h", ts(300)), ("h", ts(250)), ("h", ts(255))).toDF("k", "t")
      val off = Stateful.sessionsBatch(batch, "k", "t", gapMs = 10 * 60000L)
        .select(col("session_start"), col("session_end"), col("events")).collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L,
          r.getTimestamp(1).getTime / 60000L, r.getLong(2))).toSet
      assert(off == h, s"batch twin diverged: $off vs $h")
    } finally q.stop()
  }

  test("Stateful.sessions: stale older session under a jumped watermark closes cleanly") {
    // regression: a key receiving fresh data never enters hasTimedOut, so
    // an expired older-slot session must be evicted in the DATA branch —
    // and setTimeoutTimestamp must never be fed a sub-watermark timestamp
    // (that throws and kills the query)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = Stateful.sessions(mem.toDS(), gapMs = 10 * 60000L, watermark = "1 hour")
      .writeStream.format("memory").queryName("sessstale").outputMode("append").start()
    try {
      mem.addData(("j", ts(960))); q.processAllAvailable()
      mem.addData(("j", ts(945))); q.processAllAvailable() // older slot
      mem.addData(("k", ts(2000))); q.processAllAvailable() // wm → 1940, j untouched
      mem.addData(("j", ts(1950))); q.processAllAvailable() // data branch w/ stale state
      mem.addData(("k", ts(4000))); q.processAllAvailable(); q.processAllAvailable()
      val j = spark.table("sessstale").where(col("key") === "j")
        .select("session_start", "session_end", "events").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L,
          r.getTimestamp(1).getTime / 60000L, r.getLong(2))).toSet
      assert(j == Set((945L, 945L, 1L), (960L, 960L, 1L), (1950L, 1950L, 1L)), j.toString)
    } finally q.stop()
  }

  test("Dedup.dedupStream: firehose dedup drops repeats within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = graft.pipeline.Dedup.dedupStream(
        mem.toDS().toDF("text", "ts"), "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("ddstream").outputMode("append").start()
    try {
      // in-batch duplicate + cross-batch duplicate inside the horizon;
      // whitespace/case variants share a normalized fingerprint
      mem.addData(("hello world", ts(1)), ("hello   WORLD", ts(2)), ("other doc", ts(3)))
      q.processAllAvailable()
      mem.addData(("hello world", ts(4)), ("third text", ts(5)))
      q.processAllAvailable()
      val texts = spark.table("ddstream").select("text").collect().map(_.getString(0)).toSeq
      assert(texts.length == 3, texts.mkString("|"))
      assert(texts.contains("hello world") && texts.contains("other doc")
        && texts.contains("third text"))
    } finally q.stop()
  }

  test("Dedup.dedupStreamNear: near-dup dropped in horizon; expired state re-admits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val aNear = a + " indeed" // distinct text, most shingles shared
    val b = "completely different content about database engines and shuffle partitioning"
    val c = "yet another unrelated document mentioning vectors and embeddings at scale"
    // precondition (deterministic — fixed hashes): (a, aNear) band-collide
    // at the spec parameters, nothing else does
    val pre = graft.pipeline.Dedup.bandCollisionPairs(
      Seq((1L, a), (2L, aNear), (3L, b), (4L, c)).toDF("id", "text"),
      "id", "text", shingleN = 3, k = 12, bands = 4, oracleHash = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pre == Set((1L, 2L)), s"precondition: $pre")
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = graft.pipeline.Dedup.dedupStreamNear(
        mem.toDS().toDF("text", "ts"), "text", "ts", watermark = "10 minutes",
        shingleN = 3, k = 12, bands = 4)
      .select("text", "ts")
      .writeStream.format("memory").queryName("neardupstream")
      .outputMode("append").start()
    try {
      mem.addData((a, ts(1)), (b, ts(2)))
      q.processAllAvailable()
      // near-dup of a, inside the horizon → dropped; unrelated c survives
      mem.addData((aNear, ts(5)), (c, ts(6)))
      q.processAllAvailable()
      // advance the watermark past a's state (6 > 1 + 10-min delay ⇒
      // watermark 30 evicts every band entry of a)
      mem.addData((b + " v2", ts(40)))
      q.processAllAvailable(); q.processAllAvailable()
      // LATENESS contract: a duplicate arriving beyond the horizon is
      // re-admitted — bounded state trades horizon for memory, exactly
      // like dedupStream's exact-fp variant
      mem.addData((a, ts(41)))
      q.processAllAvailable()
      val out = spark.table("neardupstream").select("text").collect()
        .map(_.getString(0)).toSeq
      assert(out.count(_ == a) == 2, s"expired dup must re-emit: $out")
      assert(!out.contains(aNear), s"near-dup inside horizon must drop: $out")
      assert(out.contains(b) && out.contains(c))
    } finally q.stop()
  }

  test("Dedup.dedupStreamHashes: hash near-dup dropped in horizon; expired state re-admits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // planted 64-bit hashes: y = x with bits flipped in blocks 0 and 2 of
    // the 6-block layout (hamming 2 ≤ h=3 → some clean 3-block combo
    // still collides); z differs from x in every block
    val (xHi, xLo) = (0x01234567L, 0xFEDCBA98L)
    val yLo = xLo ^ (1L << 3) ^ (1L << 25)
    val (zHi, zLo) = (xHi ^ 0xFFFFFFFFL, xLo ^ 0xFFFFFFFFL)
    val mem = MemoryStream[(Long, Long, Long, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val q = graft.pipeline.Dedup.dedupStreamHashes(
        mem.toDS().toDF("id", "hi", "lo", "ts"), "hi", "lo", "ts",
        watermark = "10 minutes")
      .select("id", "ts")
      .writeStream.format("memory").queryName("hashdedupstream")
      .outputMode("append").start()
    try {
      mem.addData((1L, xHi, xLo, ts(1)))
      q.processAllAvailable()
      // hamming-2 twin inside the horizon → dropped; distant z survives
      mem.addData((2L, xHi, yLo, ts(5)), (3L, zHi, zLo, ts(6)))
      q.processAllAvailable()
      // advance watermark past x's band state, then replay x exactly
      mem.addData((4L, 0x11111111L, 0x22222222L, ts(40)))
      q.processAllAvailable(); q.processAllAvailable()
      mem.addData((5L, xHi, xLo, ts(41)))
      q.processAllAvailable()
      val out = spark.table("hashdedupstream").select("id").collect()
        .map(_.getLong(0)).toSet
      assert(out.contains(1L) && out.contains(3L) && out.contains(4L))
      assert(!out.contains(2L), s"hamming-2 twin inside horizon must drop: $out")
      assert(out.contains(5L), s"expired twin must re-emit: $out")
    } finally q.stop()
  }

  test("session windows merge events within gap") {
    val s = EventTime.session(engine.table("events"), "ts", "30 minutes", "0 seconds",
      Seq("user_id"), Seq(count(lit(1)).as("cnt")))
    val sessions = s.count()
    val users = engine.table("events").select("user_id").distinct().count()
    assert(sessions >= users)
    assert(s.agg(sum("cnt")).collect()(0).getLong(0) == engine.table("events").count())
  }

  test("IntervalJoin.stream matches only inside the delay window, both sides streaming") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = MemoryStream[(Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = graft.streaming.IntervalJoin.stream(
      left.toDF.toDF("user_id", "click_t"), right.toDF.toDF("user_id", "purchase_t"),
      "user_id", "click_t", "purchase_t", minDelaySec = 0, maxDelaySec = 60,
      watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ijtest").start()
    try {
      left.addData((1L, ts(100)), (2L, ts(100)))
      q.processAllAvailable()
      // in-window for u1 (right arrives AFTER left is already in state),
      // out-of-window for u2 (+61 s), wrong key for u3
      right.addData((1L, ts(130)), (2L, ts(161)), (3L, ts(130)))
      // left arriving after right: state works in both directions
      left.addData((4L, ts(200)))
      q.processAllAvailable()
      right.addData((4L, ts(200))) // boundary: delay 0 is inside [0, 60]
      q.processAllAvailable()
      val rows = spark.table("ijtest")
        .select(col("user_id"), col("purchase_t").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 130L), (4L, 200L)))
    } finally q.stop()
  }

  test("Stateful.ewmaAlarms: state carries across batches, equals the batch " +
      "chart, late rows dropped by contract") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
    def ts(d: Int) = new java.sql.Timestamp(d * 86400000L)
    val q = Stateful.ewmaAlarms(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("ewmatest")
      .outputMode("append").start()
    try {
      // the q281 hand trace split across TWO batches: [10, 14] then
      // [10, 100] — the (m, d) state must survive the batch boundary
      mem.addData(("k", ts(1), 10L), ("k", ts(2), 14L))
      q.processAllAvailable()
      mem.addData(("k", ts(3), 10L), ("k", ts(4), 100L))
      q.processAllAvailable()
      val rows = spark.table("ewmatest").orderBy("ts")
        .select("x", "pred", "dev", "alarm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(rows.toSeq == Seq((14L, 10L, 0L, false),
        (10L, 12L, 2L, false), (100L, 11L, 2L, true)))
      // a row older than the last processed bucket is dropped, state intact
      mem.addData(("k", ts(2), 999L), ("k", ts(5), 55L))
      q.processAllAvailable()
      val after = spark.table("ewmatest").orderBy("ts")
        .select("x", "pred").collect().map(r => (r.getLong(0), r.getLong(1)))
      // m after 100: (100+11)/2 = 55, d = (89+2)/2 = 45 -> pred 55
      assert(after.toSeq == Seq((14L, 10L), (10L, 12L), (100L, 11L), (55L, 55L)))
    } finally q.stop()
  }

  test("Stateful.gapAlarms: holes fire across batch boundaries, late " +
      "buckets dropped, per-key isolation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Stateful.gapAlarms(mem.toDS())
      .writeStream.format("memory").queryName("gaptest")
      .outputMode("append").start()
    try {
      mem.addData(("k", 1L), ("k", 2L), ("m", 10L))
      q.processAllAvailable()
      assert(spark.table("gaptest").count() == 0) // contiguous so far
      // batch 2: k jumps 2 -> 5 (hole 3-4, fires as 5 lands) then 5 -> 7
      mem.addData(("k", 5L), ("k", 7L), ("m", 11L))
      q.processAllAvailable()
      val rows = spark.table("gaptest").orderBy("key", "gap_start")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(rows.toSeq == Seq(("k", 3L, 4L, 2L), ("k", 6L, 6L, 1L)))
      // a late bucket (0 < last) neither alarms nor disturbs the state
      mem.addData(("k", 0L), ("k", 8L))
      q.processAllAvailable()
      assert(spark.table("gaptest").count() == 2) // 7 -> 8 is contiguous
    } finally q.stop()
  }

  test("Stateful.phAlarms: hand trace across batches in exact micro-units, " +
      "late buckets dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val q = Stateful.phAlarms(mem.toDS(), lambdaMicro = 50000000L)
      .writeStream.format("memory").queryName("phtest")
      .outputMode("append").start()
    try {
      // flat 100s: every deviation vs the running mean is 0 → ph 0
      mem.addData(("k", "t01", 100L), ("k", "t02", 100L))
      q.processAllAvailable()
      // state must carry: t03 still flat; t04 jumps to 200 —
      // mean(100,100,100,200)=125, dev=75 → ph = 75e6 micro ≥ λ=50e6
      mem.addData(("k", "t03", 100L), ("k", "t04", 200L))
      q.processAllAvailable()
      val rows = spark.table("phtest").orderBy("t")
        .select("t", "ph_micro", "alarm").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.toSeq == Seq(("t01", 0L, false), ("t02", 0L, false),
        ("t03", 0L, false), ("t04", 75000000L, true)))
      // fractional mean path: t05 x=100 → mean 600/5=120, dev −20,
      // m = 55e12 pico, min still 0 → ph 55e6, still alarming;
      // the re-sent t02 is late and dropped by contract
      mem.addData(("k", "t02", 999L), ("k", "t05", 100L))
      q.processAllAvailable()
      val after = spark.table("phtest").orderBy("t")
        .select("t", "ph_micro").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(after.length == 5 && after.last == (("t05", 55000000L)))
    } finally q.stop()
  }

  test("StreamTuning.sizedSession: isolated shuffle width, inherited builder confs, shared context") {
    val batchWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = StreamTuning.sizedSession(spark, statePartitions = 3)
    assert(ss.conf.get("spark.sql.shuffle.partitions") == "3")
    // the BATCH session keeps its width — the whole point of isolation
    assert(spark.conf.get("spark.sql.shuffle.partitions") == batchWidth
      && batchWidth != "3")
    // builder-level confs the gates depend on must survive newSession
    assert(ss.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(ss.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(ss.sparkContext eq spark.sparkContext)
    // a stateful agg STARTED from the sized session lays out 3 state
    // partitions and still computes the exact result
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("k", "x").groupBy("k").agg(sum("x").as("s"))
      .writeStream.format("memory").queryName("tuned_mem")
      .outputMode("complete").start()
    try {
      mem.addData(("a", 1L), ("b", 2L), ("a", 3L))
      q.processAllAvailable()
      val got = ss.table("tuned_mem").orderBy("k").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("a", 4L), ("b", 2L)))
      assert(q.lastProgress.stateOperators.head.numShufflePartitions == 3L)
    } finally q.stop()
    intercept[IllegalArgumentException](StreamTuning.sizedSession(spark, 0))
  }
}
