package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: latest right ≤ left.ts per key, tolerance,
  * no-match nulls, equal-timestamp inclusivity. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val left = spark.createDataFrame(Seq(
    (1L, 101L, ts("2024-01-01 10:00:00")),
    (1L, 102L, ts("2024-01-01 12:00:00")),
    (2L, 201L, ts("2024-01-01 09:00:00")),
    (3L, 301L, ts("2024-01-01 09:30:00")))).toDF("k", "id", "ts")

  private lazy val right = spark.createDataFrame(Seq(
    (1L, ts("2024-01-01 09:00:00"), 10.0),
    (1L, ts("2024-01-01 11:00:00"), 20.0),
    (1L, ts("2024-01-01 12:00:00"), 30.0), // equal ts → matches id 102
    (2L, ts("2024-01-01 23:00:00"), 99.0))).toDF("k", "ts", "v")

  test("latest preceding right row per key; equal ts inclusive; no match → null") {
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts")
      .orderBy("k", "id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Double]("v") == 10.0)  // 10:00 → 09:00 row
    assert(out(1).getAs[Double]("v") == 30.0)  // 12:00 → equal-ts row
    assert(out(2).isNullAt(out(2).fieldIndex("v"))) // right is later only
    assert(out(3).isNullAt(out(3).fieldIndex("v"))) // key absent on right
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "ts",
        tolerance = Some("INTERVAL 30 MINUTE"))
      .orderBy("k", "id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("v"))) // 09:00 is 1h old
    assert(out(1).getAs[Double]("v") == 30.0)       // equal ts, age 0
  }

  test("matches DuckDB-style semantics on the events table (q41 shape)") {
    val ev = engine.table("events")
    val clicks = ev.where(col("event_type") === "click").select("user_id", "event_id", "ts")
    val purchases = ev.where(col("event_type") === "purchase").select("user_id", "ts", "value")
    val out = AsOfJoin.asof(clicks, purchases, Seq("user_id"), "ts", "ts")
    assert(out.count() == clicks.count()) // left join: every click kept
    // every matched purchase precedes (or equals) its click
    assert(out.where(col("ts_right") > col("ts")).count() == 0)
  }
}
