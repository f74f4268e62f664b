package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, Retention}

class FunnelSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val MIN = 60L * 1000000L // one minute in micros

  test("funnel min-chains steps in order, windowed, strictly increasing") {
    import spark.implicits._
    val events = Seq(
      // u1 completes A->B->C in order
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 10:05:00"), "B"),
      (1L, ts("2024-01-01 10:10:00"), "C"),
      // u2: B before A never counts; later B missing -> level 1
      (2L, ts("2024-01-01 09:00:00"), "B"),
      (2L, ts("2024-01-01 10:00:00"), "A"),
      // u3: same-ts B does NOT advance (strict >), later B does
      (3L, ts("2024-01-01 10:00:00"), "A"),
      (3L, ts("2024-01-01 10:00:00"), "B"),
      (3L, ts("2024-01-01 10:30:00"), "B"),
      // u4: B outside the 60-min window anchored at first A -> level 1;
      // an EARLIER A would have helped but min-chaining anchors at min(A)
      (4L, ts("2024-01-01 08:00:00"), "A"),
      (4L, ts("2024-01-01 09:30:00"), "B"),
      // u5: only non-step events -> level 0, still present
      (5L, ts("2024-01-01 08:00:00"), "X")
    ).toDF("user_id", "ts", "event_type")

    val got = Funnel.levels(events, "user_id", "ts", "event_type",
        Seq("A", "B", "C"), windowMicros = 60L * MIN)
      .orderBy("user_id")
      .select("user_id", "level")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 3), (2L, 1), (3L, 2), (4L, 1), (5L, 0)))
  }

  test("funnel chain timestamps are the chained minima") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 10:01:00"), "A"), // later A ignored
      (1L, ts("2024-01-01 10:02:00"), "B"),
      (1L, ts("2024-01-01 10:03:00"), "B")  // later B ignored
    ).toDF("user_id", "ts", "event_type")
    val row = Funnel.levels(events, "user_id", "ts", "event_type",
        Seq("A", "B"), windowMicros = 60L * MIN).collect().head
    val t1 = row.getAs[Long]("ts1"); val t2 = row.getAs[Long]("ts2")
    assert(t2 - t1 == 2 * MIN)
  }

  test("cohort retention counts users by first-day cohort and offset") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-02 11:00:00")), // same day twice -> one active day
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 12:00:00")), (3L, ts("2024-01-04 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Retention.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L, 2L), ("2024-01-01", 1, 1L, 2L),
      ("2024-01-02", 0, 1L, 1L), ("2024-01-02", 2, 1L, 1L)))
  }

  test("cohort LTV: exact-cent cumulative curve and per-user division") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.00),
      (1L, ts("2024-01-02 10:00:00"), 2.00),
      (2L, ts("2024-01-01 12:00:00"), 0.50),
      (3L, ts("2024-01-06 12:00:00"), 4.00)
    ).toDF("user_id", "ts", "value")
    val got = Retention.cohortLtv(events, "user_id", "ts", "value")
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 150L, 150L, 2L, 75.0),
      ("2024-01-01", 1, 200L, 350L, 2L, 175.0),
      ("2024-01-06", 0, 400L, 400L, 1L, 400.0)))
  }
}
