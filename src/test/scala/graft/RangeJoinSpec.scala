package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the theta join; plan is an equi-join, not a nested loop") {
    val ev = engine.table("events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_t"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_t"))
    val bucketed = RangeJoin.inner(clicks, purchases, "user_id",
      "click_t", "purchase_t", 0, 1800, bucketSec = 600)
    val got = bucketed.select("user_id", "click_t", "purchase_t")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet

    val theta = clicks.alias("l").join(purchases.alias("r"),
        col("l.user_id") === col("r.user_id") &&
        col("r.purchase_t") >= col("l.click_t") &&
        col("r.purchase_t") <= col("l.click_t") + expr("INTERVAL 1800 SECONDS"))
      .select(col("l.user_id"), col("click_t"), col("purchase_t"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(got == theta && got.nonEmpty)

    // scale contract: the plan hash-joins on (key, bucket) — no nested loop
    val plan = bucketed.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("__bucket"))
  }

  test("sub-second timestamps respect exact window bounds") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // right at lt+60.000s is IN [0s, 60s]; at lt+60.001s is OUT
    val l = Seq((1L, ts(10000)), (2L, ts(10000))).toDF("k", "lt")
    val r = Seq((1L, ts(70000)), (2L, ts(70001))).toDF("k", "rt")
    val got = RangeJoin.inner(l, r, "k", "lt", "rt", 0, 60, bucketSec = 7)
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }
}
