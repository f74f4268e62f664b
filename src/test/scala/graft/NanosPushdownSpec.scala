package graft

import org.apache.spark.sql.functions._

/** The nanos-timestamp predicate rewrite must (a) restore parquet
  * pushdown on the raw int64 column and (b) not change results. */
class NanosPushdownSpec extends SparkSpec {

  private val cut = "2024-01-10 00:00:00"

  test("range filter on nanos ts reaches the parquet scan as PushedFilters") {
    val df = engine.table("events").where(col("ts") >= cut)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"expected pushdown on raw ts, plan:\n${plan.take(2000)}")
  }

  test("rewrite preserves results vs unconverted long comparison") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet") // ts stays long
    val cutNanos = java.sql.Timestamp.valueOf(cut).getTime * 1000000L
    Seq[(String, Long => org.apache.spark.sql.Column)](
      (">", n => col("ts") > lit(n + 999L)),
      (">=", n => col("ts") >= lit(n)),
      ("<", n => col("ts") < lit(n)),
      ("<=", n => col("ts") <= lit(n + 999L))
    ).foreach { case (op, longPred) =>
      val viaEngine = engine.table("events").where(
        org.apache.spark.sql.functions.expr(s"ts $op TIMESTAMP '$cut'")).count()
      val viaRaw = raw.where(longPred(cutNanos)).count()
      assert(viaEngine == viaRaw, s"op $op")
    }
    // equality on a micro value
    val someTs = engine.table("events").orderBy("event_id").limit(1)
      .select("ts").collect()(0).getTimestamp(0)
    val eq = engine.table("events").where(col("ts") === someTs).count()
    assert(eq >= 1)
  }
}
