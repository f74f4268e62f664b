package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopK, TopKPerKeyExec}

class TopKSpec extends SparkSpec {

  test("TopK.perKey equals the window formulation; plan is two-stage with an exchange") {
    val orders = engine.table("orders")
      .select("o_orderstatus", "o_orderkey", "o_totalprice")
    val got = TopK.perKey(orders, Seq("o_orderstatus"), "o_totalprice",
        k = 3, tieCol = "o_orderkey")
      .orderBy("o_orderstatus", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expect = orders
      .withColumn("rank", row_number().over(
        Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long"))
      .where(col("rank") <= 3)
      .orderBy("o_orderstatus", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)

    // sparkPlan (pre-AQE): the adaptive wrapper hides operators from collect
    val q = TopK.perKey(orders, Seq("o_orderstatus"), "o_totalprice", 3, "o_orderkey")
    val execs = q.queryExecution.sparkPlan.collect {
      case e: TopKPerKeyExec => e.partial
    }
    assert(execs.sorted == Seq(false, true), s"expected partial+final stages, got $execs")
    // the exchange is inserted by EnsureRequirements at execution prep
    val hasExchange = q.queryExecution.executedPlan.toString.contains("Exchange")
    assert(hasExchange, "expected a key-clustered exchange between the stages")
  }

  test("k larger than the group ranks the whole group; ascending order works") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("b", 3L, 1.0))
      .toDF("g", "id", "v")
    val got = TopK.perKey(df, Seq("g"), "v", k = 10, tieCol = "id", desc = false)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 2L, 1L), ("a", 1L, 2L), ("b", 3L, 1L)))
  }
}
