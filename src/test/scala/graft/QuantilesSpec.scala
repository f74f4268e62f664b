package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

class QuantilesSpec extends SparkSpec {

  test("histogram bisection equals the sort-based percentile_disc rank") {
    val li = engine.table("lineitem")
    val ps = Seq(0.25, 0.5, 0.75, 0.875)
    val got = Quantiles.exactQuantiles(li, Seq("l_returnflag"), "l_extendedprice", ps)
      .orderBy("l_returnflag", "p")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))

    // oracle: explicit rank selection over a full sort (small data only)
    val expect = for {
      rf <- Seq("A", "N", "R")
      p <- ps
    } yield {
      val vals = li.where(col("l_returnflag") === rf)
        .select(col("l_extendedprice").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      val rank = math.max(0, math.ceil(p * vals.length).toLong - 1).toInt
      (rf, p, vals(rank))
    }
    assert(got.toSeq == expect)
  }

  test("degenerate group (all values equal) resolves to that value") {
    import spark.implicits._
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("h", 1.0), ("h", 2.0))
      .toDF("k", "x")
    val got = Quantiles.exactQuantiles(df, Seq("k"), "x", Seq(0.5))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(got.toSeq == Seq(("g", 5.0), ("h", 1.0)))
  }

  test("sketchQuantiles: GK rank bound holds on real data; high accuracy " +
      "recovers the exact median; verified=false skips the check scan") {
    val li = engine.table("lineitem")
    val ps = Seq(0.25, 0.5, 0.75, 0.875)
    val sk = Quantiles.sketchQuantiles(li, Seq("l_returnflag"),
      "l_extendedprice", ps, accuracy = 100).collect()
    assert(sk.length == 3 * ps.size)
    assert(sk.forall(_.getAs[Int]("within_eps") == 1))
    // rank interval really is an interval around the target
    sk.foreach { r =>
      assert(r.getAs[Long]("est_rank_lo") <= r.getAs[Long]("est_rank_hi"))
      assert(r.getAs[Long]("target_rank") >= 1L &&
        r.getAs[Long]("target_rank") <= r.getAs[Long]("n"))
    }
    // 100 distinct values, accuracy 10000 -> eps_n = ceil(100/10000) = 1:
    // the estimate's rank interval must hit ceil(0.5*100) = 50 within 1
    import spark.implicits._
    val d = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "x")
    val one = Quantiles.sketchQuantiles(d, Seq("k"), "x", Seq(0.5),
      accuracy = 10000).head()
    assert(one.getAs[Int]("within_eps") == 1)
    assert(math.abs(one.getAs[Double]("est") - 50.0) <= 1.0)
    val unverified = Quantiles.sketchQuantiles(d, Seq("k"), "x", Seq(0.5),
      accuracy = 100, verified = false)
    assert(!unverified.columns.contains("within_eps"))
    assert(unverified.count() == 1)
  }
}
