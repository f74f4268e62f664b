package graft

import org.apache.spark.sql.functions._

import graft.operators.{TimeSeries, Trend}

/** TWAP, OHLC candles, correlation matrix. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)

  test("twap: duration-weighted, last observation weightless, single-event null") {
    val df = Seq(
      ("k", ts(0), 1L, 10.0),   // holds 10 s at 10.00
      ("k", ts(10), 2L, 20.0),  // holds 30 s at 20.00
      ("k", ts(40), 3L, 99.0),  // last: no weight
      ("solo", ts(5), 4L, 7.0)
    ).toDF("u", "ts", "id", "v")
    val got = TimeSeries.twap(df, "u", "ts", "id", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    // (1000*10 + 2000*30) / 40 / 100 = 17.5
    assert(got("k").getAs[Double]("twap") == 17.5)
    assert(got("k").getAs[Long]("dur_s") == 40L)
    assert(got("solo").isNullAt(3))
  }

  test("ohlc: open/close by total order, tie broken by id") {
    val df = Seq(
      ("a", ts(86400 + 10), 2L, 5.0), // same day, later id at same-second? distinct ts
      ("a", ts(86400 + 10), 1L, 3.0), // tie on ts: id 1 is the OPEN
      ("a", ts(86400 + 50), 3L, 9.0), // close
      ("a", ts(86400 + 20), 4L, 1.0)  // low
    ).toDF("k", "ts", "id", "v")
    val r = TimeSeries.ohlc(df, "k", "ts", "id", "v").head()
    assert(r.getAs[Double]("open") == 3.0)
    assert(r.getAs[Double]("high") == 9.0)
    assert(r.getAs[Double]("low") == 1.0)
    assert(r.getAs[Double]("close") == 9.0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("sum_value") == 18.0)
  }

  test("corrMatrix: perfect / inverse / named pairs, partition-independent") {
    val data = (1 to 200).map { i =>
      (i.toDouble, 2.0 * i + 3, -1.5 * i + 10)
    }
    val df = data.toDF("x", "y", "z").repartition(7)
    val got = Trend.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(got(("x", "y")) == 1.0)
    assert(got(("x", "z")) == -1.0)
    assert(got(("y", "z")) == -1.0)
    val again = Trend.corrMatrix(df.repartition(2), Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(again == got)
  }
}
