package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Analyze, Resample}

class ResampleSpec extends SparkSpec {

  test("resample densifies gaps per key and forward-fills the sum") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val df = Seq(
      ("a", ts(0), 1.0), ("a", ts(5), 2.0), // bucket 0: cnt 2, sum 3
      ("a", ts(35), 4.0),                   // bucket 3: cnt 1, sum 4 (1, 2 gaps)
      ("b", ts(12), 9.0)                    // single bucket, no gaps
    ).toDF("k", "t", "v")
    val got = Resample.resample(df, "k", "t", stepSec = 10, valueCol = "v")
      .orderBy("k", "b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getDecimal(4).doubleValue()))
    assert(got.toSeq == Seq(
      ("a", 0L, 2L, 0, 3.0), ("a", 1L, 0L, 1, 3.0),
      ("a", 2L, 0L, 1, 3.0), ("a", 3L, 1L, 0, 4.0),
      ("b", 1L, 1L, 0, 9.0)))
  }

  test("tableStats: one row per column, exact ndv/nulls/extents") {
    import spark.implicits._
    val df = Seq((1L, Some("x"), 2.5), (2L, None, -1.0), (2L, Some("a"), 2.5))
      .toDF("id", "s", "v")
    val got = Analyze.tableStats(df, Seq("id", "s", "v"))
      .orderBy("column_name").collect()
    val byName = got.map(r => r.getString(0) -> r).toMap
    val id = byName("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 0 && id.getLong(3) == 2)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 2.0 && id.isNullAt(6))
    val s = byName("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "x")
    val v = byName("v")
    assert(v.getLong(3) == 2 && v.getDouble(4) == -1.0 && v.getDouble(5) == 2.5)
  }
}
