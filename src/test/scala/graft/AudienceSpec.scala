package graft

import org.apache.spark.sql.functions._

import graft.operators.{Attribution, Bitmaps}

/** Exact id bitmaps (audience algebra) and last-touch attribution. */
class AudienceSpec extends SparkSpec {
  import spark.implicits._

  test("bitmaps: exact cardinality/intersection across partitions; dup ids collapse") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 100L),
      ("b", 2L), ("b", 100L), ("b", 4000L)).toDF("g", "id").repartition(5)
    val bms = Bitmaps.bitmapBy(df, Seq("g"), col("id"), maxId = 4096)
    val ov = Bitmaps.overlap(bms, "g").head()
    assert(ov.getAs[Long]("n_a") == 3 && ov.getAs[Long]("n_b") == 3)
    assert(ov.getAs[Long]("n_and") == 2) // {2, 100}
    assert(ov.getAs[Long]("n_or") == 4)  // {1, 2, 100, 4000}
    assert(ov.getAs[Double]("jaccard") == 0.5)
  }

  test("bitmaps: out-of-domain id fails loudly") {
    val df = Seq(("a", 5000L)).toDF("g", "id")
    val e = intercept[Exception] {
      Bitmaps.bitmapBy(df, Seq("g"), col("id"), maxId = 4096).collect()
    }
    assert(e.getMessage != null)
  }

  test("lastTouch: credits the latest in-window touch, else direct") {
    val ts = (s: Int) => new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      (1L, ts(100), 10L, "view", 0.0),    // touch
      (1L, ts(200), 11L, "buy", 5.0),     // within 1000s of view → view
      (1L, ts(5000), 12L, "buy", 7.0),    // view too old → direct
      (2L, ts(50), 20L, "buy", 3.0),      // no touch ever → direct
      (2L, ts(60), 21L, "click", 0.0),
      (2L, ts(70), 22L, "buy", 4.0),      // after click → click
      (3L, ts(10), 30L, "view", 0.0),
      (3L, ts(20), 31L, "click", 0.0),    // latest touch wins
      (3L, ts(30), 32L, "buy", 9.0)
    ).toDF("u", "ts", "id", "et", "v")
    val rows = Attribution.lastTouch(df, "u", "ts", "id", "et", "v",
        convType = "buy", touchTypes = Seq("view", "click"), lookbackSec = 1000L)
      .collect().map(r => (r.getAs[Double]("value"), r.getAs[String]("channel"))).toMap
    assert(rows == Map(5.0 -> "view", 7.0 -> "direct", 3.0 -> "direct",
      4.0 -> "click", 9.0 -> "click"))
    val roll = Attribution.byChannel(df, "u", "ts", "id", "et", "v",
        "buy", Seq("view", "click"), 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(roll == Map("view" -> ((1L, 5.0)), "click" -> ((2L, 13.0)),
      "direct" -> ((2L, 10.0))))
  }
}
