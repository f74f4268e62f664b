package graft

import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Sweep-line interval union + gaps-and-islands run segmentation. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("unionCoverage: overlap merges, touching merges, gap splits, inverted dropped") {
    // k: [1,3) ∪ [2,5) -> [1,5); [7,9) ∪ [9,10) touch -> [7,10)
    val df = Seq(("k", 1L, 3L), ("k", 2L, 5L), ("k", 7L, 9L), ("k", 9L, 10L),
      ("k", 20L, 10L), // inverted: dropped
      ("m", 0L, 2L)).toDF("g", "st", "en")
    val rows = Intervals.unionCoverage(df, col("g"), col("st"), col("en"))
      .orderBy("key").collect()
    assert(rows.length == 2)
    val k = rows(0)
    assert(k.getAs[Long]("n_intervals") == 4 && k.getAs[Long]("n_islands") == 2)
    assert(k.getAs[Long]("covered") == 7 && k.getAs[Long]("span") == 9)
    assert(k.getAs[Double]("coverage") == math.rint(7.0 / 9.0 * 1e6) / 1e6)
    // single zero-length interval: span 0 -> NULL ratio, covered 0
    val z = Seq(("z", 4L, 4L)).toDF("g", "st", "en")
    val rz = Intervals.unionCoverage(z, col("g"), col("st"), col("en")).head()
    assert(rz.getAs[Long]("covered") == 0 && rz.isNullAt(rz.fieldIndex("coverage")))
    // duplicate identical intervals stay one island, counted twice
    val d = Seq(("d", 1L, 3L), ("d", 1L, 3L)).toDF("g", "st", "en")
    val rd = Intervals.unionCoverage(d, col("g"), col("st"), col("en")).head()
    assert(rd.getAs[Long]("n_intervals") == 2 && rd.getAs[Long]("n_islands") == 1)
    assert(rd.getAs[Long]("covered") == 2)
  }

  test("stateRuns: rn - rn' segmentation, per-state stats, tie-break order") {
    // u1: a a b a ; u2: b b
    val df = Seq((1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "a", 40L, 4L), (2L, "b", 5L, 5L), (2L, "b", 6L, 6L))
      .toDF("u", "s", "t", "id")
    val rows = Intervals.stateRuns(df, col("u"), col("s"), col("t"), col("id"))
      .orderBy("state").collect()
    val a = rows(0)
    assert(a.getAs[Long]("n_runs") == 2 && a.getAs[Long]("n_events") == 3)
    assert(a.getAs[Long]("max_len") == 2 && a.getAs[Double]("avg_len") == 1.5)
    assert(a.getAs[Long]("n_keys") == 1)
    val b = rows(1)
    assert(b.getAs[Long]("n_runs") == 2 && b.getAs[Long]("max_len") == 2)
    assert(b.getAs[Long]("n_keys") == 2)
    // same timestamp, tie broken by id: a(id=1) then b(id=2) then a(id=3)
    val tied = Seq((9L, "a", 7L, 1L), (9L, "b", 7L, 2L), (9L, "a", 7L, 3L))
      .toDF("u", "s", "t", "id")
    val rt = Intervals.stateRuns(tied, col("u"), col("s"), col("t"), col("id"))
      .orderBy("state").collect()
    assert(rt(0).getAs[Long]("n_runs") == 2 && rt(1).getAs[Long]("n_runs") == 1)
  }
}
