package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey interleaves bits (hand-checked) and gridCoord clamps") {
    // aN=3 (011), bN=5 (101), bits=3: z = 1<<0 + 1<<1 + 1<<2 + 0<<3 + 0<<4 + 1<<5 = 39
    val row = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrder.zOrderKey(col("a"), col("b"), 3).as("z"))
      .head()
    assert(row.getLong(0) == 39L)
    val g = Seq((-5.0, 0.5, 99.0)).toDF("lo", "mid", "hi")
      .select(
        ZOrder.gridCoord(col("lo"), 0.0, 1.0, 8).as("glo"),
        ZOrder.gridCoord(col("mid"), 0.0, 1.0, 8).as("gmid"),
        ZOrder.gridCoord(col("hi"), 0.0, 1.0, 8).as("ghi"))
      .head()
    assert(g.getLong(0) == 0L)    // below min clamps to 0
    assert(g.getLong(1) == 128L)  // 0.5 * 256
    assert(g.getLong(2) == 255L)  // above max clamps to 2^bits-1
  }

  test("z-order layout prunes a second-dimension box that linear layout cannot") {
    // uniform 64x64 grid of points over [0,64)x[0,64)
    val pts = spark.range(64L * 64L)
      .select((col("id") % 64).cast("double").as("x"),
        (col("id") / 64).cast("long").cast("double").as("y"))
    val stats = ZOrder.layoutPruningStats(pts, "x", "y",
      aMin = 0.0, aMax = 64.0, bMin = 0.0, bMax = 64.0,
      boxes = Seq(ZOrder.Box("yband", 0.0, 64.0, 16.0, 32.0)),
      bits = 6, bucketBits = 4)
    val scanned = stats.groupBy("layout")
      .agg(sum(when(col("scan_yband"), 1L).otherwise(0L)).as("scanned"),
        count(lit(1)).as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // linear buckets sort by x only: every bucket spans all y -> all 16 scanned
    assert(scanned("linear") == ((16L, 16L)))
    // zorder buckets are 4x4 quadrants of the grid: the quadrant-aligned
    // y in [16,32) band touches exactly one y-quadrant row -> 4 of 16
    assert(scanned("zorder") == ((4L, 16L)))
  }

}
