package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout: interleave the bits of two grid
 * coordinates so that range predicates on EITHER dimension prune file-
 * level min/max statistics — the multi-column clustering trick behind
 * Delta/Iceberg `OPTIMIZE ZORDER BY`. A linear (single-column) sort
 * prunes only its own column; at 100 TB the difference between "scan 6%
 * of files" and "scan 100% of files" on the second dimension is the whole
 * game, and parquet row-group stats give the pruning for free once rows
 * are clustered.
 *
 * Everything here is pure column arithmetic (shift/and/floor — codegen,
 * no UDF): a deterministic grid normalization, the bit interleave, and a
 * bucket assignment by leading z-bits, so the layout is a stable function
 * of the row, never of a sampled partitioner. The WRITE path lives in
 * [[Scale.writeZOrdered]] (n-column, bounds from a metadata agg); this
 * object is the MEASURABLE side: explicit-bounds floor arithmetic an
 * oracle reproduces bit-for-bit, and `layoutPruningStats` — per-bucket
 * min/max + would-this-box-scan-it flags for the z-order layout AND the
 * linear baseline, side by side.
 */
object ZOrder {

  /** Deterministic grid coordinate: clamp `x` into [min,max] and scale to
    * `[0, 2^bits)`. Plain IEEE `(x-min)*2^bits/(max-min)` + floor so an
    * oracle reproduces it bit-for-bit. */
  def gridCoord(x: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, "max must exceed min")
    require(bits >= 1 && bits <= 20, "bits must be in [1,20]")
    val n = (1L << bits).toDouble
    val raw = floor((x - lit(min)) * lit(n) / lit(max - min)).cast("long")
    least(greatest(raw, lit(0L)), lit((1L << bits) - 1L))
  }

  /** Morton interleave of two `bits`-wide coordinates: a's bit i lands at
    * 2i, b's at 2i+1. Unrolled shift/and/or chain — whole-stage codegen. */
  def zOrderKey(aN: Column, bN: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, "bits must be in [1,20]")
    (0 until bits).map { i =>
      shiftright(aN, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bN, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** A named box predicate in ORIGINAL units, [lo, hi) on each dim. */
  final case class Box(name: String, aLo: Double, aHi: Double,
      bLo: Double, bHi: Double)

  /**
   * The measurable layout comparison: bucket rows two ways — `zorder`
   * (leading `bucketBits` of the z-key: a 2^(bucketBits/2)-per-side grid)
   * and `linear` (leading `bucketBits` of the FIRST dimension's
   * coordinate: what sorting by column a alone gives you) — then report
   * each bucket's row count, per-dimension min/max (the file-footer
   * stats a scan planner would read), and one `scan_<box>` flag per
   * requested box: whether a min/max-pruning reader must open the
   * bucket. Two aggregations over the input, keyed on the bucket — no
   * collect, no sampled boundaries.
   */
  def layoutPruningStats(df: DataFrame, aCol: String, bCol: String,
      aMin: Double, aMax: Double, bMin: Double, bMax: Double,
      boxes: Seq[Box], bits: Int = 8, bucketBits: Int = 4): DataFrame = {
    require(bucketBits >= 2 && bucketBits <= 2 * bits,
      "bucketBits must be in [2, 2*bits]")
    require(bucketBits % 2 == 0, "bucketBits must be even (square grid)")
    require(boxes.nonEmpty, "at least one box required")
    val aN = gridCoord(col(aCol), aMin, aMax, bits)
    val bN = gridCoord(col(bCol), bMin, bMax, bits)
    val zBucket = shiftright(zOrderKey(aN, bN, bits), 2 * bits - bucketBits)
    val lBucket = shiftright(aN, bits - bucketBits)

    def perBucket(layout: String, bucket: Column): DataFrame =
      df.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          round(min(col(aCol).cast("double")), 6).as("min_a"),
          round(max(col(aCol).cast("double")), 6).as("max_a"),
          round(min(col(bCol).cast("double")), 6).as("min_b"),
          round(max(col(bCol).cast("double")), 6).as("max_b"))
        .withColumn("layout", lit(layout))

    val stats = perBucket("zorder", zBucket).unionByName(perBucket("linear", lBucket))
    val flagged = boxes.foldLeft(stats) { (acc, box) =>
      // [lo, hi) box vs closed [min,max] bucket stats: scan unless disjoint
      acc.withColumn(s"scan_${box.name}",
        !(col("max_a") < lit(box.aLo) || col("min_a") >= lit(box.aHi) ||
          col("max_b") < lit(box.bLo) || col("min_b") >= lit(box.bHi)))
    }
    flagged.select(col("layout") +: col("bucket") +: col("n_rows") +:
      col("min_a") +: col("max_a") +: col("min_b") +: col("max_b") +:
      boxes.map(b => col(s"scan_${b.name}")): _*)
  }
}
