package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketed range join — the scale-out plan for time-range joins
 * (`right.ts ∈ [left.ts + minDelay, left.ts + maxDelay]` on a shared
 * key). A raw range predicate gives Catalyst nothing to hash on: with a
 * key it plans a sort-merge join on the key alone (full per-key cross
 * product before the filter), and keyless it degrades to
 * BroadcastNestedLoop/Cartesian — O(|L|·|R|) at 100 TB.
 *
 * The bucket trick makes it an EQUI-join: quantize time into `bucketSec`
 * buckets, explode each left row into the ceil((maxDelay−minDelay)/
 * bucket)+1 buckets its window can touch (bounded, data-independent
 * duplication), tag each right row with its single bucket, hash-join on
 * (key, bucket), then apply the exact range residual. Every matching
 * pair meets in exactly one bucket (the right row's), so no dedup pass
 * is needed. Shuffle volume: |L|·(window/bucket) + |R| — tunable,
 * linear, and AQE-skew-splittable, vs. the nested loop's quadratic
 * compare count.
 */
object RangeJoin {

  /**
   * Inner range join. Left/right column sets must be disjoint apart from
   * `keyCol` (which survives once).
   */
  def inner(left: DataFrame, right: DataFrame, keyCol: String,
      lTs: String, rTs: String, minDelaySec: Long, maxDelaySec: Long,
      bucketSec: Long = 300L): DataFrame = {
    require(minDelaySec <= maxDelaySec, "minDelaySec <= maxDelaySec")
    require(bucketSec > 0, "bucketSec > 0")
    // bucket assignment quantizes to whole seconds (safe: integer-second
    // delays make truncation monotone across the window bounds); the
    // exact residual below compares full-precision timestamps
    val lSec = col(lTs).cast("long")
    val rSec = col(rTs).cast("long")
    val lo = floor((lSec + minDelaySec) / bucketSec)
    val hi = floor((lSec + maxDelaySec) / bucketSec)
    val l = left.withColumn("__bucket", explode(sequence(lo, hi)))
    val r = right.withColumn("__bucket", floor(rSec / bucketSec))
    l.alias("l").join(r.alias("r"),
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("l.__bucket") === col("r.__bucket") &&
        col(s"r.$rTs") >= col(s"l.$lTs") + expr(s"INTERVAL $minDelaySec SECONDS") &&
        col(s"r.$rTs") <= col(s"l.$lTs") + expr(s"INTERVAL $maxDelaySec SECONDS"))
      .drop(col(s"r.$keyCol")).drop("__bucket")
  }
}
