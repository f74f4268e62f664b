package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream interval join — the Structured Streaming operator class
 * where BOTH sides are unbounded and matches must meet inside an
 * event-time window: `right.ts ∈ [left.ts + minDelay, left.ts + maxDelay]`
 * on a shared key (click→purchase attribution, request→response pairing).
 *
 * Spark keeps both sides' rows in join state; the time-range condition
 * plus the two watermarks is what lets it EVICT: a left row older than
 * `watermark + maxDelay` can never match a future right row, so state is
 * bounded by (arrival rate × horizon) per side — the same contract as the
 * streaming dedup family. Without the range condition the state would be
 * unbounded; this operator exists to make the bounded form first-class.
 *
 * Inner-join emission is watermark-independent (the watermark only drives
 * eviction), so against a fully-admitted replay the result equals the
 * batch interval join deterministically — which is exactly how the gate
 * oracles it.
 */
object IntervalJoin {

  /**
   * @param left  streaming side with columns (keyCol, lTs, ...)
   * @param right streaming side with columns (keyCol, rTs, ...); column
   *              names other than keyCol must not collide with left's
   * @return inner-joined stream carrying left's columns + right's
   *         (keyCol deduplicated to left's)
   */
  def stream(left: DataFrame, right: DataFrame, keyCol: String,
      lTs: String, rTs: String, minDelaySec: Long, maxDelaySec: Long,
      watermark: String): DataFrame = {
    require(minDelaySec <= maxDelaySec, "minDelaySec <= maxDelaySec")
    val l = left.withWatermark(lTs, watermark).alias("l")
    val r = right.withWatermark(rTs, watermark).alias("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rTs") >= col(s"l.$lTs") + expr(s"INTERVAL $minDelaySec SECONDS") &&
        col(s"r.$rTs") <= col(s"l.$lTs") + expr(s"INTERVAL $maxDelaySec SECONDS"))
      .drop(col(s"r.$keyCol"))
  }
}
