package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exponentially decayed scoring in EXACT integer arithmetic — the
 * recency-weighted leaderboard ("recent activity counts more") without
 * the float trap: `pow(0.5, age/halflife)` sums are partition-order
 * dependent and engine-divergent. Here the half-life is a power-of-two
 * ladder: value in cents (exact from the 2-decimal money domain), age
 * bucketed into half-life units k, weight = 2^-k applied as integer
 * `div` by `1 << k` — truncation is part of the definition, sums are
 * exact longs, the result is bit-identical on any engine or layout
 * (same doctrine as [[GraphOps.pageRankFixed]]).
 */
object Decay {

  /**
   * Per-key decayed sum: (key, decayed_cents, n_events). `valueCol` is
   * 2-decimal money (cast to DECIMAL(18,2) — exact cents); each event's
   * cents are divided by 2^k where k = clamp(ageDays div halfLifeDays,
   * 0, 62); ONE key-shuffled aggregation.
   */
  def decayedSum(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, asOfDate: String, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    df.selectExpr(keyCol,
        s"""CAST(CAST($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT)
            div shiftleft(CAST(1 AS BIGINT),
              CAST(least(greatest(datediff(DATE '$asOfDate', CAST($tsCol AS DATE))
                div $halfLifeDays, 0), 62) AS INT)) AS __dc""")
      .groupBy(col(keyCol))
      .agg(sum(col("__dc")).as("decayed_cents"), count(lit(1)).as("n_events"))
  }

  /** Global top-`k` keys by decayed score (key breaks ties) — a bounded
    * TakeOrdered, never a full sort. */
  def leaderboard(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, asOfDate: String, halfLifeDays: Int,
      topK: Int): DataFrame =
    decayedSum(df, keyCol, tsCol, valueCol, asOfDate, halfLifeDays)
      .orderBy(col("decayed_cents").desc, col(keyCol).asc)
      .limit(topK)
}
