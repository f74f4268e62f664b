package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Irregular-time-series summaries over event streams, in the engine's
 * exact-arithmetic doctrine (cents × whole seconds — long products, long
 * sums, one published ratio):
 *
 *  - TWAP: the time-weighted average every metering/pricing pipeline
 *    needs on irregular samples — each observation holds until the next
 *    one, so its weight is that duration; a plain avg() over-weights
 *    bursts.
 *  - OHLC: open/high/low/close candle resampling; open/close are
 *    first/last under the TOTAL (ts, id) order, so candles are
 *    deterministic under timestamp ties.
 *
 * Both are ONE key-partitioned window/aggregation pass — no self-joins,
 * no per-bucket lookups. Reference anchor: none (no time-series surface
 * in the reference); extends the resample family (q156 gap-fill).
 */
object TimeSeries {

  /**
   * Per-key TWAP: (key, n_events, dur_s, twap) where twap = Σ(value·dur)
   * / Σ(dur) in value units, 6dp; dur is whole seconds until the NEXT
   * event of the same key (the last observation carries no weight —
   * there is nothing to hold it against). Keys with a single event (or
   * zero total duration) publish NULL.
   */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val withDur = df
      .withColumn("__t", col(tsCol).cast("long"))
      .withColumn("__dur", coalesce(lead(col("__t"), 1).over(w) - col("__t"), lit(0L)))
      .withColumn("__cents",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
    withDur.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__dur")).as("dur_s"),
        sum(col("__cents") * col("__dur")).as("__num"))
      .select(col(keyCol), col("n_events"), col("dur_s"),
        when(col("dur_s") > 0,
          round(col("__num").cast("double")
            / (col("dur_s").cast("double") * 100.0), 6)).as("twap"))
  }

  /**
   * OHLC candles per (key, bucket): bucket = date_trunc(`unit`, ts);
   * open/close under the total (ts, id) order; volume and a decimal-exact
   * value sum ride along. Output: (key, bucket_ts, open, high, low,
   * close, n, sum_value).
   */
  def ohlc(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, unit: String = "DAY"): DataFrame = {
    val bucketed = df.withColumn("__b", date_trunc(unit, col(tsCol)))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tsCol), col(idCol))
    val wd = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    bucketed
      .withColumn("__ra", row_number().over(w))
      .withColumn("__rd", row_number().over(wd))
      .groupBy(col(keyCol), col("__b").cast("long").as("bucket_ts"))
      .agg(
        max(when(col("__ra") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("__rd") === 1, col(valueCol))).as("close"),
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
  }
}
