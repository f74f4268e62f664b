package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Marketing-style LAST-TOUCH attribution: each conversion event credits
 * its value to the most recent preceding touch event (from a declared
 * touch-type set) by the same user within a lookback window; conversions
 * with no eligible touch are 'direct'.
 *
 * Shape: ONE user-keyed window pass — `last(touch, ignoreNulls)` over
 * (ts, id) with an explicit ROWS frame carries the latest touch forward;
 * no per-conversion lookup join, no self-join of the event stream. The
 * (ts, id) order key is total, so the carried touch is deterministic even
 * under timestamp ties. At 100 TB this is the standard
 * partition-by-user window: activity-bounded partitions, AQE handles
 * whales (same contract as q161's event paths).
 *
 * Reference anchor: none (the reference has no event analytics);
 * extension family alongside funnel (q148) and paths (q161).
 */
object Attribution {

  /** Per-conversion attribution rows: (user, ts, channel, value) where
    * channel is the credited touch type or 'direct'. */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not contain the conversion type")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).cast("long").as("t"), col(typeCol).as("ch")))
    events
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .where(col(typeCol) === convType)
      .select(col(userCol), col(tsCol),
        when(col("__lt").isNotNull &&
            col(tsCol).cast("long") - col("__lt.t") <= lookbackSec,
          col("__lt.ch")).otherwise(lit("direct")).as("channel"),
        col(valueCol).as("value"))
  }

  /** Channel roll-up: (channel, n_conversions, total_value) with DECIMAL
    * accumulation so the sum is partition-order independent. */
  def byChannel(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackSec: Long): DataFrame =
    lastTouch(events, userCol, tsCol, idCol, typeCol, valueCol,
        convType, touchTypes, lookbackSec)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(18,2)")).as("__tv"))
      .select(col("channel"), col("n_conversions"),
        col("__tv").cast("double").as("total_value"))
}
