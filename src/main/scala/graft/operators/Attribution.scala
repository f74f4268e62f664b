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

  /**
   * LINEAR multi-touch attribution: each conversion's value splits
   * EQUALLY across every eligible touch in the lookback; no-touch
   * conversions stay 'direct'. The split is exact INTEGER cents —
   * `cents div k` per touch with the remainder credited to the LATEST
   * touch — so per-channel credits sum to the conversion total to the
   * cent, deterministically (a double split leaks fractions of cents
   * and its sums are order-dependent).
   *
   * Shape: the same single user-keyed window pass as [[lastTouch]], but
   * carrying the RUNNING TOUCH LIST (`collect_list` over the prefix
   * frame — activity-bounded, like q161's paths); conversions filter the
   * list to the lookback and explode. No conversions×touches self-join.
   *
   * Output: (channel, n_credits, credited_cents).
   */
  def linearTouch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not contain the conversion type")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).cast("long").as("t"), col(typeCol).as("ch")))
    val convs = events
      .withColumn("__touches", collect_list(touch).over(w))
      .where(col(typeCol) === convType)
      .withColumn("__cents",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("__el", filter(col("__touches"),
        x => col(tsCol).cast("long") - x.getField("t") <= lookbackSec))
      .withColumn("__k", size(col("__el")))
    val direct = convs.where(col("__k") === 0)
      .select(lit("direct").as("channel"), col("__cents").as("credit"))
    val credited = convs.where(col("__k") > 0)
      .select(col("__cents"), col("__k"),
        posexplode(col("__el")).as(Seq("pos", "tch")))
      .select(col("tch.ch").as("channel"),
        (expr("__cents div __k") +
          when(col("pos") === col("__k") - 1, pmod(col("__cents"), col("__k")))
            .otherwise(lit(0L))).as("credit"))
    direct.unionByName(credited)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit")).as("credited_cents"))
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
