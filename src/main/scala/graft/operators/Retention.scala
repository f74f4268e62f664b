package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cohort-retention analysis — the standard product-analytics rollup:
 * users are cohorted by their first-activity day, and each later active
 * day counts toward (cohort_day, day_offset) retention.
 *
 * Plan shape (scale-grade): two user-keyed aggregations over one scan
 * lineage — (user → first day) and (user, day) distinct — joined on the
 * user key (co-partitioned: both sides arrive hash-partitioned by user,
 * no extra exchange), then one map-combined rollup to the tiny
 * (cohort_day × offset) grid. The event log is never self-joined and
 * nothing is keyed by a high-cardinality composite; output cardinality
 * is days², corpus-size-free.
 */
object Retention {

  /**
   * @return (cohort_day DATE, day_offset INT, users BIGINT,
   *          cohort_size BIGINT, retention DOUBLE) — one row per
   *          (cohort, offset) with at least one active user; offset 0 is
   *          the cohort itself, so retention(0) = 1.0.
   */
  /**
   * RFM segmentation — recency/frequency/monetary quintiles, the
   * standard customer-value rollup. One customer-keyed aggregation, then
   * three `ntile(5)` windows over the CUSTOMER relation (not the orders
   * log) with a key tiebreak making every tile assignment deterministic.
   * Scores follow the usual convention: 5 = most recent / most frequent /
   * highest spend.
   *
   * Scale note: `ntile` is a global sort of the aggregated relation —
   * fine while |customers| ≪ |orders|, the usual regime. When the
   * customer relation itself is huge, swap the exact tiles for
   * threshold bucketing off [[Quantiles.exactQuantiles]] cut points
   * (broadcast 4 cuts per dimension, one CASE per row, no global sort);
   * ntile is the gate contract here because DuckDB reproduces it
   * rank-for-rank.
   *
   * @param asOfDate recency anchor, 'yyyy-MM-dd'
   * @return (custCol, recency_days INT, frequency BIGINT,
   *          monetary DECIMAL(18,2), r/f/m INT quintiles, segment "rfm")
   */
  def rfm(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String, asOfDate: String): DataFrame = {
    val base = orders.groupBy(col(custCol)).agg(
      datediff(lit(asOfDate).cast("date"), max(to_date(col(dateCol))))
        .as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(col(amountCol).cast("decimal(18,2)")).as("monetary"))
    def tile(order: Column) =
      ntile(5).over(Window.orderBy(order, col(custCol)))
    base
      .withColumn("r", tile(col("recency_days").desc))
      .withColumn("f", tile(col("frequency").asc))
      .withColumn("m", tile(col("monetary").asc))
      .withColumn("segment", concat(col("r"), col("f"), col("m")))
  }

  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val firstDay = df.groupBy(col(userCol))
      .agg(min(day).as("cohort_day"))
    val activeDays = df.select(col(userCol), day.as("active_day")).distinct()
    val grid = activeDays.join(firstDay, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("users"))
    val sizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    grid.join(sizes, "cohort_day")
      .withColumn("retention",
        col("users").cast("double") / col("cohort_size"))
      .select("cohort_day", "day_offset", "users", "cohort_size", "retention")
  }

  /**
   * Cohort LTV curve — cumulative revenue per user by cohort age, the
   * unit-economics readout every acquisition decision hangs on (is day-N
   * cumulative value crossing acquisition cost, and does a newer cohort
   * bend the curve). Revenue is EXACT cents end to end: daily sums,
   * cohort-age rollup, and the running cumulative are all long
   * arithmetic; the only division is the published per-user LTV. Shape:
   * two user-keyed aggregations that co-partition (the cohortRetention
   * discipline) + one cohort-partitioned window over the
   * days²-bounded grid. Output: (cohort_day, day_offset, revenue_cents,
   * cum_revenue_cents, cohort_size, ltv_cents_per_user).
   */
  def cohortLtv(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val firstDay = df.groupBy(col(userCol)).agg(min(day).as("cohort_day"))
    val daily = df
      .select(col(userCol), day.as("active_day"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__c"))
      .groupBy(col(userCol), col("active_day")).agg(sum(col("__c")).as("__c"))
    val grid = daily.join(firstDay, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .agg(sum(col("__c")).as("revenue_cents"))
    val sizes = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(sizes, "cohort_day")
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
      .withColumn("ltv_cents_per_user",
        round(col("cum_revenue_cents").cast("double")
          / col("cohort_size").cast("double"), 6))
      .select("cohort_day", "day_offset", "revenue_cents",
        "cum_revenue_cents", "cohort_size", "ltv_cents_per_user")
  }
}
