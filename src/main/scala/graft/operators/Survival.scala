package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Kaplan-Meier survival estimation (product-limit, KM 1958) — the
 * right-censoring-aware answer to "how long until conversion/churn"
 * that a plain average of observed durations gets wrong (censored
 * subjects carry information: they survived AT LEAST their horizon).
 *
 * Determinism: the estimator is a running PRODUCT of rationals
 * Π(1 − dᵢ/nᵢ) over ordered event times; products don't window, so it
 * runs as exp(Σ ln(·)) with each ln term 12dp-rounded and the Σ taken
 * over EXACT decimals (the engine's Σ doctrine) — the curve is
 * bit-reproducible across engines. A time where every at-risk subject
 * events (1 − d/n = 0) zeroes the curve from there on via an explicit
 * flag — no ln(0) ever evaluates.
 *
 * Shape: one grouped count by duration (|distinct times| rows), one
 * ordered window over that bounded relation. The subject table is
 * touched once.
 *
 * Output (event times only): (t, n_risk, n_event, n_censored, survival).
 */
object Survival {

  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: Column): DataFrame = {
    val total = df.count()
    val byT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(eventCol, 1L).otherwise(0L)).as("n_event"),
        sum(when(eventCol, 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = byT
      .withColumn("__gone", sum(col("n_event") + col("n_censored")).over(w))
      .withColumn("n_risk",
        lit(total) - col("__gone") + col("n_event") + col("n_censored"))
      .withColumn("__zero", (col("n_event") === col("n_risk")).cast("int"))
      .withColumn("__term", when(col("__zero") === 1, lit(0.0))
        .otherwise(round(log(lit(1.0) -
          col("n_event").cast("double") / col("n_risk").cast("double")), 12)))
      .withColumn("__logsum",
        sum(col("__term").cast("decimal(24,12)")).over(w))
      .withColumn("__anyzero", max(col("__zero")).over(w))
      .withColumn("survival", when(col("__anyzero") === 1, lit(0.0))
        .otherwise(round(exp(col("__logsum").cast("double")), 6)))
    curve.where(col("n_event") > 0)
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        col("survival"))
  }
}
