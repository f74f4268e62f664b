package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A/B experiment readout on deterministic hash assignment: arms come
 * from the same salted-md5 bucketing as [[graft.pipeline.Sampling]]
 * (pure function of (salt, unit id) — assignment is reproducible,
 * re-derivable, and independent across salts), conversion is measured
 * per UNIT (not per event — a chatty user must not vote twice), and the
 * readout is the two-proportion pooled z-score computed from exact
 * counts, doubles entering only in the one published formula (sqrt is
 * correctly rounded — deterministic across engines). The p-value is
 * deliberately NOT published: erf is not reproducible across math
 * libraries; z is, and the caller owns the threshold.
 */
object Experiment {

  /** 8-hex md5 bucket fraction in [0,1) for unit assignment. */
  private def frac(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 13), 16, 10)
      .cast("long") / lit(DistinctSketch.HashDenom)

  /**
   * One-row readout: (n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift, z).
   * `units` = one row per experimental unit; `converted` a boolean
   * Column over it. Arm B when frac ≥ `split` (default 50/50).
   */
  def abTest(units: DataFrame, idCol: String, converted: Column,
      salt: String, split: Double = 0.5): DataFrame = {
    val armed = units.select(col(idCol),
      when(frac(col(idCol), salt) < split, lit("A")).otherwise(lit("B")).as("arm"),
      when(converted, 1L).otherwise(0L).as("c"))
    val agg = armed.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "A", col("c")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === "B", col("c")).otherwise(0L)).as("conv_b"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (ca, cb) = (col("conv_a").cast("double"), col("conv_b").cast("double"))
    val ra = ca / na
    val rb = cb / nb
    val p = (ca + cb) / (na + nb)
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(ra, 6).as("rate_a"), round(rb, 6).as("rate_b"),
      round(rb - ra, 6).as("lift"),
      round((rb - ra) / sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb)), 6)
        .as("z"))
  }
}
