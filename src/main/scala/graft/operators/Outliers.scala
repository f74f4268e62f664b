package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Robust (median/MAD) outlier detection per group — the outlier cut that
 * survives heavy tails: mean/stddev are dragged by the very outliers they
 * are supposed to flag, the median and the median-absolute-deviation are
 * not (50% breakdown point). The robust z-score
 * `(x − median) / (1.4826 · MAD)` reads like a normal z-score (1.4826
 * makes MAD consistent with σ under normality, Rousseeuw & Croux 1993);
 * |z| > 3.5 is the standard cut (Iglewicz & Hoaglin 1993).
 *
 * Shape: two grouped EXACT-percentile aggregations (median, then median
 * of absolute deviations — `Quantiles.exactQuantiles` semantics), each
 * group-cardinality-sized and BROADCAST back onto the scan; the data side
 * is never shuffled. Cutoffs round to 6dp on both engines so interpolation
 * float dust can't flip a boundary row. Complements the percentile-band
 * cut (`TextAnalysis.trimOutliers`): bands need a chosen quantile pair,
 * the robust z adapts to each group's spread.
 *
 * Reference anchor: no statistics surface in the reference (SURVEY §2.9);
 * pipeline extension (outlier filtering before training-data mixing).
 */
object Outliers {

  /** Per-row robust z-score: adds `med`, `mad`, `robust_z` (null when the
    * group's MAD is 0 — a constant group has no spread to score against). */
  def robustZ(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val g = col(groupCol)
    val med = df.groupBy(g).agg(
      round(expr(s"percentile($valCol, 0.5D)"), 6).as("med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(g).agg(
      round(expr(s"percentile(abs($valCol - med), 0.5D)"), 6).as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("robust_z",
        when(col("mad") > 0,
          round((col(valCol) - col("med")) / (lit(1.4826) * col("mad")), 6)))
  }

  /** Group profile: (group, med, mad, n, n_out) with |robust_z| > `zThresh`
    * counted as outliers. One more grouped agg over the scored rows. */
  def madProfile(df: DataFrame, groupCol: String, valCol: String,
      zThresh: Double = 3.5): DataFrame =
    robustZ(df, groupCol, valCol)
      .groupBy(col(groupCol))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(abs(col("robust_z")) > zThresh, 1L).otherwise(0L)).as("n_out"))

  /** Keep only in-band rows (|robust_z| ≤ `zThresh`; zero-MAD groups are
    * kept whole — no evidence of spread means no evidence of outliers). */
  def trimRobust(df: DataFrame, groupCol: String, valCol: String,
      zThresh: Double = 3.5): DataFrame =
    robustZ(df, groupCol, valCol)
      .where(col("robust_z").isNull || abs(col("robust_z")) <= zThresh)
      .drop("med", "mad", "robust_z")

  /**
   * Winsorized per-group summary: clip to the exact [pLo, pHi] rank
   * quantiles instead of DROPPING the tails (trimming changes n and
   * biases sums; winsorizing keeps every row, pulling the tails to the
   * cut). Quantiles come from the histogram-bisection path (no per-group
   * sort — the 100 TB route, q153/q194 discipline) and are BROADCAST
   * back onto the scan; the clip and the winsorized sum are exact long
   * arithmetic over integer `unitsCol`, so the published mean's one
   * division is the only float. `pLo`/`pHi` must be dyadic (exact
   * doubles) — p·n then has no float dust to shift a rank.
   *
   * Output: (group, n, lo_cut, hi_cut, n_lo, n_hi, sum_w, mean_w).
   */
  def winsorize(df: DataFrame, groupCol: String, unitsCol: Column,
      pLo: Double = 0.0625, pHi: Double = 0.9375): DataFrame = {
    require(pLo > 0 && pHi > pLo && pHi <= 1, s"0 < pLo < pHi <= 1: $pLo, $pHi")
    val base = df.select(col(groupCol).as("g"), unitsCol.cast("long").as("v"))
    val qs = Quantiles.exactQuantiles(base, Seq("g"), "v", Seq(pLo, pHi))
    val lo = qs.where(col("p") === pLo)
      .select(col("g"), col("value").cast("long").as("lo_cut"))
    val hi = qs.where(col("p") === pHi)
      .select(col("g"), col("value").cast("long").as("hi_cut"))
    base.join(broadcast(lo), Seq("g")).join(broadcast(hi), Seq("g"))
      .withColumn("__w", least(greatest(col("v"), col("lo_cut")), col("hi_cut")))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        max(col("lo_cut")).as("lo_cut"), max(col("hi_cut")).as("hi_cut"),
        sum(when(col("v") < col("lo_cut"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("hi_cut"), 1L).otherwise(0L)).as("n_hi"),
        sum(col("__w")).as("sum_w"))
      .withColumn("mean_w",
        round(col("sum_w").cast("double") / col("n").cast("double"), 6))
  }
}
