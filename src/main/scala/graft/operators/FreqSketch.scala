package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.countMinSketch

/**
 * Count-min frequency layer ([[graft.expr.CountMinAgg]]): build the
 * sketch in ONE narrow map-combined aggregation — the token/key stream
 * is never shuffled — then answer point-frequency queries for any probe
 * set by broadcasting the (width·depth)-sized counter row and evaluating
 * the min-over-rows lookup as codegen `element_at` arithmetic. Estimates
 * are exact when the probed item avoids collision in any row (the gate
 * regime); always an over-count otherwise, never under.
 */
object FreqSketch {

  /** One-row sketch of `itemCol`'s xxhash64 stream. */
  def countMin(df: DataFrame, itemCol: Column, width: Int = 8192,
      depth: Int = 4): DataFrame =
    df.agg(countMinSketch(xxhash64(itemCol), width, depth).as("cms"))

  /** Point estimate for `itemCol` given the sketch array column: min over
    * depth rows at the item's Kirsch-Mitzenmacher positions. Pure codegen
    * (element_at + modular arithmetic on xxhash64). */
  def estimate(cms: Column, itemCol: Column, width: Int, depth: Int): Column = {
    val h = xxhash64(itemCol)
    val h1 = h.bitwiseAND(lit(0xffffffffL))
    val h2 = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
    val rows = (0 until depth).map { d =>
      val p = pmod(h1 + lit(d.toLong) * h2, lit(width.toLong))
      element_at(cms, (lit(d.toLong * width) + p + lit(1L)).cast("int"))
    }
    least(rows: _*)
  }

  /** Frequency table for a probe set: cross-join the broadcast sketch row
    * onto the probes and evaluate [[estimate]] per probe. */
  def frequencies(df: DataFrame, itemCol: Column, probes: DataFrame,
      probeCol: String, width: Int = 8192, depth: Int = 4): DataFrame =
    probes.crossJoin(broadcast(countMin(df, itemCol, width, depth)))
      .select(col(probeCol), estimate(col("cms"), col(probeCol), width, depth).as("est"))

  /**
   * Equi-join SIZE estimation from two count-min sketches — the
   * pre-shuffle cardinality probe (AMS/CM inner product, Alon-Matias-
   * Szegedy '96 / Cormode-Muthukrishnan '05): |A ⋈ B| = Σ_k cntA(k)·
   * cntB(k) is estimated per depth row as the dot product of the two
   * counter rows, taking the MIN over rows. Each row only OVER-counts
   * (collision cross-terms are non-negative), so est ≥ true always, and
   * est = true exactly when no two observed keys share a cell in some
   * row — guaranteed-checkable for bounded key domains (the q180
   * collision-free regime), and the expected overshoot is ≤
   * (e/width)·n_left·n_right otherwise.
   *
   * Why it matters at 100 TB: the answer costs two narrow map-combined
   * scans (the key streams are never shuffled) + an O(width·depth) dot
   * product — you learn whether the join output is 10⁶ or 10¹² rows,
   * and hence broadcast vs shuffle vs pre-aggregate, WITHOUT running
   * the join. Deterministic (counter sums are order-free), so the
   * estimate itself is gate-hashable.
   *
   * Output: one row (n_left, n_right, est_join_size).
   */
  def joinSizeEstimate(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      width: Int = 8192, depth: Int = 4): DataFrame = {
    // NULL keys never join — exclude them from the sketches so n_left/
    // n_right and the estimate share the join's semantics
    val a = countMin(left.where(leftKey.isNotNull), leftKey, width, depth)
      .select(col("cms").as("__cma"))
    val b = countMin(right.where(rightKey.isNotNull), rightKey, width, depth)
      .select(col("cms").as("__cmb"))
    def rowDot(d: Int): Column = aggregate(
      zip_with(slice(col("__cma"), d * width + 1, width),
        slice(col("__cmb"), d * width + 1, width), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    def total(c: Column): Column =
      aggregate(slice(c, 1, width), lit(0L), (acc, x) => acc + x)
    a.crossJoin(broadcast(b)).select(
      total(col("__cma")).as("n_left"),
      total(col("__cmb")).as("n_right"),
      least((0 until depth).map(rowDot): _*).as("est_join_size"))
  }
}
