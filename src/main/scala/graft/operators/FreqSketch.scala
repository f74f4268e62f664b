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
}
