package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.idBitmap

/**
 * Exact audience sets over BOUNDED id domains as per-group bitmaps — the
 * roaring-bitmap warehouse pattern ([[graft.expr.IdBitmapAgg]]): where
 * KMV ([[DistinctSketch]]) estimates distinct counts for unbounded
 * domains, bitmaps give EXACT cardinalities, intersections and unions
 * when the id space is dense and declared (user ids, enum dimensions).
 * Build once per group in ONE aggregation (|domain|/8 bytes of state);
 * every subsequent audience question — overlap matrices, funnels across
 * segments, reach of unions — is codegen `zip_with`/`bit_count` array
 * arithmetic on bitmap rows. The ids are never shuffled again.
 */
object Bitmaps {

  /** Per-group id bitmap: groupBy(groupCols) → `bm` array<long> column. */
  def bitmapBy(df: DataFrame, groupCols: Seq[String], idCol: Column,
      maxId: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(idBitmap(idCol, maxId).as("bm"))

  /** Exact set bit count of a bitmap column — codegen HOF, no shuffle. */
  def cardinality(bm: Column): Column =
    aggregate(bm, lit(0L), (acc, w) => acc + bit_count(w))

  def and(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x.bitwiseAND(y))
  def or(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x.bitwiseOR(y))

  /**
   * Pairwise EXACT overlap between the groups of a [[bitmapBy]] result:
   * (g_a, g_b, n_a, n_b, n_and, n_or, jaccard). The join is bitmap-row ×
   * bitmap-row — |groups|² tiny rows of array math.
   */
  def overlap(bitmaps: DataFrame, groupCol: String): DataFrame = {
    val a = bitmaps.select(col(groupCol).as("g_a"), col("bm").as("__ba"))
    val b = bitmaps.select(col(groupCol).as("g_b"), col("bm").as("__bb"))
    a.join(b, col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"),
        cardinality(col("__ba")).as("n_a"),
        cardinality(col("__bb")).as("n_b"),
        cardinality(and(col("__ba"), col("__bb"))).as("n_and"),
        cardinality(or(col("__ba"), col("__bb"))).as("n_or"))
      .withColumn("jaccard",
        round(col("n_and").cast("double") / col("n_or").cast("double"), 6))
  }
}
