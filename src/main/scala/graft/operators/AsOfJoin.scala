package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, the most recent right row with
 * `right.ts <= left.ts` per key — the time-series join the reference
 * lacks (SURVEY.md §2.4 "Missing: no as-of join"), added as an engine
 * extension.
 *
 * Algorithm (scale-first): tag and UNION both sides, one shuffle on
 * (key, ts) into a single window pass carrying the last right payload
 * forward — O(N log N) per partition, no per-row lookups, no range
 * explosion, skew handled by AQE like any other window. This is the
 * union-merge formulation used by time-series engines; a broadcast
 * nested-loop would die at 100 TB.
 */
object AsOfJoin {

  /**
   * @param left        probe side (keeps all rows)
   * @param right       reference side (its latest row ≤ ts attaches)
   * @param keyCols     equi-key column names present on both sides
   * @param leftTs      event-time column on left
   * @param rightTs     event-time column on right
   * @param tolerance   optional max age of the matched right row, e.g.
   *                    "INTERVAL 1 HOUR" — older matches become NULL
   * @return left columns + right's non-key payload columns (null when no
   *         right row precedes the left row)
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: Option[String] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs).toSeq
    val payload = struct((rightTs +: payloadCols).map(col): _*)

    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        payload.as("__payload")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTagged.schema("__payload").dataType).as("__payload"),
        struct(left.columns.map(col): _*).as("__left")): _*)
    val rWithLeft = rTagged.withColumn("__left",
      lit(null).cast(lTagged.schema("__left").dataType))

    // right rows sort BEFORE left rows at equal ts (side 0 < 1): a right
    // row at exactly left.ts matches (<= semantics, like DuckDB ASOF)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = rWithLeft.unionByName(lTagged)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withTol = tolerance match {
      case Some(t) => merged.withColumn("__match",
        when(col("__match").isNotNull &&
          col("__match").getField(rightTs) >= col("__ts") - expr(t), col("__match")))
      case None => merged
    }

    val leftOut = left.columns.toSeq.map(c => col("__left").getField(c).as(c))
    val rightOut = (rightTs +: payloadCols).map(c =>
      col("__match").getField(c).as(if (c == rightTs) s"${c}_right" else c))
    withTol.select(leftOut ++ rightOut: _*)
  }
}
