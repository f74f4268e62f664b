package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension type-2 history (Kimball): turn a versioned
 * change log (pk, ts, attributes…) into effective-dated rows
 * (pk, attrs…, valid_from, valid_to, is_current), collapsing consecutive
 * versions whose tracked attributes did not actually change — the
 * standard dimension-history build every warehouse runs on CDC output.
 *
 * Shape: ONE pk-keyed window pass — null-safe lag-compare marks run
 * heads, lead over the kept heads closes intervals. (ts, tie) is a total
 * order per pk, so runs and intervals are deterministic under timestamp
 * ties. No self-joins; at 100 TB this is the plain partition-by-pk
 * window (activity-bounded partitions).
 *
 * The temporal lookup ([[temporalJoin]]) then answers "which version was
 * active at fact time" by composing the engine's as-of join
 * ([[AsOfJoin.asof]], union-sort shape — never a fact×history range
 * join); validity intervals are half-open [from, to).
 */
object Scd {

  /** Build the type-2 history. `tieCol` breaks ts ties (total order). */
  def buildHistory(changes: DataFrame, pkCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val w = Window.partitionBy(col(pkCol)).orderBy(col(tsCol), col(tieCol))
    val same = attrCols
      .map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduce(_ && _)
    val heads = changes
      .withColumn("__head", lag(col(tsCol), 1).over(w).isNull || !same)
      .where(col("__head"))
    val wh = Window.partitionBy(col(pkCol)).orderBy(col(tsCol), col(tieCol))
    heads.select(
        (col(pkCol) +: attrCols.map(col)) :+
        col(tsCol).as("valid_from") :+
        lead(col(tsCol), 1).over(wh).as("valid_to"): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /**
   * Temporal (point-in-time) join: for each fact row, attach the history
   * version active at `factTs` — as-of backward on valid_from, which for
   * a well-formed SCD2 history (contiguous half-open intervals) IS the
   * interval containment lookup. Facts before the first version get
   * null attributes.
   */
  def temporalJoin(facts: DataFrame, history: DataFrame, pkCol: String,
      factTs: String): DataFrame =
    AsOfJoin.asof(facts,
        history.drop("valid_to", "is_current")
          .withColumnRenamed("valid_from", "__vf"),
        Seq(pkCol), factTs, "__vf")
      .withColumnRenamed("__vf_right", "state_since")
}
