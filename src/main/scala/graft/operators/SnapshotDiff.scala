package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot differencing (CDC derivation): given two versions of a table,
 * classify every primary key as `inserted` / `deleted` / `updated` /
 * `unchanged`. This is the incremental-reprocessing primitive a curation
 * pipeline runs between corpus snapshots — downstream stages (dedup,
 * embedding, indexing) re-run only over the `inserted`+`updated` slice
 * instead of the full 100 TB (the same delta-first shape as
 * `Dedup.dedupAgainstHistory`, which q112 gates).
 *
 * The reference exposes no snapshot diff; its change surface is the
 * row-level watch/event stream (`lib/src/core/data_store_impl.dart`'s
 * watch API, SURVEY.md §2.8). This operator is the batch complement:
 * derive the same insert/update/delete classification from two stored
 * snapshots after the fact.
 *
 * Shape at scale: ONE full-outer shuffle join keyed on the PK — both
 * sides partition by the same key, so AQE coalesces and skew-splits as
 * usual; the value comparison is a codegen null-safe conjunction over the
 * requested columns, no row hashing materialized. 100 TB snapshots diff
 * in one pass with no driver state.
 */
object SnapshotDiff {

  /**
   * Classify each PK across two snapshots.
   *
   * Output: (`pk`, change_type) with change_type ∈
   * {inserted, deleted, updated, unchanged}. `compareCols` drive the
   * updated/unchanged split with null-safe equality (`<=>`): a column
   * going NULL→value or value→NULL counts as a change, NULL→NULL does
   * not.
   */
  def diff(oldDf: DataFrame, newDf: DataFrame, pk: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val o = oldDf.select(pk, compareCols: _*).withColumn("__old", lit(1))
    val n = newDf.select(pk, compareCols: _*).withColumn("__new", lit(1))
    val joined = o.alias("o").join(n.alias("n"),
      col(s"o.$pk") === col(s"n.$pk"), "full_outer")
    val same = compareCols
      .map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduce(_ && _)
    joined.select(
      coalesce(col(s"o.$pk"), col(s"n.$pk")).as(pk),
      when(col("o.__old").isNull, lit("inserted"))
        .when(col("n.__new").isNull, lit("deleted"))
        .when(same, lit("unchanged"))
        .otherwise(lit("updated")).as("change_type"))
  }

  /** `diff` restricted to actionable rows (everything but `unchanged`) —
    * the slice downstream incremental stages consume. */
  def changes(oldDf: DataFrame, newDf: DataFrame, pk: String,
      compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, pk, compareCols).where(col("change_type") =!= "unchanged")
}
