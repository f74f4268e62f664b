package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval algebra over (key, start, end) relations — the sweep-line
 * union ("how much time is actually covered, merging overlaps") and
 * run-length segmentation ("how long do states persist") that naive
 * SUM(end − start) double-counts and GROUP BY can't see. Both are
 * per-key windowed scans: the window is PARTITIONED by the entity key,
 * so parallelism is the number of keys and no single task ever holds
 * more than one key's intervals — the standard 100 TB shape (same
 * contract as sessionize). Reference anchor: tostore has no interval
 * ops at all (SURVEY §2.4 "no as-of, interval, range joins") — this is
 * engine-extension surface like `operators/RangeJoin.scala`.
 */
object Intervals {

  /**
   * Union coverage per key over half-open intervals [start, end) — the
   * classic sweep: order intervals by (start, end), a new island begins
   * where start exceeds the running max end of everything before
   * (touching intervals start == prev-max MERGE — [1,3)∪[3,5) is one
   * covered stretch), per-island coverage is max(end) − min(start),
   * and per-key coverage sums islands exactly (longs end-to-end; the
   * only double is the final published ratio). Rows with NULL or
   * inverted bounds (end < start) are dropped before the sweep — they
   * have no well-defined extent. Output: one row per key
   * (key, n_intervals, n_islands, covered, span, coverage), where
   * span = max(end) − min(start) and coverage = covered/span (6dp).
   */
  def unionCoverage(df: DataFrame, keyCol: Column, startCol: Column,
      endCol: Column): DataFrame = {
    val s = df.select(keyCol.as("key"), startCol.cast("long").as("st"),
        endCol.cast("long").as("en"))
      .where(col("key").isNotNull && col("st").isNotNull &&
        col("en").isNotNull && col("en") >= col("st"))
    val wPrev = Window.partitionBy(col("key")).orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("key")).orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islanded = s
      .withColumn("__pm", max(col("en")).over(wPrev))
      .withColumn("__new",
        when(col("__pm").isNull || col("st") > col("__pm"), 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wCum))
    val perIsland = islanded.groupBy(col("key"), col("__isl"))
      .agg(count(lit(1)).as("n"), min(col("st")).as("lo"), max(col("en")).as("hi"))
    perIsland.groupBy(col("key"))
      .agg(sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("hi") - col("lo")).as("covered"),
        (max(col("hi")) - min(col("lo"))).as("span"))
      .select(col("key"), col("n_intervals"), col("n_islands"),
        col("covered"), col("span"),
        when(col("span") > 0, round(col("covered").cast("double")
          / col("span").cast("double"), 6)).as("coverage"))
  }

  /**
   * Run-length segmentation — maximal runs of consecutive identical
   * state per key (the gaps-and-islands rn − rn' trick: a global
   * per-key row number minus a per-(key, state) row number is constant
   * exactly while the state persists), then per-state corpus stats.
   * Ordering is (tsCol, tieCol) with a caller-supplied unique
   * tie-breaker so both engines segment identically. All windows are
   * key-partitioned. Output: one row per state
   * (state, n_runs, n_events, max_len, avg_len, n_keys), avg_len the
   * one exact-rational divide (6dp).
   */
  def stateRuns(df: DataFrame, keyCol: Column, stateCol: Column,
      tsCol: Column, tieCol: Column): DataFrame = {
    val s = df.select(keyCol.as("key"), stateCol.cast("string").as("state"),
        tsCol.cast("long").as("t"), tieCol.as("tie"))
      .where(col("key").isNotNull && col("state").isNotNull)
    val wAll = Window.partitionBy(col("key")).orderBy(col("t"), col("tie"))
    val wState = Window.partitionBy(col("key"), col("state"))
      .orderBy(col("t"), col("tie"))
    val runs = s
      .withColumn("__grp", row_number().over(wAll) - row_number().over(wState))
      .groupBy(col("key"), col("state"), col("__grp"))
      .agg(count(lit(1)).as("len"))
    runs.groupBy(col("state"))
      .agg(count(lit(1)).as("n_runs"), sum(col("len")).as("n_events"),
        max(col("len")).as("max_len"),
        round(sum(col("len")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("avg_len"),
        countDistinct(col("key")).as("n_keys"))
  }
}
