package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EXACT distributed quantiles by histogram bisection — the selection
 * algorithm an engine wants at 100 TB, where a per-group full sort
 * (`percentile` / window-rank) is the thing to avoid:
 *
 *   pass A: per-group (n, min, max) — one map-combined aggregation;
 *   pass B: fixed-width histogram counts (group, bin) — one map-combined
 *           aggregation whose output is |groups| × bins rows,
 *           corpus-size-free; a per-group running sum over the bins
 *           (a ≤`bins`-row window per group) locates, for every target
 *           rank, its bin and the offset inside that bin;
 *   pass C: only rows falling in CANDIDATE bins (expected n/bins per
 *           group) are shuffled, ranked per (group, p) and the offset-th
 *           row is the exact answer.
 *
 * Rank contract = SQL `percentile_disc` / DuckDB `quantile_disc`:
 * 0-based rank `max(0, ceil(p·n) − 1)` — the smallest value whose
 * cumulative frequency reaches p. Use dyadic p (k/2^m: 0.25, 0.5,
 * 0.875…) so `p·n` is exact in binary floating point on every engine.
 *
 * Nothing is collected to the driver; the bin→rank resolution is a join
 * between two bounded relations (histogram, targets). A pathological bin
 * (massive tie-run) degrades pass C to a larger — still bin-bounded —
 * sort; production refinement is recursing the bisection on that bin,
 * which this implementation documents rather than needs at gate scale.
 */
object Quantiles {

  /**
   * @param ps dyadic quantiles in (0, 1]
   * @return one row per (group, p): groupCols..., p DOUBLE, value DOUBLE
   */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], bins: Int = 4096): DataFrame = {
    require(ps.nonEmpty, "at least one quantile")
    require(bins >= 2, "bins >= 2")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")

    // pass A: per-group extent
    val stats = df.groupBy(g: _*).agg(
      count(v).as("__n"), min(v).as("__min"), max(v).as("__max"))

    // target ranks per (group, p): 0-based ceil(p*n)-1, clamped at 0
    val targets = stats
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("__rank",
        greatest(ceil(col("p") * col("__n")).cast("long") - 1L, lit(0L)))
      .select(g :+ col("p") :+ col("__rank"): _*)

    // shared bin expression (passes B and C must agree bit-for-bit)
    val width = (col("__max") - col("__min")) / lit(bins)
    val binExpr = when(col("__max") === col("__min"), lit(0))
      .otherwise(least(
        floor((v - col("__min")) / width).cast("int"), lit(bins - 1)))

    // pass B: histogram + per-group cumulative counts (window over <= bins rows)
    val binned = df.join(broadcast(stats), groupCols)
    val hist = binned.groupBy(g :+ binExpr.as("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(
        Window.partitionBy(g: _*).orderBy(col("__bin"))))
    // the bin holding each rank, plus the rank's offset inside the bin
    val targetBins = targets.join(hist, groupCols)
      .where(col("__rank") < col("__cum") &&
        col("__rank") >= col("__cum") - col("__cnt"))
      .withColumn("__off", col("__rank") - (col("__cum") - col("__cnt")))
      .select(g :+ col("p") :+ col("__bin") :+ col("__off"): _*)

    // pass C: candidate rows only -> per-(group, p) offset selection
    val candidates = binned.withColumn("__bin", binExpr)
      .join(broadcast(targetBins), groupCols :+ "__bin")
    candidates
      .withColumn("__rn", row_number().over(
        Window.partitionBy(g :+ col("p"): _*).orderBy(v)))
      .where(col("__rn") === col("__off") + 1)
      .select(g :+ col("p") :+ v.as("value"): _*)
  }

  /**
   * Exact WEIGHTED median per group with integer weights: the smallest
   * value whose cumulative weight reaches half the group total
   * (2·cum ≥ total) under the total (value, tie…) order — one window
   * cumulative sum in exact longs, no interpolation ambiguity, no
   * value duplication by weight (the naive explode-by-weight blows the
   * row count up by Σw). Output: (group…, wmedian, total_weight).
   */
  /**
   * SCALE path for the weighted median: the same histogram-bisection
   * shape as [[exactQuantiles]], with bin COUNTS replaced by bin WEIGHT
   * sums — a per-group full-sort window (the [[weightedMedian]] oracle
   * path) serializes each group into one task, which at coarse groups
   * (3 return flags × millions of rows) wastes the cluster; here the
   * corpus-sized passes are both map-combined aggregations and only the
   * target bin's rows (expected n/bins) ever see a window. Same
   * contract: smallest value under (value, tie…) whose cumulative weight
   * w reaches ⌈W/2⌉. Output: (group…, wmedian, total_weight).
   */
  def weightedMedianBinned(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, tieCols: Seq[String],
      bins: Int = 4096): DataFrame = {
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val wgt = col(weightCol).cast("long")
    val stats = df.groupBy(g: _*).agg(
      sum(wgt).as("__W"), min(v).as("__min"), max(v).as("__max"))
    val width = (col("__max") - col("__min")) / lit(bins)
    val binExpr = when(col("__max") === col("__min"), lit(0))
      .otherwise(least(
        floor((v - col("__min")) / width).cast("int"), lit(bins - 1)))
    val binned = df.join(broadcast(stats), groupCols)
    val hist = binned.groupBy(g :+ binExpr.as("__bin"): _*)
      .agg(sum(wgt).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(
        Window.partitionBy(g: _*).orderBy(col("__bin"))))
    val targetBin = hist
      .join(broadcast(stats.select(g :+ expr("(__W + 1) div 2").as("__T"): _*)),
        groupCols)
      .where(col("__T") <= col("__cum") &&
        col("__T") > col("__cum") - col("__cnt"))
      .withColumn("__off", col("__T") - (col("__cum") - col("__cnt")))
      .select(g :+ col("__bin") :+ col("__off"): _*)
    val order = v +: tieCols.map(col)
    val candidates = binned.withColumn("__bin", binExpr)
      .join(broadcast(targetBin), groupCols :+ "__bin")
      .withColumn("__cw", sum(wgt).over(
        Window.partitionBy(g: _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    candidates.where(col("__cw") >= col("__off"))
      .groupBy(g: _*).agg(min(v).as("wmedian"))
      .join(broadcast(stats.select(g :+ col("__W").as("total_weight"): _*)),
        groupCols)
      .select(g :+ col("wmedian") :+ col("total_weight"): _*)
  }

  def weightedMedian(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weightCol: String, tieCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val order = col(valueCol) +: tieCols.map(col)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    df.withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wAll))
      .where(col("__cum") * 2 >= col("__tot"))
      .groupBy(g: _*)
      .agg(min(col(valueCol).cast("double")).as("wmedian"),
        max(col("__tot")).as("total_weight"))
  }

  /**
   * MERGEABLE-SKETCH quantiles — the missing member of the sketch
   * family (HLL/KMV/CountMin have it; quantiles get it here): Spark's
   * native `percentile_approx` is a Greenwald–Khanna `QuantileSummaries`
   * ImperativeAggregate, so Catalyst's partial/final aggregation IS the
   * sketch build-and-merge — fixed-size state per group, one
   * map-combined pass, merge-associative across partitions/executors.
   * That makes it the 100 TB path; [[exactQuantiles]] is the exact twin.
   *
   * The GK guarantee is on RANK, not value: rank(est) ∈
   * [⌈φ·n⌉ − ε·n, ⌈φ·n⌉ + ε·n] with ε = 1/accuracy. `verified = true`
   * adds one broadcast-join verification scan that computes the exact
   * rank of each estimate and a `within_eps` flag — the production
   * pattern is to run it on a sample or not at all (the bound is a
   * theorem), the gate runs it always and REQUIRES the flag.
   *
   * Determinism note (why gates must not hash the estimate itself): the
   * sketch merge ORDER across partitions is scheduler-dependent and GK
   * estimates may differ between runs WITHIN the rank bound; `est` and
   * `est_rank` are published for humans, the deterministic columns are
   * (group, p, n, target_rank, within_eps).
   *
   * Output: (group…, p, n, target_rank, est, est_rank?, within_eps?).
   */
  def sketchQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 100, verified: Boolean = true): DataFrame = {
    require(ps.nonEmpty, "at least one quantile")
    require(accuracy >= 10, "accuracy >= 10")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val sk = df.groupBy(g: _*).agg(
        count(v).as("n"),
        percentile_approx(v, array(ps.map(lit): _*), lit(accuracy)).as("__ests"))
      .withColumn("__pe", explode(arrays_zip(
        array(ps.map(lit): _*).as("p"), col("__ests").as("est"))))
      .select(g ++ Seq(col("__pe.p").as("p"), col("n"),
        ceil(col("__pe.p") * col("n")).cast("long").as("target_rank"),
        col("__pe.est").as("est")): _*)
    if (!verified) sk
    else {
      // Materialize the sketch ONCE before reusing its plan: GK merges
      // are order-dependent, so re-evaluating `sk` in the verification
      // lineage could verify a DIFFERENT estimate than the one published.
      val skM = sk.localCheckpoint(true)
      // one verification scan: exact rank INTERVAL of every estimate
      // (ties give est a rank range [count(<est)+1, count(<=est)]; the
      // GK bound holds if that interval overlaps target ± eps·n) via a
      // broadcast of the tiny (|groups|·|ps|) estimate relation
      val ranks = df.join(broadcast(skM), groupCols)
        .groupBy(g :+ col("p"): _*)
        .agg(sum(when(v < col("est"), 1L).otherwise(0L)).as("__below"),
          sum(when(v <= col("est"), 1L).otherwise(0L)).as("__ub"))
      skM.join(ranks, groupCols :+ "p")
        .withColumn("__eps_n", ceil(col("n") / lit(accuracy)).cast("long"))
        .withColumn("within_eps",
          (col("__below") + 1L <= col("target_rank") + col("__eps_n") &&
            col("__ub") >= col("target_rank") - col("__eps_n")).cast("int"))
        .select(g ++ Seq(col("p"), col("n"), col("target_rank"), col("est"),
          (col("__below") + 1L).as("est_rank_lo"), col("__ub").as("est_rank_hi"),
          col("within_eps")): _*)
    }
  }
}
