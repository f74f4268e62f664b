package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-group linear trend (OLS on a metric over time) with DECIMAL-exact
 * moment sums: slope/intercept/r² from the closed-form normal equations
 *
 *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
 *   r²    = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
 *
 * computed from EXACT decimal sums. The built-in `regr_slope`/`covar_pop`
 * accumulate doubles in partition order — the last bits differ run to run
 * and engine to engine; here every Σ is decimal (x integral days, y
 * decimal money → all products exact), the n·Σ−Σ·Σ differences are exact
 * decimal subtraction (the catastrophic-cancellation step happens in
 * exact arithmetic), and only the final division runs in IEEE doubles —
 * identically on any engine. ONE map-side-combined aggregation per group;
 * the moment row is O(|groups|).
 *
 * Reference anchor: the reference's aggregates stop at count/sum/avg/
 * min/max (`lib/src/query/aggregate.dart`); regression is a relational
 * superset (SURVEY §2.6 extension rows).
 */
object Trend {

  /**
   * (group, n, slope, intercept, r2), all doubles rounded to 6dp.
   * `xCol` must be integral (e.g. a day number), `yCol` numeric; both are
   * widened to DECIMAL(38,…) before summing so every moment is exact.
   */
  def fitLinear(df: DataFrame, groupCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val x = xCol.cast("decimal(38,0)")
    val y = yCol.cast("decimal(38,2)")
    val moments = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum((x * y).cast("decimal(38,2)")).as("sxy"),
      sum((y * y).cast("decimal(38,4)")).as("syy"))
    // exact decimal differences, THEN one cast to double per term
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val denX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val denY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val slope = num / denX
    moments.select(
        col(groupCol), col("n").cast("long").as("n"),
        round(slope, 6).as("slope"),
        round((col("sy").cast("double") - slope * col("sx").cast("double"))
          / col("n").cast("double"), 6).as("intercept"),
        round(num * num / (denX * denY), 6).as("r2"))
  }

  /**
   * Theil–Sen robust trend per group (Theil 1950 / Sen 1968): the slope
   * is the LOWER MEDIAN of all pairwise slopes (y_j−y_i)/(t_j−t_i) over
   * i<j, the intercept the lower median of (y_i − slope·t_i) — a 29.3%
   * breakdown point, so outliers [[fitLinear]] chases simply do not
   * move it. Each pairwise slope is ONE double division (identical
   * expression both engines; the median then selects among
   * identically-computed values, so tie order cannot matter), and the
   * intercept composes from the PUBLISHED 6dp slope. Pairs build as a
   * per-key rn self-join (i<j): O(n²/2) per series BY DESIGN — this is
   * the exact small-series estimator, guarded by `maxN` (the peel-style
   * contract: a series longer than maxN throws rather than silently
   * paying quadratic cost; at scale use [[fitLinear]] or bucket first).
   * Medians run as rank windows PARTITIONED by key over the pair/point
   * relations. `tCol` must be unique per key.
   *
   * Output: (key, n, n_pairs, slope, intercept), 6dp.
   */
  def theilSen(df: DataFrame, keyCol: String, tCol: Column, yCol: Column,
      maxN: Int = 2000): DataFrame = {
    require(maxN >= 2, "maxN >= 2")
    val base = df.select(col(keyCol).as("__k"), tCol.cast("long").as("__t"),
      yCol.cast("long").as("__y")).where(col("__t").isNotNull && col("__y").isNotNull)
      .cache()
    val worst = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    require(worst <= maxN,
      s"theilSen: longest series has $worst points > maxN=$maxN — " +
        "the all-pairs exact estimator is for bounded series; bucket first")
    val a = base.select(col("__k"), col("__t").as("ta"), col("__y").as("ya"))
    val b = base.select(col("__k"), col("__t").as("tb"), col("__y").as("yb"))
    val slopes = a.join(b, "__k").where(col("tb") > col("ta"))
      .select(col("__k"),
        ((col("yb") - col("ya")).cast("double")
          / (col("tb") - col("ta")).cast("double")).as("__s"))
    val wS = Window.partitionBy(col("__k")).orderBy(col("__s"))
    val slopePick = slopes
      .withColumn("__rn", row_number().over(wS))
      .withColumn("__np", count(lit(1)).over(Window.partitionBy(col("__k"))))
      .where(col("__rn") === ceil(col("__np").cast("double") / 2.0).cast("long"))
      .select(col("__k"), col("__np").as("n_pairs"),
        round(col("__s"), 6).as("slope"))
    // intercept from the PUBLISHED slope: lower median of y − slope·t
    val resid = base.join(slopePick, "__k")
      .select(col("__k"), col("n_pairs"), col("slope"),
        (col("__y").cast("double") - col("slope") * col("__t").cast("double"))
          .as("__r"))
    val wR = Window.partitionBy(col("__k")).orderBy(col("__r"))
    val out = resid
      .withColumn("__rn", row_number().over(wR))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__k"))))
      .where(col("__rn") === ceil(col("__n").cast("double") / 2.0).cast("long"))
      .select(col("__k").as(keyCol), col("__n").as("n"), col("n_pairs"),
        col("slope"), round(col("__r"), 6).as("intercept"))
      .localCheckpoint(true) // one row per key — materialize, then free base
    base.unpersist(false)
    out
  }

  /**
   * Mann–Kendall trend test per key (Mann 1945, Kendall 1975) — the
   * NONPARAMETRIC "is there a monotone trend at all" hypothesis test
   * that pairs with [[theilSen]]'s slope estimate (same pair set, same
   * bounded-series contract): S = Σ_{i<j} sgn(y_j − y_i) over the
   * t-ordered series, variance with the tie correction
   *
   *   18·Var(S) = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)
   *
   * (t_g = size of each tied-value group), z with the ±1 continuity
   * correction. S, the tie sum and 18·Var(S) are EXACT integers; the
   * published z takes one sqrt + one divide of those integers, spelled
   * identically in any replaying engine. The p-value is deliberately
   * not published (erf is not library-reproducible; z is).
   *
   * Shape: the same per-key rn self-join as theilSen — O(n²/2) per
   * series BY DESIGN under the same loud `maxN` refusal (this is the
   * exact small-series test; bucket first at scale), plus one
   * (key, value) tie count. Constant series (Var = 0) publish NULL z.
   *
   * Output: (key, n, s, var18, z) — var18 = 18·Var(S), exact.
   */
  def mannKendall(df: DataFrame, keyCol: String, tCol: Column, yCol: Column,
      maxN: Int = 2000): DataFrame = {
    require(maxN >= 2, "maxN >= 2")
    val base = df.select(col(keyCol).as("__k"), tCol.cast("long").as("__t"),
        yCol.cast("long").as("__y"))
      .where(col("__t").isNotNull && col("__y").isNotNull)
      .cache()
    val worst = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    require(worst <= maxN,
      s"mannKendall: longest series has $worst points > maxN=$maxN — " +
        "the all-pairs exact test is for bounded series; bucket first")
    val a = base.select(col("__k"), col("__t").as("ta"), col("__y").as("ya"))
    val b = base.select(col("__k"), col("__t").as("tb"), col("__y").as("yb"))
    val sAgg = a.join(b, "__k").where(col("tb") > col("ta"))
      .groupBy(col("__k"))
      .agg(sum(signum((col("yb") - col("ya")).cast("double")).cast("long"))
        .as("s"))
    val ties = base.groupBy(col("__k"), col("__y"))
      .agg(count(lit(1)).as("tg"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__ng"), sum(col("tg")).as("__n"),
        sum(col("tg") * (col("tg") - 1L) * (lit(2L) * col("tg") + 5L))
          .as("__tsum"))
    val out = ties.join(sAgg, "__k")
      .withColumn("var18",
        col("__n") * (col("__n") - 1L) * (lit(2L) * col("__n") + 5L)
          - col("__tsum"))
      .select(col("__k").as(keyCol), col("__n").as("n"), col("s"),
        col("var18"),
        when(col("var18") > 0, round(
          (col("s").cast("double") - signum(col("s").cast("double")))
            / sqrt(col("var18").cast("double") / 18.0), 6)).as("z"))
      .localCheckpoint(true) // one row per key — materialize, free base
    base.unpersist(false)
    out
  }

  /**
   * Seasonal Mann–Kendall (Hirsch & Slack 1984) — the trend test
   * [[mannKendall]] gets WRONG on seasonal data: a flat series with a
   * strong annual cycle reads as oscillating pairs and dilutes S, and a
   * trend confined to one season drowns. The seasonal form runs the MK
   * statistic WITHIN each season (January-to-January comparisons only)
   * and combines: S = Σₘ Sₘ, Var18 = Σₘ Var18ₘ, one continuity-corrected
   * z — cross-season pairs never enter.
   *
   * Exactness + shape: [[mannKendall]] verbatim with season as the key
   * (same exact integer S and tie-corrected variance, same bounded-
   * series O(n²) contract per SEASON — which divides the series length
   * by the season count), then a seasons-sized exact-integer rollup and
   * the same one-sqrt z expression.
   *
   * Output: one row (n_seasons, n, s, var18, z_sk) — NULL z when the
   * combined variance is 0.
   */
  def seasonalMannKendall(df: DataFrame, seasonCol: Column, tCol: Column,
      yCol: Column, maxN: Int = 2000): DataFrame = {
    val per = mannKendall(df.withColumn("__season", seasonCol.cast("string")),
      "__season", tCol, yCol, maxN)
    per.agg(count(lit(1)).as("n_seasons"), sum(col("n")).as("n"),
        sum(col("s")).as("s"), sum(col("var18")).as("var18"))
      .select(col("n_seasons"), col("n"), col("s"), col("var18"),
        when(col("var18") > 0, round(
          (col("s").cast("double") - signum(col("s").cast("double")))
            / sqrt(col("var18").cast("double") / 18.0), 6)).as("z_sk"))
  }

  /**
   * Kendall τ-b per key (Kendall 1938) — the third leg of the
   * correlation shelf (Pearson [[fitLinear]]/corr reads linearity,
   * Spearman q260 reads monotone-through-ranks, τ reads CONCORDANCE:
   * the probability a random pair moves together minus apart), with
   * the tie-corrected denominator:
   *
   *   S   = Σ_{i<j} sgn(x_j−x_i)·sgn(y_j−y_i)
   *   τ_b = S / √((D₀−Dx)(D₀−Dy)),  D₀ = n(n−1)/2,
   *   Dx = Σ tx(tx−1)/2,  Dy = Σ ty(ty−1)/2  over tied-value groups.
   *
   * S and every D are EXACT integers; one sqrt + one divide publishes
   * τ_b at 6dp. Same bounded-series pair join and loud `maxN` contract
   * as [[theilSen]]/[[mannKendall]] (`idCol` must be unique per key —
   * it defines the i<j pair order, though S itself is pair-symmetric).
   * A side with all values tied (Dx = D₀) publishes NULL.
   *
   * Output: (key, n, s, d0, dx, dy, tau_b).
   */
  def kendallTau(df: DataFrame, keyCol: String, idCol: Column, xCol: Column,
      yCol: Column, maxN: Int = 2000): DataFrame = {
    require(maxN >= 2, "maxN >= 2")
    val base = df.select(col(keyCol).as("__k"), idCol.cast("long").as("__i"),
        xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .where(col("__i").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
      .cache()
    val worst = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    require(worst <= maxN,
      s"kendallTau: longest series has $worst points > maxN=$maxN — " +
        "the all-pairs exact statistic is for bounded series; bucket first")
    val a = base.select(col("__k"), col("__i").as("ia"),
      col("__x").as("xa"), col("__y").as("ya"))
    val b = base.select(col("__k"), col("__i").as("ib"),
      col("__x").as("xb"), col("__y").as("yb"))
    val sAgg = a.join(b, "__k").where(col("ib") > col("ia"))
      .groupBy(col("__k"))
      .agg(sum((signum((col("xb") - col("xa")).cast("double"))
        * signum((col("yb") - col("ya")).cast("double"))).cast("long"))
        .as("s"))
    // integer pair counts stay in longs: c(c−1) is even, `div` exact
    def tieSum(c: String): Column = sum(expr(s"$c * ($c - 1) div 2"))
    val tx = base.groupBy(col("__k"), col("__x"))
      .agg(count(lit(1)).as("c")).groupBy(col("__k"))
      .agg(tieSum("c").cast("long").as("dx"))
    val ty = base.groupBy(col("__k"), col("__y"))
      .agg(count(lit(1)).as("c")).groupBy(col("__k"))
      .agg(tieSum("c").cast("long").as("dy"))
    val n = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
    val out = n.join(sAgg, "__k").join(tx, "__k").join(ty, "__k")
      .withColumn("d0", expr("n * (n - 1) div 2").cast("long"))
      .select(col("__k").as(keyCol), col("n"), col("s"), col("d0"),
        col("dx"), col("dy"),
        when(col("d0") > col("dx") && col("d0") > col("dy"), round(
          col("s").cast("double")
            / sqrt((col("d0") - col("dx")).cast("double")
              * (col("d0") - col("dy")).cast("double")), 6)).as("tau_b"))
      .localCheckpoint(true)
    base.unpersist(false)
    out
  }

  /**
   * Pairwise Pearson correlation matrix over `cols` — ONE aggregation
   * computes every moment (sums, squares, cross-products) as exact
   * DECIMAL(38,8); the correlation assembles as
   * (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²)) with the
   * cancellations in exact decimal, doubles entering only at the final
   * sqrt (IEEE sqrt is correctly rounded → deterministic) and division.
   * `corr()`'s running double covariances are neither order- nor
   * engine-stable; this is. Output: (col_a, col_b, n, corr) for a < b.
   */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val d = (c: String) => col(c).cast("decimal(38,4)")
    val aggs =
      Seq(count(lit(1)).cast("decimal(38,0)").as("n")) ++
      cols.map(c => sum(d(c)).as(s"s_$c")) ++
      cols.map(c => sum((d(c) * d(c)).cast("decimal(38,8)")).as(s"ss_$c")) ++
      cols.combinations(2).toSeq.map { case Seq(a, b) =>
        sum((d(a) * d(b)).cast("decimal(38,8)")).as(s"sp_${a}_$b") }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      val num = (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
        .cast("double")
      val dx = (col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")).cast("double")
      val dy = (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")).cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n"),
        round(num / sqrt(dx * dy), 6).as("corr"))
    }
    m.select(explode(array(pairs: _*)).as("p")).select("p.*")
  }
}
