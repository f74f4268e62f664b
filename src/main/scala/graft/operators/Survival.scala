package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Kaplan-Meier survival estimation (product-limit, KM 1958) — the
 * right-censoring-aware answer to "how long until conversion/churn"
 * that a plain average of observed durations gets wrong (censored
 * subjects carry information: they survived AT LEAST their horizon).
 *
 * Determinism: the estimator is a running PRODUCT of rationals
 * Π(1 − dᵢ/nᵢ) over ordered event times; products don't window, so it
 * runs as exp(Σ ln(·)) with each ln term 12dp-rounded and the Σ taken
 * over EXACT decimals (the engine's Σ doctrine) — the curve is
 * bit-reproducible across engines. A time where every at-risk subject
 * events (1 − d/n = 0) zeroes the curve from there on via an explicit
 * flag — no ln(0) ever evaluates.
 *
 * Shape: one grouped count by duration (|distinct times| rows), one
 * ordered window over that bounded relation. The subject table is
 * touched once.
 *
 * Output (event times only): (t, n_risk, n_event, n_censored, survival).
 */
object Survival {

  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: Column): DataFrame = {
    val total = df.count()
    val byT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(eventCol, 1L).otherwise(0L)).as("n_event"),
        sum(when(eventCol, 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = byT
      .withColumn("__gone", sum(col("n_event") + col("n_censored")).over(w))
      .withColumn("n_risk",
        lit(total) - col("__gone") + col("n_event") + col("n_censored"))
      .withColumn("__zero", (col("n_event") === col("n_risk")).cast("int"))
      .withColumn("__term", when(col("__zero") === 1, lit(0.0))
        .otherwise(round(log(lit(1.0) -
          col("n_event").cast("double") / col("n_risk").cast("double")), 12)))
      .withColumn("__logsum",
        sum(col("__term").cast("decimal(24,12)")).over(w))
      .withColumn("__anyzero", max(col("__zero")).over(w))
      .withColumn("survival", when(col("__anyzero") === 1, lit(0.0))
        .otherwise(round(exp(col("__logsum").cast("double")), 6)))
    curve.where(col("n_event") > 0)
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        col("survival"))
  }

  /**
   * Two-sample log-rank test (Mantel 1966) — "does cohort A reach the
   * event FASTER", the hypothesis test the two KM curves beg for and
   * the time-to-event A/B readout a mean-comparison gets wrong under
   * censoring. At every pooled event time: O₁ − E₁ with
   * E₁ⱼ = dⱼ·n₁ⱼ/nⱼ and hypergeometric variance
   * Vⱼ = dⱼ·(n₁ⱼ/nⱼ)·(1 − n₁ⱼ/nⱼ)·(nⱼ−dⱼ)/(nⱼ−1); z = (O₁−E₁)/√V.
   *
   * Determinism: every term is a rational of exact counts, 12dp-rounded
   * and DECIMAL-summed (the engine's Σ doctrine); the only unrounded
   * float work is the final √ and divide. At-risk counts at POOLED
   * times come from a RANGE window (strictly-earlier frame, so subjects
   * eventing at t still count at risk) over the per-group time table
   * unioned with pooled-time markers — |distinct times| rows per group,
   * never subjects × times.
   *
   * Output: one row (group_a, group_b, n_a, n_b, o_a, e_a, v_sum, z) —
   * the p-value is deliberately not published (erf is not reproducible
   * across math libraries; z is).
   */
  /**
   * Nelson-Aalen cumulative hazard (Nelson 1972, Aalen 1978) — the
   * additive sibling of [[kaplanMeier]]: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over
   * ordered event times. Where KM answers "what fraction survives past
   * t", H(t) reads as the expected number of events per subject still
   * at risk — the estimator of choice when hazards are the modeling
   * target (its increments are the raw hazard terms) and the numerically
   * safer one near total failure (no product collapses to 0).
   *
   * Determinism: each increment dᵢ/nᵢ is a rational of exact counts,
   * 12dp-rounded, DECIMAL-summed by a running window (the engine's Σ
   * doctrine) — no ln/exp at all, so the curve is reproducible across
   * engines with no transcendental in sight. exp(−H) (the
   * Fleming-Harrington survival estimate) is deliberately left to the
   * caller.
   *
   * Shape: identical to KM — one grouped count by duration
   * (|distinct times| rows), one ordered window over that bounded
   * relation; the subject table is touched once.
   *
   * Output (event times only): (t, n_risk, n_event, n_censored,
   * cumhazard).
   */
  def nelsonAalen(df: DataFrame, durationCol: String,
      eventCol: Column): DataFrame = {
    val total = df.count()
    val byT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(eventCol, 1L).otherwise(0L)).as("n_event"),
        sum(when(eventCol, 0L).otherwise(1L)).as("n_censored"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("__gone", sum(col("n_event") + col("n_censored")).over(w))
      .withColumn("n_risk",
        lit(total) - col("__gone") + col("n_event") + col("n_censored"))
      .withColumn("__term", round(
        col("n_event").cast("double") / col("n_risk").cast("double"), 12))
      .withColumn("cumhazard", round(
        sum(col("__term").cast("decimal(24,12)")).over(w).cast("double"), 6))
      .where(col("n_event") > 0)
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        col("cumhazard"))
  }

  /**
   * Restricted mean survival time (RMST; Royston & Parmar 2013) — the
   * area under the [[kaplanMeier]] curve up to a chosen horizon τ:
   * "average event-free time over the first τ seconds", the single
   * effect-size number a whole survival curve collapses to, and the
   * standard alternative to hazard ratios when proportional hazards is
   * dubious. ∫₀^τ S(t)dt over a step curve is a finite sum of
   * rectangles: 1·min(t₁,τ) for the leading all-alive segment, then
   * S(tᵢ)·(min(tᵢ₊₁,τ)−tᵢ) per event time below τ.
   *
   * Determinism: each rectangle multiplies the PUBLISHED 6dp survival by
   * an exact long width (exact DECIMAL(38,6) products), DECIMAL-summed
   * (the Σ doctrine) — one final double cast, 6dp. The lead window runs
   * over the KM curve relation (|distinct event times| rows — the same
   * bounded class kaplanMeier's own cumulative window already uses).
   *
   * Output: one row (tau, n, n_events, rmst) — n_events counts events
   * strictly below τ (the drops that shape the integrated area).
   */
  def rmst(df: DataFrame, durationCol: String, eventCol: Column,
      tau: Long): DataFrame = {
    require(tau >= 1, "rmst: tau >= 1")
    val km = kaplanMeier(df, durationCol, eventCol)
      .select(col("t"), col("n_event"), col("survival"))
    val w = Window.orderBy(col("t"))
    val seg = km.where(col("t") < tau)
      .withColumn("__end",
        least(coalesce(lead(col("t"), 1).over(w), lit(tau)), lit(tau)))
      .withColumn("__area",
        (col("survival").cast("decimal(24,6)")
          * (col("__end") - col("t")).cast("decimal(38,0)"))
          .cast("decimal(38,6)"))
    val tail = seg.agg(
      coalesce(sum(col("__area")), lit(0).cast("decimal(38,6)")).as("__tail"),
      coalesce(sum(col("n_event")), lit(0L)).as("n_events"),
      // leading rectangle ends at the FIRST event time (or τ if none
      // falls below it): survival is 1.0 there by definition
      coalesce(min(col("t")), lit(tau)).as("__t1"))
    val n = df.count()
    tail.select(lit(tau).as("tau"), lit(n).as("n"), col("n_events"),
      round((col("__t1").cast("decimal(38,6)") + col("__tail"))
        .cast("double"), 6).as("rmst"))
  }

  /**
   * Survival quantiles — median (and friends) survival time read off
   * the [[kaplanMeier]] curve: t_q = the first event time where the
   * PUBLISHED 6dp survival drops to ≤ q. "Median time to churn" is the
   * single most-quoted survival number; unlike a plain median of
   * observed durations it is censoring-correct. A curve that never
   * reaches q (heavy censoring) publishes NULL — loudly undefined, the
   * standard convention.
   *
   * Shape: the bounded KM curve cross-joined with the ≤16 requested
   * quantiles, one (q) min-aggregation. Output per q (desc): (q, t_q,
   * survival_at) where survival_at is the curve value AT t_q.
   */
  def survivalQuantiles(df: DataFrame, durationCol: String,
      eventCol: Column, qs: Seq[Double] = Seq(0.75, 0.5, 0.25)): DataFrame = {
    require(qs.nonEmpty && qs.size <= 16, "1..16 quantiles")
    require(qs.forall(q => q > 0 && q < 1), "quantiles in (0,1)")
    require(qs.distinct.size == qs.size, "duplicate quantiles")
    val spark = df.sparkSession
    import spark.implicits._
    val km = kaplanMeier(df, durationCol, eventCol)
      .select(col("t"), col("survival")).localCheckpoint(true)
    val qDf = qs.map(q => BigDecimal(q).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble).toDF("q")
    val hit = qDf.join(km, km("survival") <= qDf("q"), "left")
      .groupBy(col("q")).agg(min(col("t")).as("t_q"))
    hit.join(km.select(col("t").as("t_q"), col("survival").as("survival_at")),
        Seq("t_q"), "left")
      .select(col("q"), col("t_q"), col("survival_at"))
      .orderBy(col("q").desc)
  }

  def logRank(df: DataFrame, durationCol: String, eventCol: Column,
      groupCol: Column): DataFrame = {
    val subj = df.select(groupCol.cast("string").as("g"),
      col(durationCol).cast("long").as("t"), eventCol.as("ev"))
    val byT = subj.groupBy(col("g"), col("t"))
      .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("ne"),
        sum(when(col("ev"), 0L).otherwise(1L)).as("nc"))
    val totals = subj.groupBy(col("g")).agg(count(lit(1)).as("total"))
    val pooled = byT.where(col("ne") > 0).select(col("t")).distinct()
    val groups = totals.select(col("g"))
    val marked = byT
      .unionByName(groups.crossJoin(pooled)
        .select(col("g"), col("t"), lit(0L).as("ne"), lit(0L).as("nc")))
      .groupBy(col("g"), col("t"))
      .agg(sum(col("ne")).as("ne"), sum(col("nc")).as("nc"))
    val wStrict = Window.partitionBy(col("g")).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val risk = marked
      .withColumn("__gone", coalesce(sum(col("ne") + col("nc")).over(wStrict), lit(0L)))
      .join(totals, "g")
      .withColumn("n_risk", col("total") - col("__gone"))
      .join(pooled, Seq("t"), "left_semi")
    val gs = totals.orderBy(col("g")).collect().map(_.getString(0))
    require(gs.length == 2, s"logRank needs exactly two groups, got ${gs.toSeq}")
    val a = risk.where(col("g") === gs(0))
      .select(col("t"), col("ne").as("d1"), col("n_risk").as("n1"))
    val b = risk.where(col("g") === gs(1))
      .select(col("t"), col("ne").as("d2"), col("n_risk").as("n2"))
    val terms = a.join(b, "t")
      .withColumn("dj", col("d1") + col("d2"))
      .withColumn("nj", col("n1") + col("n2"))
      .where(col("dj") > 0 && col("nj") > 0)
      .withColumn("__e", round(col("dj").cast("double") * col("n1").cast("double")
        / col("nj").cast("double"), 12).cast("decimal(24,12)"))
      .withColumn("__v", when(col("nj") > 1, round(
        col("dj").cast("double") * (col("n1").cast("double") / col("nj").cast("double"))
          * (lit(1.0) - col("n1").cast("double") / col("nj").cast("double"))
          * (col("nj") - col("dj")).cast("double") / (col("nj") - 1L).cast("double"),
        12)).otherwise(lit(0.0)).cast("decimal(24,12)"))
    val na = totals.where(col("g") === gs(0)).select(col("total")).head().getLong(0)
    val nb = totals.where(col("g") === gs(1)).select(col("total")).head().getLong(0)
    terms.agg(sum(col("d1")).as("o_a"), sum(col("__e")).as("__esum"),
        sum(col("__v")).as("__vsum"))
      .select(lit(gs(0)).as("group_a"), lit(gs(1)).as("group_b"),
        lit(na).as("n_a"), lit(nb).as("n_b"), col("o_a"),
        round(col("__esum").cast("double"), 6).as("e_a"),
        round(col("__vsum").cast("double"), 6).as("v_sum"),
        when(col("__vsum") > 0, round(
          (col("o_a").cast("double") - col("__esum").cast("double"))
            / sqrt(col("__vsum").cast("double")), 6)).as("z"))
  }

  /**
   * Aalen–Johansen cumulative incidence under COMPETING RISKS (Aalen &
   * Johansen 1978): when a subject can exit by more than one cause
   * (churned vs converted, bounced vs purchased), 1−KM per cause
   * OVERSTATES every cause's incidence — the correct per-cause
   * probability is CIF_k(t) = Σ_{tᵢ≤t} S(tᵢ⁻)·d_{k,i}/nᵢ, with S(t⁻)
   * the ALL-CAUSE Kaplan-Meier just before t. `causeCol`: 0/NULL =
   * censored, any other integer = a competing event cause.
   *
   * Determinism: the all-cause S(t⁻) is the [[kaplanMeier]] machinery
   * verbatim (12dp ln terms, DECIMAL running sum, explicit zero flag —
   * here over the STRICTLY-EARLIER frame); each CIF increment is
   * 12dp-rounded and DECIMAL-summed per cause (the Σ doctrine). Shape:
   * subjects touched ONCE (one (t, cause) groupBy); every window runs
   * over the bounded |distinct times| relation.
   *
   * Output (per event time × cause with events): (t, cause, n_risk,
   * n_event, s_minus, cif), ordered by (cause, t). Σ_k CIF_k(∞) =
   * 1 − S(∞) — the incidences partition the exits, which is the whole
   * point.
   */
  def aalenJohansen(df: DataFrame, durationCol: String,
      causeCol: Column): DataFrame = {
    val total = df.count()
    val byTC = df.groupBy(col(durationCol).cast("long").as("t"),
        coalesce(causeCol.cast("long"), lit(0L)).as("cause"))
      .agg(count(lit(1)).as("cnt")).cache()
    val byT = byTC.groupBy(col("t")).agg(
      sum(when(col("cause") =!= 0L, col("cnt")).otherwise(0L)).as("n_event"),
      sum(when(col("cause") === 0L, col("cnt")).otherwise(0L)).as("n_censored"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val curve = byT
      .withColumn("__gone", sum(col("n_event") + col("n_censored")).over(w))
      .withColumn("n_risk",
        lit(total) - col("__gone") + col("n_event") + col("n_censored"))
      .withColumn("__zero", (col("n_event") === col("n_risk")).cast("int"))
      .withColumn("__term", when(col("__zero") === 1, lit(0.0))
        .otherwise(round(log(lit(1.0) -
          col("n_event").cast("double") / col("n_risk").cast("double")), 12)))
      .withColumn("__logprev", coalesce(
        sum(col("__term").cast("decimal(24,12)")).over(wPrev),
        lit(0).cast("decimal(24,12)")))
      .withColumn("__zprev", coalesce(max(col("__zero")).over(wPrev), lit(0)))
      .withColumn("s_minus", when(col("__zprev") === 1, lit(0.0))
        .otherwise(exp(col("__logprev").cast("double"))))
    val wc = Window.partitionBy(col("cause")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = byTC.where(col("cause") =!= 0L)
      .join(curve.select(col("t"), col("n_risk"), col("s_minus")), "t")
      .withColumn("__inc", round(col("s_minus")
        * col("cnt").cast("double") / col("n_risk").cast("double"), 12)
        .cast("decimal(24,12)"))
      .withColumn("cif", round(sum(col("__inc")).over(wc).cast("double"), 6))
      .select(col("t"), col("cause"), col("n_risk"), col("cnt").as("n_event"),
        round(col("s_minus"), 6).as("s_minus"), col("cif"))
      .orderBy("cause", "t")
      .localCheckpoint(true) // bounded: |event times × causes| rows
    byTC.unpersist(false)
    out
  }

  /**
   * Harrell's concordance index for a binary risk marker — the
   * DISCRIMINATION read that completes the Cox family: [[coxBinary]]
   * says how large the hazard ratio is, C says how often the marker
   * actually ORDERS pairs correctly (the survival analog of ROC-AUC;
   * 0.5 = coin flip). A pair is comparable when the earlier subject's
   * time is an EVENT and the partner's observed time is strictly
   * later; concordant when the earlier-event subject carries the
   * higher risk mark, half-credit on marker ties.
   *
   * Exactness + shape: everything reduces to the per-distinct-time
   * relation — event counts at t and strictly-later counts per arm
   * from [[DistDrift.withPrefixSums]]' below-sums (later = total −
   * below − at). The doubled numerator and the denominator are exact
   * integer sums (DECIMAL(38,0) — products of two counts), C is ONE
   * double divide, 6dp. No pair join anywhere.
   *
   * Output: one row (n, n_events, n_comparable, c_index) — NULL C
   * when no pair is comparable.
   */
  def concordanceBinary(df: DataFrame, durationCol: String,
      eventCol: Column, exposedCol: Column): DataFrame = {
    val subj = df.select(col(durationCol).cast("long").as("t"),
        eventCol.as("ev"), exposedCol.as("x"))
      .where(col("t").isNotNull && col("ev").isNotNull && col("x").isNotNull)
    val perT = subj.groupBy(col("t").as("v")).agg(
      sum(when(col("x"), 1L).otherwise(0L)).as("a1"),
      sum(when(col("x"), 0L).otherwise(1L)).as("a0"),
      sum(when(col("ev") && col("x"), 1L).otherwise(0L)).as("e1"),
      sum(when(col("ev") && !col("x"), 1L).otherwise(0L)).as("e0"))
    val tot = perT.agg(coalesce(sum(col("a1")), lit(0L)),
      coalesce(sum(col("a0")), lit(0L)),
      coalesce(sum(col("e1") + col("e0")), lit(0L))).head()
    val (n1, n0, nEv) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val cum = DistDrift.withPrefixSums(perT, Seq("a1", "a0"))
    val l1 = lit(n1) - col("a1_below") - col("a1")
    val l0 = lit(n0) - col("a0_below") - col("a0")
    val agg = cum.agg(
      sum(d(col("e1")) * d(l0) * 2 + d(col("e1")) * d(l1)
        + d(col("e0")) * d(l0)).as("num2"),
      sum(d(col("e1") + col("e0")) * d(l1 + l0)).as("den")).head()
    val (num2, den) = (Option(agg.getDecimal(0)).map(BigDecimal(_))
      .getOrElse(BigDecimal(0)),
      Option(agg.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0)))
    val spark = df.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c = if (den > 0)
      Some(r6(num2.toDouble / (2.0 * den.toDouble))) else None
    Seq((n1 + n0, nEv, den.toLong, c))
      .toDF("n", "n_events", "n_comparable", "c_index")
  }

  /**
   * STRATIFIED Cox (binary covariate) — the adjustment [[coxBinary]]
   * cannot make: pooling risk sets across calendar months / cohorts /
   * sites assumes they share one baseline hazard, and a confounded
   * baseline biases the hazard ratio exactly like Simpson's paradox
   * biases a pooled odds ratio (the q294→q375 story, in time-to-event
   * form). Stratification keeps ONE β but lets every stratum carry its
   * own baseline: the partial likelihood is the SUM of per-stratum
   * event-time terms, so risk sets never cross strata.
   *
   * Mechanics are [[coxBinary]] verbatim with (stratum, time) keys:
   * exact risk sets from a stratum-PARTITIONED strictly-below window
   * over the bounded per-(stratum, time) relation, 12dp-decimal U/I
   * terms, 12dp-rerounded β and e^β per Newton step. Output as
   * [[coxBinary]] plus n_strata.
   */
  def coxStratified(df: DataFrame, durationCol: String, eventCol: Column,
      exposedCol: Column, strataCol: Column, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in [1,20]: $iters")
    val subj = df.select(strataCol.cast("string").as("g"),
        col(durationCol).cast("long").as("t"),
        eventCol.as("ev"), exposedCol.as("x"))
      .where(col("g").isNotNull && col("t").isNotNull &&
        col("ev").isNotNull && col("x").isNotNull)
    val perT = subj.groupBy(col("g"), col("t")).agg(
      sum(when(col("x"), 1L).otherwise(0L)).as("a1"),
      sum(when(col("x"), 0L).otherwise(1L)).as("a0"),
      sum(when(col("ev") && col("x"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"))
    val wg = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = Window.partitionBy(col("g"))
    val evt = perT
      .withColumn("r1", sum(col("a1")).over(totals)
        - coalesce(sum(col("a1")).over(wg), lit(0L)))
      .withColumn("r0", sum(col("a0")).over(totals)
        - coalesce(sum(col("a0")).over(wg), lit(0L)))
      .where(col("d") > 0)
      .select(col("d"), col("d1"), col("r1"), col("r0"))
      .localCheckpoint(true)
    val t = subj.agg(count(lit(1)),
      coalesce(sum(when(col("ev"), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("ev") && col("x"), 1L).otherwise(0L)), lit(0L)),
      countDistinct(col("g"))).head()
    val (n, sumD, sumD1, nStrata) =
      (t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3))
    val spark = df.sparkSession
    import spark.implicits._
    def nullRow: DataFrame =
      Seq((n, nStrata, sumD, sumD1))
        .toDF("n", "n_strata", "n_events", "d1_exposed")
        .withColumn("beta", lit(null).cast("double"))
        .withColumn("hr", lit(null).cast("double"))
        .withColumn("se", lit(null).cast("double"))
        .withColumn("z", lit(null).cast("double"))
    if (sumD == 0) { nullRow }
    else {
      def r12(x: Double): Double =
        BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      def sums(beta: Double): (Double, Double) = {
        val eb = r12(math.exp(beta))
        val p = (col("r1").cast("double") * lit(eb)) /
          (col("r0").cast("double") + col("r1").cast("double") * lit(eb))
        val r = evt.agg(
          sum(round(col("d").cast("double") * p, 12)
            .cast("decimal(38,12)")).as("su"),
          sum(round(col("d").cast("double") * p * (lit(1.0) - p), 12)
            .cast("decimal(38,12)")).as("si")).head()
        (r.getDecimal(0).doubleValue, r.getDecimal(1).doubleValue)
      }
      val d1d = sumD1.toDouble
      var beta = 0.0
      var degenerate = false
      var k = 0
      while (k < iters && !degenerate) {
        val (su, si) = sums(beta)
        if (si <= 0.0) degenerate = true
        else beta = r12(beta + (d1d - su) / si)
        k += 1
      }
      if (degenerate) { nullRow }
      else {
        val (_, si) = sums(beta)
        if (si <= 0.0) { nullRow }
        else {
          val se = 1.0 / math.sqrt(si)
          val z = beta / se
          def r6(x: Double) =
            BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Seq((n, nStrata, sumD, sumD1, r6(beta), r6(math.exp(beta)),
            r6(se), r6(z)))
            .toDF("n", "n_strata", "n_events", "d1_exposed", "beta", "hr",
              "se", "z")
        }
      }
    }
  }

  /**
   * Cox proportional hazards with ONE binary covariate (Cox 1972,
   * Breslow ties) — the EFFECT SIZE the survival shelf lacked:
   * [[logRank]] says the arms differ, Cox says BY HOW MUCH (hazard
   * ratio e^β), adjusting for the whole censoring structure. With a
   * binary covariate the partial likelihood collapses onto the
   * per-event-time relation: at each event time t with d events (d₁ of
   * them exposed) and risk counts (r₀, r₁),
   *
   *   U(β) = Σd₁ − Σ_t d·p(t),   I(β) = Σ_t d·p(t)·(1−p(t)),
   *   p(t) = r₁e^β / (r₀ + r₁e^β)
   *
   * and β̂ is `iters` Newton steps β ← β + U/I from β₀ = 0 — each step
   * ONE map-combined aggregation over the bounded |distinct times|
   * relation, nothing subject-sized after the first pass.
   *
   * Determinism: (d, d₁, r₀, r₁) are exact longs (risk sets = totals −
   * distributed strictly-below prefix sums, the [[DistDrift
   * .withPrefixSums]] machinery); per-time U/I terms round 12dp and
   * DECIMAL-sum; β re-rounds 12dp per step (the q366 iteration
   * doctrine), so the whole Newton path replays verbatim in SQL. The
   * one transcendental (e^β of a 12dp scalar) is the shelf's accepted
   * ln/exp parity. Degenerate information (no events, or an arm never
   * at risk → I = 0) publishes NULL estimates instead of diverging.
   *
   * Output: one row (n, n_events, d1_exposed, beta, hr, se, z) — 6dp.
   */
  def coxBinary(df: DataFrame, durationCol: String, eventCol: Column,
      exposedCol: Column, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters in [1,20]: $iters")
    val subj = df.select(col(durationCol).cast("long").as("t"),
        eventCol.as("ev"), exposedCol.as("x"))
      .where(col("t").isNotNull && col("ev").isNotNull && col("x").isNotNull)
    val perT = subj.groupBy(col("t").as("v")).agg(
      sum(when(col("x"), 1L).otherwise(0L)).as("a1"),
      sum(when(col("x"), 0L).otherwise(1L)).as("a0"),
      sum(when(col("ev") && col("x"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("ev"), 1L).otherwise(0L)).as("d"))
    val tot = perT.agg(coalesce(sum(col("a1")), lit(0L)),
      coalesce(sum(col("a0")), lit(0L)), coalesce(sum(col("d1")), lit(0L)),
      coalesce(sum(col("d")), lit(0L))).head()
    val (n1, n0, sumD1, sumD) =
      (tot.getLong(0), tot.getLong(1), tot.getLong(2), tot.getLong(3))
    val evt = DistDrift.withPrefixSums(perT, Seq("a1", "a0"))
      .where(col("d") > 0)
      .select(col("d"), col("d1"),
        (lit(n1) - col("a1_below")).as("r1"),
        (lit(n0) - col("a0_below")).as("r0"))
      .localCheckpoint(true) // |event times| rows, read once per step
    val spark = df.sparkSession
    import spark.implicits._
    def nullRow: DataFrame =
      Seq((n1 + n0, sumD, sumD1)).toDF("n", "n_events", "d1_exposed")
        .withColumn("beta", lit(null).cast("double"))
        .withColumn("hr", lit(null).cast("double"))
        .withColumn("se", lit(null).cast("double"))
        .withColumn("z", lit(null).cast("double"))
    if (sumD == 0) { nullRow }
    else {
      def r12(x: Double): Double =
        BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      // e^β re-rounds 12dp so a 1-ulp exp() disagreement between
      // engines cannot propagate into every term's rounding
      def sums(beta: Double): (Double, Double) = {
        val eb = r12(math.exp(beta))
        val p = (col("r1").cast("double") * lit(eb)) /
          (col("r0").cast("double") + col("r1").cast("double") * lit(eb))
        val r = evt.agg(
          sum(round(col("d").cast("double") * p, 12)
            .cast("decimal(38,12)")).as("su"),
          sum(round(col("d").cast("double") * p * (lit(1.0) - p), 12)
            .cast("decimal(38,12)")).as("si")).head()
        (r.getDecimal(0).doubleValue, r.getDecimal(1).doubleValue)
      }
      val d1d = sumD1.toDouble
      var beta = 0.0
      var degenerate = false
      var k = 0
      while (k < iters && !degenerate) {
        val (su, si) = sums(beta)
        if (si <= 0.0) degenerate = true
        else beta = r12(beta + (d1d - su) / si)
        k += 1
      }
      if (degenerate) { nullRow }
      else {
        val (_, si) = sums(beta)
        if (si <= 0.0) { nullRow }
        else {
          val se = 1.0 / math.sqrt(si)
          val z = beta / se
          def r6(x: Double) =
            BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Seq((n1 + n0, sumD, sumD1, r6(beta), r6(math.exp(beta)), r6(se),
            r6(z))).toDF("n", "n_events", "d1_exposed", "beta", "hr", "se", "z")
        }
      }
    }
  }
}
