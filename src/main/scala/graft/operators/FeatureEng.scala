package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Feature-engineering primitives for model pipelines over warehouse
 * tables, in the engine's exact-arithmetic doctrine: every published
 * statistic is an integer rational of exact counts/unit-sums with ONE
 * double division at the end (the q262 lesson — multi-term double
 * chains are not engine-reproducible; single divides of exactly-
 * converted integers are).
 *
 *  - [[targetEncode]]: smoothed mean-target encoding (Micci-Barreca
 *    2001) — the high-cardinality categorical encoder one-hot can't be.
 *  - [[decisionStump]]: the best single-threshold Gini split — the
 *    one-feature baseline model and the building block boosted trees
 *    repeat; also the cheapest "is this feature predictive at all"
 *    probe.
 *
 * Reference anchor: none (no ML surface in the reference); extends the
 * evaluation family (rocAuc/averagePrecision/calibration).
 */
object FeatureEng {

  /**
   * Smoothed mean-target encoding per category: with per-category count
   * c and unit-sum s, global N and S, pseudo-count m,
   *   enc = (s + m·(S/N)) / (c + m) = (s·N + m·S) / (N·(c + m))
   * — the right-hand form clears the prior's denominator so the encode
   * is ONE divide of exact DECIMAL(38,0) integers (bound: s·N < 10³⁸).
   * A category with few rows shrinks toward the global prior instead of
   * memorizing its target — the leakage-prone naive mean does not.
   * One groupBy + a broadcast scalar join; no windows, no second pass.
   * Output per category: (category, n, sum_units, raw_mean, enc), 6dp.
   */
  def targetEncode(df: DataFrame, catCol: Column, unitsCol: Column,
      m: Long): DataFrame = {
    require(m >= 0, "pseudo-count m must be >= 0")
    val s = df.select(catCol.cast("string").as("category"),
        unitsCol.cast("long").as("u"))
      .where(col("category").isNotNull && col("u").isNotNull)
    val per = s.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("u")).as("sum_units"))
    val tot = s.agg(count(lit(1)).as("__N"), sum(col("u")).as("__S"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    per.crossJoin(broadcast(tot))
      .select(col("category"), col("n"), col("sum_units"),
        round(col("sum_units").cast("double") / col("n").cast("double"), 6)
          .as("raw_mean"),
        round((d(col("sum_units")) * d(col("__N")) + lit(m) * d(col("__S")))
            .cast("double")
          / (d(col("__N")) * (d(col("n")) + lit(m))).cast("double"), 6)
          .as("enc"))
  }

  /**
   * Weight-of-evidence encoding + information value (the credit-scoring
   * standard, Siddiqi 2006) — the categorical encoder whose output
   * doubles as a feature-strength audit: per category,
   *
   *   WoE(c) = ln( dp(c) / dn(c) ),   IV = Σ_c (dp(c) − dn(c))·WoE(c)
   *
   * with dp = (pos_c + 1)/(P + k) and dn = (neg_c + 1)/(NN + k) the
   * Laplace-smoothed positive/negative distributions over k categories
   * (integer +1 smoothing keeps every ratio an EXACT integer rational —
   * half-count variants do not). IV reads on the standard scale: < 0.02
   * useless, > 0.3 strong, > 0.5 suspicious (leakage).
   *
   * Determinism: WoE is ln of ONE divide of exact DECIMAL(38,0) products
   * ((pos+1)·(NN+k) over (neg+1)·(P+k)), 12dp-rounded (the ln doctrine —
   * KM/MI/Zipf precedent); the IV term multiplies the cleared-form
   * dp−dn (one exact-decimal divide) by the PUBLISHED 12dp WoE, rounds
   * 12dp, and DECIMAL-sums. One groupBy + one broadcast totals join; no
   * windows. Output per category: (category, n, n_pos, n_neg, woe,
   * iv_term, iv) — iv repeated for self-containment, 6dp.
   */
  def woeEncode(df: DataFrame, catCol: Column, labelCol: Column): DataFrame = {
    val s = df.select(catCol.cast("string").as("category"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .where(col("category").isNotNull)
    val per = s.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
      .localCheckpoint(true) // feeds k, the totals, and the scored scan
    val k = per.count() // bounded: the category relation
    require(k >= 1, "woeEncode: empty input")
    val tot = per.agg(sum(col("n_pos")).as("__P"), sum(col("n_neg")).as("__NN"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val dpNum = (d(col("n_pos")) + 1) * (d(col("__NN")) + lit(k))
    val dnNum = (d(col("n_neg")) + 1) * (d(col("__P")) + lit(k))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("woe",
        round(log(dpNum.cast("double") / dnNum.cast("double")), 12))
      .withColumn("iv_term", round(
        (dpNum - dnNum).cast("double")
          / ((d(col("__P")) + lit(k)) * (d(col("__NN")) + lit(k)))
            .cast("double")
          * col("woe"), 12))
    val iv = scored.agg(
      round(sum(col("iv_term").cast("decimal(38,12)")).cast("double"), 6)
        .as("iv"))
    scored.crossJoin(broadcast(iv))
      .select(col("category"), col("n"), col("n_pos"), col("n_neg"),
        col("woe"), col("iv_term"), col("iv"))
      .orderBy(col("category"))
  }

  /**
   * Best single-threshold Gini split of a numeric score against a
   * boolean label. Thresholds are the DISTINCT score values (left =
   * score ≤ v), their cumulative pos/row counts come from the bucketed
   * prefix sums of [[DistDrift.withPrefixSums]] — no full-relation
   * window, candidate relation bounded by score cardinality. Node Gini
   * 2p(n−p)/n² makes the weighted-split cost the exact rational
   *   cost(v) = 2·[p_l(n_l−p_l)·n_r + p_r(n_r−p_r)·n_l] / (N·n_l·n_r)
   * — ONE divide per candidate of DECIMAL(38,0) integers, argmin
   * tie-breaks to the smallest threshold; `gain` composes from the
   * PUBLISHED 6dp parent/split Ginis. Output: one row (n, n_pos,
   * threshold, n_left, pos_left, n_right, pos_right, gini_parent,
   * gini_split, gain).
   */
  /**
   * Percentile-rank (quantile-normalize) transform — the monotone
   * feature map that makes heavy-tailed columns comparable across
   * sources and models (rank-based calibration, the Spearman/q260
   * worldview applied as a TRANSFORM): each distinct integer value v
   * publishes its mid-rank percentile
   *
   *   pct(v) = (2·below(v) + cnt(v) + 1) / (2·n)
   *
   * (half-unit mid-rank over ties — min value with cnt 1 gets 1/n, max
   * gets exactly 1.0). below comes from [[DistDrift.withPrefixSums]]'
   * distributed prefix sums over the DISTINCT-value relation, so no row
   * ever passes through a window and the result is bounded by value
   * cardinality, not row count; apply to rows by joining back on v.
   * ONE double divide per distinct value, 6dp.
   * Output: (v, cnt, n_below, pct) ordered by v.
   */
  def percentileRank(df: DataFrame, valueCol: Column): DataFrame = {
    val s = df.select(valueCol.cast("long").as("v")).where(col("v").isNotNull)
    val perValue = s.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val tot = s.agg(count(lit(1)).as("__n"))
    DistDrift.withPrefixSums(perValue, Seq("cnt"))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("cnt"), col("cnt_below").as("n_below"),
        round((lit(2L) * col("cnt_below") + col("cnt") + 1L).cast("double")
          / (lit(2L) * col("__n")).cast("double"), 6).as("pct"))
      .orderBy(col("v"))
  }

  /**
   * Isotonic calibration by pool-adjacent-violators (PAVA; Barlow et al.
   * 1972) — the non-parametric score→probability map: the best
   * MONOTONE fit of label rate to score, the calibrator that fixes what
   * [[Experiment.calibration]]'s binned ECE only measures. Runs on the
   * per-DISTINCT-score (n, pos) relation: the heavy pass is one
   * distributed aggregation; PAVA itself is inherently sequential, so
   * it runs driver-side on the bounded distinct relation (`maxDistinct`
   * loud contract — the BPE-vocab house pattern; quantize scores
   * upstream, exactly as every isotonic implementation does). Violator
   * comparisons are EXACT cross-multiplied integers (BigInt — no float
   * mean ever compared); each block's rate takes ONE double divide,
   * 6dp. The fit equals the minimax characterization
   * max_{j≤i} min_{k≥i} mean(y[j..k]) — which is what the independent
   * oracle computes, so a pooling bug cannot hash-match.
   * Output: (v, n, pos, p_iso) per distinct score, ordered by v,
   * p_iso non-decreasing.
   */
  def isotonicCalibrate(df: DataFrame, scoreCol: Column, labelCol: Column,
      maxDistinct: Long = 100000L): DataFrame = {
    val s = df.select(scoreCol.cast("long").as("v"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .where(col("v").isNotNull)
    val per = s.groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val nd = per.count()
    require(nd >= 1, "isotonicCalibrate: empty input")
    require(nd <= maxDistinct,
      s"isotonicCalibrate: $nd distinct scores > maxDistinct=$maxDistinct — " +
        "PAVA is sequential; quantize the score upstream or raise the bound")
    val rows = per.orderBy(col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    rows.foreach { case (_, n0, p0) =>
      var (cn, cp, cs) = (n0, p0, 1)
      // pool while the previous block's rate EXCEEDS this one's (exact
      // integer compare; pooling equal rates would not change any value)
      while (st.nonEmpty && BigInt(st.last._2) * cn > BigInt(cp) * st.last._1) {
        val (pn, pp, ps) = st.remove(st.size - 1)
        cn += pn; cp += pp; cs += ps
      }
      st += ((cn, cp, cs))
    }
    val fits = st.toSeq.flatMap { case (n0, p0, span) =>
      val p = BigDecimal(p0.toDouble / n0.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq.fill(span)(p)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.zip(fits).map { case ((v, n0, p0), p) => (v, n0, p0, p) }.toSeq
      .toDF("v", "n", "pos", "p_iso")
  }

  /**
   * QUANTILE NORMALIZATION onto the pooled distribution (the
   * microarray-era technique, Bolstad et al. 2003, batch-effect removal
   * for features): every group's value v is replaced by the POOLED
   * distribution's value at the same quantile, making all groups share
   * one marginal distribution exactly — where [[percentileRank]] maps
   * into [0,1], this maps back into the VALUE domain of the corpus.
   *
   * Definition (type-1 inverse CDF, max-rank over ties): for a group-g
   * value v with cumulative in-group count r = cum_g(v) out of n_g, its
   * pooled position is pos = ⌈r·N/n_g⌉ and the normalized value is the
   * smallest pooled value q with cum_pool(q) ≥ pos. All integer: pos
   * computes as (r·N + n_g − 1) div n_g in DECIMAL(38,0) (r·N overflows
   * long at warehouse scale), and the lookup compares exact longs — no
   * float enters at any point, so the map is engine-reproducible.
   *
   * Shape: everything runs on the DISTINCT (group, value) relation —
   * per-group ranks from a window PARTITIONED by group, the pooled
   * lookup as ONE ordered merge (the AsOfJoin union-window trick: ref
   * rows keyed by exclusive cum-below, probe rows by pos−1, last
   * ref value carried forward). The merge window is unpartitioned BY
   * CONTRACT — it orders ≤ (|groups|+1)·`maxDistinct` rows (the
   * isotonic/theilSen bounded-relation class, loud require below);
   * quantize the value upstream to stay inside it. Rows never enter
   * any window; apply to rows by joining back on (group, value).
   *
   * Output: (g, v, cnt, pos, q_norm) per distinct (group, value),
   * ordered. q_norm is a value the pooled corpus actually contains.
   */
  def quantileNormalize(df: DataFrame, groupCol: Column, valueCol: Column,
      maxDistinct: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = df.select(groupCol.cast("string").as("g"),
        valueCol.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
    val per = s.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // feeds ranks, pooled ref, and the probe side
    val ndist = per.select(col("v")).distinct().count()
    require(ndist >= 1, "quantileNormalize: empty input")
    require(ndist <= maxDistinct,
      s"quantileNormalize: $ndist distinct values > maxDistinct=$maxDistinct " +
        "— the pooled merge orders the distinct relation; quantize the " +
        "value upstream or raise the bound")
    val nPool = s.count()
    val nG = per.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val wG = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val probes = per
      .withColumn("r_g", sum(col("cnt")).over(wG))
      .join(nG, "g")
      // ceil(r·N / n_g) in exact decimal; pos ≤ N fits a long again
      .withColumn("pos",
        floor((d(col("r_g")) * d(lit(nPool)) + d(col("n_g")) - d(lit(1L)))
          / d(col("n_g"))).cast("long"))
    val pooled = per.groupBy(col("v")).agg(sum(col("cnt")).as("cp"))
    val wP = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = pooled
      .withColumn("k", coalesce(sum(col("cp")).over(wP), lit(0L)))
      .select(col("k"), lit(0).as("side"), col("v").as("ref_v"),
        lit(null).cast("string").as("g"), lit(null).cast("long").as("v"),
        lit(null).cast("long").as("cnt"), lit(null).cast("long").as("pos"))
    val pr = probes.select((col("pos") - 1L).as("k"), lit(1).as("side"),
      lit(null).cast("long").as("ref_v"), col("g"), col("v"), col("cnt"),
      col("pos"))
    // ref sorts before probes at equal key: a probe at pos = cb+1 takes
    // THIS ref value (its interval starts there), matching <= semantics
    val wM = Window.orderBy(col("k"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref.unionByName(pr)
      .withColumn("q_norm", last(col("ref_v"), ignoreNulls = true).over(wM))
      .where(col("side") === 1)
      .select(col("g"), col("v"), col("cnt"), col("pos"), col("q_norm"))
      .orderBy(col("g"), col("v"))
  }

  /**
   * Feature ranking by best-split Gini gain — [[decisionStump]] run per
   * candidate feature, ranked by how much a single threshold on each
   * explains the label: the standard "which columns are predictive AT
   * ALL" triage before any model is trained, and the per-feature split
   * criterion a boosted-tree layer would compute anyway. Each feature's
   * stump is the exact-rational machinery (distinct-value prefix sums,
   * one divide per candidate); the loop is driver-side over the BOUNDED
   * feature list (≤ 64 by contract), each iteration fully distributed.
   * Ties in gain order by feature name — a total order.
   *
   * Output: (feature, n, n_pos, threshold, gini_parent, gini_split,
   * gain), best feature first.
   */
  def featureRank(df: DataFrame, features: Seq[(String, Column)],
      labelCol: Column): DataFrame = {
    require(features.nonEmpty && features.size <= 64,
      s"featureRank: 1..64 candidate features, got ${features.size}")
    require(features.map(_._1).distinct.size == features.size,
      "featureRank: duplicate feature names")
    // ALL candidate features ride ONE pipeline (the round-17 job-count
    // cut: the per-feature decisionStump loop ran a full prefix-sum
    // machinery per feature — measured 47 sequential jobs for 3
    // features): one explode turns each row into |features| (f, v, y)
    // rows in the same scan, one GROUPED prefix pass cumulates every
    // feature (per-feature totals ride the bucket collect), and the
    // per-feature argmin is a min_by aggregate ordered by the identical
    // (cost asc, v asc) key — v is unique per (f, v) row, so the
    // min_by tie case is unreachable and the selection matches the
    // stump's orderBy+limit(1) exactly.
    val spark = df.sparkSession
    val fs = array(features.map { case (n, c) =>
      struct(lit(n).as("f"), c.cast("double").as("v")) }: _*)
    val rows = df.select(explode(fs).as("fv"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .select(col("fv.f").as("f"), col("fv.v").as("v"), col("y"))
      .where(col("v").isNotNull)
    val pr = rows.agg(min(col("v")), max(col("v"))).head()
    val bounds = if (pr.isNullAt(0)) (0.0, 0.0)
      else (pr.getDouble(0), pr.getDouble(1))
    val perValue = rows.groupBy(col("f"), col("v"))
      .agg(count(lit(1)).as("ct"), sum(col("y")).as("cp"))
    val info = DistDrift.withPrefixSumsInfo(perValue, Seq("ct", "cp"),
      knownBounds = Some(bounds), groupCols = Seq("f"))
    val tots = features.map { case (name, _) =>
      val t = info.perGroupTotals.getOrElse(Seq(name),
        Map("ct" -> 0L, "cp" -> 0L))
      (name, t("ct"), t("cp"))
    }
    import spark.implicits._
    val totDf = tots.toDF("f", "__n", "__p")
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val nl = col("ct_below") + col("ct")
    val pl = col("cp_below") + col("cp")
    val nr = col("__n") - nl
    val pr2 = col("__p") - pl
    val cost = round(
      (lit(2L) * (d(pl) * (d(nl) - d(pl)) * d(nr)
        + d(pr2) * (d(nr) - d(pr2)) * d(nl))).cast("double")
      / (d(col("__n")) * d(nl) * d(nr)).cast("double"), 6)
    val parent = round((lit(2L) * d(col("__p")) * (d(col("__n")) - d(col("__p"))))
        .cast("double")
      / (d(col("__n")) * d(col("__n"))).cast("double"), 6)
    val best = info.df.join(broadcast(totDf), "f")
      .where(nl < col("__n"))
      .withColumn("__cost", cost)
      .groupBy(col("f").as("feature"))
      .agg(min_by(
        struct(col("__n").as("n"), col("__p").as("n_pos"),
          col("v").as("threshold"), parent.as("gini_parent"),
          col("__cost").as("gini_split")),
        struct(col("__cost"), col("v"))).as("b"))
    best.select(col("feature"), col("b.n").as("n"), col("b.n_pos").as("n_pos"),
        col("b.threshold").as("threshold"),
        col("b.gini_parent").as("gini_parent"),
        col("b.gini_split").as("gini_split"))
      .withColumn("gain", round(col("gini_parent") - col("gini_split"), 6))
      .orderBy(col("gain").desc, col("feature").asc)
  }

  def decisionStump(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val s = df.select(scoreCol.cast("double").as("v"),
        when(labelCol, 1L).otherwise(0L).as("y"))
      .where(col("v").isNotNull)
    val perValue = s.groupBy(col("v"))
      .agg(count(lit(1)).as("ct"), sum(col("y")).as("cp"))
    val tot = s.agg(count(lit(1)).as("__n"), sum(col("y")).as("__p"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val nl = col("ct_below") + col("ct")
    val pl = col("cp_below") + col("cp")
    val nr = col("__n") - nl
    val pr = col("__p") - pl
    val cost = round(
      (lit(2L) * (d(pl) * (d(nl) - d(pl)) * d(nr)
        + d(pr) * (d(nr) - d(pr)) * d(nl))).cast("double")
      / (d(col("__n")) * d(nl) * d(nr)).cast("double"), 6)
    val best = DistDrift.withPrefixSums(perValue, Seq("ct", "cp"))
      .crossJoin(broadcast(tot))
      .where(nl < col("__n"))
      .withColumn("__cost", cost)
      .orderBy(col("__cost").asc, col("v").asc)
      .limit(1)
    val parent = round((lit(2L) * d(col("__p")) * (d(col("__n")) - d(col("__p"))))
        .cast("double")
      / (d(col("__n")) * d(col("__n"))).cast("double"), 6)
    best.select(col("__n").as("n"), col("__p").as("n_pos"),
        col("v").as("threshold"), nl.as("n_left"), pl.as("pos_left"),
        nr.as("n_right"), pr.as("pos_right"),
        parent.as("gini_parent"), col("__cost").as("gini_split"))
      .withColumn("gain", round(col("gini_parent") - col("gini_split"), 6))
  }
}
