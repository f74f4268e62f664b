package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Irregular-time-series summaries over event streams, in the engine's
 * exact-arithmetic doctrine (cents × whole seconds — long products, long
 * sums, one published ratio):
 *
 *  - TWAP: the time-weighted average every metering/pricing pipeline
 *    needs on irregular samples — each observation holds until the next
 *    one, so its weight is that duration; a plain avg() over-weights
 *    bursts.
 *  - OHLC: open/high/low/close candle resampling; open/close are
 *    first/last under the TOTAL (ts, id) order, so candles are
 *    deterministic under timestamp ties.
 *
 * Both are ONE key-partitioned window/aggregation pass — no self-joins,
 * no per-bucket lookups. Reference anchor: none (no time-series surface
 * in the reference); extends the resample family (q156 gap-fill).
 */
object TimeSeries {

  /**
   * Per-key TWAP: (key, n_events, dur_s, twap) where twap = Σ(value·dur)
   * / Σ(dur) in value units, 6dp; dur is whole seconds until the NEXT
   * event of the same key (the last observation carries no weight —
   * there is nothing to hold it against). Keys with a single event (or
   * zero total duration) publish NULL.
   */
  def twap(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val withDur = df
      .withColumn("__t", col(tsCol).cast("long"))
      .withColumn("__dur", coalesce(lead(col("__t"), 1).over(w) - col("__t"), lit(0L)))
      .withColumn("__cents",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
    withDur.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__dur")).as("dur_s"),
        sum(col("__cents") * col("__dur")).as("__num"))
      .select(col(keyCol), col("n_events"), col("dur_s"),
        when(col("dur_s") > 0,
          round(col("__num").cast("double")
            / (col("dur_s").cast("double") * 100.0), 6)).as("twap"))
  }

  /**
   * CUSUM change-point detection per key, in EXACT long arithmetic via
   * the prefix-minimum identity: the textbook recursion
   * S_t = max(0, S_{t−1} + (x_t − target)) equals
   * S_t = P_t − min(0, min_{i≤t} P_i) for the prefix sums
   * P_t = Σ(x_i − target) — which turns an inherently sequential
   * statistic into TWO stacked window passes (prefix sum, running min)
   * with no recursion and no floats. An alarm is S_t > h.
   *
   * Output per key: (key, n, max_s, n_alarms, first_alarm_t) —
   * max drift in cents, alarm count, epoch-second of the first alarm
   * (null when none). Page (1954) statistic; target/h in cents.
   */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, targetCents: Long, hCents: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = df
      .withColumn("__d",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long") - lit(targetCents))
      .withColumn("__p", sum(col("__d")).over(w))
      .withColumn("__s", col("__p") - least(lit(0L), min(col("__p")).over(w)))
    scored.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max(col("__s")).as("max_s"),
        sum(when(col("__s") > hCents, 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__s") > hCents, col(tsCol).cast("long"))).as("first_alarm_t"))
  }

  /**
   * Offline single-changepoint detection per key — the retrospective
   * structural-break finder [[cusum]]'s online alarm isn't: over an
   * already-bucketed integer series, pick the split τ minimizing pooled
   * SSE, equivalently maximizing the variance-reduction gain
   * G(τ) = S_τ²/τ + (S_n−S_τ)²/(n−τ) − S_n²/n (binary segmentation's
   * one step, Scott & Knott 1974). Prefix sums are exact longs over a
   * key-partitioned window (series bounded by calendar buckets, keys
   * distributed — the [[holt]] scale shape). The gain is the exact
   * integer rational num/den with denominators CLEARED —
   * num = S_τ²(n−τ)n + S_r²τn − S_n²τ(n−τ) in DECIMAL(38,0), den =
   * τ(n−τ)n — because a 3-term double chain is NOT engine-reproducible
   * (contraction flipped the last ulp vs the oracle at 5e15); one
   * double division of exactly-converted integers is. Operand bound:
   * S_n²·n < 10³⁸ — cents-level daily sums to ~$10¹⁴ total per key.
   * Argmax tie-breaks to the earliest split. Output per key:
   * (key, n_buckets, cp_t — last LEFT bucket, n_left, mean_left,
   * mean_right, gain), 6dp in units / units².
   */
  def changepoint(bucketed: DataFrame, keyCol: String, tCol: String,
      unitsCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bucketed
      .select(col(keyCol).as("__k"), col(tCol).as("__t"),
        col(unitsCol).cast("long").as("__v"))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col("__k")).orderBy(col("__t"))).cast("long"))
      .withColumn("__s", sum(col("__v")).over(w))
    val tot = pre.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sn"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val slD = d(col("__s"))
    val srD = d(col("__sn")) - slD
    val iD = d(col("__i"))
    val nrD = d(col("__n")) - iD
    val nD = d(col("__n"))
    val cand = pre.join(tot, "__k").where(col("__i") < col("__n"))
      .withColumn("__num", slD * slD * nrD * nD + srD * srD * iD * nD
        - d(col("__sn")) * d(col("__sn")) * iD * nrD)
      .withColumn("__den", iD * nrD * nD)
      .withColumn("__gain",
        round(col("__num").cast("double") / col("__den").cast("double"), 6))
    val pick = Window.partitionBy(col("__k"))
      .orderBy(col("__gain").desc, col("__t").asc)
    cand.withColumn("__rn", row_number().over(pick)).where(col("__rn") === 1)
      .select(col("__k").as(keyCol), col("__n").as("n_buckets"),
        col("__t").as("cp_t"), col("__i").as("n_left"),
        round(col("__s").cast("double") / col("__i").cast("double"), 6)
          .as("mean_left"),
        round((col("__sn") - col("__s")).cast("double")
          / (col("__n") - col("__i")).cast("double"), 6).as("mean_right"),
        col("__gain").as("gain"))
  }

  /**
   * Binary-segmentation changepoints, depth 2 (Scott & Knott style
   * recursion over the [[changepoint]] statistic) — the MULTI-shift
   * reading q262's single best split cannot give: a series that
   * stepped twice fools one split into landing between the steps.
   * Level 1 finds the best split of the whole series; level 2 splits
   * each half again (a side shorter than `minSeg`·2 is left whole), so
   * up to 3 changepoints / 4 segments emerge.
   *
   * Determinism + shape: ONE global prefix pass over the bucketed
   * series (bounded: calendar buckets); each of the ≤3 argmax picks is
   * the q262 exact-decimal gain expression over a sub-range with
   * driver-scalar bounds — (gain 6dp desc, t asc) pick, a 1-row
   * bounded collect each. Segment means are one divide of exact longs.
   *
   * Output per final segment: (seg, t_start, t_end, n, mean_units,
   * split_gain) — split_gain is the gain of the split that created the
   * segment's LEFT boundary (NULL for the first segment), ordered.
   */
  def binarySegmentation(bucketed: DataFrame, tCol: String,
      unitsCol: String, minSeg: Int = 2): DataFrame = {
    require(minSeg >= 1, "minSeg >= 1")
    val w = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = bucketed
      .select(col(tCol).cast("long").as("__t"),
        col(unitsCol).cast("long").as("__v"))
      .withColumn("__i", row_number().over(Window.orderBy(col("__t"))).cast("long"))
      .withColumn("__s", sum(col("__v")).over(w))
      .localCheckpoint(true) // bounded buckets; read ≤ 3 + 4 more times
    val nTot = rows.count()
    def d(c: Column): Column = c.cast("decimal(38,0)")
    // exact prefix scalar at row index i (0 → 0)
    def sAt(i: Long): Long =
      if (i == 0L) 0L
      else rows.where(col("__i") === i).select(col("__s")).head().getLong(0)
    // best split of (lo, hi] (1-based, inclusive): q262's gain verbatim
    // over the sub-range; None when the side cannot hold minSeg twice
    def bestSplit(lo: Long, hi: Long): Option[(Long, Long, Double)] = {
      val nSeg = hi - lo
      if (nSeg < 2L * minSeg) return None
      val sLo = sAt(lo)
      val sSeg = sAt(hi) - sLo
      val slD = d(col("__s")) - d(lit(sLo))
      val iD = d(col("__i")) - d(lit(lo))
      val srD = d(lit(sSeg)) - slD
      val nrD = d(lit(nSeg)) - iD
      val nD = d(lit(nSeg))
      val pick = rows
        .where(col("__i") > lo && col("__i") - lo >= minSeg &&
          col("__i") < hi && (lit(hi) - col("__i")) >= minSeg)
        .withColumn("__gain", round(
          (slD * slD * nrD * nD + srD * srD * iD * nD
            - d(lit(sSeg)) * d(lit(sSeg)) * iD * nrD).cast("double")
          / (iD * nrD * nD).cast("double"), 6))
        .where(col("__gain") > 0) // a zero-gain split is no shift at all
        .orderBy(col("__gain").desc, col("__t").asc)
        .select(col("__i"), col("__t"), col("__gain")).limit(1).collect()
      pick.headOption.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    // (lo, hi] spans; level 1 then each side — at most 3 picks
    val spans = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])]()
    bestSplit(0L, nTot) match {
      case None => spans += ((0L, nTot, None))
      case Some((c1, _, g1)) =>
        bestSplit(0L, c1) match {
          case None => spans += ((0L, c1, None))
          case Some((c2, _, g2)) =>
            spans += ((0L, c2, None)); spans += ((c2, c1, Some(g2)))
        }
        val tail = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])]()
        bestSplit(c1, nTot) match {
          case None => tail += ((c1, nTot, Some(g1)))
          case Some((c3, _, g3)) =>
            tail += ((c1, c3, Some(g1))); tail += ((c3, nTot, Some(g3)))
        }
        spans ++= tail
    }
    val spark = bucketed.sparkSession
    import spark.implicits._
    val segDf = spans.zipWithIndex.map { case ((lo, hi, g), k) =>
      (k.toLong + 1L, lo, hi, g)
    }.toSeq.toDF("seg", "__lo", "__hi", "split_gain")
    rows.join(broadcast(segDf), col("__i") > col("__lo") && col("__i") <= col("__hi"))
      .groupBy(col("seg"), col("__lo"), col("__hi"), col("split_gain"))
      .agg(min(col("__t")).as("t_start"), max(col("__t")).as("t_end"),
        count(lit(1)).as("n"), sum(col("__v")).as("__sv"))
      .select(col("seg"), col("t_start"), col("t_end"), col("n"),
        round(col("__sv").cast("double") / col("n").cast("double"), 6)
          .as("mean_units"),
        col("split_gain"))
      .orderBy(col("seg"))
  }

  /**
   * Holt double-exponential smoothing (level + trend) per key over an
   * already-bucketed integer series, with α = β = 1/2 — the halving
   * weights make every step EXACT integer arithmetic (truncating `div`
   * is part of the published definition), so the fit is bit-reproducible
   * on any engine: no float accumulation order to diverge on.
   *
   * PRECONDITION (the [[dtw]] unique-bucket contract, stated here
   * because a per-key probe would cost a second full groupBy pass):
   * `bucketed` means ONE row per (key, t) — [[resample]]'s output
   * shape. A duplicate t survives the sorted collect as an extra
   * series point, silently changing n and every downstream state (and
   * the (t, x) secondary sort makes the replay order value-dependent).
   * [[ewmaChart]] enforces this on its existing probe; here it is the
   * caller's contract, as with the oracle's identical CTE replay.
   *
   *   l_t = (x_t + l_{t-1} + b_{t-1}) div 2        (α = 1/2)
   *   b_t = (l_t − l_{t-1} + b_{t-1}) div 2        (β = 1/2)
   *   init l_1 = x_1, b_1 = 0;  SAE = Σ|x_t − (l_{t-1}+b_{t-1})|
   *
   * The recurrence is inherently sequential, so it runs as an ordered
   * fold (`aggregate` HOF, whole-stage codegen) over the key's collected
   * series — the SERIES is bounded (calendar buckets), the KEYS are
   * distributed; at 100 TB this is one groupBy shuffle and a per-key
   * O(|series|) fold, never a driver loop. Operand bound: |units| must
   * stay < 2^52 (exact-double trunc replay for the oracle) — cents-level
   * daily totals satisfy this up to ~$45 T/day.
   *
   * Output per key: (key, n_buckets, level_units, trend_units,
   * sae_units, f_<h>_units = level + h·trend for each horizon).
   */
  def holt(bucketed: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, horizons: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(h => h >= 1 && h <= 365))
    val series = bucketed
      .select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
        col(unitsCol).cast("long").as("x"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("s"))
    val fold = series.withColumn("st", expr(
      """aggregate(s,
           named_struct('l', CAST(0 AS BIGINT), 'tr', CAST(0 AS BIGINT),
                        'i', CAST(0 AS BIGINT), 'sae', CAST(0 AS BIGINT)),
           (a, e) -> CASE WHEN a.i = 0 THEN
               named_struct('l', e.x, 'tr', CAST(0 AS BIGINT),
                            'i', CAST(1 AS BIGINT), 'sae', CAST(0 AS BIGINT))
             ELSE named_struct(
               'l', (e.x + a.l + a.tr) div 2,
               'tr', (((e.x + a.l + a.tr) div 2) - a.l + a.tr) div 2,
               'i', a.i + 1,
               'sae', a.sae + abs(e.x - (a.l + a.tr))) END)"""))
    val base = fold.select(
      col("key"), col("st.i").as("n_buckets"), col("st.l").as("level_units"),
      col("st.tr").as("trend_units"), col("st.sae").as("sae_units"))
    horizons.foldLeft(base) { (d, h) =>
      d.withColumn(s"f_${h}_units",
        col("level_units") + lit(h.toLong) * col("trend_units"))
    }
  }

  /**
   * Rolling-origin backtest of [[holt]] over a single bucketed series:
   * for each of the last `folds` origins, fit on the prefix and score
   * the one-step-ahead forecast against the actual — the honest
   * out-of-sample error a fit statistic (SAE on trained points) cannot
   * give. Prefixes materialize as a (cutoff, prefix-rows) theta join —
   * folds × |series| rows, both calendar-bounded — and ALL folds then
   * run as ONE [[holt]] call keyed by the cutoff: the fold loop is data,
   * not a driver loop. Exact integer end to end.
   *
   * Output per fold: (fold 1..folds, cutoff_t, f1_units, actual_units,
   * abs_err).
   */
  /**
   * Holt-Winters ADDITIVE seasonal smoothing per key (Winters 1960) —
   * [[holt]] plus a seasonal index of period `m`: the level/trend pair
   * tracks the de-seasonalized series while s[p mod m] absorbs the
   * recurring within-period offset, so a weekly rhythm stops polluting
   * the trend and the h-step forecast carries the right day's offset.
   * All state INTEGER with α=β=γ=1/2 truncating division (the holt
   * doctrine — `div` IS the published contract, bit-replayable):
   *
   *   idx  = p mod m          (p = 0-based bucket position; seed p=0)
   *   f    = l + tr + s[idx]                        (pre-update forecast)
   *   l'   = ((x − s[idx]) + (l + tr))  div 2
   *   tr'  = ((l' − l) + tr)            div 2
   *   s'[idx] = ((x − l') + s[idx])     div 2
   *   sae += |x − f|
   *
   * seeded l = x₀, tr = 0, s = zeros (the first period behaves like
   * [[holt]] while the seasonal fills in — the standard cold-start,
   * and part of the replayable contract). Forecast at horizon h:
   * l + h·tr + s[(n+h−1) mod m].
   *
   * Shape: identical to [[holt]] — one groupBy collects each key's
   * calendar-bounded bucketed series, ONE `aggregate` fold carries the
   * (l, tr, s[m]) state, no windows, |keys| parallelism. [[holt]]'s
   * unique-bucket PRECONDITION applies verbatim (one row per (key, t);
   * resample first).
   *
   * Output: (key, n_buckets, level_units, trend_units, sae_units,
   * f_1_units, f_m_units) — f_m exercises the full seasonal cycle.
   */
  def holtWinters(bucketed: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, m: Int = 7): DataFrame = {
    require(m >= 2 && m <= 366, s"period m in [2,366]: $m")
    val series = bucketed
      .select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
        col(unitsCol).cast("long").as("x"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("s"))
    // l' appears in tr' and s' — SQL has no let-binding, so the l'
    // formula is repeated verbatim (the holt idiom)
    val lNew = "(((e.x - element_at(a.s, cast(a.i % $M as int) + 1)) " +
      "+ a.l + a.tr) div 2)"
    val fold = series.withColumn("st", expr(
      s"""aggregate(s,
           named_struct('l', CAST(0 AS BIGINT), 'tr', CAST(0 AS BIGINT),
                        'i', CAST(0 AS BIGINT), 'sae', CAST(0 AS BIGINT),
                        's', array_repeat(CAST(0 AS BIGINT), $m)),
           (a, e) -> CASE WHEN a.i = 0 THEN
               named_struct('l', e.x, 'tr', CAST(0 AS BIGINT),
                            'i', CAST(1 AS BIGINT), 'sae', CAST(0 AS BIGINT),
                            's', array_repeat(CAST(0 AS BIGINT), $m))
             ELSE named_struct(
               'l', ${lNew.replace("$M", m.toString)},
               'tr', ((${lNew.replace("$M", m.toString)} - a.l) + a.tr) div 2,
               'i', a.i + 1,
               'sae', a.sae + abs(e.x - (a.l + a.tr
                 + element_at(a.s, cast(a.i % $m as int) + 1))),
               's', transform(sequence(0, ${m - 1}), j ->
                 IF(j = cast(a.i % $m as int),
                   ((e.x - ${lNew.replace("$M", m.toString)})
                     + element_at(a.s, cast(a.i % $m as int) + 1)) div 2,
                   element_at(a.s, j + 1)))) END)"""))
    fold.select(
      col("key"), col("st.i").as("n_buckets"), col("st.l").as("level_units"),
      col("st.tr").as("trend_units"), col("st.sae").as("sae_units"),
      (col("st.l") + col("st.tr") + element_at(col("st.s"),
        (col("st.i") % m).cast("int") + 1)).as("f_1_units"),
      (col("st.l") + lit(m.toLong) * col("st.tr") + element_at(col("st.s"),
        ((col("st.i") + m - 1) % m).cast("int") + 1)).as(s"f_${m}_units"))
  }

  /**
   * EWMA control chart per key (Roberts 1959, the SPC classic) — the
   * ONLINE anomaly monitor that complements [[cusum]]'s structural-break
   * alarm: each bucket is scored against the exponentially-weighted
   * mean of its own past, with limits from the exponentially-weighted
   * absolute deviation (a robust sigma stand-in that needs no second
   * pass). All state is INTEGER with α = 1/2 truncating division (the
   * [[holt]] doctrine — `div` IS the definition, so the chart is
   * bit-reproducible by any engine replaying the recursion):
   *
   *   pred  = m  (state before seeing x)
   *   alarm = dev > 0 AND |x − pred| > k·dev
   *   m'    = (x + m)   div 2
   *   dev'  = (|x − pred| + dev) div 2
   *
   * seeded m = x₀, dev = 0 (the seed bucket publishes no row — there is
   * no "past" to score against; the first few alarms are warm-up noise
   * by nature and the caller filters on bucket index if needed).
   *
   * Shape: one groupBy collects each key's CALENDAR-BOUNDED bucketed
   * series into a sorted array (`maxBuckets` loud contract, the
   * holtBacktest doctrine), ONE `aggregate` fold replays the recursion
   * appending per-bucket rows, one explode — no windows, no self-joins,
   * |keys| parallelism.
   *
   * Output: (key, t, x, pred, dev, alarm) per non-seed bucket; `dev` is
   * the PRE-update deviation the alarm compared against.
   */
  def ewmaChart(bucketed: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, k: Int = 3, maxBuckets: Long = 200000L): DataFrame = {
    require(k >= 1 && k <= 10, s"k in [1,10]: $k")
    val series = bucketed
      .select(col(keyCol).as("key"), col(tCol).cast("long").as("t"),
        col(unitsCol).cast("long").as("x"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("s"),
        count(lit(1)).as("__n"))
    // the existing size probe also enforces the unique-bucket contract
    // (the dtw discipline): a duplicate t would replay as an extra
    // series point with value-dependent order — refuse loudly. Dup
    // detection is a per-key O(|series|) array pass, no extra shuffle.
    val probe = series
      .withColumn("__dup",
        col("__n") - size(array_distinct(transform(col("s"), e => e("t")))))
      .agg(coalesce(max(col("__n")), lit(0L)),
        coalesce(max(col("__dup")), lit(0L))).head()
    val (worst, dups) = (probe.getLong(0), probe.getLong(1))
    require(worst <= maxBuckets,
      s"ewmaChart: a key holds $worst buckets > maxBuckets=$maxBuckets — " +
        "input must be a calendar-bounded bucketed series (resample first)")
    require(dups == 0L,
      s"ewmaChart: a key holds $dups duplicate $tCol buckets — the chart " +
        "is defined on a SERIES; aggregate to one value per bucket first " +
        "(resample)")
    val fold = series.withColumn("st", expr(
      s"""aggregate(s,
           named_struct('m', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT),
                        'i', CAST(0 AS BIGINT),
                        'out', CAST(array() AS ARRAY<STRUCT<
                          t: BIGINT, x: BIGINT, pred: BIGINT,
                          dev: BIGINT, alarm: BOOLEAN>>)),
           (a, e) -> CASE WHEN a.i = 0 THEN
               named_struct('m', e.x, 'd', CAST(0 AS BIGINT),
                            'i', CAST(1 AS BIGINT), 'out', a.out)
             ELSE named_struct(
               'm', (e.x + a.m) div 2,
               'd', (abs(e.x - a.m) + a.d) div 2,
               'i', a.i + 1,
               'out', concat(a.out, array(named_struct(
                 't', e.t, 'x', e.x, 'pred', a.m, 'dev', a.d,
                 'alarm', a.d > 0 AND abs(e.x - a.m) > $k * a.d)))) END)"""))
    fold.select(col("key"), explode(col("st.out")).as("o"))
      .select(col("key"), col("o.t").as("t"), col("o.x").as("x"),
        col("o.pred").as("pred"), col("o.dev").as("dev"),
        col("o.alarm").as("alarm"))
  }

  def holtBacktest(bucketed: DataFrame, tCol: String, unitsCol: String,
      folds: Int = 7, maxBuckets: Long = 200000L): DataFrame = {
    require(folds >= 1 && folds <= 60, s"folds in [1,60]: $folds")
    val w = Window.orderBy(col("t"))
    val ranked = bucketed
      .select(col(tCol).cast("long").as("t"), col(unitsCol).cast("long").as("x"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .cache() // cutoff probe + three joins below
    val n = ranked.count()
    require(n > folds, s"series length $n must exceed folds=$folds")
    // calendar-bound CONTRACT (the seasonalDow doctrine made loud): the
    // ordered window is global, safe only because the input is an
    // already-reduced bucketed series — un-bucketed rows passed here
    // would silently recreate the single-task window, so refuse instead
    require(n <= maxBuckets,
      s"holtBacktest: $n buckets > maxBuckets=$maxBuckets — input must be a " +
        "calendar-bounded bucketed series (resample/aggregate first)")
    val spark = bucketed.sparkSession
    import spark.implicits._
    val cuts = (n - folds until n).map(_.toLong).toDF("c")
    val prefixes = ranked.join(broadcast(cuts), col("rn") <= col("c"))
    val fits = holt(prefixes, "c", "t", "x", horizons = Seq(1))
      .select(col("key").as("c"), col("f_1_units"))
    fits
      .join(ranked.select((col("rn") - 1L).as("c"), col("x").as("actual_units")), "c")
      .join(ranked.select(col("rn").as("c"), col("t").as("cutoff_t")), "c")
      .select((col("c") - lit(n - folds) + 1L).as("fold"), col("cutoff_t"),
        col("f_1_units"), col("actual_units"),
        abs(col("f_1_units") - col("actual_units")).as("abs_err"))
  }

  /**
   * Additive seasonal decomposition by day-of-week over a DAILY integer
   * series: trend is the centered 7-day moving average, the seasonal
   * index is the mean deviation from trend per weekday. Published in the
   * exact doctrine — deviation is kept as the integer 7·x_t − Σ_{±3} x
   * (multiply through by 7 instead of dividing the moving sum, so no
   * rational ever materializes), summed exactly; only the final index is
   * one double division. Weekday = (days-since-epoch + 4) mod 7
   * (0 = Thursday) — pure integer arithmetic, no engine DOW convention
   * to disagree on.
   *
   * The ordered window is GLOBAL but runs over the already-reduced daily
   * series — calendar-bounded (~10³ rows for years of data), so the
   * single-partition window is a non-issue at any input scale; the heavy
   * reduction upstream is the distributed part. The window is RANGE ±3
   * calendar days over __t (not ROWS ±3): on a gapped daily series a
   * row-count window would silently span 8+ days and misattribute the
   * deviation, whereas the range frame + the mn = 7 guard excludes any
   * day whose ±3-day calendar neighborhood is incomplete — edge days and
   * gap-adjacent days alike, the standard centered-MA contract.
   *
   * Output: (dow, n_days, sum_dev7, seasonal) with seasonal =
   * round(sum_dev7 / (7·n_days), 6) in input units.
   */
  def seasonalDow(daily: DataFrame, tCol: String, unitsCol: String): DataFrame = {
    val w = Window.orderBy(col("__t")).rangeBetween(-3L * 86400L, 3L * 86400L)
    daily
      .select(col(tCol).cast("long").as("__t"),
        col(unitsCol).cast("long").as("__x"))
      .withColumn("__ms", sum(col("__x")).over(w))
      .withColumn("__mn", count(lit(1)).over(w))
      .where(col("__mn") === 7)
      .select(expr("pmod((__t div 86400) + 4, 7)").as("dow"),
        (col("__x") * 7L - col("__ms")).as("__dev7"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__dev7")).as("sum_dev7"))
      .withColumn("seasonal",
        round(col("sum_dev7").cast("double") /
          (col("n_days").cast("double") * 7.0), 6))
  }

  /**
   * OHLC candles per (key, bucket): bucket = date_trunc(`unit`, ts);
   * open/close under the total (ts, id) order; volume and a decimal-exact
   * value sum ride along. Output: (key, bucket_ts, open, high, low,
   * close, n, sum_value).
   */
  def ohlc(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, unit: String = "DAY"): DataFrame = {
    val bucketed = df.withColumn("__b", date_trunc(unit, col(tsCol)))
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tsCol), col(idCol))
    val wd = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    bucketed
      .withColumn("__ra", row_number().over(w))
      .withColumn("__rd", row_number().over(wd))
      .groupBy(col(keyCol), col("__b").cast("long").as("bucket_ts"))
      .agg(
        max(when(col("__ra") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("__rd") === 1, col(valueCol))).as("close"),
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /**
   * Exact sample autocorrelation at lags 1..maxLag per key, over a
   * series of integer values (cents) ordered by `tCol` — the "is there
   * weekly structure / does yesterday predict today" probe that pairs
   * with [[holt]]/[[seasonalDow]]. The textbook estimator
   * r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² is evaluated in
   * EXACT integer arithmetic by clearing denominators (x̄ = S/n):
   *
   *   num·n² = n²·Σ x_t·x_{t+k} − n·S·(S_head + S_tail) + (n−k)·S²
   *   den·n² = n·(n·Σx² − S²)
   *
   * where S_head/S_tail are the sums of the first/last n−k values. All
   * sums are DECIMAL(38,0) (the welchT moment doctrine — the
   * catastrophic cancellation happens in exact arithmetic); ONE double
   * division per (key, lag), 6dp. Plan: a single key-partitioned window
   * pass computes every lead_k (one WindowExec, maxLag functions), the
   * lag relation stacks via an inline array (no per-lag scan), and two
   * map-combined aggs finish — no self-joins. Keys with n ≤ maxLag or
   * zero variance publish NULL for the affected lags. Lags are bounded
   * small by contract; state is |keys|·maxLag rows. `tCol` must be
   * UNIQUE per key (resample/aggregate first — q156/q240 do): a tie
   * would make lead() order-dependent.
   *
   * Output: (key, lag, n, n_pairs, acf).
   */
  def acf(df: DataFrame, keyCol: String, tCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag >= 1")
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val base = df.select(col(keyCol).as("__k"), col(tCol).as("__t"),
      col(valueCol).cast("long").as("__x"))
      // own-value null filter (matches ccf's inner-alignment filter): a
      // NULL bucket must not count toward __n/__np on one engine only —
      // the oracle counts rn-joined pairs regardless of null values
      .where(col("__x").isNotNull)
    val leads = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__x$k", lead(col("__x"), k).over(w))
    }
    // per-key full-series moments (exact)
    val dec = "decimal(38,0)"
    val moments = base.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).as("__s"),
      sum((col("__x").cast(dec) * col("__x").cast(dec)).cast(dec)).as("__sxx"))
    // stack lags: (key, lag, x, x_lead) — pairs only
    val stacked = leads.select(col("__k"), col("__x"),
        explode(array((1 to maxLag).map(k =>
          struct(lit(k).as("lag"), col(s"__x$k").as("xl"))): _*)).as("p"))
      .select(col("__k"), col("p.lag").as("lag"), col("__x"), col("p.xl"))
      .where(col("xl").isNotNull)
    val perLag = stacked.groupBy(col("__k"), col("lag")).agg(
      count(lit(1)).as("__np"),
      sum((col("__x").cast(dec) * col("xl").cast(dec)).cast(dec)).as("__sxy"),
      sum(col("__x").cast(dec)).as("__sh"),
      sum(col("xl").cast(dec)).as("__st"))
    perLag.join(moments, "__k")
      .select(col("__k").as(keyCol), col("lag"), col("__n").as("n"),
        col("__np").as("n_pairs"),
        when(col("__n") * col("__sxx") - col("__s") * col("__s") =!= 0, round(
          (col("__n").cast(dec) * col("__n").cast(dec) * col("__sxy")
            - col("__n").cast(dec) * col("__s") * (col("__sh") + col("__st"))
            + col("__np").cast(dec) * col("__s") * col("__s")).cast("double")
          / (col("__n").cast(dec)
            * (col("__n").cast(dec) * col("__sxx") - col("__s") * col("__s")))
            .cast("double"), 6)).as("acf"))
  }

  /**
   * Partial autocorrelation at lags 1..3 per key (Durbin–Levinson) —
   * the AR-order probe that [[acf]] cannot be: ACF of an AR(1) decays
   * over every lag, PACF cuts off sharply after the true order, so
   * "which lags matter DIRECTLY" reads off this, not ACF. The DL
   * recursion at depth 3 is closed-form in r₁..r₃:
   *
   *   φ₁₁ = r₁
   *   φ₂₂ = (r₂ − r₁²) / (1 − r₁²),      φ₂₁ = r₁·(1 − φ₂₂)
   *   φ₃₃ = (r₃ − φ₂₁·r₂ − φ₂₂·r₁) / (1 − φ₂₁·r₁ − φ₂₂·r₂)
   *
   * and COMPOSES FROM THE PUBLISHED 6dp ACF values (the engine's
   * pure-function doctrine — bit-replayable by any engine from the
   * q240-style output, which is also why depth is fixed at 3: each
   * further level squares the expression tree that must be spelled
   * identically in an oracle). Zero denominators publish NULL. Cost: the
   * [[acf]] pass + a |keys|-bounded pivot and projection.
   *
   * Output: (key, n, r1, r2, r3, pacf_1, pacf_2, pacf_3).
   */
  def pacf3(df: DataFrame, keyCol: String, tCol: String,
      valueCol: String): DataFrame = {
    val r = acf(df, keyCol, tCol, valueCol, maxLag = 3)
      .groupBy(col(keyCol), col("n"))
      .pivot("lag", Seq(1, 2, 3)).agg(first(col("acf")))
      .withColumnsRenamed(Map("1" -> "r1", "2" -> "r2", "3" -> "r3"))
    val phi22 = (col("r2") - col("r1") * col("r1")) /
      (lit(1.0) - col("r1") * col("r1"))
    val phi21 = col("r1") * (lit(1.0) - col("__p22"))
    val num3 = col("r3") - col("__p21") * col("r2") - col("__p22") * col("r1")
    val den3 = lit(1.0) - col("__p21") * col("r1") - col("__p22") * col("r2")
    // each level ROUNDS before feeding the next (compose-from-published):
    // __p22 is the 6dp pacf_2 itself, so pacf_3 is a pure function of
    // published values and replays identically anywhere
    r.withColumn("__p22",
        when(lit(1.0) - col("r1") * col("r1") =!= 0.0, round(phi22, 6)))
      .withColumn("__p21", round(phi21, 6))
      .select(col(keyCol), col("n"), col("r1"), col("r2"), col("r3"),
        col("r1").as("pacf_1"),
        col("__p22").as("pacf_2"),
        when(den3 =!= 0.0, round(num3 / den3, 6)).as("pacf_3"))
  }

  /**
   * Exact rolling median over per-key daily integer series — the
   * robust-smoothing twin of [[seasonalDow]]'s centered moving average
   * (one spiky day drags a mean for the whole window; the median
   * ignores it). RANGE ±`halfWindowDays` calendar days over __t (the
   * seasonalDow doctrine: a gapped series must not let a ROWS frame
   * span 8+ days), complete windows only (count == 2h+1, odd), so the
   * median is the EXACT middle order statistic — published as the
   * integer unit value itself, no interpolation, engine-independent:
   * sort_array over the ≤(2h+1)-element window list is deterministic
   * whatever order collect_list saw. Windows are PARTITIONED by key;
   * each key's series is calendar-bounded (resample first, the acf
   * contract). Output: (key, t, units, med_units).
   */
  def rollingMedian(daily: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, halfWindowDays: Int = 3): DataFrame = {
    require(halfWindowDays >= 1 && halfWindowDays <= 30, "halfWindowDays in [1,30]")
    val h = halfWindowDays
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(-h.toLong * 86400L, h.toLong * 86400L)
    daily
      .select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t"),
        col(unitsCol).cast("long").as("__x"))
      .where(col("__x").isNotNull)
      .withColumn("__win", sort_array(collect_list(col("__x")).over(w)))
      .where(size(col("__win")) === 2 * h + 1)
      .select(col("__k").as(keyCol), col("__t").as("t"),
        col("__x").as("units"),
        element_at(col("__win"), h + 1).as("med_units"))
  }

  /**
   * Additive STL-lite decomposition over per-key daily integer series —
   * units = trend + seasonal + residual, the readout behind "is Friday
   * down because of the season or the trend". Trend is the centered
   * (2h+1)-day moving mean over complete RANGE calendar windows only
   * (the [[rollingMedian]] doctrine — a gapped series must not let a
   * ROWS frame span extra days); seasonal is the per-key day-of-period
   * mean of the detrended series; residual composes from the PUBLISHED
   * 6dp trend and seasonal. Exactness: trend = round(Σunits/n, 6) is
   * ONE exact-rational divide; detrended = units − trend is EXACTLY a
   * 6dp decimal (integer minus a published 6dp value), carried as
   * DECIMAL(38,6) so the seasonal numerator Σdet stays an exact 6dp
   * decimal whose double image is identical across engines (|Σ|·10⁶
   * must stay < 2⁵³ — holds for calendar-bounded daily series; a
   * scale-12 carrier here would push the numerator past 2⁵³ and make
   * the decimal→double cast ULP-divergent); seasonal is then one
   * IEEE divide + round(·,6); residual is an EXACT
   * DECIMAL(38,6) subtraction of the published parts (both are exact
   * 6dp values, so no re-round — a final round(·,6) is ULP/tie
   * divergent across engines). Edge buckets without a
   * complete trend window publish NULL trend/seasonal/resid and are
   * excluded from the seasonal means — visible, never imputed. Windows
   * are key-partitioned; series calendar-bounded (resample first, the
   * [[acf]] contract). Output: (key, t, units, s ∈ 0..period−1, trend,
   * seasonal, resid), 6dp.
   */
  def stlDecompose(daily: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, period: Int = 7, halfWindowDays: Int = 3): DataFrame = {
    require(period >= 2 && period <= 366, "period in [2,366]")
    require(halfWindowDays >= 1 && halfWindowDays <= 183,
      "halfWindowDays in [1,183]")
    val h = halfWindowDays
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rangeBetween(-h.toLong * 86400L, h.toLong * 86400L)
    val base = daily
      .select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t"),
        col(unitsCol).cast("long").as("__x"))
      .where(col("__x").isNotNull)
      .withColumn("__s", pmod(expr("__t div 86400"), lit(period.toLong)))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sum", sum(col("__x")).over(w))
      .withColumn("trend", when(col("__n") === 2 * h + 1,
        round(col("__sum").cast("double") / col("__n").cast("double"), 6)))
      .withColumn("__det", when(col("trend").isNotNull,
        col("__x").cast("decimal(38,6)") - col("trend").cast("decimal(38,6)")))
    val seas = base.where(col("__det").isNotNull)
      .groupBy(col("__k"), col("__s"))
      .agg(round(sum(col("__det")).cast("double")
        / count(lit(1)).cast("double"), 6).as("seasonal"))
    base.join(seas, Seq("__k", "__s"), "left")
      .select(col("__k").as(keyCol), col("__t").as("t"),
        col("__x").as("units"), col("__s").as("s"), col("trend"),
        when(col("trend").isNotNull, col("seasonal")).as("seasonal"),
        when(col("trend").isNotNull,
          (col("__x").cast("decimal(38,6)")
            - col("trend").cast("decimal(38,6)")
            - col("seasonal").cast("decimal(38,6)")).cast("double"))
          .as("resid"))
  }

  /**
   * Seasonal anomaly detection over the [[stlDecompose]] residual — the
   * S-H-ESD-lite read every metrics platform runs: remove trend and
   * season first, THEN score what's left, so a weekly peak is never
   * flagged merely for being a weekly peak. Scoring is the robust
   * median/MAD z (the `Outliers.robustZ` doctrine: 1.4826 consistency
   * constant, |z| > `zThresh` flags, 50% breakdown — mean/σ would be
   * dragged by the anomalies themselves): per key, med and MAD of the
   * residual come from two exact-percentile group aggregations (6dp
   * cutoffs), broadcast back onto the decomposed rows.
   *
   * Only complete-window rows (resid non-NULL) are scored; a zero-MAD
   * key (constant residual) publishes NULL z and flags nothing. The
   * percentiles run over EXACT micro-unit integers (resid is a 6dp
   * decimal by construction, so resid·10⁶ is integral): median
   * interpolation of integers/half-integers is dyadic-exact in doubles,
   * so no engine's (a+b)/2-vs-a+(b−a)/2 spelling can diverge by an ulp
   * — the published 6dp med/mad are bit-identical everywhere. Output:
   * every scored row (key, t, units, s, trend, seasonal, resid, med,
   * mad, robust_z, is_anomaly) with z composed from the PUBLISHED
   * med/mad.
   */
  def stlAnomalies(daily: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, period: Int = 7, halfWindowDays: Int = 3,
      zThresh: Double = 3.5): DataFrame = {
    require(zThresh > 0, "zThresh > 0")
    val dec = stlDecompose(daily, keyCol, tCol, unitsCol, period,
        halfWindowDays)
      .where(col("resid").isNotNull)
      .withColumn("__rm", round(col("resid") * lit(1e6), 0).cast("long"))
    val med = dec.groupBy(col(keyCol)).agg(
      expr("percentile(__rm, 0.5D)").as("__medm"))
    val withMed = dec.join(broadcast(med), Seq(keyCol))
    val mad = withMed.groupBy(col(keyCol)).agg(
      expr("percentile(abs(__rm - __medm), 0.5D)").as("__madm"))
    withMed.join(broadcast(mad), Seq(keyCol))
      .withColumn("med", round(col("__medm") / lit(1e6), 6))
      .withColumn("mad", round(col("__madm") / lit(1e6), 6))
      .withColumn("robust_z", when(col("mad") > 0,
        round((col("resid") - col("med")) / (lit(1.4826) * col("mad")), 6)))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > zThresh, lit(false)))
      .drop("__rm", "__medm", "__madm")
  }

  /**
   * Trend / seasonality strength (Hyndman & Athanasopoulos, FPP §STL
   * features) over the [[stlDecompose]] parts — the two numbers that
   * say whether a series is WORTH seasonal modeling at all:
   *
   *   F_seasonal = max(0, 1 − Var(resid)/Var(seasonal + resid))
   *   F_trend    = max(0, 1 − Var(resid)/Var(trend + resid))
   *
   * (0 = the component explains nothing, → 1 = dominates). seasonal +
   * resid is exactly the detrended series units − trend, and trend +
   * resid is units − seasonal — both exact 6dp decimals by the STL
   * construction, so all three series quantize to EXACT micro-unit
   * longs (the stlAnomalies device) and each variance numerator
   * n·Σx² − (Σx)² is exact DECIMAL(38,0) integer arithmetic; the shared
   * n cancels in the ratio, leaving ONE double divide per strength.
   *
   * One aggregation per key over the scored rows. Output: one row per
   * key (key, n, f_seasonal, f_trend); a flat component (zero variance
   * denominator) publishes NULL for its strength.
   */
  def seasonalStrength(daily: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, period: Int = 7,
      halfWindowDays: Int = 3): DataFrame = {
    val dec = stlDecompose(daily, keyCol, tCol, unitsCol, period,
        halfWindowDays)
      .where(col("resid").isNotNull)
    def micro(c: Column): Column = round(c * lit(1e6), 0).cast("long")
    val m = dec.select(col(keyCol),
      micro(col("resid")).as("__r"),
      micro(col("units").cast("double") - col("trend")).as("__d"),
      micro(col("units").cast("double") - col("seasonal")).as("__g"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val agg = m.groupBy(col(keyCol)).agg(count(lit(1)).as("n"),
      sum(col("__r")).as("sr"), sum(d(col("__r")) * d(col("__r"))).as("srr"),
      sum(col("__d")).as("sd"), sum(d(col("__d")) * d(col("__d"))).as("sdd"),
      sum(col("__g")).as("sg"), sum(d(col("__g")) * d(col("__g"))).as("sgg"))
    def ssq(s: Column, ss: Column): Column =
      (d(col("n")) * ss - d(s) * d(s)).cast("decimal(38,0)")
    val vr = ssq(col("sr"), col("srr"))
    val vd = ssq(col("sd"), col("sdd"))
    val vg = ssq(col("sg"), col("sgg"))
    agg.select(col(keyCol), col("n"),
      when(vd > 0, greatest(lit(0.0), round(
        lit(1.0) - vr.cast("double") / vd.cast("double"), 6)))
        .as("f_seasonal"),
      when(vg > 0, greatest(lit(0.0), round(
        lit(1.0) - vr.cast("double") / vg.cast("double"), 6)))
        .as("f_trend"))
  }

  /**
   * Calendar coverage report per key — the data-quality read BEFORE any
   * series operator runs: how many step-aligned buckets exist between a
   * key's first and last observation, how many are missing, and the
   * longest gap. The q156 gap-fill resample repairs holes; this one
   * AUDITS them (a feed that silently lost a week shows up here first).
   *
   * All integer arithmetic on exact bucket indices (t div step): one
   * key-partitioned lag window over the observed buckets + one rollup.
   * Output: (key, n_observed, t_min, t_max, n_expected, n_missing,
   * longest_gap, coverage) — coverage = observed/expected, one divide,
   * 6dp; longest_gap counts consecutive MISSING buckets (0 = complete).
   */
  def coverageReport(bucketed: DataFrame, keyCol: String, tCol: String,
      step: Long): DataFrame = {
    require(step >= 1, "step >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__i"))
    bucketed.select(col(keyCol), col(tCol).cast("long").as("__t"))
      .where(col("__t").isNotNull)
      .select(col(keyCol), expr(s"__t div ${step}L").as("__i"))
      .distinct()
      .withColumn("__gap", col("__i") - lag(col("__i"), 1).over(w) - 1L)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_observed"),
        (min(col("__i")) * step).as("t_min"),
        (max(col("__i")) * step).as("t_max"),
        (max(col("__i")) - min(col("__i")) + 1L).as("n_expected"),
        coalesce(max(col("__gap")), lit(0L)).as("longest_gap"))
      .select(col(keyCol), col("n_observed"), col("t_min"), col("t_max"),
        col("n_expected"),
        (col("n_expected") - col("n_observed")).as("n_missing"),
        greatest(col("longest_gap"), lit(0L)).as("longest_gap"),
        round(col("n_observed").cast("double")
          / col("n_expected").cast("double"), 6).as("coverage"))
  }

  /**
   * Index of dispersion (Fano factor) per key — Var/mean of a bucketed
   * count series, the one-number Poisson-ness probe: D ≈ 1 means
   * arrivals are memoryless, D ≫ 1 means bursty/overdispersed (retry
   * storms, bots, campaign spikes), D ≪ 1 means scheduled/metronomic.
   * The count-series complement of [[graft.operators.EventPaths
   * .interArrival]]'s gap CV.
   *
   * Exact: with integer counts c over n buckets, D = Var/mean =
   * (n·Σc² − (Σc)²) / (n·Σc) — ONE divide of exact DECIMAL(38,0)
   * integers, 6dp. One aggregation per key; buckets are
   * calendar-bounded by construction.
   *
   * Output: (key, n_buckets, total, mean, dispersion); an all-zero key
   * publishes NULL dispersion.
   */
  def dispersionIndex(bucketed: DataFrame, keyCol: String, tCol: String,
      cntCol: String): DataFrame = {
    def d(c: Column): Column = c.cast("decimal(38,0)")
    bucketed.select(col(keyCol), col(cntCol).cast("long").as("__c"))
      .where(col("__c").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_buckets"), sum(col("__c")).as("total"),
        sum(d(col("__c")) * d(col("__c"))).as("__q"))
      .select(col(keyCol), col("n_buckets"), col("total"),
        round(col("total").cast("double") / col("n_buckets").cast("double"), 6)
          .as("mean"),
        when(col("total") > 0, round(
          (d(col("n_buckets")) * col("__q") - d(col("total")) * d(col("total")))
            .cast("double")
          / (d(col("n_buckets")) * d(col("total"))).cast("double"), 6))
          .as("dispersion"))
  }

  /**
   * Naive / seasonal-naive forecast baselines over one bucketed series —
   * the denominators every forecast evaluation needs (MASE, Hyndman &
   * Koehler 2006, scales a model's error by the naive in-sample MAE)
   * and the cheapest possible "is there m-periodicity worth modeling"
   * probe: if the seasonal-naive (repeat the value m steps back) beats
   * the naive (repeat yesterday), the season is real. Errors are exact
   * long |differences| in the series' integer units; the two MAEs and
   * their ratio publish 6dp. One ordered window pass (lag 1 and lag m),
   * one aggregation; series bounded by the calendar (resample first,
   * [[acf]] contract). mase_m < 1 ⇒ season m explains the series better
   * than persistence.
   *
   * Output: one row (n, n_pairs_1, mae_1, n_pairs_m, mae_m, mase_m).
   */
  def seasonalNaiveEval(bucketed: DataFrame, tCol: String, unitsCol: String,
      m: Int = 7, maxBuckets: Long = 200000L): DataFrame = {
    require(m >= 2, "season m >= 2")
    val w = Window.orderBy(col("__t"))
    val pre = bucketed.select(col(tCol).as("__t"),
        col(unitsCol).cast("long").as("__x"))
      .where(col("__x").isNotNull)
    // calendar-bound CONTRACT (see holtBacktest): the global ordered
    // window is safe only over an already-bucketed series — refuse loud
    val nb = pre.count()
    require(nb <= maxBuckets,
      s"seasonalNaiveEval: $nb buckets > maxBuckets=$maxBuckets — input must " +
        "be a calendar-bounded bucketed series (resample/aggregate first)")
    val base = pre
      .withColumn("__l1", lag(col("__x"), 1).over(w))
      .withColumn("__lm", lag(col("__x"), m).over(w))
    base.agg(
        count(lit(1)).as("n"),
        sum(when(col("__l1").isNotNull, 1L).otherwise(0L)).as("n_pairs_1"),
        sum(abs(col("__x") - col("__l1"))).as("__sae1"),
        sum(when(col("__lm").isNotNull, 1L).otherwise(0L)).as("n_pairs_m"),
        sum(abs(col("__x") - col("__lm"))).as("__saem"))
      .select(col("n"), col("n_pairs_1"),
        when(col("n_pairs_1") > 0, round(col("__sae1").cast("double")
          / col("n_pairs_1").cast("double"), 6)).as("mae_1"),
        col("n_pairs_m"),
        when(col("n_pairs_m") > 0, round(col("__saem").cast("double")
          / col("n_pairs_m").cast("double"), 6)).as("mae_m"))
      // mase composes from the PUBLISHED 6dp MAEs (pure-function doctrine)
      .withColumn("mase_m", when(col("mae_1") > 0,
        round(col("mae_m") / col("mae_1"), 6)))
  }

  /**
   * Exact cross-correlation between two aligned series — "does x LEAD
   * y": r_xy(k) for k in −maxLag..maxLag correlates x_t with y_{t+k}
   * (positive k = x leads by k steps; r_xy(−k) = r_yx(k)). Pearson over
   * the overlapping pairs with FULL-series means/variances (the
   * standard ccf estimator), denominators cleared as in [[acf]]:
   *
   *   num·n² = n²·Σ x_t·y_{t+k} − n·Sy·Σ_head x − n·Sx·Σ_tail y + (n−k)·Sx·Sy
   *   den·n² = n · (√(n·Σx²−Sx²) · √(n·Σy²−Sy²))
   *
   * Every sum is DECIMAL(38,0); Dx·Dy would overflow 128-bit integers
   * at realistic scales, so the two square roots are taken SEPARATELY
   * on correctly-rounded double casts (bit-identical cross-engine) and
   * ONE division publishes 6dp. Rows are the inner time alignment of
   * the two columns (both non-null); `tCol` unique per row (resample
   * first, as [[acf]]). One window pass builds every lead of BOTH
   * columns; the ±lag relation stacks inline; two map-combined aggs.
   * Zero variance in either series → NULL.
   *
   * Output: (lag −maxLag..maxLag, n, n_pairs, ccf); lag 0 is the plain
   * Pearson correlation of the aligned series.
   */
  def ccf(df: DataFrame, tCol: String, xCol: String, yCol: String,
      maxLag: Int, maxBuckets: Long = 200000L): DataFrame = {
    require(maxLag >= 1, "maxLag >= 1")
    val w = Window.orderBy(col("__t"))
    val base = df.select(col(tCol).as("__t"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    // calendar-bound CONTRACT (see holtBacktest): the global ordered
    // window is safe only over an already-bucketed aligned series
    val nb = base.count()
    require(nb <= maxBuckets,
      s"ccf: $nb buckets > maxBuckets=$maxBuckets — input must be a " +
        "calendar-bounded bucketed series (resample/aggregate first)")
    val dec = "decimal(38,0)"
    val moments = base.agg(
      count(lit(1)).as("__n"),
      sum(col("__x").cast(dec)).as("__sx"),
      sum(col("__y").cast(dec)).as("__sy"),
      sum((col("__x").cast(dec) * col("__x").cast(dec)).cast(dec)).as("__sxx"),
      sum((col("__y").cast(dec) * col("__y").cast(dec)).cast(dec)).as("__syy"))
    val leads = (1 to maxLag).foldLeft(base) { (d, k) =>
      d.withColumn(s"__xl$k", lead(col("__x"), k).over(w))
        .withColumn(s"__yl$k", lead(col("__y"), k).over(w))
    }
    // lag +k pairs (x_t, y_{t+k}); lag −k pairs (x_{t+k}, y_t)
    val pairStructs =
      (1 to maxLag).map(k =>
        struct(lit(k).as("lag"), col("__x").as("a"), col(s"__yl$k").as("b"))) ++
      (1 to maxLag).map(k =>
        struct(lit(-k).as("lag"), col(s"__xl$k").as("a"), col("__y").as("b"))) :+
      struct(lit(0).as("lag"), col("__x").as("a"), col("__y").as("b"))
    val stacked = leads
      .select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.lag").as("lag"), col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val perLag = stacked.groupBy(col("lag")).agg(
      count(lit(1)).as("__np"),
      sum((col("a").cast(dec) * col("b").cast(dec)).cast(dec)).as("__sab"),
      sum(col("a").cast(dec)).as("__sa"),
      sum(col("b").cast(dec)).as("__sb"))
    // in the +k rows a is the head-x and b the tail-y; in the −k rows a
    // is the tail-x and b the head-y — the num formula is symmetric in
    // that pairing, so one expression covers both signs
    val dx = col("__n").cast(dec) * col("__sxx") - col("__sx") * col("__sx")
    val dy = col("__n").cast(dec) * col("__syy") - col("__sy") * col("__sy")
    perLag.crossJoin(broadcast(moments))
      .select(col("lag"), col("__n").as("n"), col("__np").as("n_pairs"),
        when(dx > 0 && dy > 0, round(
          (col("__n").cast(dec) * col("__n").cast(dec) * col("__sab")
            - col("__n").cast(dec) * col("__sy") * col("__sa")
            - col("__n").cast(dec) * col("__sx") * col("__sb")
            + col("__np").cast(dec) * col("__sx") * col("__sy")).cast("double")
          / (col("__n").cast("double")
            * (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))), 6)).as("ccf"))
      .orderBy("lag")
  }

  /**
   * Page–Hinkley upward-mean-shift detector per key (Page 1954, Hinkley
   * 1971; the drift monitor in VFDT/MOA streaming-ML stacks), replayed
   * over a bucketed series: mₜ = Σ_{i≤t}(xᵢ − x̄₁..ᵢ − δ), and the test
   * statistic PHₜ = mₜ − min_{s≤t} mₛ crosses `lambda` when the mean
   * has RISEN by more than the tolerance δ — unlike [[cusum]]'s fixed
   * reference mean, the running-mean reference self-calibrates on the
   * pre-drift regime.
   *
   * Determinism: prefix sums Sᵢ are exact longs; each deviation term
   * xᵢ − Sᵢ/i − δ is ONE double expression of exact operands,
   * 12dp-rounded and DECIMAL-prefix-summed (the Σ doctrine); the
   * running min compares those exact decimals. Shape: three stacked
   * key-partitioned ordered windows over the bucketed relation —
   * calendar-bounded per key (`maxBuckets` loud contract, the
   * [[ewmaChart]] discipline).
   *
   * Output per key: (key, n, ph_max, alarms, first_alarm_t) — ph_max
   * 6dp; first_alarm_t NULL when the statistic never crosses.
   */
  def pageHinkley(bucketed: DataFrame, keyCol: String, tCol: String,
      unitsCol: String, delta: Double = 0.0, lambda: Double,
      maxBuckets: Long = 200000L): DataFrame = {
    require(lambda > 0, "lambda > 0")
    val pre = bucketed.select(col(keyCol).cast("string").as("__k"),
        col(tCol).as("__t"), col(unitsCol).cast("long").as("__x"))
      .where(col("__x").isNotNull)
    val worst = pre.groupBy(col("__k")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L))).head().getLong(0)
    require(worst <= maxBuckets,
      s"pageHinkley: a key holds $worst buckets > maxBuckets=$maxBuckets — " +
        "input must be a calendar-bounded bucketed series (resample first)")
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d6 = BigDecimal(delta).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val l6 = BigDecimal(lambda).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = pre
      .withColumn("__s", sum(col("__x")).over(w))
      .withColumn("__i", count(lit(1)).over(w))
      .withColumn("__dev", round(col("__x").cast("double")
        - col("__s").cast("double") / col("__i").cast("double") - lit(d6), 12)
        .cast("decimal(38,12)"))
      .withColumn("__m", sum(col("__dev")).over(w))
      .withColumn("__mmin", min(col("__m")).over(w))
      .withColumn("__ph", (col("__m") - col("__mmin")).cast("double"))
      .withColumn("__alarm", (col("__ph") >= lit(l6)).cast("long"))
    scored.groupBy(col("__k").as("key"))
      .agg(count(lit(1)).as("n"),
        round(max(col("__ph")), 6).as("ph_max"),
        sum(col("__alarm")).as("alarms"),
        min(when(col("__alarm") === 1L, col("__t"))).as("first_alarm_t"))
      .orderBy("key")
  }

  /**
   * Exact dynamic-time-warping distance between two bucketed integer
   * series — the ELASTIC similarity the shelf's point-wise reads (holt
   * error, correlation, drift tests) cannot give: two series with the
   * same shape but a shifted/stretched time axis read near-zero DTW
   * while any aligned-index distance reads huge. Classic L1 DTW with
   * unit steps (Sakoe & Chiba 1978):
   *
   *   D(i,j) = |a_i − b_j| + min(D(i−1,j), D(i,j−1), D(i−1,j−1))
   *
   * on integer units (cents), so the WHOLE DP is exact integer
   * arithmetic — no rounding contract at all: any engine replaying the
   * recurrence in any dependency-respecting order lands the identical
   * number. The sequential DP runs as ONE nested codegen `aggregate`
   * fold (rows over b, cells over a) on the two collect_list'd series —
   * never a driver loop — and both series are CONTRACT-bounded: counts
   * are probed and refused above `maxN` before anything is collected
   * (the theilSen discipline; DTW is O(m·n) BY DEFINITION — at scale
   * you bucket coarser first, which this API forces the caller to own).
   * Empty series publish NULLs loudly. Output: one row
   * (n_a, n_b, dtw_units, dtw_per_step = dtw/(n_a+n_b) 6dp).
   */
  def dtw(aSeries: DataFrame, bSeries: DataFrame, tCol: String,
      unitsCol: String, maxN: Int = 256): DataFrame = {
    def arr(df: DataFrame, name: String) = {
      val s = df.select(col(tCol).cast("long").as("t"),
          col(unitsCol).cast("long").as("x"))
        .where(col("t").isNotNull && col("x").isNotNull)
      // one probe row carries BOTH contract gates: the O(m·n) size cap
      // and bucket uniqueness — duplicate t values would survive the
      // sort_array(collect_list) as extra series points, silently
      // changing n and the distance (and the (t,x) secondary sort makes
      // the order value-dependent), so they refuse loudly instead
      val probe = s.agg(count(lit(1)), countDistinct(col("t"))).head()
      val n = probe.getLong(0)
      require(n <= maxN,
        s"dtw: series $name has $n buckets > maxN=$maxN — the DP is " +
          "O(m·n) by definition; bucket coarser first")
      require(n == probe.getLong(1),
        s"dtw: series $name has duplicate $tCol buckets ($n rows, " +
          s"${probe.getLong(1)} distinct) — DTW is defined on a SERIES; " +
          "aggregate to one value per bucket first (resample)")
      s.agg(expr("transform(sort_array(collect_list(struct(t, x))), " +
        "e -> e.x)").as(name))
    }
    val one = arr(aSeries, "a").crossJoin(arr(bSeries, "b"))
    one.select(size(col("a")).cast("long").as("n_a"),
        size(col("b")).cast("long").as("n_b"),
        expr(
          """CASE WHEN size(a) = 0 OR size(b) = 0 THEN CAST(NULL AS BIGINT)
             ELSE element_at(
               aggregate(
                 sequence(1, size(b)),
                 CAST(array() AS ARRAY<BIGINT>),
                 (prev, j) -> aggregate(
                   sequence(1, size(a)),
                   CAST(array() AS ARRAY<BIGINT>),
                   (row, i) -> array_append(row,
                     abs(element_at(a, i) - element_at(b, j)) +
                     CASE
                       WHEN j = 1 AND i = 1 THEN CAST(0 AS BIGINT)
                       WHEN j = 1 THEN element_at(row, i - 1)
                       WHEN i = 1 THEN element_at(prev, 1)
                       ELSE least(element_at(prev, i),
                                  element_at(row, i - 1),
                                  element_at(prev, i - 1))
                     END))),
               size(a)) END""").as("dtw_units"))
      .select(col("n_a"), col("n_b"), col("dtw_units"),
        when(col("n_a") + col("n_b") > 0,
          round(col("dtw_units").cast("double")
            / (col("n_a") + col("n_b")).cast("double"), 6)).as("dtw_per_step"))
  }

  /**
   * Sakoe–Chiba banded [[dtw]] — the ORIGINAL paper's scale-and-sanity
   * knob: only alignments with |i−j| ≤ `band` are admissible, so the DP
   * walks n·(2·band+1) cells instead of m·n AND pathological warps (one
   * point absorbing a whole season) are excluded by construction.
   * band = 0 degenerates to the aligned L1 distance; band ≥ max(m,n)
   * equals the unconstrained [[dtw]] exactly (spec-pinned both ways).
   * `band ≥ |m−n|` is required loudly — narrower leaves the (m,n)
   * corner itself out of band.
   *
   * Mechanics: rows are PADDED to constant width 2·band+1 (local cell
   * li ↔ grid i = j−band+li−1); out-of-grid cells carry the SENTINEL
   * (2⁶¹-ish, far above any true path cost yet far below Long overflow
   * even after one add) and every admissible non-origin cell provably
   * has one finite neighbor, so the sentinel never reaches a published
   * value. Exact integer end to end like [[dtw]] — no rounding
   * contract; the oracle replays the same padded grid cell-by-cell in
   * linearized order. Output: (n_a, n_b, band, dtw_units,
   * dtw_per_step).
   */
  def dtwBanded(aSeries: DataFrame, bSeries: DataFrame, tCol: String,
      unitsCol: String, band: Int, maxN: Int = 4096): DataFrame = {
    require(band >= 0, s"band must be >= 0: $band")
    def arr(df: DataFrame, name: String) = {
      val s = df.select(col(tCol).cast("long").as("t"),
          col(unitsCol).cast("long").as("x"))
        .where(col("t").isNotNull && col("x").isNotNull)
      // same two contract gates as [[dtw]]'s arr, one probe row
      val probe = s.agg(count(lit(1)), countDistinct(col("t"))).head()
      val n = probe.getLong(0)
      require(n <= maxN,
        s"dtwBanded: series $name has $n buckets > maxN=$maxN — bucket " +
          "coarser first")
      require(n == probe.getLong(1),
        s"dtwBanded: series $name has duplicate $tCol buckets ($n rows, " +
          s"${probe.getLong(1)} distinct) — aggregate to one value per " +
          "bucket first (resample)")
      (n, s.agg(expr("transform(sort_array(collect_list(struct(t, x))), " +
        "e -> e.x)").as(name)))
    }
    val (na, da) = arr(aSeries, "a")
    val (nb, db) = arr(bSeries, "b")
    require(band >= math.abs(na - nb),
      s"dtwBanded: band=$band < |m−n|=${math.abs(na - nb)} — the (m,n) " +
        "corner is out of band; widen the band or equalize the grids")
    val l = 2 * band + 1
    val one = da.crossJoin(db)
    one.select(size(col("a")).cast("long").as("n_a"),
        size(col("b")).cast("long").as("n_b"),
        lit(band.toLong).as("band"),
        expr(
          s"""CASE WHEN size(a) = 0 OR size(b) = 0 THEN CAST(NULL AS BIGINT)
             ELSE element_at(
               aggregate(
                 sequence(1, size(b)),
                 transform(sequence(1, $l),
                   li -> CAST(2305843009213693951 AS BIGINT)),
                 (prev, j) -> aggregate(
                   sequence(1, $l),
                   CAST(array() AS ARRAY<BIGINT>),
                   (row, li) -> array_append(row,
                     CASE WHEN j - $band + li - 1 < 1
                            OR j - $band + li - 1 > size(a)
                       THEN CAST(2305843009213693951 AS BIGINT)
                     WHEN j = 1 AND j - $band + li - 1 = 1
                       THEN abs(element_at(a, j - $band + li - 1)
                                - element_at(b, j))
                     ELSE abs(element_at(a, j - $band + li - 1)
                              - element_at(b, j))
                          + least(
                              CASE WHEN li >= 2 THEN element_at(row, li - 1)
                                   ELSE CAST(2305843009213693951 AS BIGINT) END,
                              CASE WHEN li < $l THEN element_at(prev, li + 1)
                                   ELSE CAST(2305843009213693951 AS BIGINT) END,
                              element_at(prev, li))
                     END))),
               size(a) - size(b) + $band + 1) END""").as("dtw_units"))
      .select(col("n_a"), col("n_b"), col("band"), col("dtw_units"),
        when(col("n_a") + col("n_b") > 0,
          round(col("dtw_units").cast("double")
            / (col("n_a") + col("n_b")).cast("double"), 6)).as("dtw_per_step"))
  }
}
