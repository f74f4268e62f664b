package graft

import org.apache.spark.sql.functions._

import graft.operators.{TimeSeries, Trend}

/** TWAP, OHLC candles, correlation matrix. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)

  test("twap: duration-weighted, last observation weightless, single-event null") {
    val df = Seq(
      ("k", ts(0), 1L, 10.0),   // holds 10 s at 10.00
      ("k", ts(10), 2L, 20.0),  // holds 30 s at 20.00
      ("k", ts(40), 3L, 99.0),  // last: no weight
      ("solo", ts(5), 4L, 7.0)
    ).toDF("u", "ts", "id", "v")
    val got = TimeSeries.twap(df, "u", "ts", "id", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    // (1000*10 + 2000*30) / 40 / 100 = 17.5
    assert(got("k").getAs[Double]("twap") == 17.5)
    assert(got("k").getAs[Long]("dur_s") == 40L)
    assert(got("solo").isNullAt(3))
  }

  test("ohlc: open/close by total order, tie broken by id") {
    val df = Seq(
      ("a", ts(86400 + 10), 2L, 5.0), // same day, later id at same-second? distinct ts
      ("a", ts(86400 + 10), 1L, 3.0), // tie on ts: id 1 is the OPEN
      ("a", ts(86400 + 50), 3L, 9.0), // close
      ("a", ts(86400 + 20), 4L, 1.0)  // low
    ).toDF("k", "ts", "id", "v")
    val r = TimeSeries.ohlc(df, "k", "ts", "id", "v").head()
    assert(r.getAs[Double]("open") == 3.0)
    assert(r.getAs[Double]("high") == 9.0)
    assert(r.getAs[Double]("low") == 1.0)
    assert(r.getAs[Double]("close") == 9.0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("sum_value") == 18.0)
  }

  test("corrMatrix: perfect / inverse / named pairs, partition-independent") {
    val data = (1 to 200).map { i =>
      (i.toDouble, 2.0 * i + 3, -1.5 * i + 10)
    }
    val df = data.toDF("x", "y", "z").repartition(7)
    val got = Trend.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(got(("x", "y")) == 1.0)
    assert(got(("x", "z")) == -1.0)
    assert(got(("y", "z")) == -1.0)
    val again = Trend.corrMatrix(df.repartition(2), Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr")).toMap
    assert(again == got)
  }

  test("acf: hand-checked lags, zero-variance null, multi-key independence") {
    // x = 1..5: mean 3, acf(1) = 4/10 = 0.4, acf(2) = -1/10 = -0.1
    val a = (1 to 5).map(i => ("a", i.toLong, i.toLong))
    // alternating 10,20: acf(1) = -125/150, acf(2) = 100/150
    val b = (1 to 6).map(i => ("b", i.toLong, if (i % 2 == 1) 10L else 20L))
    // constant: zero variance -> NULL at every lag
    val c = (1 to 5).map(i => ("c", i.toLong, 7L))
    val df = (a ++ b ++ c).toDF("k", "t", "x")
    val got = TimeSeries.acf(df, "k", "t", "x", maxLag = 2)
      .orderBy("k", "lag").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == Seq(
      ("a", 1, Some(0.4)), ("a", 2, Some(-0.1)),
      ("b", 1, Some(BigDecimal(-125.0 / 150.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      ("b", 2, Some(BigDecimal(100.0 / 150.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      ("c", 1, None), ("c", 2, None)))
    // n and n_pairs: n constant per key, pairs shrink by lag
    val np = TimeSeries.acf(df, "k", "t", "x", maxLag = 2)
      .orderBy("k", "lag").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(np.filter(_._1 == "a") == Seq(("a", 1, 5L, 4L), ("a", 2, 5L, 3L)))
  }

  test("ccf: lag-0 Pearson, shifted-ramp hand check, zero variance NULL") {
    // y = x - 1: lag 0 is perfect correlation; at lags +-1 the
    // full-series-mean estimator gives 1.25/5 = 0.25 (hand-computed)
    val df = Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 3L, 2L), (4L, 4L, 3L))
      .toDF("t", "x", "y")
    val got = TimeSeries.ccf(df, "t", "x", "y", maxLag = 1)
      .orderBy("lag").collect()
      .map(r => (r.getInt(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq((-1, 3L, Some(0.25)), (0, 4L, Some(1.0)),
      (1, 3L, Some(0.25))))
    // zero variance on one side -> NULL everywhere
    val flat = Seq((1L, 1L, 5L), (2L, 2L, 5L), (3L, 3L, 5L)).toDF("t", "x", "y")
    assert(TimeSeries.ccf(flat, "t", "x", "y", maxLag = 1)
      .collect().forall(_.isNullAt(3)))
    // rows with a NULL on either side are excluded from the alignment
    val withNull = df.union(Seq((5L, Option.empty[Long], Option(9L)))
      .toDF("t", "x", "y"))
    assert(TimeSeries.ccf(withNull, "t", "x", "y", maxLag = 1)
      .where(col("lag") === 0).head().getLong(1) == 4L)
  }

  test("seasonalNaiveEval: linear ramp vs perfect weekly series") {
    // ramp: |x_t - x_{t-1}| = 1, |x_t - x_{t-7}| = 7 -> mase 7 (no season)
    val ramp = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("t", "x")
    val r = TimeSeries.seasonalNaiveEval(ramp, "t", "x", m = 7).head()
    assert(r.getAs[Long]("n") == 20 && r.getAs[Long]("n_pairs_1") == 19 &&
      r.getAs[Long]("n_pairs_m") == 13)
    assert(r.getAs[Double]("mae_1") == 1.0 && r.getAs[Double]("mae_m") == 7.0)
    assert(r.getAs[Double]("mase_m") == 7.0)
    // perfect weekly pattern: seasonal-naive error is exactly zero
    val weekly = (1 to 21).map(i => (i.toLong, (i % 7).toLong * 10)).toDF("t", "x")
    val w = TimeSeries.seasonalNaiveEval(weekly, "t", "x", m = 7).head()
    assert(w.getAs[Double]("mae_m") == 0.0 && w.getAs[Double]("mase_m") == 0.0)
    assert(w.getAs[Double]("mae_1") > 0.0)
  }

  test("rollingMedian: spike-proof middle element, complete windows only, gaps") {
    // days 0..8 all value 10 except a spike 1000 on day 4: the ±3 median
    // stays 10 everywhere (mean smoothing would smear the spike)
    val days = (0 to 8).map(d =>
      ("k", d.toLong * 86400L, if (d == 4) 1000L else 10L))
    val got = TimeSeries.rollingMedian(days.toDF("k", "t", "x"), "k", "t", "x")
      .orderBy("t").collect()
    // complete windows: centers 3..5 only
    assert(got.map(_.getAs[Long]("t")).toSeq ==
      Seq(3L * 86400, 4L * 86400, 5L * 86400))
    assert(got.map(_.getAs[Long]("med_units")).toSeq == Seq(10L, 10L, 10L))
    // a calendar gap disqualifies windows spanning it (RANGE, not ROWS):
    // dropping day 2 leaves no 7 consecutive days at all -> empty
    val gapped = days.filterNot(_._2 == 2L * 86400)
    assert(TimeSeries.rollingMedian(gapped.toDF("k", "t", "x"), "k", "t", "x")
      .isEmpty)
    // dropping day 0 instead: centers 4 and 5 keep complete windows
    val gap0 = days.filterNot(_._2 == 0L)
    assert(TimeSeries.rollingMedian(gap0.toDF("k", "t", "x"), "k", "t", "x")
      .orderBy("t").collect().map(_.getAs[Long]("t")).toSeq ==
      Seq(4L * 86400, 5L * 86400))
  }

  test("calendar-bound contract: the global-window trio refuses un-bucketed input") {
    val big = (1 to 50).map(i => (i.toLong, i.toLong)).toDF("t", "x")
    intercept[IllegalArgumentException] {
      TimeSeries.ccf(big.withColumn("y", col("x")), "t", "x", "y",
        maxLag = 1, maxBuckets = 10).collect()
    }
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalNaiveEval(big, "t", "x", m = 7, maxBuckets = 10).collect()
    }
    intercept[IllegalArgumentException] {
      TimeSeries.holtBacktest(big, "t", "x", folds = 3, maxBuckets = 10).collect()
    }
    // at/below the bound all three run
    assert(TimeSeries.seasonalNaiveEval(big, "t", "x", m = 7, maxBuckets = 50)
      .head().getAs[Long]("n") == 50)
  }

  test("pacf3: replayable from the published acf values alone; " +
      "zero variance publishes nulls") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = (1 to 40).map(i => ("k", i.toLong, ((i * 37) % 19 + i / 3).toLong))
      .toDF("k", "t", "x")
    // replay the Durbin-Levinson closed forms from the PUBLISHED acf
    // rows - the operator's whole contract is that this matches
    val rs = TimeSeries.acf(df, "k", "t", "x", maxLag = 3)
      .orderBy("lag").collect().map(_.getDouble(4))
    val Array(r1, r2, r3) = rs
    val p22 = r6((r2 - r1 * r1) / (1.0 - r1 * r1))
    val p21 = r6(r1 * (1.0 - p22))
    val p33 = r6((r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2))
    val got = TimeSeries.pacf3(df, "k", "t", "x").head()
    assert(got.getAs[Double]("r1") == r1 && got.getAs[Double]("r3") == r3)
    assert(got.getAs[Double]("pacf_1") == r1)
    assert(got.getAs[Double]("pacf_2") == p22)
    assert(got.getAs[Double]("pacf_3") == p33)
    // flat series: acf NULL everywhere -> every pacf NULL
    val flat = (1 to 10).map(i => ("k", i.toLong, 5L)).toDF("k", "t", "x")
    val f = TimeSeries.pacf3(flat, "k", "t", "x").head()
    assert(f.isNullAt(5) && f.isNullAt(6) && f.isNullAt(7))
  }

  test("theilSen: outlier-immune slope (OLS moves, the median does not), " +
      "maxN guard throws, single-point keys vanish") {
    val clean = (1 to 9).map(i => ("k", i.toLong, 2L * i))
    val df = (clean :+ (("k", 10L, 1000L))).toDF("g", "t", "y")
    val r = Trend.theilSen(df, "g", col("t"), col("y")).head()
    // 36 of the 45 pairwise slopes are exactly 2.0; lower median = 2.0,
    // residual lower median = 0.0 - the 1000-unit outlier is invisible
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("n_pairs") == 45)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 0.0)
    // OLS on the same data is dragged far off 2.0 by the outlier
    val ols = Trend.fitLinear(df, "g", col("t"), col("y")).head()
    assert(math.abs(ols.getAs[Double]("slope") - 2.0) > 10.0)
    // guard: an over-long series throws instead of paying quadratic
    val long = (1 to 50).map(i => ("k", i.toLong, i.toLong)).toDF("g", "t", "y")
    intercept[IllegalArgumentException] {
      Trend.theilSen(long, "g", col("t"), col("y"), maxN = 10).collect()
    }
    // a single-point key has no pairs and yields no row
    val single = Seq(("solo", 1L, 5L)).toDF("g", "t", "y")
    assert(Trend.theilSen(single, "g", col("t"), col("y")).isEmpty)
  }

  test("holtWinters: hand-traced m=2 recursion with seasonal slots, " +
      "forecasts pick the right slot, period contract") {
    // x=[10,20,30,40], m=2: l=33, tr=7, s=[3,4], sae=10+13+10=33
    // f_1 = 33+7+s[0]=43 (next position 4 is even), f_2 = 33+14+s[1]=51
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L),
      ("k", 4L, 40L)).toDF("g", "t", "x")
    val r = TimeSeries.holtWinters(df, "g", "t", "x", m = 2).head()
    assert(r.getAs[Long]("n_buckets") == 4)
    assert(r.getAs[Long]("level_units") == 33)
    assert(r.getAs[Long]("trend_units") == 7)
    assert(r.getAs[Long]("sae_units") == 33)
    assert(r.getAs[Long]("f_1_units") == 43)
    assert(r.getAs[Long]("f_2_units") == 51)
    // zero seasonal (m larger than series): degenerates to holt's path
    intercept[IllegalArgumentException] {
      TimeSeries.holtWinters(df, "g", "t", "x", m = 1)
    }
  }

  test("ewmaChart: hand-traced integer recursion, flat-series dev stays 0, " +
      "seed publishes no row, bound contract") {
    // x = [10, 14, 10, 100]: seed m=10; then pred/dev/alarm per step
    val df = Seq(("k", 1L, 10L), ("k", 2L, 14L), ("k", 3L, 10L),
      ("k", 4L, 100L)).toDF("g", "t", "x")
    val rows = TimeSeries.ewmaChart(df, "g", "t", "x", k = 3)
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.toSeq == Seq((2L, 10L, 0L, false), // |14-10|=4, dev 0 -> no alarm
      (3L, 12L, 2L, false),                        // m=(14+10)/2, d=(4+0)/2
      (4L, 11L, 2L, true)))                        // |100-11|=89 > 3*2
    // flat series: dev never leaves 0, so no alarm can ever fire
    val flat = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 10L))
      .toDF("g", "t", "x")
    assert(TimeSeries.ewmaChart(flat, "g", "t", "x")
      .where(col("alarm")).isEmpty)
    intercept[IllegalArgumentException] {
      TimeSeries.ewmaChart(df, "g", "t", "x", maxBuckets = 2L).collect()
    }
    // unique-bucket contract (the dtw discipline): a duplicate t must
    // refuse loudly, not replay as an extra value-order-dependent point
    val dup = Seq(("k", 1L, 10L), ("k", 2L, 14L), ("k", 2L, 9L))
      .toDF("g", "t", "x")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.ewmaChart(dup, "g", "t", "x")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("kendallTau: perfect concordance/discordance, ties shrink the " +
      "denominator, all-tied side NULL") {
    // x=[1,2,3], y=[10,20,30]: S=3, D0=3, no ties -> tau 1
    val up = Seq(("k", 1L, 1L, 10L), ("k", 2L, 2L, 20L), ("k", 3L, 3L, 30L))
      .toDF("g", "i", "x", "y")
    val r = Trend.kendallTau(up, "g", col("i"), col("x"), col("y")).head()
    assert(r.getAs[Long]("s") == 3 && r.getAs[Long]("d0") == 3)
    assert(r.getAs[Double]("tau_b") == 1.0)
    // reversed y: tau -1
    val down = Seq(("k", 1L, 1L, 30L), ("k", 2L, 2L, 20L), ("k", 3L, 3L, 10L))
      .toDF("g", "i", "x", "y")
    assert(Trend.kendallTau(down, "g", col("i"), col("x"), col("y"))
      .head().getAs[Double]("tau_b") == -1.0)
    // tie in y: x=[1,2,3], y=[10,10,30]: S = 0+1+1 = 2, Dy=1
    // tau_b = 2/sqrt(3*2)
    val tied = Seq(("k", 1L, 1L, 10L), ("k", 2L, 2L, 10L), ("k", 3L, 3L, 30L))
      .toDF("g", "i", "x", "y")
    val rt = Trend.kendallTau(tied, "g", col("i"), col("x"), col("y")).head()
    assert(rt.getAs[Long]("s") == 2 && rt.getAs[Long]("dy") == 1)
    assert(rt.getAs[Double]("tau_b") ==
      math.rint(2.0 / math.sqrt(6.0) * 1e6) / 1e6)
    // a constant side makes the denominator 0 -> NULL
    val const = Seq(("k", 1L, 1L, 5L), ("k", 2L, 2L, 5L)).toDF("g", "i", "x", "y")
    assert(Trend.kendallTau(const, "g", col("i"), col("x"), col("y"))
      .head().isNullAt(6))
  }

  test("mannKendall: monotone/tied/constant hand cases, maxN guard") {
    // strictly increasing: S = C(4,2) = 6, no ties, var18 = 4*3*13 = 156
    val up = (1 to 4).map(i => ("k", i.toLong, i.toLong)).toDF("g", "t", "y")
    val r = Trend.mannKendall(up, "g", col("t"), col("y")).head()
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("s") == 6)
    assert(r.getAs[Long]("var18") == 156)
    assert(r.getAs[Double]("z") ==
      math.rint(5.0 / math.sqrt(156.0 / 18.0) * 1e6) / 1e6)
    // ties: [1,1,2] -> S=2, tie group of 2 subtracts 2*1*9=18 from 66
    val tied = Seq(("k", 1L, 1L), ("k", 2L, 1L), ("k", 3L, 2L))
      .toDF("g", "t", "y")
    val rt = Trend.mannKendall(tied, "g", col("t"), col("y")).head()
    assert(rt.getAs[Long]("s") == 2 && rt.getAs[Long]("var18") == 48)
    assert(rt.getAs[Double]("z") ==
      math.rint(1.0 / math.sqrt(48.0 / 18.0) * 1e6) / 1e6)
    // constant series: var18 = 0 -> z NULL
    val const = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L))
      .toDF("g", "t", "y")
    assert(Trend.mannKendall(const, "g", col("t"), col("y"))
      .head().isNullAt(4))
    intercept[IllegalArgumentException] {
      Trend.mannKendall(up, "g", col("t"), col("y"), maxN = 3).collect()
    }
  }

  test("changepoint: clean shift found with exact gain; flat series ties to earliest") {
    val shift = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 50L), ("a", 5L, 50L)).toDF("g", "t", "v")
    val r = TimeSeries.changepoint(shift, "g", "t", "v").head()
    assert(r.getLong(1) == 5 && r.getLong(2) == 3 && r.getLong(3) == 3)
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 50.0)
    // hand rational: num = 900·2·5 + 10000·3·5 − 16900·3·2 = 57600, den = 30
    assert(r.getDouble(6) == 1920.0)
    // constant series: every split gains 0, earliest wins deterministically
    val flat = Seq(("b", 1L, 7L), ("b", 2L, 7L), ("b", 3L, 7L)).toDF("g", "t", "v")
    val f = TimeSeries.changepoint(flat, "g", "t", "v").head()
    assert(f.getLong(2) == 1 && f.getDouble(6) == 0.0)
    assert(f.getDouble(4) == 7.0 && f.getDouble(5) == 7.0)
  }

  test("stlAnomalies: spike flagged after season removal; flat series silent; " +
      "med/mad replay from exact micro medians") {
    // 28 flat days at 100 with a +1000 spike on day 14: the spike must
    // carry the max |z| and a flag; the med/mad the operator publishes
    // must equal an independent micro-unit median computed here
    val spiky = (0 until 28).map(d =>
      ("k", d.toLong * 86400L, if (d == 14) 1100L else 100L))
      .toDF("g", "t", "units")
    val rows = TimeSeries.stlAnomalies(spiky, "g", "t", "units",
      period = 7, halfWindowDays = 3, zThresh = 3.5)
      .orderBy("t").collect()
    // the spike leaks into its neighbors' trend windows (echo flags are
    // expected of any moving-mean STL) — the contract is: the spike day
    // IS flagged and carries the LARGEST |z| of all
    val flagged = rows.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.map(_.getAs[Long]("t")).contains(14L * 86400L))
    val zMax = rows.map(r => math.abs(
      Option(r.getAs[java.lang.Double]("robust_z")).fold(0.0)(_.doubleValue)))
    assert(zMax.max == math.abs(
      rows.find(_.getAs[Long]("t") == 14L * 86400L).get.getAs[Double]("robust_z")))
    // independent med/mad replay over exact micro-units
    val micro = rows.map(r => math.round(r.getAs[Double]("resid") * 1e6))
    def medOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expMed = medOf(micro.map(_.toDouble).toSeq)
    val expMad = medOf(micro.map(m => math.abs(m - expMed)).toSeq)
    assert(rows.forall(_.getAs[Double]("med") == r6(expMed / 1e6)))
    assert(rows.forall(_.getAs[Double]("mad") == r6(expMad / 1e6)))
    // a constant series decomposes to zero residual: MAD 0, z NULL, silent
    val quiet = (0 until 28).map(d => ("k", d.toLong * 86400L, 100L))
      .toDF("g", "t", "units")
    val q = TimeSeries.stlAnomalies(quiet, "g", "t", "units").collect()
    assert(q.nonEmpty && q.forall(r => r.isNullAt(r.fieldIndex("robust_z"))))
    assert(q.forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("coverageReport: hand gaps, duplicate buckets collapse, complete key") {
    // k observes buckets {0,1,2,5,9} (two t values land in bucket 0):
    // expected 10, missing 5, longest gap 3 (buckets 6..8)
    val df = Seq(("k", 0L), ("k", 5L), ("k", 10L), ("k", 20L), ("k", 50L),
      ("k", 90L), ("m", 0L), ("m", 10L), ("m", 20L)).toDF("g", "t")
    val rows = TimeSeries.coverageReport(df, "g", "t", step = 10L)
      .orderBy("g").collect()
    val Seq(k, m) = rows.toSeq
    assert(k.getAs[Long]("n_observed") == 5L)
    assert(k.getAs[Long]("t_min") == 0L && k.getAs[Long]("t_max") == 90L)
    assert(k.getAs[Long]("n_expected") == 10L)
    assert(k.getAs[Long]("n_missing") == 5L)
    assert(k.getAs[Long]("longest_gap") == 3L)
    assert(k.getAs[Double]("coverage") == 0.5)
    assert(m.getAs[Long]("n_missing") == 0L && m.getAs[Long]("longest_gap") == 0L)
    assert(m.getAs[Double]("coverage") == 1.0)
  }

  test("dispersionIndex: hand Fano, metronome is 0, zero series NULL") {
    // counts 1,9,2: n=3 S=12 Q=86 → D=(258−144)/36 = 3.166667, mean 4
    val df = Seq(("k", 0L, 1L), ("k", 1L, 9L), ("k", 2L, 2L),
      ("m", 0L, 5L), ("m", 1L, 5L), ("m", 2L, 5L),
      ("z", 0L, 0L), ("z", 1L, 0L)).toDF("g", "t", "c")
    val rows = TimeSeries.dispersionIndex(df, "g", "t", "c")
      .orderBy("g").collect()
    val Seq(k, m, z) = rows.toSeq
    assert(k.getAs[Double]("mean") == 4.0)
    assert(k.getAs[Double]("dispersion") == 3.166667)
    assert(m.getAs[Double]("dispersion") == 0.0)
    assert(z.isNullAt(z.fieldIndex("dispersion")))
  }

  test("seasonalStrength: pure season scores 1 (flat deseason -> NULL trend); " +
      "pure trend scores 1 the other way") {
    // exact period-7 wave, no trend, no noise: resid 0 → f_seasonal 1;
    // units − seasonal is constant → zero variance → f_trend NULL
    val wave = (0 until 28).map(d =>
      ("k", d.toLong * 86400L, if (d % 7 == 0) 200L else 100L))
      .toDF("g", "t", "units")
    val w = TimeSeries.seasonalStrength(wave, "g", "t", "units").head()
    assert(w.getAs[Double]("f_seasonal") == 1.0)
    assert(w.isNullAt(w.fieldIndex("f_trend")))
    // exact linear trend: moving mean recovers it, det 0 → f_seasonal
    // NULL, resid 0 against a varying deseasonalized series → f_trend 1
    val line = (0 until 28).map(d => ("k", d.toLong * 86400L, 10L * d))
      .toDF("g", "t", "units")
    val l = TimeSeries.seasonalStrength(line, "g", "t", "units").head()
    assert(l.isNullAt(l.fieldIndex("f_seasonal")))
    assert(l.getAs[Double]("f_trend") == 1.0)
  }

  test("pageHinkley: flat series reads 0; planted level shift alarms") {
    import spark.implicits._
    val flat = (0 until 20).map(i => ("k", f"t$i%02d", 100L)).toDF("g", "t", "x")
    val f = TimeSeries.pageHinkley(flat, "g", "t", "x", lambda = 10.0).head()
    assert(f.getAs[Double]("ph_max") == 0.0 && f.getAs[Long]("alarms") == 0L
      && f.isNullAt(f.fieldIndex("first_alarm_t")))
    // 10×100 then 10×200: deviations vs the self-calibrating running
    // mean accumulate ~50/bucket after the shift — crosses λ=100 well
    // inside the second half
    val shift = (0 until 20).map(i =>
      ("k", f"t$i%02d", if (i < 10) 100L else 200L)).toDF("g", "t", "x")
    val s = TimeSeries.pageHinkley(shift, "g", "t", "x", lambda = 100.0).head()
    assert(s.getAs[Double]("ph_max") > 100.0)
    assert(s.getAs[Long]("alarms") >= 1L)
    assert(s.getString(s.fieldIndex("first_alarm_t")) >= "t10")
    // calendar contract refuses loud
    intercept[IllegalArgumentException] {
      TimeSeries.pageHinkley(shift, "g", "t", "x", lambda = 1.0,
        maxBuckets = 5L).collect()
    }
  }
  test("binarySegmentation: two-step series yields 3 exact segments, flat stays whole") {
    import spark.implicits._
    def seg(xs: Seq[Long]) = graft.operators.TimeSeries.binarySegmentation(
      xs.zipWithIndex.map { case (v, i) => (i.toLong + 1L, v) }.toDF("t", "units"),
      "t", "units").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), Option(r.get(5)).map(_.asInstanceOf[Double])))
    // 0×4, 10×4, 30×4: level 1 lands on the BIGGER step (i=8, gain
    // 640000/384), level 2 recovers the smaller one (i=4, gain 200)
    val two = seg(Seq.fill(4)(0L) ++ Seq.fill(4)(10L) ++ Seq.fill(4)(30L))
    assert(two.toSeq == Seq(
      (1L, 1L, 4L, 4L, 0.0, None),
      (2L, 5L, 8L, 4L, 10.0, Some(200.0)),
      (3L, 9L, 12L, 4L, 30.0, Some(1666.666667))))
    // one step: split found once, neither flat side re-splits
    val one = seg(Seq.fill(4)(0L) ++ Seq.fill(4)(10L))
    assert(one.length == 2 && one(1)._6 == Some(200.0))
    // constant series: no positive gain anywhere → one whole segment
    val flat = seg(Seq.fill(8)(7L))
    assert(flat.toSeq == Seq((1L, 1L, 8L, 8L, 7.0, None)))
  }

  test("dtw: identical 0, hand DP, plateau-stretch 0 where L1 reads 5, refusal") {
    import graft.operators.TimeSeries
    def s(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    // identical series warp along the diagonal at zero cost
    val a = s(Seq(3L, 7L, 1L, 9L))
    val r0 = TimeSeries.dtw(a, a, "t", "x").head()
    assert(r0.getAs[Long]("dtw_units") == 0L
      && r0.getAs[Double]("dtw_per_step") == 0.0)
    // hand DP: a=[0,1,2], b=[0,2] → D(:,1)=[0,1,3];
    // D(:,2) = [2, 1+min(1,2,0), 0+min(3,1,1)] → DTW = 1
    val r1 = TimeSeries.dtw(s(Seq(0L, 1L, 2L)), s(Seq(0L, 2L)), "t", "x")
      .head()
    assert(r1.getAs[Long]("n_a") == 3L && r1.getAs[Long]("n_b") == 2L)
    assert(r1.getAs[Long]("dtw_units") == 1L)
    assert(r1.getAs[Double]("dtw_per_step") == 0.2)
    // THE dtw property: a stretched plateau is the same shape —
    // [0,0,5,0] vs [0,5,5,0] warps to 0 while aligned L1 reads 5
    val r2 = TimeSeries.dtw(s(Seq(0L, 0L, 5L, 0L)), s(Seq(0L, 5L, 5L, 0L)),
      "t", "x").head()
    assert(r2.getAs[Long]("dtw_units") == 0L)
    // empty side publishes NULL loudly, not a fake 0
    val re = TimeSeries.dtw(s(Seq.empty), a, "t", "x").head()
    assert(re.isNullAt(re.fieldIndex("dtw_units")))
    // O(m·n) contract: series over maxN refuse before collecting
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.dtw(s(Seq(1L, 2L, 3L)), a, "t", "x", maxN = 2)
    }
    assert(ex.getMessage.contains("maxN"))
    // duplicate bucket timestamps are NOT a series — they would survive
    // the sort as extra points (value-dependent order) and silently
    // change n and the distance, so they refuse loudly
    val dup = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("t", "x")
    val ed = intercept[IllegalArgumentException] {
      TimeSeries.dtw(dup, a, "t", "x")
    }
    assert(ed.getMessage.contains("duplicate"))
  }

  test("dtwBanded: band 0 = aligned L1, band 1 recovers exact, guards") {
    import graft.operators.TimeSeries
    def s(xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    def run(a: Seq[Long], b: Seq[Long], band: Int) =
      TimeSeries.dtwBanded(s(a), s(b), "t", "x", band).head()
    val a4 = Seq(0L, 0L, 5L, 0L); val b4 = Seq(0L, 5L, 5L, 0L)
    // band 0 admits only the diagonal — the aligned L1 distance (5);
    // band 1 already re-admits the plateau warp and reads the exact 0
    assert(run(a4, b4, 0).getAs[Long]("dtw_units") == 5L)
    assert(run(a4, b4, 1).getAs[Long]("dtw_units") == 0L)
    // band ≥ max(m,n) is the unconstrained dtw exactly (hand 3×2 = 1)
    val r = run(Seq(0L, 1L, 2L), Seq(0L, 2L), 3)
    assert(r.getAs[Long]("dtw_units") == 1L
      && r.getAs[Long]("band") == 3L
      && r.getAs[Double]("dtw_per_step") == 0.2)
    // narrower than the length mismatch leaves the corner out of band
    val ex = intercept[IllegalArgumentException] {
      TimeSeries.dtwBanded(s(Seq(1L, 2L, 3L, 4L)), s(Seq(1L)), "t", "x", 1)
    }
    assert(ex.getMessage.contains("band"))
    // same unique-bucket contract as dtw
    val dup = Seq((0L, 1L), (0L, 2L)).toDF("t", "x")
    val ed = intercept[IllegalArgumentException] {
      TimeSeries.dtwBanded(dup, s(Seq(1L, 2L)), "t", "x", 2)
    }
    assert(ed.getMessage.contains("duplicate"))
  }
}
