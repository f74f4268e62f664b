package graft

import org.apache.spark.sql.functions._

import graft.operators.{Attribution, Bitmaps}

/** Exact id bitmaps (audience algebra) and last-touch attribution. */
class AudienceSpec extends SparkSpec {
  import spark.implicits._

  test("bitmaps: exact cardinality/intersection across partitions; dup ids collapse") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 100L),
      ("b", 2L), ("b", 100L), ("b", 4000L)).toDF("g", "id").repartition(5)
    val bms = Bitmaps.bitmapBy(df, Seq("g"), col("id"), maxId = 4096)
    val ov = Bitmaps.overlap(bms, "g").head()
    assert(ov.getAs[Long]("n_a") == 3 && ov.getAs[Long]("n_b") == 3)
    assert(ov.getAs[Long]("n_and") == 2) // {2, 100}
    assert(ov.getAs[Long]("n_or") == 4)  // {1, 2, 100, 4000}
    assert(ov.getAs[Double]("jaccard") == 0.5)
  }

  test("bitmaps: out-of-domain id fails loudly") {
    val df = Seq(("a", 5000L)).toDF("g", "id")
    val e = intercept[Exception] {
      Bitmaps.bitmapBy(df, Seq("g"), col("id"), maxId = 4096).collect()
    }
    assert(e.getMessage != null)
  }

  test("linearTouch: equal split with remainder to the LATEST touch; cents reconcile") {
    val ts = (s: Int) => new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      (1L, ts(10), 1L, "view", 0.0),
      (1L, ts(20), 2L, "click", 0.0),
      (1L, ts(30), 3L, "view", 0.0),
      (1L, ts(40), 4L, "buy", 1.00),  // 100 cents over 3 touches: 33/33/34
      (2L, ts(10), 5L, "buy", 9.99)   // no touches → direct 999
    ).toDF("u", "ts", "id", "et", "v")
    val got = Attribution.linearTouch(df, "u", "ts", "id", "et", "v",
        "buy", Seq("view", "click"), lookbackSec = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // view: rows 1 and 3 → 33 + 34 (row 3 is LATEST, takes the remainder)
    assert(got == Map("view" -> ((2L, 67L)), "click" -> ((1L, 33L)),
      "direct" -> ((1L, 999L))))
    // exact reconciliation: total credited == total conversion cents
    assert(got.values.map(_._2).sum == 100L + 999L)
  }

  test("cusum: prefix-min identity matches the textbook recursion") {
    val ts = (s: Int) => new java.sql.Timestamp(s * 1000L)
    // values in dollars; target 5.00 → d (cents): +300, -700, +400, +900
    val df = Seq(
      ("k", ts(1), 1L, 8.0), ("k", ts(2), 2L, -2.0),
      ("k", ts(3), 3L, 9.0), ("k", ts(4), 4L, 14.0)
    ).toDF("g", "ts", "id", "v")
    // recursion: S = 300, 0, 400, 1300 → max 1300, alarms(>350): t3? S3=400>350, S4=1300
    val r = graft.operators.TimeSeries.cusum(df, "g", "ts", "id", "v",
      targetCents = 500L, hCents = 350L).head()
    assert(r.getAs[Long]("max_s") == 1300L)
    assert(r.getAs[Long]("n_alarms") == 2L)
    assert(r.getAs[Long]("first_alarm_t") == 3L)
  }

  test("holt: ordered fold equals the textbook recursion (incl. negative-trend truncation)") {
    def ref(xs: Seq[Long]): (Long, Long, Long) = {
      var l = xs.head; var b = 0L; var sae = 0L
      for (x <- xs.tail) {
        sae += math.abs(x - (l + b))
        val nl = (x + l + b) / 2 // scala Long / truncates toward zero == `div`
        b = (nl - l + b) / 2; l = nl
      }
      (l, b, sae)
    }
    for (xs <- Seq(Seq(100L, 120L, 90L, 200L, 180L, 210L),
                   Seq(100L, 3L, 7L),          // odd negative numerators
                   Seq(5L))) {                 // single bucket
      val (l, b, sae) = ref(xs)
      val df = xs.zipWithIndex
        .map { case (x, i) => ("k", i.toLong, x) }.toDF("key", "t", "units")
        .repartition(3)
      val r = graft.operators.TimeSeries.holt(df, "key", "t", "units",
        horizons = Seq(1, 7)).head()
      assert(r.getAs[Long]("n_buckets") == xs.length)
      assert(r.getAs[Long]("level_units") == l, s"level for $xs")
      assert(r.getAs[Long]("trend_units") == b, s"trend for $xs")
      assert(r.getAs[Long]("sae_units") == sae, s"sae for $xs")
      assert(r.getAs[Long]("f_7_units") == l + 7 * b)
    }
  }

  test("holtBacktest: per-fold forecasts equal prefix refits; errors vs actuals") {
    val xs = Vector(100L, 120L, 90L, 200L, 180L, 210L, 170L, 260L, 240L, 300L)
    def refFit(p: Seq[Long]): (Long, Long) = { // (level, trend)
      var l = p.head; var b = 0L
      for (x <- p.tail) { val nl = (x + l + b) / 2; b = (nl - l + b) / 2; l = nl }
      (l, b)
    }
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong * 86400L, x) }
      .toDF("t", "units").repartition(3)
    val got = graft.operators.TimeSeries.holtBacktest(df, "t", "units", folds = 3)
      .orderBy("fold").collect()
    assert(got.length == 3)
    got.zipWithIndex.foreach { case (r, i) =>
      val cut = xs.length - 3 + i // fit-prefix length
      val (l, b) = refFit(xs.take(cut))
      assert(r.getAs[Long]("fold") == i + 1)
      assert(r.getAs[Long]("cutoff_t") == (cut - 1).toLong * 86400L)
      assert(r.getAs[Long]("f_1_units") == l + b, s"fold ${i + 1}")
      assert(r.getAs[Long]("actual_units") == xs(cut))
      assert(r.getAs[Long]("abs_err") == math.abs(l + b - xs(cut)))
    }
  }

  test("seasonalDow: exact integer deviations match a hand-rolled centered MA") {
    val xs = Vector(100L, 200L, 150L, 300L, 250L, 120L, 180L,
                    110L, 210L, 160L, 310L, 260L, 130L, 190L, 140L)
    // reference: centered ±3 full windows only, dev7 = 7x - windowSum
    val devByDow = (3 until xs.length - 3).map { k =>
      val dow = (k + 4) % 7 // t = k days since epoch
      dow -> (xs(k) * 7 - (k - 3 to k + 3).map(xs).sum)
    }.groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val df = xs.zipWithIndex
      .map { case (x, k) => (k.toLong * 86400L, x) }.toDF("t", "units")
      .repartition(4)
    val got = graft.operators.TimeSeries.seasonalDow(df, "t", "units")
      .collect().map(r => r.getAs[Long]("dow") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("sum_dev7")))).toMap
    assert(got == devByDow.map { case (d, v) => d.toLong -> v })
    // constant series decomposes to an all-zero seasonal profile
    val const = (0 until 14).map(k => (k.toLong * 86400L, 500L)).toDF("t", "units")
    val zero = graft.operators.TimeSeries.seasonalDow(const, "t", "units").collect()
    assert(zero.forall(_.getAs[Double]("seasonal") == 0.0))
    // calendar-gap safety: drop day 7 from a 15-day series — the RANGE
    // window must exclude every day whose ±3-day calendar neighborhood
    // is incomplete (days 4..10), not silently span the hole the way a
    // ROWS ±3 frame would
    val gapped = xs.zipWithIndex.filter(_._2 != 7)
      .map { case (x, k) => (k.toLong * 86400L, x) }.toDF("t", "units")
      .repartition(3)
    val keptDays = graft.operators.TimeSeries.seasonalDow(gapped, "t", "units")
      .agg(org.apache.spark.sql.functions.sum("n_days")).head().getLong(0)
    // full windows remain only at centers 3..xs.length-4 minus 4..10
    val expectKept = (3 until xs.length - 3).count(k => k < 4 || k > 10)
    assert(keptDays == expectKept.toLong, s"kept $keptDays")
  }

  test("benford: counts by leading cent digit; chi2 small on a Benford-ish set") {
    import org.apache.spark.sql.functions.col
    val vals = (1 to 300).map(i => math.pow(1.04, i)) // geometric → Benford
    val df = vals.map(v => math.rint(v * 100) / 100).toDF("v")
    val rows = graft.operators.Profile.benford(df, "v").collect()
    assert(rows.length == 9)
    val obs = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(obs.values.sum == 300)
    assert(obs(1) > obs(9)) // monotone-ish Benford shape
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(chi2 < 30.0, s"chi2=$chi2") // geometric data ≈ Benford
  }

  test("lastTouch: credits the latest in-window touch, else direct") {
    val ts = (s: Int) => new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      (1L, ts(100), 10L, "view", 0.0),    // touch
      (1L, ts(200), 11L, "buy", 5.0),     // within 1000s of view → view
      (1L, ts(5000), 12L, "buy", 7.0),    // view too old → direct
      (2L, ts(50), 20L, "buy", 3.0),      // no touch ever → direct
      (2L, ts(60), 21L, "click", 0.0),
      (2L, ts(70), 22L, "buy", 4.0),      // after click → click
      (3L, ts(10), 30L, "view", 0.0),
      (3L, ts(20), 31L, "click", 0.0),    // latest touch wins
      (3L, ts(30), 32L, "buy", 9.0)
    ).toDF("u", "ts", "id", "et", "v")
    val rows = Attribution.lastTouch(df, "u", "ts", "id", "et", "v",
        convType = "buy", touchTypes = Seq("view", "click"), lookbackSec = 1000L)
      .collect().map(r => (r.getAs[Double]("value"), r.getAs[String]("channel"))).toMap
    assert(rows == Map(5.0 -> "view", 7.0 -> "direct", 3.0 -> "direct",
      4.0 -> "click", 9.0 -> "click"))
    val roll = Attribution.byChannel(df, "u", "ts", "id", "et", "v",
        "buy", Seq("view", "click"), 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(roll == Map("view" -> ((1L, 5.0)), "click" -> ((2L, 13.0)),
      "direct" -> ((2L, 10.0))))
  }

  test("shapleyAttribution: hand lattice, efficiency axiom, lattice guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // converting units: {A}×2, {A,B}×1, {}×1 direct; one {B} NON-convert
    // v(∅)=1 v(A)=3 v(B)=1 v(AB)=4 → φ_A=(2+3)/2=2.5, φ_B=(0+1)/2=0.5
    val units = Seq(
      (true, false, true), (true, false, true), (true, true, true),
      (false, false, true), (false, true, false)).toDF("a", "b", "conv")
    val rows = Attribution.shapleyAttribution(units,
      Seq("A" -> col("a"), "B" -> col("b")), col("conv")).collect()
    val m = rows.map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    assert(m == Map("A" -> 2.5, "B" -> 0.5))
    assert(rows.head.getAs[Long]("n_conv") == 4L
      && rows.head.getAs[Long]("v_full") == 4L
      && rows.head.getAs[Long]("v_empty") == 1L)
    // efficiency: Σφ = v(C) − v(∅)
    assert(m.values.sum == 3.0)
    intercept[IllegalArgumentException] {
      Attribution.shapleyAttribution(units,
        (1 to 9).map(i => s"c$i" -> col("a")), col("conv"))
    }
  }
}
