package graft

import org.apache.spark.sql.functions._

import graft.operators.Survival

/** Kaplan-Meier product-limit estimator. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("textbook cohort: censoring removes from risk without an event row") {
    // t=1 event, t=2 censored, t=3 event, t=4 censored
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", col("ev"))
      .orderBy("t").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // event times only
    assert(rows(0).getAs[Long]("n_risk") == 4)
    assert(rows(0).getAs[Double]("survival") == 0.75)       // 3/4
    assert(rows(1).getAs[Long]("n_risk") == 2)
    assert(rows(1).getAs[Double]("survival") == 0.375)      // 3/4 · 1/2
  }

  test("full-event tail zeroes the curve without evaluating ln(0)") {
    val df = Seq((1L, true), (2L, true)).toDF("dur", "ev")
    val rows = Survival.kaplanMeier(df, "dur", col("ev"))
      .orderBy("t").collect()
    assert(rows(0).getAs[Double]("survival") == 0.5)
    assert(rows(1).getAs[Double]("survival") == 0.0) // d == n at t=2
  }

  test("partition-order independent (decimal log sums)") {
    val df = (1 to 500).map(i => ((i % 37).toLong + 1, i % 5 != 0)).toDF("dur", "ev")
    val a = Survival.kaplanMeier(df.repartition(11), "dur", col("ev"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("survival")).toMap
    val b = Survival.kaplanMeier(df.repartition(2), "dur", col("ev"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("survival")).toMap
    assert(a == b)
  }

  test("nelsonAalen: hand-computed additive hazard; exp(-H) ~ KM") {
    // t=1 event (4 at risk), t=2 censored, t=3 event (2 at risk), t=4 cens
    // H(1) = 1/4 = 0.25; H(3) = 1/4 + 1/2 = 0.75
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("dur", "ev")
    val rows = Survival.nelsonAalen(df, "dur", col("ev"))
      .orderBy("t").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(rows(0).getAs[Long]("n_risk") == 4)
    assert(rows(0).getAs[Double]("cumhazard") == 0.25)
    assert(rows(1).getAs[Long]("n_risk") == 2)
    assert(rows(1).getAs[Double]("cumhazard") == 0.75)
  }

  test("nelsonAalen: total failure stays finite where KM hits zero") {
    val df = Seq((1L, true), (2L, true)).toDF("dur", "ev")
    val rows = Survival.nelsonAalen(df, "dur", col("ev"))
      .orderBy("t").collect()
    assert(rows(0).getAs[Double]("cumhazard") == 0.5)
    assert(rows(1).getAs[Double]("cumhazard") == 1.5) // 1/2 + 1/1 — no 0 collapse
  }

  test("logRank: hand-computed O/E/V/z; identical curves give z 0") {
    // A: events at 1, 2; B: censored at 1, event at 3
    // t=1: n=(2,2) d=(1,0) → E .5 V .25 | t=2: n=(1,1) d=(1,0) → E .5 V .25
    // t=3: n=(0,1) d=(0,1) → E 0, V 0 (nj=1) ⇒ O=2 E=1 V=.5 z=1.414214
    val df = Seq(("A", 1L, true), ("A", 2L, true),
      ("B", 1L, false), ("B", 3L, true)).toDF("g", "dur", "ev")
    val r = Survival.logRank(df, "dur", col("ev"), col("g")).head()
    assert(r.getAs[String]("group_a") == "A" && r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Long]("o_a") == 2L)
    assert(r.getAs[Double]("e_a") == 1.0)
    assert(r.getAs[Double]("v_sum") == 0.5)
    assert(r.getAs[Double]("z") == 1.414214)
    // identical cohorts → O == E exactly → z == 0
    val same = Seq(("A", 1L, true), ("A", 5L, false), ("B", 1L, true),
      ("B", 5L, false)).toDF("g", "dur", "ev")
    assert(Survival.logRank(same, "dur", col("ev"), col("g"))
      .head().getAs[Double]("z") == 0.0)
  }

  test("rmst: hand rectangles under the KM step curve, clamped at tau") {
    // KM: S=0.75 from t=2, S=0.375 from t=6 (see first test family)
    // area to tau=7: 1·2 + 0.75·(6−2) + 0.375·(7−6) = 5.375
    val df = Seq((2L, true), (4L, false), (6L, true), (8L, false))
      .toDF("dur", "ev")
    val r = Survival.rmst(df, "dur", col("ev"), tau = 7L).head()
    assert(r.getAs[Long]("tau") == 7L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_events") == 2L)
    assert(r.getAs[Double]("rmst") == 5.375)
  }

  test("survivalQuantiles: first-crossing picks, never-reached is NULL") {
    // S: 0.75 from t=2, 0.375 from t=6 (the first-test cohort)
    val df = Seq((2L, true), (4L, false), (6L, true), (8L, false))
      .toDF("dur", "ev")
    val rows = Survival.survivalQuantiles(df, "dur", col("ev"),
      qs = Seq(0.75, 0.5, 0.25)).collect()
    assert(rows.map(_.getAs[Double]("q")).toSeq == Seq(0.75, 0.5, 0.25))
    assert(rows(0).getAs[Long]("t_q") == 2L
      && rows(0).getAs[Double]("survival_at") == 0.75)
    assert(rows(1).getAs[Long]("t_q") == 6L
      && rows(1).getAs[Double]("survival_at") == 0.375)
    assert(rows(2).isNullAt(rows(2).fieldIndex("t_q"))) // never ≤ 0.25
    intercept[IllegalArgumentException] {
      Survival.survivalQuantiles(df, "dur", col("ev"), qs = Seq(1.5))
    }
  }

  test("rmst: tau at/below the first event is the all-alive rectangle") {
    val df = Seq((2L, true), (4L, false)).toDF("dur", "ev")
    val r = Survival.rmst(df, "dur", col("ev"), tau = 2L).head()
    assert(r.getAs[Long]("n_events") == 0L)
    assert(r.getAs[Double]("rmst") == 2.0)
    // no events at all: S ≡ 1, rmst = tau exactly
    val cens = Seq((3L, false), (9L, false)).toDF("dur", "ev")
    assert(Survival.rmst(cens, "dur", col("ev"), tau = 5L)
      .head().getAs[Double]("rmst") == 5.0)
  }

  test("aalenJohansen: single cause = 1−KM; competing causes partition 1−S") {
    // one cause only → CIF must equal 1 − KM at every event time
    val one = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 1L)).toDF("dur", "cause")
    val rows = Survival.aalenJohansen(one, "dur", col("cause")).collect()
    assert(rows.map(r => (r.getAs[Long]("t"), r.getAs[Double]("cif"))).toSeq ==
      Seq((1L, 0.25), (2L, 0.5), (4L, 1.0)))
    assert(rows.map(_.getAs[Double]("s_minus")).toSeq == Seq(1.0, 0.75, 0.5))
    // two subjects exit at the same time by DIFFERENT causes: the
    // incidences split the full exit mass 0.5/0.5 — 1−KM per cause
    // would have said 1.0 each
    val comp = Seq((1L, 1L), (1L, 2L)).toDF("dur", "cause")
    val cr = Survival.aalenJohansen(comp, "dur", col("cause")).collect()
    assert(cr.length == 2)
    assert(cr.map(r => (r.getAs[Long]("cause"), r.getAs[Double]("cif"))).toSet ==
      Set((1L, 0.5), (2L, 0.5)))
    assert(cr.forall(_.getAs[Double]("s_minus") == 1.0))
  }

  test("coxBinary: symmetric arms beta exactly 0, hand Newton pin, degenerates NULL") {
    import spark.implicits._
    def run(rows: Seq[(Long, Boolean, Boolean)]) =
      Survival.coxBinary(rows.toDF("dur", "ev", "x"),
        "dur", col("ev"), col("x")).head()
    // identical event-time multisets per arm: r1 = r0 at every event
    // time → U(0) = 0 → Newton never moves — beta EXACTLY 0, hr 1
    val sym = run(Seq((1L, true, true), (2L, true, true),
      (1L, true, false), (2L, true, false)))
    assert(sym.getAs[Double]("beta") == 0.0 && sym.getAs[Double]("hr") == 1.0
      && sym.getAs[Double]("z") == 0.0)
    // interleaved arms (exposed events at 1,3; control at 2,4): the
    // 4-step 12dp Newton replay, pinned against an independent
    // re-implementation (direction: earlier exposed events → hr > 1)
    val hand = run(Seq((1L, true, true), (3L, true, true),
      (2L, true, false), (4L, true, false)))
    assert(hand.getAs[Double]("beta") == 0.940614)
    assert(hand.getAs[Double]("hr") == 2.561553)
    assert(hand.getAs[Double]("se") == 1.240258)
    assert(hand.getAs[Double]("z") == 0.758401)
    // one-arm data carries no contrast (I = 0): NULL estimates
    val oneArm = run(Seq((1L, true, true), (2L, true, true)))
    assert(oneArm.isNullAt(3) && oneArm.isNullAt(4) && oneArm.isNullAt(6))
    // no events at all: NULL estimates, counts still published
    val noEv = run(Seq((1L, false, true), (2L, false, false)))
    assert(noEv.getAs[Long]("n_events") == 0L && noEv.isNullAt(3))
  }

  test("coxStratified: one stratum equals coxBinary; replicas keep beta, shrink se") {
    import spark.implicits._
    val hand = Seq((1L, true, true, "s1"), (3L, true, true, "s1"),
      (2L, true, false, "s1"), (4L, true, false, "s1"))
    def run(rows: Seq[(Long, Boolean, Boolean, String)]) =
      Survival.coxStratified(rows.toDF("dur", "ev", "x", "g"),
        "dur", col("ev"), col("x"), col("g")).head()
    // a single stratum IS the unstratified model: the q380 hand pin
    val one = run(hand)
    assert(one.getAs[Long]("n_strata") == 1L)
    assert(one.getAs[Double]("beta") == 0.940614
      && one.getAs[Double]("hr") == 2.561553)
    // two identical strata: per-step U and I both double, so the
    // Newton path (and beta) is unchanged while information doubles —
    // se shrinks by exactly 1/sqrt(2)
    val two = run(hand ++ hand.map { case (d, e, x, _) => (d, e, x, "s2") })
    assert(two.getAs[Long]("n_strata") == 2L)
    assert(two.getAs[Double]("beta") == 0.940614)
    assert(two.getAs[Double]("se") < one.getAs[Double]("se"))
    // risk sets must NOT cross strata: the same subjects pooled into
    // one stratum give a different beta than kept apart when the
    // strata have different baselines
    val shifted = hand ++ hand.map { case (d, e, x, _) => (d + 100L, e, x, "s2") }
    val strat = run(shifted)
    val pooled = Survival.coxBinary(
      shifted.map(r => (r._1, r._2, r._3)).toDF("dur", "ev", "x"),
      "dur", col("ev"), col("x")).head()
    assert(strat.getAs[Double]("beta") == 0.940614) // within-strata structure intact
    assert(pooled.getAs[Double]("beta") != strat.getAs[Double]("beta"))
  }

  test("concordanceBinary: hand 5/6 ordering, reversal flips, censoring counts, NULL") {
    import spark.implicits._
    def run(rows: Seq[(Long, Boolean, Boolean)]) =
      Survival.concordanceBinary(rows.toDF("dur", "ev", "x"),
        "dur", col("ev"), col("x")).head()
    // exposed event at 1,2; unexposed at 3,4: pairs (1,3)(1,4)(2,3)(2,4)
    // concordant, (1,2)(3,4) marker ties at ½ → C = 5/6
    val good = run(Seq((1L, true, true), (2L, true, true),
      (3L, true, false), (4L, true, false)))
    assert(good.getAs[Long]("n_comparable") == 6L)
    assert(good.getAs[Double]("c_index") == 0.833333)
    // swap the marker: the same pairs read 1/6
    val bad = run(Seq((1L, true, false), (2L, true, false),
      (3L, true, true), (4L, true, true)))
    assert(bad.getAs[Double]("c_index") == 0.166667)
    // a censored later subject IS comparable as the partner: exposed
    // evented before the censored unexposed's horizon → C = 1
    val cens = run(Seq((1L, true, true), (2L, false, false)))
    assert(cens.getAs[Long]("n_comparable") == 1L
      && cens.getAs[Double]("c_index") == 1.0)
    // but a censored EARLIER subject generates no comparison
    val none = run(Seq((1L, false, true), (2L, false, false)))
    assert(none.getAs[Long]("n_comparable") == 0L && none.isNullAt(3))
  }
}
