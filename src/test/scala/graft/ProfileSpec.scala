package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Column profiling + drift: counts/nulls/distinct/min-max, drift math. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("frequentSubsequences: gap-allowed support, one vote per user, prefix cap") {
    // u1: a b c ; u2: a c b ; u3: c a b
    val ev = Seq((1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "c", 3L),
      (2L, 1L, "a", 4L), (2L, 2L, "c", 5L), (2L, 3L, "b", 6L),
      (3L, 1L, "c", 7L), (3L, 2L, "a", 8L), (3L, 3L, "b", 9L))
      .toDF("u", "ts", "t", "id")
    val got = graft.operators.EventPaths.frequentSubsequences(
        ev, "u", "ts", "t", "id", maxLen = 3, topK = 100)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a->b in all three (gap-allowed: u2 has a _ b)
    assert(got(("a->b", 2)) == 3L)
    assert(got(("a->c", 2)) == 2L) // u1, u2
    assert(got(("c->b", 2)) == 2L) // u2, u3
    assert(got(("a->b->c", 3)) == 1L) // only u1
    assert(!got.contains(("b->a", 2)))
    // repeated embeddings vote once: u with a a b still supports a->b once
    val rep = Seq((9L, 1L, "a", 1L), (9L, 2L, "a", 2L), (9L, 3L, "b", 3L))
      .toDF("u", "ts", "t", "id")
    val r2 = graft.operators.EventPaths.frequentSubsequences(
        rep, "u", "ts", "t", "id", maxLen = 2, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r2("a->b") == 1L && r2("a->a") == 1L)
    // prefix cap: events past prefixLen are invisible
    val capped = graft.operators.EventPaths.frequentSubsequences(
        ev.where(col("u") === 1L), "u", "ts", "t", "id",
        maxLen = 2, topK = 10, prefixLen = 2)
      .collect().map(_.getString(0)).toSet
    assert(capped == Set("a->b"))
  }

  private val v0 = Seq(
    (1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
    (3L, None, "a"), (4L, Some(40.0), "c")
  ).toDF("id", "v", "s")

  test("profile: counts, null count, exact distinct, numeric-only min/max") {
    val p = Profile.profile(v0, Seq("id", "v", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0)
    assert(p("id").getLong(3) == 4) // exact regime
    assert(p("v").getLong(2) == 1)  // one null
    assert(p("v").getLong(3) == 3)  // distinct excludes null
    assert(p("v").getDouble(4) == 10.0 && p("v").getDouble(5) == 40.0)
    assert(p("s").getLong(3) == 3)
    assert(p("s").isNullAt(4) && p("s").isNullAt(5)) // non-numeric: no range
  }

  test("drift: null spike, cardinality collapse, range shift") {
    val v1 = Seq(
      (1L, Some(10.0), "a"), (2L, None, "a"),
      (3L, None, "a"), (4L, Some(90.0), "a")
    ).toDF("id", "v", "s")
    val d = Profile.drift(
        Profile.profile(v0, Seq("v", "s")), Profile.profile(v1, Seq("v", "s")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("v").getDouble(3) == 0.25)     // null frac 0.25 → 0.5
    assert(d("s").getDouble(4) == 0.333333) // distinct 3 → 1
    assert(d("v").getDouble(6) == 50.0)     // max 40 → 90
  }

  test("classifierEval: hand confusion; unpredicted class gets NULL precision") {
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("c", "a")).toDF("l", "p")
    val got = graft.operators.Experiment.classifierEval(df, col("l"), col("p"))
      .orderBy("cls").collect()
    val a = got(0); val b = got(1); val c = got(2)
    assert(a.getString(0) == "a" && a.getAs[Long]("n_true") == 3L &&
      a.getAs[Long]("n_pred") == 3L && a.getAs[Long]("tp") == 2L)
    assert(a.getAs[Double]("precision") == 0.666667 &&
      a.getAs[Double]("recall") == 0.666667 &&
      a.getAs[Double]("f1") == 0.666667)
    assert(b.getAs[Double]("recall") == 1.0 && b.getAs[Double]("f1") == 0.8)
    assert(c.getAs[Long]("n_pred") == 0L && c.isNullAt(4) && c.isNullAt(6))
    assert(a.getAs[Double]("accuracy") == 0.666667)
  }

  test("fdAudit: clean FD vs violated FD, hand-checked") {
    val df = Seq((1, "x", "p"), (1, "x", "q"), (2, "y", "p"), (3, "y", "p"))
      .toDF("a", "b", "c")
    val got = graft.operators.Profile.fdAudit(df,
        Seq(("a", "b"), ("b", "c"), ("a", "c")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("max_distinct"), r.getAs[Double]("conformance")))).toMap
    assert(got(("a", "b")) == ((3L, 0L, 1L, 1.0)))      // a → b holds
    assert(got(("b", "c")) == ((2L, 1L, 2L, 0.5)))      // x → {p,q}
    assert(got(("a", "c")) == ((3L, 1L, 2L, 0.666667))) // 1 → {p,q}
  }

  test("interArrival: metronome cv 0, bursty cv positive, replay zero gaps") {
    val ts = (s: Int) => new java.sql.Timestamp(s * 1000L)
    val df = (
      Seq((1L, 0), (1L, 10), (1L, 20), (1L, 30)) ++      // metronome
      Seq((2L, 0), (2L, 1), (2L, 2), (2L, 100)) ++       // bursty
      Seq((3L, 5), (3L, 5), (3L, 5)) ++                  // replay: all dup ts
      Seq((4L, 0), (4L, 9)))                             // under minEvents
      .zipWithIndex.map { case ((u, t), i) => (u, ts(t), i.toLong) }
      .toDF("u", "ts", "id")
    val got = graft.operators.EventPaths.interArrival(df, "u", "ts", "id", 3L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(4L))
    assert(got(1L).getAs[Double]("cv_gap") == 0.0)
    assert(got(1L).getAs[Double]("mean_gap_s") == 10.0)
    // user 2 gaps (1,1,98): mean 100/3; var_num = 3·9606 − 10000 = 18818
    assert(got(2L).getAs[Double]("cv_gap") ==
      BigDecimal(math.sqrt(18818.0) / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(3L).getAs[Double]("zero_gap_frac") == 1.0)
    assert(got(3L).isNullAt(4)) // sg = 0 → cv null
  }

  test("kAnonymity: hand-checked class sizes and l-diversity violations") {
    // classes: (1,x)→4 rows sens {a,b}; (1,y)→2 rows sens {a};
    //          (2,x)→5 rows sens {a,b,c}
    val df = (Seq.fill(2)((1, "x", "a")) ++ Seq.fill(2)((1, "x", "b")) ++
      Seq.fill(2)((1, "y", "a")) ++
      (Seq.fill(3)((2, "x", "a")) ++ Seq((2, "x", "b"), (2, "x", "c"))))
      .toDF("qi1", "qi2", "sens")
    val r = Profile.kAnonymity(df, Seq("qi1", "qi2"), "sens", k = 5, l = 2).head()
    assert(r.getAs[Long]("n_rows") == 11L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("min_class_size") == 2L)
    assert(r.getAs[Long]("n_rows_k_violating") == 6L)   // 4 + 2
    assert(r.getAs[Long]("n_classes_k_violating") == 2L)
    assert(r.getAs[Long]("min_l") == 1L)                // class (1,y)
    assert(r.getAs[Long]("n_classes_l_violating") == 1L)
  }

  test("dpCounts: seeded noise is reproducible, Laplace-shaped, and the " +
      "release carries its accounting columns") {
    val df = (1 to 50).map(i => (if (i <= 30) "a" else "b", i)).toDF("g", "v")
    val r1 = Profile.dpCounts(df, Seq("g"), salt = "s1", epsilon = 0.5)
      .orderBy("g").collect()
    val r2 = Profile.dpCounts(df, Seq("g"), salt = "s1", epsilon = 0.5)
      .orderBy("g").collect()
    // same salt -> bit-identical release (reproducible audits)
    assert(r1.map(_.getAs[Double]("noisy_count")).toSeq ==
      r2.map(_.getAs[Double]("noisy_count")).toSeq)
    // a different salt draws different noise
    val r3 = Profile.dpCounts(df, Seq("g"), salt = "s2", epsilon = 0.5)
      .orderBy("g").collect()
    assert(r1.map(_.getAs[Double]("noisy_count")).toSeq !=
      r3.map(_.getAs[Double]("noisy_count")).toSeq)
    // accounting columns: eps, sensitivity 1, scale = 1/eps
    r1.foreach { r =>
      assert(r.getAs[Double]("epsilon") == 0.5)
      assert(r.getAs[Long]("sensitivity") == 1L)
      assert(r.getAs[Double]("scale") == 2.0)
    }
    // the noise really is the inverse-CDF value for the group's md5
    // uniform: recompute one group by hand
    val u = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("s1:a").substring(0, 13), 16)
      .toDouble / 4503599627370496.0
    val inner = math.max(1.0 - 2.0 * math.abs(u - 0.5), 1.0 / 4503599627370496.0)
    val expect = BigDecimal(30.0 + -2.0 * math.signum(u - 0.5) * math.log(inner))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.find(_.getString(0) == "a").get.getAs[Double]("noisy_count") == expect)
    // noise magnitude is Laplace(2)-plausible: |noise| below ~20 for
    // any u >= 2^-52 is not guaranteed, but the draw is fixed - assert
    // the published value stays finite and within 40 of the exact count
    assert(math.abs(r1.find(_.getString(0) == "b").get
      .getAs[Double]("noisy_count") - 20.0) < 40.0)
  }

  test("datasetFingerprint: layout-invariant, mergeable by addition, " +
      "sensitive to a single cell") {
    val df = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Profile.datasetFingerprint(d, Seq(col("id"), col("s"))).head()
    val a = fp(df)
    assert(a.getLong(0) == 200L)
    // layout-free: repartition/coalesce do not move the sum
    assert(fp(df.repartition(17)).getString(1) == a.getString(1))
    assert(fp(df.orderBy(desc("id"))).getString(1) == a.getString(1))
    // mergeable: fingerprint(union) == fingerprint parts summed
    val left = df.where(col("id") <= 120)
    val right = df.where(col("id") > 120)
    val merged = BigInt(fp(left).getString(1)) + BigInt(fp(right).getString(1))
    assert(merged == BigInt(a.getString(1)))
    // one changed cell changes the fingerprint
    val tweaked = df.withColumn("s",
      when(col("id") === 77L, lit("v77x")).otherwise(col("s")))
    assert(fp(tweaked).getString(1) != a.getString(1))
  }

  test("modeBy: frequency winner, smallest-value tie-break, null exclusion") {
    val df = (Seq.fill(3)(("g1", "b")) ++ Seq.fill(3)(("g1", "a")) ++
      Seq(("g1", "z"), ("g2", "x")) :+ (("g2", null))).toDF("g", "v")
    val got = Profile.modeBy(df, "g", "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // g1: a and b tie at 3 -> smallest value wins; 3 distinct values
    assert(got == Seq(("g1", "a", 3L, 3L), ("g2", "x", 1L, 1L)))
    // a group with only nulls publishes no row
    val nulls = Seq(("g3", Option.empty[String])).toDF("g", "v")
    assert(Profile.modeBy(nulls, "g", "v").isEmpty)
  }

  test("sprt: hand crossing with ln3 constants, H0 side, continue, contract") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Experiment
    // p0=.25/p1=.75: each success adds ln3; A = ln19 crossed at 3 successes
    val df = Seq((1L, 2L, 2L), (2L, 1L, 1L), (3L, 5L, 5L)).toDF("t", "n", "s")
    val r = Experiment.sprt(df, "t", col("n"), col("s"), 0.25, 0.75).head()
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Long]("t") == 2L && r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("llr") ==
      math.rint(3.0 * 1.098612288668 * 1e6) / 1e6)
    // all failures cross the LOWER bound
    val lo = Seq((1L, 2L, 0L), (2L, 1L, 0L)).toDF("t", "n", "s")
    assert(Experiment.sprt(lo, "t", col("n"), col("s"), 0.25, 0.75)
      .head().getAs[String]("decision") == "accept_h0")
    // not enough evidence: continue with the final state
    val open = Seq((1L, 1L, 1L)).toDF("t", "n", "s")
    val ro = Experiment.sprt(open, "t", col("n"), col("s"), 0.25, 0.75).head()
    assert(ro.getAs[String]("decision") == "continue" && ro.getAs[Long]("n") == 1L)
    intercept[IllegalArgumentException] {
      Experiment.sprt(df, "t", col("n"), col("s"), 0.5, 0.5)
    }
  }

  test("strataMatchAtt: hand strata, off-support excluded, weighting exact") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Experiment
    // A: T[10,20] C[5] diff 10 (nt 2); B: T[8] C[2,4] diff 5 (nt 1);
    // C: treated only -> excluded. ATT = (2*10 + 1*5)/3
    val df = Seq(("A", true, 10L), ("A", true, 20L), ("A", false, 5L),
      ("B", true, 8L), ("B", false, 2L), ("B", false, 4L),
      ("C", true, 99L)).toDF("g", "tr", "y")
    val r = Experiment.strataMatchAtt(df, col("g"), col("tr"), col("y")).head()
    assert(r.getAs[Long]("n_strata") == 3 && r.getAs[Long]("n_strata_used") == 2)
    assert(r.getAs[Long]("n_treated_used") == 3 && r.getAs[Long]("n_control_used") == 3)
    assert(r.getAs[Double]("att") == math.rint(25.0 / 3.0 * 1e6) / 1e6)
    // no matched stratum -> NULL att
    val none = Seq(("A", true, 1L), ("B", false, 2L)).toDF("g", "tr", "y")
    val rn = Experiment.strataMatchAtt(none, col("g"), col("tr"), col("y")).head()
    assert(rn.isNullAt(rn.fieldIndex("att")))
  }

  test("diffInDiff: hand cells, shared shock cancels, empty cell -> NULL") {
    import org.apache.spark.sql.functions.col
    // treated pre [5] -> post [10,20]; control pre [4] -> post [8]
    // did = (15 - 5) - (8 - 4) = 6
    val df = Seq((true, true, 10L), (true, true, 20L), (true, false, 5L),
      (false, true, 8L), (false, false, 4L)).toDF("tr", "po", "y")
    val r = graft.operators.Experiment.diffInDiff(df, col("tr"), col("po"),
      col("y")).head()
    assert(r.getAs[Long]("n_tp") == 2 && r.getAs[Long]("n_c0") == 1)
    assert(r.getAs[Double]("m_treat_post") == 15.0)
    assert(r.getAs[Double]("did") == 6.0)
    // a uniform +100 post-period shock to BOTH groups leaves did alone
    val shocked = Seq((true, true, 110L), (true, true, 120L),
      (true, false, 5L), (false, true, 108L), (false, false, 4L))
      .toDF("tr", "po", "y")
    assert(graft.operators.Experiment.diffInDiff(shocked, col("tr"),
      col("po"), col("y")).head().getAs[Double]("did") == 6.0)
    // an empty cell nulls its mean and the effect — never a silent 0
    val missing = Seq((true, true, 10L), (false, true, 8L),
      (false, false, 4L)).toDF("tr", "po", "y")
    val rm = graft.operators.Experiment.diffInDiff(missing, col("tr"),
      col("po"), col("y")).head()
    assert(rm.isNullAt(rm.fieldIndex("m_treat_pre")))
    assert(rm.isNullAt(rm.fieldIndex("did")))
  }

  test("mcnemar: hand discordants, concordant-only -> NULL chi2") {
    import org.apache.spark.sql.functions.col
    // b = n01 = 5, c = n10 = 1: chi2 = 16/6, cc = (4-1)^2/6
    val df = (Seq.fill(2)((false, false)) ++ Seq.fill(5)((false, true)) ++
      Seq.fill(1)((true, false)) ++ Seq.fill(3)((true, true)))
      .toDF("bf", "af")
    val r = graft.operators.Experiment.mcnemar(df, col("bf"), col("af")).head()
    assert(r.getAs[Long]("n") == 11 && r.getAs[Long]("n01") == 5
      && r.getAs[Long]("n10") == 1)
    assert(r.getAs[Double]("chi2") == math.rint(16.0 / 6.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("chi2_cc") == math.rint(9.0 / 6.0 * 1e6) / 1e6)
    // |b-c| <= 1 floors the corrected statistic at 0, not negative
    val close = (Seq.fill(3)((false, true)) ++ Seq.fill(2)((true, false)))
      .toDF("bf", "af")
    assert(graft.operators.Experiment.mcnemar(close, col("bf"), col("af"))
      .head().getAs[Double]("chi2_cc") == 0.0)
    // no discordant pairs -> loud NULL, not a fake 0
    val conc = Seq((true, true), (false, false)).toDF("bf", "af")
    val rc = graft.operators.Experiment.mcnemar(conc, col("bf"), col("af")).head()
    assert(rc.isNullAt(rc.fieldIndex("chi2")))
  }

  test("fisherExact: tea-tasting hands, symmetry, degenerate margin, refusal") {
    import org.apache.spark.sql.functions.col
    // Fisher's tea table (3,1,1,3): p_two 34/70 = 0.485714 (R's
    // fisher.test), one-sided right 17/70 = 0.242857, left 69/70
    def table(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false)))
        .toDF("ex", "ou")
    val r = graft.operators.Experiment
      .fisherExact(table(3, 1, 1, 3), col("ex"), col("ou")).head()
    assert(r.getAs[Long]("n") == 8 && r.getAs[Long]("a") == 3
      && r.getAs[Long]("support") == 5)
    assert(r.getAs[Double]("p_two") == 0.485714)
    assert(r.getAs[Double]("p_right") == 0.242857)
    assert(r.getAs[Double]("p_left") == 0.985714)
    assert(r.getAs[Double]("odds_ratio") == 9.0)
    // transposed-association table gives the same two-sided p
    val rt = graft.operators.Experiment
      .fisherExact(table(1, 3, 3, 1), col("ex"), col("ou")).head()
    assert(rt.getAs[Double]("p_two") == 0.485714)
    assert(rt.getAs[Double]("p_left") == 0.242857)
    // degenerate margin (no outcome=true anywhere): single-point
    // support, p = 1, odds ratio NULL
    val rd = graft.operators.Experiment
      .fisherExact(table(0, 2, 0, 2), col("ex"), col("ou")).head()
    assert(rd.getAs[Long]("support") == 1L
      && rd.getAs[Double]("p_two") == 1.0)
    assert(rd.isNullAt(rd.fieldIndex("odds_ratio")))
    // support above maxSupport refuses loudly (small-margin instrument)
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Experiment
        .fisherExact(table(3, 1, 1, 3), col("ex"), col("ou"), maxSupport = 4)
    }
    assert(ex.getMessage.contains("maxSupport"))
  }

  test("mantelHaenszel: hand strata, n<2 excluded, zero-denominator NULL") {
    import org.apache.spark.sql.functions.col
    // s1: a=4 b=1 c=2 d=3; s2: a=2 b=2 c=1 d=5 (both n=10)
    def stratum(g: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((g, true, true)) ++ Seq.fill(b)((g, true, false)) ++
        Seq.fill(c)((g, false, true)) ++ Seq.fill(d)((g, false, false))
    val df = (stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 2, 2, 1, 5) ++
      Seq(("tiny", true, true))).toDF("g", "ex", "ou")
    val r = graft.operators.Experiment.mantelHaenszel(df, col("g"),
      col("ex"), col("ou")).head()
    assert(r.getAs[Long]("n_strata") == 3 && r.getAs[Long]("n_used") == 2)
    assert(r.getAs[Long]("sum_a") == 6)
    // s_ad = 1.2 + 1.0, s_bc = 0.2 + 0.2 -> OR = 5.5
    assert(r.getAs[Double]("or_mh") == 5.5)
    // chi2 recomposed with the operator's own double spelling
    val sE = BigDecimal("4.200000000000").toDouble
    val sV = BigDecimal("1.226666666667").toDouble
    val num = math.max(math.abs(6.0 - sE) - 0.5, 0.0)
    assert(r.getAs[Double]("chi2_mh") ==
      BigDecimal(num * num / sV).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // all-exposed strata: b = c = 0 everywhere -> OR denominator 0 -> NULL
    val oneSided = (Seq.fill(3)(("s", true, true)) ++
      Seq.fill(3)(("s", true, false))).toDF("g", "ex", "ou")
    val ro = graft.operators.Experiment.mantelHaenszel(oneSided, col("g"),
      col("ex"), col("ou")).head()
    assert(ro.isNullAt(ro.fieldIndex("or_mh")))
  }

  test("attribution: last/first/linear over the lookback, same-ts exclusion, direct") {
    // u1: view@10 click@20 purchase@30 (m=2), purchase@1e6 (direct)
    // u2: click@5 view@5 (tie-broken by id) purchase@50
    // u3: view@40 purchase@40 — same second never self-credits -> direct
    val ev = Seq(
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
      (1L, 1000000L, "purchase", 4L),
      (2L, 5L, "click", 5L), (2L, 5L, "view", 6L), (2L, 50L, "purchase", 7L),
      (3L, 40L, "view", 8L), (3L, 40L, "purchase", 9L))
      .toDF("u", "ts", "t", "id")
    val rows = graft.operators.EventPaths.attribution(ev, "u", "ts", "t", "id",
      target = "purchase", lookback = 100L).orderBy("channel").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("(direct)", "click", "view"))
    val Seq(d, c, v) = rows.toSeq
    assert(d.getAs[Long]("last_touch") == 2 && d.getAs[Long]("first_touch") == 2
      && d.getAs[Double]("linear") == 2.0)
    assert(c.getAs[Long]("last_touch") == 1 && c.getAs[Long]("first_touch") == 1
      && c.getAs[Double]("linear") == 1.0)
    assert(v.getAs[Long]("last_touch") == 1 && v.getAs[Long]("first_touch") == 1
      && v.getAs[Double]("linear") == 1.0)
    // no touch channels besides the target refuses loudly
    intercept[IllegalArgumentException] {
      graft.operators.EventPaths.attribution(
        Seq((1L, 1L, "purchase", 1L)).toDF("u", "ts", "t", "id"),
        "u", "ts", "t", "id", "purchase", 100L)
    }
  }

  test("attributionWeighted: dyadic decay buckets, U-shaped credit, direct") {
    // lookback 7 half-lives of 100 s; conversion at t=1000.
    // u1: ad Δ=101 (e=1, w=32), email Δ=1 (e=0, w=64), m=2
    //     → decay email 64/96, ad 32/96; position 0.5 / 0.5
    // u2: promo Δ=4 (first), email Δ=3 (mid), ad Δ=2 (last), all e=0, m=3
    //     → decay 1/3 each; position ad/promo (2·1·1+0)/5=0.4, email 1/5
    // u3: purchase with a same-second touch only → "(direct)"
    // boundary: u1's ad at Δ=101 is e=1; a Δ=100 touch would still be e=0
    val ev = Seq(
      (1L, 899L, "ad", 1L), (1L, 999L, "email", 2L), (1L, 1000L, "purchase", 3L),
      (2L, 996L, "promo", 4L), (2L, 997L, "email", 5L), (2L, 998L, "ad", 6L),
      (2L, 1000L, "purchase", 7L),
      (3L, 1000L, "ad", 8L), (3L, 1000L, "purchase", 9L))
      .toDF("u", "ts", "t", "id")
    val rows = graft.operators.EventPaths.attributionWeighted(ev, "u", "ts",
      "t", "id", target = "purchase", lookback = 700L, halflife = 100L)
      .orderBy("channel").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("(direct)", "ad", "email", "promo"))
    val Seq(d, a, e, p) = rows.toSeq
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d.getAs[Long]("n_touched") == 1 && d.getAs[Double]("decay") == 1.0
      && d.getAs[Double]("position") == 1.0)
    // decay: ad 32/96 + 64/192·... u2 all-equal weights → 1/3 each
    val third = BigDecimal(1.0 / 3).setScale(12,
      BigDecimal.RoundingMode.HALF_UP)
    assert(a.getAs[Double]("decay") == r6(
      (third + BigDecimal(32.0 / 96).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).toDouble))
    assert(e.getAs[Double]("decay") == r6(
      (third + BigDecimal(64.0 / 96).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).toDouble))
    assert(p.getAs[Double]("decay") == r6(third.toDouble))
    // position: ad 0.5(u1 first? no — u1 first=ad) ... totals below
    assert(a.getAs[Double]("position") == 0.9)  // 0.5 (u1) + 0.4 (u2 last)
    assert(e.getAs[Double]("position") == 0.7)  // 0.5 (u1) + 0.2 (u2 mid)
    assert(p.getAs[Double]("position") == 0.4)  // 0.4 (u2 first)
    assert(a.getAs[Long]("n_touched") == 2 && e.getAs[Long]("n_touched") == 2
      && p.getAs[Long]("n_touched") == 1)
    // non-whole half-life count refuses loudly
    intercept[IllegalArgumentException] {
      graft.operators.EventPaths.attributionWeighted(ev, "u", "ts", "t", "id",
        "purchase", lookback = 750L, halflife = 100L)
    }
  }

  test("standardizedRates: Simpson scenario flips under the pooled mix; " +
      "off-support strata excluded and counted") {
    import graft.operators.Experiment
    // A: s1 80 rows r=.5, s2 20 rows r=.1 → raw .42
    // B: s1 20 rows r=.4, s2 80 rows r=.075 → raw .14
    // pooled mix 100/100 → std_a = (50+10)/200 = .3, std_b = (40+7.5)/200
    // plus an A-only stratum s3 (off-support, excluded)
    def rows(g: String, s: String, n: Int, c: Int) =
      (0 until n).map(i => (s, g, i < c))
    val units = (rows("A", "s1", 80, 40) ++ rows("A", "s2", 20, 2) ++
      rows("B", "s1", 20, 8) ++ rows("B", "s2", 80, 6) ++
      rows("A", "s3", 10, 10))
      .toDF("s", "g", "y")
    val r = Experiment.standardizedRates(units, col("s"), col("g"), col("y"))
      .head()
    assert(r.getAs[String]("group_a") == "A")
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("n_b") == 100L)
    assert(r.getAs[Double]("raw_a") == 0.42 && r.getAs[Double]("raw_b") == 0.14)
    assert(r.getAs[Double]("std_a") == 0.3)
    assert(r.getAs[Double]("std_b") == 0.2375)
    assert(r.getAs[Long]("n_strata") == 2L
      && r.getAs[Long]("n_off_support") == 1L)
    assert(r.getAs[Double]("std_diff") == -0.0625)
    intercept[IllegalArgumentException] {
      Experiment.standardizedRates(units.where(col("g") === "A"),
        col("s"), col("g"), col("y"))
    }
  }

  test("signTest: hand counts, ties excluded, all-tied NULL z") {
    import graft.operators.Experiment
    val pairs = Seq((1L, 2L), (1L, 3L), (5L, 4L), (7L, 7L)).toDF("b", "a")
    val r = Experiment.signTest(pairs, col("b"), col("a")).head()
    assert(r.getAs[Long]("n_pairs") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("n_neg") == 1L && r.getAs[Long]("n_tie") == 1L)
    assert(r.getAs[Double]("z") ==
      BigDecimal(1.0 / math.sqrt(3.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    val allTied = Seq((3L, 3L), (9L, 9L)).toDF("b", "a")
    val t = Experiment.signTest(allTied, col("b"), col("a")).head()
    assert(t.isNullAt(t.fieldIndex("z")) && t.getAs[Long]("n_tie") == 2L)
  }

  test("captureRecapture: hand Chapman, duplicates collapse, coverages") {
    import graft.operators.Profile
    val a = Seq(1L, 2L, 3L, 4L, 4L).toDF("k") // dup collapses: nA = 4
    val b = Seq(3L, 4L, 5L, 6L).toDF("k")
    val r = Profile.captureRecapture(a, b, "k").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("overlap") == 2L)
    // Chapman: 5·5/3 − 1 = 7.333333
    assert(r.getAs[Double]("n_hat") == 7.333333)
    assert(r.getAs[Double]("coverage_a") ==
      BigDecimal(4.0 / 7.333333).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("simpsonDiversity: hand lambda and Hill numbers") {
    import graft.operators.Profile
    // g1: counts [2,2] → λ=8/16=0.5, eff=2; g2: [3,1] → λ=10/16, eff=1.6
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"),
      ("g2", "a"), ("g2", "a"), ("g2", "a"), ("g2", "b")).toDF("g", "t")
    val rows = Profile.simpsonDiversity(df, "g", "t")
      .orderBy("group").collect()
    val Seq(g1, g2) = rows.toSeq
    assert(g1.getAs[Double]("simpson") == 0.5
      && g1.getAs[Double]("gini_simpson") == 0.5
      && g1.getAs[Double]("effective_types") == 2.0)
    assert(g2.getAs[Double]("simpson") == 0.625
      && g2.getAs[Double]("effective_types") == 1.6)
    assert(g2.getAs[Long]("n") == 4L && g2.getAs[Long]("n_types") == 2L)
  }

  test("behavioralEntropy: hand 12dp term sums, uniform mix normalizes to 1, " +
      "single-type user gets NULL norm") {
    // A: 2 view + 2 click → H = ln 2; B: 4 view → H = 0, norm NULL;
    // C: 1 a + 3 b → 0.25·ln4 + 0.75·ln(4/3) = 0.562335 at 6dp
    val ev = Seq(
      ("A", "view"), ("A", "view"), ("A", "click"), ("A", "click"),
      ("B", "view"), ("B", "view"), ("B", "view"), ("B", "view"),
      ("C", "a"), ("C", "b"), ("C", "b"), ("C", "b"))
      .toDF("u", "t")
    val rows = graft.operators.EventPaths.behavioralEntropy(ev, "u", "t")
      .orderBy("user").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val Seq(a, b, c) = rows.toSeq
    assert(a.getAs[Double]("entropy") == 0.693147)
    assert(a.getAs[Double]("entropy_norm") == 1.0)
    assert(b.getAs[Double]("entropy") == 0.0)
    assert(b.isNullAt(b.fieldIndex("entropy_norm")))
    assert(c.getAs[Double]("entropy") == 0.562335)
    assert(c.getAs[Long]("n_events") == 4L && c.getAs[Long]("n_types") == 2L)
  }

  test("stlDecompose: independent replica over an alternating series, edge NULLs") {
    import org.apache.spark.sql.functions.col
    val xs = Seq(10L, 20L, 12L, 22L, 14L, 24L, 16L, 26L, 18L, 28L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong * 86400L, x) }
      .toDF("k", "t", "units")
    val rows = graft.operators.TimeSeries.stlDecompose(df, "k", "t", "units",
      period = 2, halfWindowDays = 1).orderBy("t").collect()
    assert(rows.length == 10)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // replica: trend over complete +-1-day windows, parity seasonal means
    val trend = xs.indices.map { i =>
      if (i == 0 || i == 9) None
      else Some(r6((xs(i - 1) + xs(i) + xs(i + 1)).toDouble / 3.0))
    }
    val det = xs.indices.map(i => trend(i).map(tr => r6(xs(i).toDouble - tr)))
    val seas = (0 to 1).map { s =>
      val ds = xs.indices.filter(i => i % 2 == s).flatMap(det)
      s -> r6(ds.map(BigDecimal(_)).sum.toDouble / ds.size)
    }.toMap
    xs.indices.foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("s") == i % 2)
      trend(i) match {
        case None => assert(r.isNullAt(r.fieldIndex("trend")) &&
          r.isNullAt(r.fieldIndex("seasonal")) && r.isNullAt(r.fieldIndex("resid")))
        case Some(tr) =>
          assert(r.getAs[Double]("trend") == tr)
          assert(r.getAs[Double]("seasonal") == seas(i % 2))
          assert(r.getAs[Double]("resid") ==
            r6(xs(i).toDouble - tr - seas(i % 2)))
      }
    }
    // additivity: units == trend + seasonal + resid on complete rows (6dp)
    rows.filter(!_.isNullAt(4)).foreach { r =>
      val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(back - r.getAs[Long]("units").toDouble) < 2e-6)
    }
  }

  test("stationary: integer power iteration replica, dangling self-loop, refusal") {
    // u1: a a b a ; u2: b c — c has no outgoing transition (absorbing)
    val ev = Seq((1L, 1L, "a", 1L), (1L, 2L, "a", 2L), (1L, 3L, "b", 3L),
      (1L, 4L, "a", 4L), (2L, 1L, "b", 5L), (2L, 2L, "c", 6L))
      .toDF("u", "ts", "t", "id")
    val got = graft.operators.EventPaths.stationary(ev, "u", "ts", "t", "id",
      iters = 16).orderBy("state").collect()
    // independent replica: c(a,a)=1 c(a,b)=1 c(b,a)=1 c(b,c)=1, c dangling
    val U = 1000000000000L
    val p = Array(Array(U / 2, U / 2, 0L), Array(U / 2, 0L, U / 2),
      Array(0L, 0L, U))
    var v = Array.fill(3)(U / 3)
    for (_ <- 1 to 16) v = Array.tabulate(3) { j =>
      (0 until 3).map(i => BigInt(v(i)) * p(i)(j) / U).sum.toLong
    }
    assert(got.map(_.getAs[Long]("pi_units")).toSeq == v.toSeq)
    assert(got.map(_.getAs[Long]("n_out")).toSeq == Seq(2L, 2L, 0L))
    // the absorbing state soaks up most of the mass by iteration 16
    assert(got(2).getAs[Double]("pi") > 0.8)
    assert(got(2).getAs[Double]("pi") ==
      BigDecimal(v(2).toDouble / 1e12).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    intercept[IllegalArgumentException] {
      graft.operators.EventPaths.stationary(ev, "u", "ts", "t", "id",
        maxStates = 2)
    }
  }

  test("concentration: hand Gini and tie-split top shares; refusals") {
    import graft.operators.Profile
    // [1,2,3,4]: S1=30, T=10, n=4 → gini=(60−50)/40=0.25; k10=k1=1 → 0.4
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val r = Profile.concentration(df, col("v")).head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("total_units") == 10L)
    assert(r.getAs[Double]("gini") == 0.25)
    assert(r.getAs[Double]("top10_share") == 0.4)
    assert(r.getAs[Double]("top1_share") == 0.4)
    // all equal: gini exactly 0; top-1-of-4 share = 2/8
    val eq = Seq(2L, 2L, 2L, 2L).toDF("v")
    val re = Profile.concentration(eq, col("v")).head()
    assert(re.getAs[Double]("gini") == 0.0)
    assert(re.getAs[Double]("top10_share") == 0.25)
    // layout invariance (distributed prefix sums, no global window)
    val big = (1 to 500).map(i => (i % 37).toLong).toDF("v")
    assert(Profile.concentration(big.repartition(13), col("v")).head() ==
      Profile.concentration(big.repartition(2), col("v")).head())
    intercept[IllegalArgumentException] {
      Profile.concentration(Seq(-1L, 5L).toDF("v"), col("v"))
    }
    intercept[IllegalArgumentException] {
      Profile.concentration(Seq.empty[Long].toDF("v"), col("v"))
    }
    // documented long bound ENFORCED, not just stated: v·c wraps 2⁶³−1
    // (4.7e18 × 2) — must refuse loudly, not publish a wrapped Gini
    val wrap = intercept[IllegalArgumentException] {
      Profile.concentration(
        Seq(4700000000000000000L, 4700000000000000000L).toDF("v"), col("v"))
    }
    assert(wrap.getMessage.contains("exceed 2^63-1"))
    // total wraps while every per-value product fits: three distinct
    // values near the cap sum past 2⁶³−1
    val wrapTot = intercept[IllegalArgumentException] {
      Profile.concentration(
        Seq(4600000000000000000L, 4600000000000000001L,
          4600000000000000002L).toDF("v"), col("v"))
    }
    assert(wrapTot.getMessage.contains("exceed 2^63-1"))
  }
  test("entropyRate: deterministic cycle reads 0, uniform 2-chain reads ln 2") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, String, String)]) =
      graft.operators.EventPaths.entropyRate(
        rows.toDF("u", "ts", "t", "id"), "u", "ts", "t", "id").head()
    // a→b→a→b: every transition is forced — zero surprise per step
    val cyc = run(Seq(("u1", 1L, "a", "e1"), ("u1", 2L, "b", "e2"),
      ("u1", 3L, "a", "e3"), ("u1", 4L, "b", "e4")))
    assert(cyc.getAs[Long]("n_states") == 2L
      && cyc.getAs[Long]("n_transitions") == 3L)
    assert(cyc.getAs[Double]("entropy_rate") == 0.0
      && cyc.getAs[Double]("branching") == 1.0)
    // both states branch 50/50: rate = ln 2, effective branching 2
    val uni = run(Seq(("u1", 1L, "a", "e1"), ("u1", 2L, "a", "e2"),
      ("u1", 3L, "b", "e3"), ("u1", 4L, "a", "e4"),
      ("u2", 1L, "b", "e5"), ("u2", 2L, "b", "e6")))
    assert(uni.getAs[Double]("entropy_rate") == 0.693147
      && uni.getAs[Double]("branching") == 2.0)
  }
}
