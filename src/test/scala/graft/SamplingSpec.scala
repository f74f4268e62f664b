package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Deterministic hash sampling: reproducibility under repartitioning is
  * the whole point — pin it, plus rate accuracy and split disjointness. */
class SamplingSpec extends SparkSpec {

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("md5Frac52 kernel == conv(substring(md5)) Column chain byte-for-byte") {
    import spark.implicits._
    // the salted-fraction idiom shared by sampling/bootstrap/experiment
    // operators — the kernel must reproduce the chain EXACTLY (any drift
    // re-draws every sample/replica)
    val inputs = ids.select(concat(lit("salt:"), col("id").cast("string")).as("x"))
      .unionByName(Seq("", "ünïcodé:id", " sp ace ", "boot:42:7")
        .map(Tuple1(_)).toDF("x"))
    val cmp = inputs.select(
      graft.functions.GraftFunctions.md5Frac52(col("x")).as("kern"),
      conv(substring(md5(col("x")), 1, 13), 16, 10).cast("long").as("hof"))
    assert(cmp.where(col("kern") =!= col("hof")).count() == 0)
  }

  test("hashSample: deterministic, partition-invariant, ~fraction rate") {
    val a = Sampling.hashSample(ids, "id", 0.1).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(17), "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // df.sample would fail this
    assert(math.abs(a.size / 20000.0 - 0.1) < 0.01, s"rate ${a.size / 20000.0}")
    // different salt → independent draw (not identical, similar size)
    val c = Sampling.hashSample(ids, "id", 0.1, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(c != a)
    // fraction is monotone: the 10% sample is inside the 20% sample
    val wide = Sampling.hashSample(ids, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wide))
  }

  test("assignSplit: disjoint, exhaustive, stable when data grows") {
    val out = Sampling.assignSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == 20000) // every row assigned exactly once
    val rates = byId.values.groupBy(identity).view.mapValues(_.size / 20000.0).toMap
    assert(math.abs(rates("train") - 0.8) < 0.02, rates.toString)
    assert(math.abs(rates("val") - 0.1) < 0.01)
    assert(math.abs(rates("test") - 0.1) < 0.01)
    // leakage safety: assignments computed over a SUBSET agree with the
    // full run — growing the corpus never moves an existing row
    val subset = Sampling.assignSplit(ids.where(col("id") < 5000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (k, v) => byId(k) == v })
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("null ids: dropped from samples, last split branch (SQL-oracle parity)") {
    val withNull = spark.createDataFrame(
      Seq(Tuple1(Option(1L)), Tuple1(Option(2L)), Tuple1(Option.empty[Long])))
      .toDF("id")
    assert(Sampling.hashSample(withNull, "id", 0.999999)
      .collect().forall(!_.isNullAt(0))) // null never sampled
    val splits = Sampling.assignSplit(withNull, "id",
      Seq("train" -> 0.9, "test" -> 0.1)).collect()
      .map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(splits(None) == "test") // null falls through every cutoff
  }

  test("sampleStratified: per-stratum rates, full-keep and zero-default") {
    val df = ids.withColumn("q", when(col("id") % 10 === 0, "high").otherwise("low"))
    val kept = Sampling.sampleStratified(df, "id", "q",
      Map("high" -> 1.0, "low" -> 0.05))
    val byStratum = kept.groupBy("q").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("high") == 2000) // 100% of high
    assert(math.abs(byStratum("low") / 18000.0 - 0.05) < 0.01)
    // stratum not in the map + defaultFraction 0 → dropped entirely
    val dropped = Sampling.sampleStratified(df, "id", "q", Map("high" -> 1.0))
    assert(dropped.groupBy("q").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("high" -> 2000L))
  }

  test("stratifiedSplitExact: exact per-stratum counts, disjoint, deterministic") {
    import org.apache.spark.sql.functions.{col, concat, lit, md5}
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, if (i <= 70) "a" else "b"))
      .toDF("id", "src")
    val ord = md5(concat(lit("t:"), col("id").cast("string")))
    val got = Sampling.stratifiedSplitExact(df, "id", "src", 1, 10, ord)
    // exact counts: round(70/10)=7, round(30/10)=3
    val perStratum = got.where(col("split") === "test")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum == Map("a" -> 7L, "b" -> 3L))
    // half-up rational rounding: n=15, 1/10 -> (15+5)//10 = 2
    val odd = (1 to 15).map(i => (i.toLong, "x")).toDF("id", "src")
    assert(Sampling.stratifiedSplitExact(odd, "id", "src", 1, 10, ord)
      .where(col("split") === "test").count() == 2L)
    // deterministic + partition-invariant membership
    val a = got.where(col("split") === "test").select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratifiedSplitExact(df.repartition(13), "id", "src", 1, 10, ord)
      .where(col("split") === "test").select("id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)
    // exhaustive + disjoint
    assert(got.select("id").distinct().count() == 100L)
    assert(got.where(col("split").isin("test", "train")).count() == 100L)
  }

  test("contamination: hand-built corpus, full / partial / zero overlap") {
    // force the split with a two-way 0/1 weighting trick: instead, build
    // docs whose md5 assignment is known — easier to just probe the real
    // assignment and pick ids landing in train/test
    val probe = Sampling.assignSplit(
      spark.range(0, 200).toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = probe.collectFirst { case (i, "train") => i }.get
    val testIds = probe.collect { case (i, "test") => i }.take(3).toSeq
    val docs = spark.createDataFrame(Seq(
      trainId    -> "alpha beta gamma delta epsilon", // train corpus
      testIds(0) -> "alpha beta gamma delta epsilon", // identical → 1.0
      testIds(1) -> "alpha beta gamma zeta eta theta", // shares 1 trigram of 4
      testIds(2) -> "iota kappa lambda mu"             // disjoint → 0.0
    )).toDF("id", "text")
    val out = Sampling.contamination(docs, "id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(testIds(0)) == ((3L, 3L, 1.0)))
    assert(out(testIds(1)) == ((4L, 1L, 0.25)))
    assert(out(testIds(2)) == ((2L, 0L, 0.0)))
    assert(!out.contains(trainId)) // report covers the test split only
  }

  test("contaminationBloom == contamination exactly (no false negatives by construction)") {
    val docs = engine.table("documents")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val exact = keyed(Sampling.contamination(docs, "doc_id", "text", splits))
    // even at an aggressive fpp the exact join scrubs every Bloom false
    // positive — results must be IDENTICAL, not merely close
    for (fpp <- Seq(0.01, 0.3)) {
      val bloomed = keyed(Sampling.contaminationBloom(docs, "doc_id", "text",
        splits, fpp = fpp))
      assert(bloomed == exact, s"bloom path diverged at fpp=$fpp")
    }
  }

  test("weightedSample: k per group, partition-independent, weight-biased") {
    import spark.implicits._
    // group g: ids 0..199 with weight 1, ids 200..219 with weight 100 —
    // the 20 heavy ids should dominate a k=10 sample
    val df = ((0 until 200).map(i => ("g", i.toLong, 1.0)) ++
      (200 until 220).map(i => ("g", i.toLong, 100.0))).toDF("s", "id", "w")
    val a = Sampling.weightedSample(df.repartition(13), "s", "id", col("w"), k = 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    val b = Sampling.weightedSample(df.repartition(2), "s", "id", col("w"), k = 10)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    assert(a == b) // the draw is a pure function of (salt, id)
    assert(a.size == 10)
    assert(a.keys.count(_ >= 200) >= 7, s"heavy ids under-sampled: $a")
    // a different salt draws an independent sample (almost surely different)
    val c = Sampling.weightedSample(df, "s", "id", col("w"), k = 10, salt = "v2")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(c != a.keys.toSet)
  }

  test("neymanSample: allocations sum to nTotal, spread attracts budget, deterministic") {
    import spark.implicits._
    // three strata, same size; b has 10x the spread of a; c is constant
    val df = ((0 until 100).map(i => ("a", i.toLong, 50.0 + (i % 10))) ++
      (100 until 200).map(i => ("b", i.toLong, 50.0 + (i % 10) * 10)) ++
      (200 until 300).map(i => ("c", i.toLong, 50.0))).toDF("s", "id", "v")
    val got = Sampling.neymanSample(df, "s", "id", col("v"), nTotal = 30)
    val perStratum = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.values.sum == 30)
    assert(perStratum("b") > perStratum.getOrElse("a", 0L)) // S_b = 10·S_a
    assert(perStratum.getOrElse("c", 0L) == 0L) // zero variance → no budget
    val again = Sampling.neymanSample(df.repartition(7), "s", "id", col("v"), 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("horvitzThompson: est = sampled/rate exactly, unlisted stratum NULL, " +
      "layout-invariant, audit composes from published") {
    import spark.implicits._
    val rows = (0 until 400).map(i => ("a", i.toLong, 10L)) ++
      (400 until 600).map(i => ("b", i.toLong, 5L)) ++ Seq(("zz", 999L, 7L))
    val df = rows.toDF("st", "id", "v")
    val rates = Map("a" -> 0.5, "b" -> 0.25)
    val out = Sampling.horvitzThompson(df, "id", "st", col("v"), rates)
      .collect().map(r => r.getString(0) -> r).toMap
    // the estimate must be EXACTLY the sampled sum over the rate, with
    // membership from the same stratifiedFlag the corpus sampler uses
    val flag = Sampling.stratifiedFlag(col("id"), col("st"), rates,
      defaultFraction = 0.0, salt = "ht")
    val expect = df.withColumn("in", flag).where(col("in"))
      .groupBy("st").agg(org.apache.spark.sql.functions.sum("v").as("ss"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a").getAs[Double]("est_units") ==
      math.rint(expect("a") / 0.5 * 1e6) / 1e6)
    assert(out("b").getAs[Double]("est_units") ==
      math.rint(expect("b") / 0.25 * 1e6) / 1e6)
    // the audit column composes from the published estimate
    assert(out("a").getAs[Double]("rel_err") ==
      math.rint((out("a").getAs[Double]("est_units") - 4000.0) / 4000.0 * 1e6) / 1e6)
    // a stratum without a declared rate: nothing sampled, NULL estimate
    assert(out("zz").isNullAt(out("zz").fieldIndex("est_units")))
    assert(out("zz").getAs[Long]("n_sampled") == 0L)
    // pure function of (salt, id): partition layout changes nothing
    val re = Sampling.horvitzThompson(df.repartition(7), "id", "st",
      col("v"), rates).collect().map(_.toSeq).toSet
    assert(re == Sampling.horvitzThompson(df, "id", "st", col("v"), rates)
      .collect().map(_.toSeq).toSet)
  }

  test("prioritySample: degenerate n<=k is exact; n>k replays priorities, " +
      "w_est = max(w, tau), layout-free") {
    import spark.implicits._
    // n <= k: every row sampled, the estimator degenerates to the total
    val tiny = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w")
    val t = Sampling.prioritySample(tiny, "id", col("w"), k = 5, salt = "s")
      .collect()
    assert(t.length == 3)
    assert(t.forall(r => r.getAs[Double]("w_est") == r.getAs[Long]("w").toDouble))
    assert(t.forall(_.getAs[Double]("est_total") == 60.0))
    assert(t.forall(_.getAs[Double]("rel_err") == 0.0))
    assert(t.forall(r => r.isNullAt(r.fieldIndex("tau"))))
    // n > k: replay the priority formula independently and check the cut
    val df = (1 to 50).map(i => (i.toLong, (i % 7 + 1).toLong * 100L))
      .toDF("id", "w")
    val got = Sampling.prioritySample(df, "id", col("w"), k = 10, salt = "s2")
      .collect()
    assert(got.length <= 10)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val prios = (1 to 50).map { i =>
      val w = (i % 7 + 1).toLong * 100L
      val h = java.lang.Long.parseLong(md5hex(s"s2:$i").take(13), 16)
      (i.toLong, w, w.toDouble / ((h.toDouble + 1.0) / 4503599627370496.0))
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = prios(10)._3
    val expIds = prios.take(11).filter(_._3 > tau).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == expIds)
    got.foreach { r =>
      val w = r.getAs[Long]("w").toDouble
      assert(r.getAs[Double]("w_est") == BigDecimal(math.max(w, tau))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val again = Sampling.prioritySample(df.repartition(7), "id", col("w"),
      10, "s2").collect()
    assert(got.toSeq == again.toSeq)
  }

  test("efraimidisSample: k distinct WOR rows, deterministic, weight-dominant") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("id", "w")
    val got = Sampling.efraimidisSample(df, "id", col("w"), 5).collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(0)).distinct.length == 5) // without replacement
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    val again = Sampling.efraimidisSample(df.repartition(7), "id", col("w"), 5)
      .collect()
    assert(got.toSeq == again.toSeq)
    // replay the key formula: the cut must be exactly the 5 smallest
    val exp = (1 to 100).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"es:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.substring(0, 13), 16)
      (i.toLong, -math.log((h.toDouble + 1.0) / 4503599627370496.0) / 1.0)
    }.sortBy { case (id, k) => (k, id) }.take(5).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == exp)
    // a dominant weight is effectively always kept, and first
    val skew = df.withColumn("w",
      when(col("id") === 42, lit(1000000000L)).otherwise(lit(1L)))
    val s = Sampling.efraimidisSample(skew, "id", col("w"), 3).collect()
    assert(s.head.getLong(0) == 42L && s.head.getAs[Long]("rank") == 1L)
  }
}
