package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.heavyHitterCandidates

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("MG candidates are a superset of true heavy hitters across partitions") {
    // 10k rows: "hot" appears 4000x, "warm" 2000x, the rest unique —
    // capacity 8, threshold N/8: hot and warm MUST survive partial
    // sketches + merges, whatever else does
    val words = (Seq.fill(4000)("hot") ++ Seq.fill(2000)("warm") ++
      (0 until 4000).map(i => s"u$i"))
    val df = words.toDF("w").repartition(13)
    val cand = df.agg(heavyHitterCandidates(col("w"), 8).as("c"))
      .head().getSeq[String](0).toSet
    assert(cand.contains("hot") && cand.contains("warm"))
    assert(cand.size <= 8)
  }

  test("heavyHitters equals the exact computation") {
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the dog and the cat"),
      (3L, "a b c d e f g h")).toDF("doc_id", "text")
    // 17 tokens: the=5, cat=2; threshold cnt*4 > 17 -> cnt >= 5 -> {the}
    val got = graft.pipeline.CorpusStats.heavyHitters(docs, "doc_id", "text",
        capacity = 8, fracDen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 5L))
  }

  test("capacity below the guarantee bound is rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.pipeline.CorpusStats.heavyHitters(docs, "doc_id", "text",
        capacity = 8, fracDen = 32)
    }
  }

  import graft.operators.DistinctSketch._

  test("KMV keeps exactly the k smallest distinct hashes across partitions") {
    val df = ((0 until 5000).map(_.toLong) ++ (0 until 5000).map(_.toLong))
      .toDF("v").repartition(13)
    val sk = sketchBy(df, Seq.empty, xxHash52(col("v")), k = 64)
      .head().getSeq[Long](0)
    // independent truth: all 5000 distinct hashes, sorted, take 64
    val truth = df.select(xxHash52(col("v")).as("h")).distinct()
      .orderBy("h").limit(64).collect().map(_.getLong(0)).toSeq
    assert(sk == truth)
  }

  test("KMV is exact below capacity (estimate == distinct count)") {
    val df = (0 until 700).map(i => (i % 350).toLong).toDF("v").repartition(7)
    val est = sketchBy(df, Seq.empty, xxHash52(col("v")), k = 1024)
      .select(estimate(col("kmv"), 1024, fracXx).as("e"))
      .head().getDouble(0)
    assert(est == 350.0)
  }

  test("KMV estimate regime: error within theory bound on 20k distinct longs") {
    val df = (0 until 20000).map(_.toLong).toDF("v").repartition(11)
    val est = sketchBy(df, Seq.empty, xxHash52(col("v")), k = 256)
      .select(estimate(col("kmv"), 256, fracXx).as("e"))
      .head().getDouble(0)
    // relative standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4σ
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"est=$est")
  }

  test("KMV merge of group sketches == sketch of the union (array equality)") {
    val df = (0 until 4000).map(i => (i % 2, (i % 1700).toLong)).toDF("g", "v")
    val grouped = sketchBy(df, Seq("g"), xxHash52(col("v")), k = 128)
    val merged = grouped
      .agg(collect_list(col("kmv")).as("ks"))
      .select(mergeSketches(element_at(col("ks"), 1), element_at(col("ks"), 2), 128).as("kmv"))
      .head().getSeq[Long](0)
    val direct = sketchBy(df, Seq.empty, xxHash52(col("v")), k = 128)
      .head().getSeq[Long](0)
    assert(merged == direct)
  }

  test("count-min: exact in the collision-free regime; never under-counts when squeezed") {
    import graft.operators.FreqSketch
    val words = (Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 300).map(i => s"u${i % 60}"))
    val df = words.toDF("w").repartition(9)
    val probes = df.distinct()
    // wide: estimates == exact counts
    val wide = FreqSketch.frequencies(df, col("w"), probes, "w",
        width = 4096, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(wide == exact)
    // squeezed width forces collisions: estimates may inflate, never deflate
    val tight = FreqSketch.frequencies(df, col("w"), probes, "w",
        width = 16, depth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) => assert(tight(w) >= c, s"under-count for $w") }
  }

  test("decayed leaderboard: exact power-of-two ladder, hand-checked") {
    import graft.operators.Decay
    val ts = (d: String) => java.sql.Timestamp.valueOf(s"$d 12:00:00")
    val df = Seq(
      (1L, ts("2024-01-31"), 10.00), // age 1d  → k=0 → 1000
      (1L, ts("2024-01-20"), 10.00), // age 12d → k=1 → 500
      (2L, ts("2024-01-01"), 40.00), // age 31d → k=4 → 250
      (2L, ts("2024-01-31"), 0.07)   // 7 cents, k=0 → 7
    ).toDF("u", "ts", "v")
    val got = Decay.decayedSum(df, "u", "ts", "v", "2024-02-01", halfLifeDays = 7)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1500L, 2L)), 2L -> ((257L, 2L))))
    val top = Decay.leaderboard(df, "u", "ts", "v", "2024-02-01", 7, topK = 1)
      .head()
    assert(top.getLong(0) == 1L && top.getLong(1) == 1500L)
  }

  test("KMV md5 family: lexicographic hex order is numeric fraction order") {
    val df = (0 until 3000).map(_.toLong).toDF("v")
    val sk = sketchBy(df, Seq.empty, md5Hash(col("v")), k = 32)
    val row = sk.select(col("kmv"),
      estimate(col("kmv"), 32, fracMd5).as("e")).head()
    val hashes = row.getSeq[String](0)
    assert(hashes == hashes.sorted) // hex strings, lexicographic
    // estimator uses the last (k-th) element's 52-bit prefix
    val frac = java.lang.Long.parseLong(hashes.last.take(13), 16) / HashDenom
    assert(row.getDouble(1) == 31.0 / frac)
  }

  test("HLL registers: string-space rank equals the bit definition") {
    val df = (0 until 5000).map(_.toLong).toDF("v")
    val regs = graft.operators.DistinctSketch.hllRegistersMd5(df, Seq.empty, md5Hash(col("v")))
      .collect().map(r => r.getAs[String]("bucket") -> r.getAs[Int]("r"))
    // independent reference: parse the hex tail as a 64-bit value and
    // count leading zero bits directly
    val ref = scala.collection.mutable.Map.empty[String, Int]
    (0 until 5000).foreach { v =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val tail = h.substring(3, 19)
      val bits = new java.math.BigInteger(tail, 16)
      val rank = if (bits.signum == 0) 65 else 64 - bits.bitLength + 1
      val b = h.substring(0, 3)
      ref(b) = math.max(ref.getOrElse(b, 0), rank)
    }
    assert(regs.toMap == ref.toMap)
  }

  test("HLL merge of halves == whole; estimate within 5% on 20k distinct") {
    val whole = (0 until 20000).map(_.toLong).toDF("v").repartition(9)
    val h1 = (0 until 12000).map(_.toLong).toDF("v")
    val h2 = (8000 until 20000).map(_.toLong).toDF("v") // overlapping halves
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      graft.operators.DistinctSketch.hllRegistersMd5(df.withColumn("g", lit("x")), Seq("g"),
        md5Hash(col("v")))
    val merged = graft.operators.DistinctSketch.mergeRegisters(
      regsOf(h1).unionByName(regsOf(h2)), Seq("g"))
    val a = merged.orderBy("bucket").collect().toSeq
    val b = regsOf(whole).orderBy("bucket").collect().toSeq
    assert(a == b) // register-wise max is lossless union
    val est = graft.operators.DistinctSketch.hllEstimate(merged, Seq("g"))
      .head().getAs[Double]("est")
    // streaming build (complete-mode groupBy max, state bounded at m
    // register rows) == the batch registers: max is order-blind
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val sregs = graft.operators.DistinctSketch.hllRegistersMd5(
      mem.toDF.toDF("v").withColumn("g", lit("x")), Seq("g"),
      md5Hash(col("v")))
    val q = sregs.writeStream.format("memory").queryName("hll_stream_spec")
      .outputMode("complete").start()
    try {
      mem.addData(0L until 12000L: _*); q.processAllAvailable()
      mem.addData(8000L until 20000L: _*); q.processAllAvailable()
      val streamed = spark.table("hll_stream_spec").orderBy("bucket").collect().toSeq
      assert(streamed == b)
    } finally q.stop()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05, s"est=$est")
  }

  test("joinSizeEstimate: exact in the collision-free regime, " +
      "over-count-only under forced collisions, nulls excluded") {
    import spark.implicits._
    import graft.operators.FreqSketch
    // 10 distinct keys, fanout join: true size = sum cntA(k)*cntB(k)
    val a = (1 to 100).map(i => Option((i % 10).toLong)).toDF("k")
    val b = (1 to 60).map(i => Option((i % 10).toLong)).toDF("k")
    val truth = a.join(b, "k").count()
    val r = FreqSketch.joinSizeEstimate(a, col("k"), b, col("k")).head()
    assert(r.getAs[Long]("n_left") == 100 && r.getAs[Long]("n_right") == 60)
    assert(r.getAs[Long]("est_join_size") == truth)
    // width 16 (the minimum) forces collisions among the 10 keys:
    // the CM inner product may only OVER-count
    val r2 = FreqSketch.joinSizeEstimate(a, col("k"), b, col("k"),
      width = 16, depth = 4).head()
    assert(r2.getAs[Long]("est_join_size") >= truth)
    // null keys never join and never enter the sketch
    val an = a.union(Seq(Option.empty[Long], Option.empty[Long]).toDF("k"))
    val r3 = FreqSketch.joinSizeEstimate(an, col("k"), b, col("k")).head()
    assert(r3.getAs[Long]("n_left") == 100 &&
      r3.getAs[Long]("est_join_size") == truth)
  }
}
