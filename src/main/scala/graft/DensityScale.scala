package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Constant-cluster-density scale rehearsal for the three caveat families
 * whose GATE fixtures densify by construction (BASELINE.md "Standing
 * caveats"): the [[PhashScale]] pattern — scale rows while holding
 * cluster/block density constant, the regime a real corpus lives in —
 * generalized beyond images:
 *
 *  - `semantic` (q116 class): n/famSize planted clusters, each a fresh
 *    xxhash64-random 64-dim centroid with famSize members at small
 *    deterministic perturbations (within-cluster cosine ≈ 1, cross ≈ 0
 *    for random directions). Measures [[pipeline.Dedup.cosinePairsWithin]]
 *    — the verify-join core of semanticPairs — at constant density;
 *    expected pairs exactly (n/fam)·C(fam,2), linear in n. (The medoid
 *    GATE model keeps its fixed-label construction for oracle
 *    replayability; assignment cost O(n·k·d) is the caller's stated
 *    knob, not what the caveat was about.)
 *  - `cluster` (q105 class): the PhashScale hamming-2 family corpus fed
 *    through pairs → [[pipeline.Dedup.dedupClusters]] — the connected-
 *    components capstone after the (already-measured-linear) blocked
 *    pair step; expected components exactly n/famSize.
 *  - `entity` (q138 class): names with GROWING diversity — each family
 *    of famSize ids shares a hash-random 8-char stem (base-26 of
 *    xxhash64) and members differ in one suffix char, so
 *    [[pipeline.EntityMatch.nameMatchBlocked]] at prefixLen=4 keeps
 *    block density constant (the fixture's fixed syllable space was the
 *    quadratic artifact). Within-family JW ≥ 0.96 > 0.9 threshold;
 *    cross-family stems collide on a 4-char prefix only at birthday
 *    rates, so pairs ≈ (n/fam)·C(fam,2) (asserted within 5%).
 *
 * Usage: runMain graft.DensityScale [n1,n2,...] [famSize] [reps] [families]
 */
object DensityScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.lift(0).getOrElse("60000,200000,600000")
      .split(",").toSeq.map(_.trim.toLong)
    val famSize = args.lift(1).map(_.toInt).getOrElse(20)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val families = args.lift(3).getOrElse("semantic,cluster,entity")
      .split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(famSize >= 2 && famSize <= 64, "famSize in [2,64]")

    val dim = 64
    // famSize members around a fresh random centroid per family: member
    // j perturbs ONE coordinate (j mod dim) of the family centroid by a
    // small epsilon — cosine(members) ≈ 1 ≫ 0.4, cross-family ≈ 0
    def semanticCorpus(n: Long): DataFrame = {
      val fam = expr(s"id div $famSize")
      spark.range(n).select(col("id"),
        expr(s"""transform(sequence(0, ${dim - 1}), i ->
            cast(cast(pmod(xxhash64('c', id div $famSize, i), 2001) - 1000 as double)
                 / 1000.0
               + if(i = cast(id % $dim as int), 0.05, 0.0) as float))""")
          .as("v"),
        fam.as("cluster"))
    }

    def hammingCorpus(n: Long): DataFrame = {
      val fam = floor(col("id") / famSize)
      spark.range(n).select(col("id"),
        xxhash64(lit("hi"), fam).as("hi"),
        xxhash64(lit("lo"), fam)
          .bitwiseXOR(expr(s"shiftleft(1L, cast(id % $famSize as int))"))
          .as("lo"))
    }

    // 8-char base-26 stem per family (diversity grows with n), one
    // distinct lowercase suffix char per member: length 9 everywhere,
    // within-family JW = (8/9+8/9+1)/3 + winkler boost ≈ 0.977
    def entityCorpus(n: Long): DataFrame =
      spark.range(n).select(col("id"),
        expr(s"""concat(
            concat_ws('', transform(sequence(0, 7), i ->
              char(97 + cast(pmod(xxhash64('s', id div $famSize, i), 26) as int)))),
            char(97 + cast(id % $famSize as int) % 26))""").as("nm"))

    val results = sizes.flatMap { n =>
      val expectPairs = (n / famSize) * (famSize.toLong * (famSize - 1) / 2)
      val runsFor = Seq(
        "semantic" -> (() => {
          val df = semanticCorpus(n).localCheckpoint(true)
          val r = (() => pipeline.Dedup
            .cosinePairsWithin(df, "cluster", "id", "v", threshold = 0.4)
            .count())
          (r, () => df.unpersist(false), expectPairs, expectPairs)
        }),
        "cluster" -> (() => {
          val df = hammingCorpus(n).localCheckpoint(true)
          val r = (() => {
            val pairs = pipeline.Dedup.hammingPairsBlocked(
              df, "id", "hi", "lo", maxHamming = 2)
            pipeline.Dedup.dedupClusters(
                df.select(col("id")), "id", pairs, "a", "b")
              .select(col("component")).distinct().count()
          })
          (r, () => df.unpersist(false), n / famSize, n / famSize)
        }),
        // n/famSize planted 5x4 blobs (all famSize points pairwise within
        // eps=5 -> all core, EXACTLY one component each), blob origins on
        // a 1000-spaced lattice that GROWS with n — per-cell occupancy is
        // constant by construction, the honest geometry for the q273
        // gate's fixed-50-squares fixture (which densifies ~n^2 pair mass
        // at growing SF by design)
        "grid" -> (() => {
          val df = spark.range(n).select(col("id"),
              expr(s"((id div $famSize) % 1000) * 1000 + (id % $famSize) % 5")
                .as("x"),
              expr(s"((id div $famSize) div 1000) * 1000 + (id % $famSize) div 5")
                .as("y"))
            .localCheckpoint(true)
          val r = (() => operators.Clustering
            .gridDbscan(df, "id", "x", "y", eps = 5, minPts = 4)
            .where(col("component").isNotNull)
            .select(col("component")).distinct().count())
          (r, () => df.unpersist(false), n / famSize, n / famSize)
        }),
        "entity" -> (() => {
          val df = entityCorpus(n).localCheckpoint(true)
          val r = (() => pipeline.EntityMatch
            .nameMatchBlocked(df, "id", "nm", minSim = 0.9, prefixLen = 4)
            .count())
          // prefix-4 birthday collisions add a small surplus; bound 5%
          (r, () => df.unpersist(false), expectPairs,
            (expectPairs * 1.05).toLong)
        }))
      runsFor.filter(f => families(f._1)).map { case (name, mk) =>
        val (run, cleanup, lo, hi) = mk()
        val runs = (1 to reps).map { _ =>
          pipeline.Dedup.lastCcRounds.set(0)
          val t0 = System.nanoTime()
          val out = run()
          // rounds of the distributed CC loop inside this run (0 = no CC
          // or the driver union-find regime) — decomposes any ≥linear
          // exponent: at constant density the per-round cost is linear,
          // so the residual must live in the ROUND COUNT, and this
          // column says whether it grows like O(log n) (fine at 100 TB)
          // or worse (not)
          ((System.nanoTime() - t0) / 1e9, out, pipeline.Dedup.lastCcRounds.get)
        }
        cleanup()
        val out = runs.head._2
        if (out < lo || out > hi)
          System.err.println(
            s"[density-scale] WARNING $name n=$n out=$out expected=[$lo,$hi]")
        val dt = runs.map(_._1).min
        val rounds = runs.map(_._3).max
        System.err.println(
          f"[density-scale] $name n=$n out=$out $dt%.2f s cc_rounds=$rounds")
        (name, n, dt, out, rounds)
      }
    }
    val js = results.map { case (name, n, dt, p, rounds) =>
      f"""{"family":"$name","n":$n,"out":$p,"sec":$dt%.3f,"cc_rounds":$rounds}"""
    }.mkString("[", ",", "]")
    println(s"""{"rehearsal":"density","famSize":$famSize,"reps":$reps,"results":$js}""")
    spark.stop()
  }
}
