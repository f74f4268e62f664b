package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Density clustering over integer feature grids — DBSCAN (Ester et al.
 * 1996) made shuffle-shaped: candidate neighbor pairs come ONLY from a
 * 3×3 grid-cell join (cell side = eps, so every true ε-neighbor pair
 * shares adjacent cells — exact recall by construction, the
 * hammingPairs64 pigeonhole argument in 2D), never an all-pairs join.
 * The k-means family the engine already carries (IVF medoids/centroids)
 * needs k and returns convex cells; DBSCAN finds the cluster COUNT
 * itself, any shape, and names noise explicitly — the right tool for
 * embedding-projection / (quality, length)-plane corpus triage.
 *
 * Reference anchor: none (no clustering surface in the reference);
 * extends the dedup-components family ([[graft.pipeline.Dedup]]).
 */
object Clustering {

  /**
   * Grid DBSCAN over integer 2-D points:
   *  - core: ≥ `minPts` points (self included) within Euclidean `eps`;
   *  - edges between ε-close CORE pairs → connected components
   *    ([[graft.pipeline.Dedup.connectedComponents]] two-regime);
   *  - border: non-core with a core ε-neighbor — assigned its MIN core
   *    neighbor's component (the deterministic tie rule; textbook DBSCAN
   *    leaves border assignment order-dependent, a gate cannot);
   *  - noise: everything else (component NULL).
   *
   * Exactness: distances compare as integer squares (no sqrt); cell
   * keys are integer divisions — coordinates must be NON-NEGATIVE
   * (required loudly: `div` truncates toward zero, so negative coords
   * would shear cells). `maxCellPoints` is the occupancy contract
   * (house style: maxPosting/maxDegree): one degenerate cell of c
   * points costs c² pairs — probe refuses before the join pays it.
   * Output: (id, n_nbr, role ∈ core|border|noise, component).
   */
  def gridDbscan(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps: Long, minPts: Int, maxCellPoints: Long = 100000L): DataFrame = {
    require(eps >= 1, "eps >= 1")
    require(minPts >= 1, "minPts >= 1")
    val pts = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    val mins = pts.agg(min(col("x")).as("mx"), min(col("y")).as("my")).head()
    require(mins.isNullAt(0) || (mins.getLong(0) >= 0 && mins.getLong(1) >= 0),
      "gridDbscan: coordinates must be non-negative (integer cell division)")
    val cells = pts
      .withColumn("cx", expr(s"x div $eps"))
      .withColumn("cy", expr(s"y div $eps"))
      .localCheckpoint(true) // probe + both join sides below
    val worst = cells.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L))).head().getLong(0)
    require(worst <= maxCellPoints,
      s"gridDbscan: densest cell holds $worst points > maxCellPoints=" +
        s"$maxCellPoints — the cell join is Sum(occupancy^2); shrink eps, " +
        "pre-aggregate duplicates, or raise the bound")
    val probes = cells.select(col("id").as("a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(expr("transform(sequence(0, 8), " +
          "i -> struct(i div 3 - 1 AS ox, i % 3 - 1 AS oy))")).as("o"),
        col("cx"), col("cy"))
      .select(col("a"), col("xa"), col("ya"),
        (col("cx") + col("o.ox")).as("cx"), (col("cy") + col("o.oy")).as("cy"))
    val build = cells.select(col("cx"), col("cy"), col("id").as("b"),
      col("x").as("xb"), col("y").as("yb"))
    // every ε-pair shares adjacent cells (cell side = eps) — exact recall
    val nbr = probes.join(build, Seq("cx", "cy"))
      .where((col("xa") - col("xb")) * (col("xa") - col("xb"))
        + (col("ya") - col("yb")) * (col("ya") - col("yb")) <= eps * eps)
      .select(col("a"), col("b"))
      .localCheckpoint(true) // counts, edges, and border votes all read it
    val cnt = nbr.groupBy(col("a")).agg(count(lit(1)).as("n_nbr"))
    val coreIds = cnt.where(col("n_nbr") >= minPts).select(col("a").as("id"))
    val coreEdges = nbr.where(col("a") < col("b"))
      .join(coreIds.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(coreIds.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
    val comp = graft.pipeline.Dedup.connectedComponents(coreEdges, "a", "b")
    // isolated cores (no core neighbor) are their own singleton cluster
    val coreComp = coreIds
      .join(comp, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
    // border: min component over CORE ε-neighbors
    val borderComp = nbr
      .join(coreIds.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .join(coreComp.withColumnRenamed("id", "b")
        .withColumnRenamed("component", "__bc"), Seq("b"))
      .groupBy(col("a").as("id")).agg(min(col("__bc")).as("component"))
    val withRole = cnt.select(col("a").as("id"), col("n_nbr"))
      .join(coreComp.withColumn("role", lit("core")),
        Seq("id"), "left")
      .join(borderComp.withColumnRenamed("component", "__bcomp"),
        Seq("id"), "left")
      .select(col("id"), col("n_nbr"),
        coalesce(col("role"),
          when(col("__bcomp").isNotNull, lit("border")).otherwise(lit("noise")))
          .as("role"),
        coalesce(col("component"), col("__bcomp")).as("component"))
    withRole
  }

  /**
   * Pair-counting clustering agreement: Adjusted Rand Index (Hubert &
   * Arabie 1985) plus pair precision / recall / F1 — "did the clusterer
   * recover the reference partition", the evaluation the engine's own
   * clustering operators (gridDbscan / dedupClusters / labelPropagation)
   * beg for. Over the (truth, pred) contingency with cell counts n_ij,
   * row sums a_i, column sums b_j, N points, and the C(·,2) pair sums
   * TP = ΣC(n_ij,2), A = ΣC(a_i,2), B = ΣC(b_j,2), C = C(N,2):
   *
   *   precision = TP/B,  recall = TP/A,  f1 = 2·TP/(A+B)
   *   ari = 2·(C·TP − A·B) / (C·(A+B) − 2·A·B)
   *
   * (the standard form multiplied through by C — every term an EXACT
   * DECIMAL(38,0) integer, ONE double divide per published metric; the
   * F1 identity 2TP/(A+B) is the harmonic mean with no composed
   * rounding). `maxPoints` (default 10⁹) is the overflow contract:
   * beyond it A·B can exceed DECIMAL(38,0) — sample first, loudly.
   *
   * Shape: one (truth, pred) count aggregation — |cells| bounded by the
   * cluster-count product — then marginal aggs over it; the point
   * relation is touched once. Rows with a NULL label on either side are
   * excluded (noise: decide upstream whether to map it to a sentinel).
   *
   * Output: one row (n, n_cells, tp_pairs, pairs_truth, pairs_pred,
   * precision, recall, f1, ari); degenerate partitions (all-singleton /
   * one-cluster on both sides make the ARI denominator 0) publish NULL
   * ari, pair metrics NULL when their denominator is 0.
   */
  /**
   * Lloyd k-means over non-negative integer d-dim features — fixed
   * `iters` synchronous rounds (the pageRankFixed doctrine: no
   * convergence test, both engines replay the identical recursion),
   * bit-reproducible end to end: init picks the k distinct feature
   * tuples with the smallest md5 hex of their '|'-joined coordinates
   * (the DistinctSketch oracle-hash family — DuckDB has md5), assignment
   * is integer-squared-distance argmin with smallest-cluster tie-break
   * (array_min over (dist, idx) structs — lexicographic struct order IS
   * the tie rule), and the centroid update is a floor-divided integer
   * mean. Rows first collapse to the DISTINCT feature relation with
   * weights (weighted Lloyd ≡ row Lloyd, and the per-iteration scan
   * shrinks to the distinct mass); each round is then ONE map-side-
   * combined aggregation shuffling k rows regardless of input size, and
   * only k aggregate rows ever reach the driver. Coordinates must be
   * non-negative and ≤ 1e12 (required loudly: floor vs truncation
   * divides diverge on negatives across engines; the bound keeps d·diff²
   * inside DECIMAL(38,0)). Empty clusters keep their previous centroid.
   *
   * Distance arithmetic picks the [[silhouetteSimplified]] fast path
   * per call: when d·span² < 2⁶³ (span = max−min coordinate, probed —
   * the d-DEPENDENT bound, BigInt-subtracted so straddling inputs can't
   * wrap past the guard), the per-row squared distances are exact LONGs
   * in whole-stage codegen (~5× the Decimal class, and this loop runs
   * `iters` scans — the biggest exactness-preserving win in the
   * operator); above the bound, the DECIMAL(38,0) class. Identical
   * integers either way, argmin ties identical ((d, i) struct order) —
   * the two paths cannot publish different clusterings. Weighted
   * accumulations (Σ diff²·w, Σ fᵢ·w) stay DECIMAL in BOTH paths, cast
   * BEFORE the multiply — a long product fᵢ·w wraps at coordinate 10¹²
   * times a 10⁷ duplicate weight, the ratioUp overflow family.
   * Output: k rows (cluster, n, c0..c{d-1}, mean_sqdist) where n and the
   * within-cluster mean squared distance (floor(Σw·dist² / n) — the
   * exact integer mean, cast to double so both engines publish the same
   * IEEE value) come from the LAST round's assignment (measured against
   * that round's pre-update centroids) and the centroids are
   * post-update — the standard Lloyd readout.
   */
  /** A finished Lloyd fit with its distinct-feature relation still
    * CACHED — [[silhouetteSimplified]] scores against the same relation
    * and fast-path election, so sharing the fit saves a second cache
    * build + bounds probe (measured: two 0.73 s cache builds per q309
    * run). Callers MUST unpersist `pts`. */
  private case class LloydFit(pts: DataFrame, fn: Seq[String], d: Int,
    useLong: Boolean, cents: Array[Array[Long]], lastN: Array[Long],
    lastSd: Array[BigInt])

  /** Packed exact squared distance for the long fast path:
    * dist·k + j encodes the (dist, idx) argmin pair in ONE long —
    * numeric order on packed values IS lexicographic (dist asc, idx
    * asc) order because all k values carry distinct idx low-parts, so
    * `least(...)` replaces the per-row array-of-structs + array_min
    * (struct allocation + interpreted struct comparisons; measured
    * 6.6-14.6 s of task time per q309 iteration, ~5x the packed chain).
    * The election bound guarantees d·span²·k + (k−1) < 2⁶³. */
  private def packedDist(fn: Seq[String], c: Array[Long], j: Int,
      k: Int): Column =
    fn.indices.map { i =>
      val diff = col(fn(i)) - lit(c(i)); diff * diff
    }.reduce(_ + _) * lit(k.toLong) + lit(j.toLong)

  /** Shared silhouette scoring tail: per-row s = (b−a)/max(a,b) rounded
    * 12dp, weight-multiplied into a DECIMAL term (the Σ doctrine). The
    * input carries __a, __b, __cl, __w. */
  private def pts2Scored(withAb: DataFrame): DataFrame =
    withAb
      .withColumn("__sil", when(greatest(col("__a"), col("__b")) > 0,
        round((col("__b") - col("__a")) / greatest(col("__a"), col("__b")), 12))
        .otherwise(lit(0.0)))
      .select(col("__cl").as("cluster"), col("__w"),
        (col("__sil").cast("decimal(38,12)") * col("__w"))
          .cast("decimal(38,12)").as("__term"))

  private def decimalDistStruct(fn: Seq[String], c: Array[Long],
      j: Int): Column = {
    val dist = fn.indices.map { i =>
      val diff = col(fn(i)).cast("decimal(38,0)") - lit(c(i))
      diff * diff
    }.reduce(_ + _)
    struct(dist.cast("decimal(38,0)").as("d"), lit(j).as("i"))
  }

  private def lloydCore(df: DataFrame, features: Seq[Column], k: Int,
      iters: Int, maxK: Int, forceDecimal: Boolean = false): LloydFit = {
    require(k >= 1 && k <= maxK, s"k in [1,$maxK]")
    require(iters >= 1 && iters <= 64, "iters in [1,64]")
    val d = features.length
    require(d >= 1 && d <= 16, "1..16 features")
    val fn = (0 until d).map(i => s"__f$i")
    // (fanOut before the distinct collapse was measured NEUTRAL here:
    // the cache build is scan-bound — row-group-limited parquet read —
    // not partial-agg bound, so the extra exchange bought nothing)
    val pts = df.select(features.zipWithIndex.map { case (c, i) =>
        c.cast("long").as(fn(i)) }: _*)
      .where(fn.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(fn.map(col): _*).agg(count(lit(1)).as("__w"))
      .cache()
    try {
      val loC = if (d == 1) col(fn(0)) else least(fn.map(col): _*)
      val hiC = if (d == 1) col(fn(0)) else greatest(fn.map(col): _*)
      val bounds = pts.agg(min(loC), max(hiC)).head()
      require(!bounds.isNullAt(0), "kmeansLloyd needs at least one complete row")
      require(bounds.getLong(0) >= 0L, "kmeansLloyd: negative coordinates — " +
        "floor/truncation division diverges across engines; shift first")
      require(bounds.getLong(1) <= 1000000000000L,
        "kmeansLloyd: coordinates above 1e12 overflow the exact distance class")
      // fast-path election (see Scaladoc): probed once, constant across
      // iterations. The k factor keeps the PACKED encoding dist·k + j
      // inside a long (d·span²·k + k−1 < 2⁶³); identical integers to the
      // decimal path either way, so the paths cannot publish different
      // clusterings (ClusteringSpec pins the equivalence).
      val spanBound =
        math.sqrt(Long.MaxValue.toDouble / d / math.max(k, 1)).toLong - 1
      val useLong = !forceDecimal &&
        (BigInt(bounds.getLong(1)) - BigInt(bounds.getLong(0))) <=
          BigInt(spanBound)
      val init = pts.select(fn.map(col): _*)
        .withColumn("__h", md5(concat_ws("|", fn.map(col): _*)))
        .orderBy(col("__h") +: fn.map(col(_).asc): _*)
        .limit(k).collect() // k rows
      require(init.length == k,
        s"kmeansLloyd: only ${init.length} distinct tuples < k=$k")
      var cents = init.map(r => Array.tabulate(d)(i => r.getLong(i)))
      val lastN = Array.fill(k)(0L)
      val lastSd = Array.fill(k)(BigInt(0))
      for (_ <- 1 to iters) {
        // accumulations are DECIMAL in both paths, cast BEFORE the
        // multiply (Scaladoc: the f·w long-wrap family)
        def aggCols(distCol: Column): Seq[Column] =
          sum(col("__w")).as("n") +:
          sum((distCol.cast("decimal(38,0)") * col("__w"))
            .cast("decimal(38,0)")).as("sd") +:
          (0 until d).map(i =>
            sum((col(fn(i)).cast("decimal(38,0)") * col("__w"))
              .cast("decimal(38,0)")).as(s"s$i"))
        val assigned =
          if (useLong) {
            val pcols = cents.zipWithIndex.map { case (c, j) =>
              packedDist(fn, c, j, k) }
            val packed = if (pcols.length == 1) pcols.head else least(pcols: _*)
            pts.withColumn("__p", packed)
              .groupBy(pmod(col("__p"), lit(k.toLong)).cast("int").as("__c"))
              .agg(aggCols(expr(s"__p DIV ${k}L")).head,
                aggCols(expr(s"__p DIV ${k}L")).tail: _*)
          } else {
            val cands = array(cents.zipWithIndex.map { case (c, j) =>
              decimalDistStruct(fn, c, j) }: _*)
            pts.withColumn("__best", array_min(cands))
              .groupBy(col("__best.i").as("__c"))
              .agg(aggCols(col("__best.d")).head,
                aggCols(col("__best.d")).tail: _*)
          }
        val sums = assigned.collect() // ≤ k rows
        java.util.Arrays.fill(lastN, 0L)
        (0 until k).foreach(j => lastSd(j) = BigInt(0))
        val next = cents.map(_.clone())
        sums.foreach { r =>
          val j = r.getInt(0)
          val n = r.getLong(1)
          lastN(j) = n
          lastSd(j) = BigInt(r.getDecimal(2).toBigInteger)
          (0 until d).foreach { i =>
            next(j)(i) = (BigInt(r.getDecimal(3 + i).toBigInteger) / n).toLong
          }
        }
        cents = next
      }
      LloydFit(pts, fn, d, useLong, cents, lastN, lastSd)
    } catch { case t: Throwable => pts.unpersist(); throw t }
  }

  def kmeansLloyd(df: DataFrame, features: Seq[Column], k: Int, iters: Int,
      maxK: Int = 64, forceDecimalPath: Boolean = false): DataFrame = {
    // forceDecimalPath: spec hook ONLY — pins the packed-long argmin
    // byte-equal to the decimal struct path on the same data
    val spark = df.sparkSession
    val fit = lloydCore(df, features, k, iters, maxK, forceDecimalPath)
    try {
      val d = fit.d; val cents = fit.cents
      val lastN = fit.lastN; val lastSd = fit.lastSd
      // mean_sqdist = floor(sd / n): the exact integer mean cast to
      // double — both engines round the SAME integer to the same IEEE
      // value (a 6dp round of a ~1e11 quotient is ULP-divergent; this
      // is not)
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false) +:
        (0 until d).map(i => org.apache.spark.sql.types.StructField(s"c$i",
          org.apache.spark.sql.types.LongType, nullable = false)) :+
        org.apache.spark.sql.types.StructField("mean_sqdist",
          org.apache.spark.sql.types.DoubleType, nullable = true))
      val rows = (0 until k).map { j =>
        org.apache.spark.sql.Row.fromSeq(
          j +: lastN(j) +: (0 until d).map(i => cents(j)(i)) :+
            (if (lastN(j) > 0) (lastSd(j) / lastN(j)).toDouble else null))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } finally fit.pts.unpersist()
  }

  /**
   * Simplified silhouette over a [[kmeansLloyd]] clustering (Hruschka et
   * al. 2004 — the linear-time variant every at-scale evaluator uses):
   * per point, a = distance to its own (nearest) centroid, b = distance
   * to the second-nearest, s = (b − a)/max(a, b) ∈ [0, 1] (centroid
   * distances make s non-negative by construction; near 0 means the
   * point sits on a cluster boundary). The O(n²) within-cluster pair
   * definition is the thing this deliberately is NOT — distances go to
   * k centroids only, so the scoring pass is one projection over the
   * weighted DISTINCT feature relation (the kmeansLloyd collapse) plus
   * one k-row-output aggregation.
   *
   * Determinism: squared distances are exact DECIMAL(38,0) integers
   * (the kmeansLloyd bound), a/b take one IEEE sqrt each (exactly
   * rounded, engine-portable), s rounds 12dp and weight-sums in DECIMAL
   * (the Σ doctrine); argmin/second-min tie-break on centroid index via
   * (dist, idx) struct sort. Output: k rows + an ALL rollup
   * (cluster, n, mean_sil), mean 6dp; an empty cluster publishes NULL.
   */
  def silhouetteSimplified(df: DataFrame, features: Seq[Column], k: Int,
      iters: Int, forceDecimalPath: Boolean = false): DataFrame = {
    require(k >= 2, "silhouetteSimplified: k >= 2 — one cluster has no b")
    // one shared Lloyd fit: the scoring pass reads the SAME cached
    // distinct relation and fast-path election as the iteration loop
    // (previously a second cache build + bounds probe per call)
    val fit = lloydCore(df, features, k, iters, maxK = 64,
      forceDecimal = forceDecimalPath)
    val d = fit.d; val fn = fit.fn; val cents = fit.cents
    // fast path: squared distances are exact LONGs (codegen arithmetic,
    // ~5× the decimal path) under the lloydCore span bound (now
    // d·span²·k < 2⁶³ for the packed argmin encoding; centroids are
    // coordinate means, so every |coord − centroid| ≤ span). Above the
    // bound, the DECIMAL(38,0) class. Identical integers either way →
    // identical sqrt doubles → the published silhouettes cannot differ
    // between the two paths. a/b come from the smallest and
    // second-smallest packed values: all k packed values are DISTINCT
    // (distinct idx low-parts), so the second-least `when` chain is
    // well-defined and reproduces array_sort's (dist, idx) order.
    val per = try {
      val scored = (if (fit.useLong) {
        val ps = cents.zipWithIndex.map { case (c, j) =>
          packedDist(fn, c, j, k) }
        pts2Scored(fit.pts
          .withColumn("__pmin", least(ps: _*))
          .withColumn("__p2", least(ps.map(p =>
            when(p === col("__pmin"), lit(Long.MaxValue)).otherwise(p)): _*))
          .withColumn("__a", sqrt(expr(s"__pmin DIV ${k}L").cast("double")))
          .withColumn("__b", sqrt(expr(s"__p2 DIV ${k}L").cast("double")))
          .withColumn("__cl", pmod(col("__pmin"), lit(k.toLong)).cast("int")))
      } else {
        val cands = array(cents.zipWithIndex.map { case (c, j) =>
          decimalDistStruct(fn, c, j) }: _*)
        pts2Scored(fit.pts.withColumn("__s", array_sort(cands))
          .withColumn("__a", sqrt(element_at(col("__s"), 1)("d").cast("double")))
          .withColumn("__b", sqrt(element_at(col("__s"), 2)("d").cast("double")))
          .withColumn("__cl", element_at(col("__s"), 1)("i")))
      })
      // ≤ k rows, materialized EAGERLY: the ALL rollup and the spine
      // join below must not each replay the scoring scan
      scored.groupBy(col("cluster"))
        .agg(sum(col("__w")).as("n"), sum(col("__term")).as("__ts"))
        .localCheckpoint(true)
    } finally fit.pts.unpersist()
    val spark = df.sparkSession
    import spark.implicits._
    val spine = (0 until k).toDF("cluster")
    val perFull = spine.join(per, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("n"), lit(0L)).as("n"),
        col("__ts"))
    val all = perFull.agg(sum(col("n")).as("n"), sum(col("__ts")).as("__ts"))
      .select(lit(-1).as("cluster"), col("n"), col("__ts"))
    perFull.unionByName(all)
      .select(col("cluster"), col("n"),
        when(col("n") > 0, round((col("__ts").cast("double"))
          / col("n").cast("double"), 6)).as("mean_sil"))
      .orderBy(col("cluster"))
  }

  def agreement(points: DataFrame, truthCol: String, predCol: String,
      maxPoints: Long = 1000000000L): DataFrame = {
    val s = points.select(col(truthCol).cast("string").as("tr"),
        col(predCol).cast("string").as("pr"))
      .where(col("tr").isNotNull && col("pr").isNotNull)
    val cells = s.groupBy(col("tr"), col("pr"))
      .agg(count(lit(1)).as("nij")).localCheckpoint(true)
    def d(c: Column): Column = c.cast("decimal(38,0)")
    def c2(c: Column): Column = (d(c) * (d(c) - 1) / 2).cast("decimal(38,0)")
    val tp = cells.agg(sum(c2(col("nij"))).as("tp"),
      count(lit(1)).as("n_cells"), sum(col("nij")).as("n"))
    val aa = cells.groupBy(col("tr")).agg(sum(col("nij")).as("ai"))
      .agg(sum(c2(col("ai"))).as("a2"))
    val bb = cells.groupBy(col("pr")).agg(sum(col("nij")).as("bi"))
      .agg(sum(c2(col("bi"))).as("b2"))
    val m = tp.crossJoin(aa).crossJoin(bb)
    val nRow = m.select(col("n")).head()
    val nPts = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(nPts <= maxPoints,
      s"agreement: $nPts points > maxPoints=$maxPoints — the pair-count " +
        "products overflow DECIMAL(38,0); sample before evaluating")
    val cTot = c2(col("n"))
    val ariNum = (lit(2) * (cTot * col("tp") - col("a2") * col("b2")))
      .cast("decimal(38,0)")
    val ariDen = (cTot * (col("a2") + col("b2"))
      - lit(2) * col("a2") * col("b2")).cast("decimal(38,0)")
    m.select(col("n"), col("n_cells"),
      col("tp").cast("long").as("tp_pairs"),
      col("a2").cast("long").as("pairs_truth"),
      col("b2").cast("long").as("pairs_pred"),
      when(col("b2") > 0,
        round(col("tp").cast("double") / col("b2").cast("double"), 6))
        .as("precision"),
      when(col("a2") > 0,
        round(col("tp").cast("double") / col("a2").cast("double"), 6))
        .as("recall"),
      when(col("a2") + col("b2") > 0,
        round((lit(2) * col("tp")).cast("double")
          / (col("a2") + col("b2")).cast("double"), 6)).as("f1"),
      when(ariDen =!= 0,
        round(ariNum.cast("double") / ariDen.cast("double"), 6)).as("ari"))
  }

  /**
   * Two-component 1-D Gaussian mixture by EXACT-REPLAY EM — the SOFT
   * companion of [[kmeansLloyd]]: k-means draws a hard boundary; a
   * mixture says "this corpus is two length/score populations with
   * these weights", which is the right model when a filter merged two
   * sources and you need to know how much of each survived.
   *
   * Determinism (the q366/q380 iteration doctrine): EM runs over the
   * per-DISTINCT-VALUE relation (bounded; counts exact longs); each
   * iteration's responsibilities round 9dp — coarse enough that a
   * 1-ulp exp() disagreement between engines cannot flip a rounding —
   * and every moment is a DECIMAL sum of rounded terms; the six
   * parameters re-round 9dp per step. Deterministic init: μ from the
   * exact p25/p75 order statistics, σ² from exact global moments,
   * w = ½. A collapsing component (zero responsibility mass) keeps its
   * previous parameters instead of dividing by zero; σ² floors at
   * 1e-6. Components publish ordered by mean. Shape: one groupBy, then
   * `iters` map-combined aggregations over the bounded relation.
   *
   * Output: one row (n, mu1, sigma2_1, w1, mu2, sigma2_2, w2) — 6dp.
   */
  def gmm1d(df: DataFrame, valueCol: Column, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters in [1,10]: $iters")
    val pv = df.select(valueCol.cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // bounded distinct values; read iters+2 times
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val mom = pv.agg(coalesce(sum(col("c")), lit(0L)).as("n"),
      sum(d38(col("c")) * d38(col("v"))).as("s1"),
      sum(d38(col("c")) * d38(col("v")) * d38(col("v")))
        .as("s2")).head()
    val n = mom.getLong(0)
    require(n >= 2, "gmm1d: need at least two rows")
    val (s1, s2) = (mom.getDecimal(1), mom.getDecimal(2))
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nD = n.toDouble
    val varInit = r9(math.max(
      (nD * s2.doubleValue - s1.doubleValue * s1.doubleValue) / (nD * nD), 1e-6))
    // exact p25/p75 order statistics from strictly-below prefix sums
    val k1 = math.ceil(0.25 * nD).toLong.max(1L)
    val k2 = math.ceil(0.75 * nD).toLong.max(1L)
    val cum = DistDrift.withPrefixSums(pv, Seq("c"))
    val qs = cum.agg(
      min(when(col("c_below") + col("c") >= k1, col("v"))).as("q1"),
      min(when(col("c_below") + col("c") >= k2, col("v"))).as("q2")).head()
    var (m1, m2) = (qs.getLong(0).toDouble, qs.getLong(1).toDouble)
    var (g1, g2) = (varInit, varInit)
    var (w1, w2) = (0.5, 0.5)
    for (_ <- 1 to iters) {
      val vd = col("v").cast("double"); val cd = col("c").cast("double")
      def dens(w: Double, m: Double, g: Double): Column =
        lit(w) * exp(lit(0.0) - (vd - lit(m)) * (vd - lit(m))
          / (lit(2.0) * lit(g))) / lit(math.sqrt(g))
      val p1 = dens(w1, m1, g1); val p2 = dens(w2, m2, g2)
      val scored = pv.withColumn("rr",
        when(p1 + p2 > 0.0, round(p1 / (p1 + p2), 9)).otherwise(lit(0.5)))
      def tAgg(r: Column) = Seq(
        sum(round(r * cd, 9).cast("decimal(38,9)")),
        sum(round(r * cd * vd, 6).cast("decimal(38,6)")),
        sum(round(r * cd * vd * vd, 3).cast("decimal(38,3)")))
      val a = scored.agg(tAgg(col("rr")).head,
        tAgg(col("rr")).tail ++ tAgg(lit(1.0) - col("rr")): _*).head()
      def upd(nM: Double, sM: Double, qM: Double, m0: Double, g0: Double,
          w0: Double): (Double, Double, Double) =
        if (nM <= 0.0) (m0, g0, w0)
        else {
          val m = r9(sM / nM)
          (m, r9(math.max(qM / nM - m * m, 1e-6)), r9(nM / nD))
        }
      val (nm1, nm2) = (a.getDecimal(0).doubleValue, a.getDecimal(3).doubleValue)
      val u1 = upd(nm1, a.getDecimal(1).doubleValue, a.getDecimal(2).doubleValue,
        m1, g1, w1)
      val u2 = upd(nm2, a.getDecimal(4).doubleValue, a.getDecimal(5).doubleValue,
        m2, g2, w2)
      m1 = u1._1; g1 = u1._2; w1 = u1._3
      m2 = u2._1; g2 = u2._2; w2 = u2._3
    }
    val spark = df.sparkSession
    import spark.implicits._
    val ((lm, lg, lw), (hm, hg, hw)) =
      if (m1 <= m2) ((m1, g1, w1), (m2, g2, w2))
      else ((m2, g2, w2), (m1, g1, w1))
    Seq((n, r6(lm), r6(lg), r6(lw), r6(hm), r6(hg), r6(hw)))
      .toDF("n", "mu1", "sigma2_1", "w1", "mu2", "sigma2_2", "w2")
  }
}
