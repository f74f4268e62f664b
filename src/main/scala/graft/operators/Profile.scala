package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.functions.GraftFunctions.kmvSketch

/**
 * Column profiling and snapshot drift — the monitoring layer a 100 TB
 * ingest needs BEFORE queries go wrong: null-rate spikes, cardinality
 * collapses (a join key suddenly constant), range shifts (an upstream
 * unit change). One pass per table version, |columns|-sized outputs,
 * pure-arithmetic drift on top.
 *
 * Distinct counts ride the KMV sketch ([[DistinctSketch]]): in ONE
 * aggregation alongside the other moments (a multi-column exact
 * `count(distinct)` would plan an Expand pass per column), exact below
 * sketch capacity (the gate regime), ~1/√k relative error above —
 * production profiles run k≈1024 per column and never shuffle values.
 *
 * min/max are published for NUMERIC columns only (cast to double, 6dp) —
 * cross-type renderings are not portable across engines; categorical
 * drift is cardinality drift here.
 *
 * Reference anchor: the reference has no profiling surface; nearest is
 * table stats in `queryTableDiagnostics` (SURVEY §2.11). Extension.
 */
object Profile {

  /** Long-format profile: one row per requested column —
    * (column, n, n_null, n_distinct, min_num, max_num). */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 1 << 16): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val numeric = schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        // xxhash64(NULL) returns the seed, not NULL — mask nulls out so
        // they can't masquerade as a distinct value
        size(kmvSketch(when(col(c).isNotNull,
            shiftrightunsigned(xxhash64(col(c)), 12)), k))
          .cast("long").as(s"__d_$c"),
        (if (numeric) round(min(col(c)).cast("double"), 6) else lit(null).cast("double"))
          .as(s"__min_$c"),
        (if (numeric) round(max(col(c)).cast("double"), 6) else lit(null).cast("double"))
          .as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"), col(s"__max_$c").as("max_num"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** log10(1 + 1/d) for d = 1..9 as LITERALS — Benford's expected
    * first-digit shares. Hardcoded (not computed) so no transcendental
    * evaluation can diverge between engines. */
  val BenfordShares: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /**
   * Benford first-digit audit of a positive 2-decimal money column — the
   * classic fabricated-data / unit-mixup detector: natural multi-scale
   * amounts follow log10(1+1/d); uniform or clamped data does not.
   * First digit via INTEGER cents rendered to a string (no log10 — a
   * boundary value like 100.00 must not land in the wrong digit on one
   * engine), chi² against the literal expected shares with 12dp-rounded
   * DECIMAL-summed terms (the PSI doctrine). Output per digit:
   * (digit, observed, expected, chi2) — chi2 repeated (grand total).
   */
  /**
   * Functional-dependency audit: for each candidate determinant → dependent
   * pair, how close does `det → dep` hold? A clean FD (n_violating = 0) is
   * a join-collapse/normalization opportunity and a data contract worth
   * enforcing; a near-FD with a handful of violating groups is usually a
   * data-quality bug (the classic profiling read, Papenbrock et al. 2015).
   *
   * Per pair: ONE (det, dep) distinct-pair aggregation then a det-keyed
   * rollup — both map-side combined, |distinct det| rows survive. conformance
   * = fraction of determinant groups with exactly one dependent value.
   *
   * Output per candidate: (det, dep, n_groups, n_violating, max_distinct,
   * conformance).
   */
  def fdAudit(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "at least one candidate FD")
    candidates.map { case (det, dep) =>
      val groups = df.select(col(det).as("__d"), col(dep).as("__v"))
        .distinct()
        .groupBy(col("__d")).agg(count_distinct(col("__v")).as("__k"))
      groups.agg(
        lit(det).as("det"), lit(dep).as("dep"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("__k")).as("max_distinct"))
        .withColumn("conformance", round(
          (col("n_groups") - col("n_violating")).cast("double")
            / col("n_groups").cast("double"), 6))
    }.reduce(_ unionByName _)
  }

  /**
   * k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
   * al. 2007) over a quasi-identifier tuple — the re-identification
   * check a training-data release needs: a row whose QI combination is
   * shared by fewer than k individuals is linkable; an equivalence class
   * whose sensitive attribute takes fewer than l distinct values leaks
   * it outright. ONE grouped aggregation on the QI key (map-side
   * combined; |classes| rows survive), then a class-level rollup —
   * nothing quadratic, nothing collected.
   *
   * Output: one row (k_threshold, l_threshold, n_rows, n_classes,
   * min_class_size, n_rows_k_violating, n_classes_k_violating,
   * min_l, n_classes_l_violating).
   */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Int = 5, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2 && l >= 1)
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        count_distinct(col(sensitiveCol)).as("ldiv"))
    classes.agg(
      lit(k.toLong).as("k_threshold"), lit(l.toLong).as("l_threshold"),
      sum(col("sz")).as("n_rows"), count(lit(1)).as("n_classes"),
      min(col("sz")).as("min_class_size"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("n_rows_k_violating"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_classes_k_violating"),
      min(col("ldiv")).as("min_l"),
      sum(when(col("ldiv") < l, 1L).otherwise(0L)).as("n_classes_l_violating"))
  }

  /**
   * Differentially-private count release with SEEDED Laplace noise —
   * the release half of the privacy shelf ([[kAnonymity]] audits what
   * must not ship; this ships what may). Per group: noisy = exact +
   * Lap(Δ/ε) with count sensitivity Δ = 1 and the noise drawn by
   * inverse-CDF transform of a salted-md5 uniform over the GROUP KEY
   * (the [[Experiment]] assignment idiom): u ∈ [0,1),
   * noise = −(Δ/ε)·sgn(u−½)·ln(1−2|u−½|), the ln argument clamped at
   * 2⁻⁵² so the one measure-zero u never yields ±∞. Seeding makes the
   * release REPRODUCIBLE — replayable audits, bit-identical across
   * engines, the right tool for pipeline tests and fixed one-shot
   * releases; the ε-budget obligations stay with the caller: a fresh
   * salt per NEW release (republishing the identical value spends no
   * new budget; a re-draw does), and ε_total = Σ ε over distinct
   * releases. Group keys must come from a PUBLIC domain (the
   * declared-bounds discipline) — emitting a row per observed group
   * would otherwise leak group existence regardless of noise.
   *
   * One map-combined count aggregation; the noise is a codegen
   * projection over the |groups|-bounded result.
   * Output: (group…, noisy_count 6dp, epsilon, sensitivity, scale).
   */
  def dpCounts(df: DataFrame, groupCols: Seq[String], salt: String,
      epsilon: Double): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0, "need groups and epsilon > 0")
    val b = 1.0 / epsilon
    val keyStr = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val u = graft.functions.GraftFunctions.md5Frac52(
      concat(lit(salt), lit(":"), keyStr)) / lit(DistinctSketch.HashDenom)
    val centered = u - lit(0.5)
    val inner = greatest(lit(1.0) - lit(2.0) * abs(centered),
      lit(1.0 / DistinctSketch.HashDenom))
    val noise = -lit(b) * signum(centered) * log(inner)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(groupCols.map(col) ++ Seq(
        round(col("__n") + noise, 6).as("noisy_count"),
        lit(epsilon).as("epsilon"),
        lit(1L).as("sensitivity"),
        lit(b).as("scale")): _*)
  }

  /**
   * Order-invariant dataset fingerprint — O(1) state per table version,
   * the cheap "are these two snapshots identical?" probe that makes a
   * full q133-style diff unnecessary when the answer is yes. Each row
   * hashes to a 52-bit integer (salted-md5 over the '|'-joined canonical
   * column strings — the [[Experiment]] idiom, cross-engine exact) and
   * the fingerprint is the plain SUM of row hashes: commutative, so
   * partition/layout/order free, and mergeable (fingerprint of a union
   * = sum of fingerprints mod nothing — exact decimal sum). Collisions:
   * two different MULTISETS colliding needs a 52-bit sum match —
   * adversarial inputs defeat it (not a MAC), drift does not. Callers
   * pick the column list; casts must be deterministic (cents for
   * decimals, epoch for timestamps).
   *
   * Output: one row (n_rows, fingerprint DECIMAL(38,0) as string —
   * stringified so the driver-side canonical rendering is stable).
   */
  def datasetFingerprint(df: DataFrame, cols: Seq[Column],
      salt: String = "fp"): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val key = concat_ws("|", cols.map(_.cast("string")): _*)
    val h = graft.functions.GraftFunctions.md5Frac52(
      concat(lit(salt), lit(":"), key))
    df.agg(count(lit(1)).as("n_rows"),
      sum(h.cast("decimal(38,0)")).cast("string").as("fingerprint"))
  }

  /**
   * Per-group MODE with a deterministic tie-break — the categorical
   * imputation/profiling basic `mode()` built-ins leave tie-undefined:
   * the most frequent value per group, ties resolved to the SMALLEST
   * value (string order), so the answer is a pure function of the data.
   * One map-combined (group, value) count, then a rank window over the
   * value-cardinality-bounded count relation — the subject rows never
   * pass through a window. NULL values are excluded (a NULL mode means
   * "no non-null values", published as no row).
   *
   * Output: (group, mode, mode_count, n_distinct).
   */
  def modeBy(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val counts = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valCol).cast("string").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("c").desc, col("v").asc)
    counts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .where(col("__rn") === 1)
      .select(col("g").as(groupCol), col("v").as("mode"),
        col("c").as("mode_count"), col("__nd").as("n_distinct"))
  }

  /**
   * Concentration / inequality readout over a non-negative unit column —
   * the GLOBAL sibling of [[DistDrift.gini]] (per-group, whose window is
   * bounded by the group partition — a whole-relation Gini cannot
   * window, hence the prefix-sum mechanism here) plus the top-decile
   * and top-percentile shares it lacks: the
   * "do 10% of customers carry 80% of revenue" numbers every revenue,
   * token-count, and degree distribution gets asked. With values ranked
   * ascending, Gini = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx); ties make Σ i·x
   * well-defined because equal values are exchangeable, so it computes
   * on the DISTINCT-value relation: a value v with count c occupying
   * ranks after `below` contributes v·(c·below + c(c+1)/2). Prefix
   * counts come from [[DistDrift.withPrefixSums]] (distributed — no
   * full-relation window); the top-k share picks the single boundary
   * value row where k = ⌈n/10⌉ (or ⌈n/100⌉) crosses the suffix and
   * splits its tie run exactly.
   *
   * Everything is exact DECIMAL(38,0) integer arithmetic with THREE
   * published divides (gini, top10, top1), 6dp. Operand bound: per-value
   * units v·c and the grand total must fit a long (cents at warehouse
   * scale clear this; refuse negatives loudly — Gini is undefined
   * below 0) — and the bound is ENFORCED: v·c and Σ(v·c) are probed in
   * DECIMAL on the distinct-value relation and refused past 2⁶³−1, so a
   * wrapped long can never publish a confidently wrong Gini (the
   * probe-then-refuse discipline; with the long total verified, the
   * internal Σ v·(c·below + c(c+1)/2) ≤ Σx·n stays under 10³⁸ for any
   * feasible n). Output: one row (n, total_units, gini, top10_share,
   * top1_share).
   */
  def concentration(df: DataFrame, unitsCol: Column): DataFrame = {
    val s = df.select(unitsCol.cast("long").as("v")).where(col("v").isNotNull)
    def d(c: Column): Column = c.cast("decimal(38,0)")
    // distinct-value relation, materialized once: the min/overflow probe
    // and the prefix-sum scan below both read it (replaces the old
    // separate min-probe pass over the raw rows)
    val perValue0 = s.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("__uvd", d(col("v")) * d(col("cnt")))
      .localCheckpoint(true)
    val probe = perValue0.agg(min(col("v")), max(col("__uvd")),
      sum(col("__uvd"))).head()
    require(!probe.isNullAt(0), "concentration: empty input")
    require(probe.getLong(0) >= 0L,
      "concentration: negative units — Gini needs a non-negative measure")
    val longMax = BigDecimal(Long.MaxValue)
    require(probe.getDecimal(1).compareTo(longMax.bigDecimal) <= 0 &&
      probe.getDecimal(2).compareTo(longMax.bigDecimal) <= 0,
      s"concentration: per-value units x count (max ${probe.getDecimal(1)}) " +
        s"or total units (${probe.getDecimal(2)}) exceed 2^63-1 — rescale " +
        "the units (e.g. dollars not cents) so the exact-integer contract holds")
    val perValue = perValue0
      .withColumn("uv", col("__uvd").cast("long")) // exact: probed above
      .drop("__uvd")
    val pre = DistDrift.withPrefixSums(perValue, Seq("cnt", "uv"))
      .localCheckpoint(true) // feeds the moment agg + two boundary picks
    val tot = pre.agg(sum(col("cnt")).as("__n"), sum(col("uv")).as("__t"),
      sum((d(col("v")) * (d(col("cnt")) * d(col("cnt_below"))
        + (d(col("cnt")) * (d(col("cnt")) + 1) / 2).cast("decimal(38,0)")))
        .cast("decimal(38,0)")).as("__s1"))
    def topShare(tag: String, div: Long) = {
      // k-th largest boundary: above < k <= above + cnt; the tie run at
      // the boundary value contributes only its (k - above) top rows
      val k = (d(col("__n")) + (div - 1)) / div
      val above = d(col("__n")) - d(col("cnt_below")) - d(col("cnt"))
      pre.crossJoin(broadcast(tot))
        .where(above < floor(k) && floor(k) <= above + d(col("cnt")))
        .select(when(col("__t") > 0, round(
          ((d(col("__t")) - d(col("uv_below")) - d(col("uv")))
            + (floor(k) - above) * d(col("v"))).cast("double")
          / d(col("__t")).cast("double"), 6)).as(s"top${tag}_share"))
    }
    tot.select(col("__n").as("n"), col("__t").as("total_units"),
        when(col("__t") > 0, round(
          (lit(2) * col("__s1") - (d(col("__n")) + 1) * d(col("__t")))
            .cast("double")
          / (d(col("__n")) * d(col("__t"))).cast("double"), 6)).as("gini"))
      // 1-row sides: broadcast explicitly so the assembly is two scalar
      // BNLs, never a planned CartesianProduct
      .crossJoin(broadcast(topShare("10", 10L)))
      .crossJoin(broadcast(topShare("1", 100L)))
  }

  /**
   * Simpson diversity per group — λ = Σ(c/n)² over the group's type
   * counts: the probability two draws agree, the concentration twin of
   * [[graft.operators.EventPaths.behavioralEntropy]]'s entropy (λ is
   * variance-flavored — hit hardest by the single dominant type —
   * where entropy is log-flavored). effective_types = 1/λ is the
   * "equivalent number of equally-common types" (Hill number of order
   * 2), the audience-concentration read: 500 users but effective 3
   * means three accounts dominate.
   *
   * Exact: λ = Σc² / n² and 1/λ = n²/Σc² are each ONE divide of exact
   * DECIMAL(38,0) integers; gini_simpson composes from the PUBLISHED λ.
   * One (group, type) count aggregation + one group rollup.
   *
   * Output: (group, n, n_types, simpson, gini_simpson, effective_types).
   */
  def simpsonDiversity(df: DataFrame, groupCol: String,
      typeCol: String): DataFrame = {
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val gt = df.select(col(groupCol).as("group"), col(typeCol).as("__t"))
      .where(col("group").isNotNull && col("__t").isNotNull)
      .groupBy(col("group"), col("__t")).agg(count(lit(1)).as("__c"))
    gt.groupBy(col("group"))
      .agg(sum(col("__c")).as("n"), count(lit(1)).as("n_types"),
        sum(d(col("__c")) * d(col("__c"))).as("__s2"))
      .select(col("group"), col("n"), col("n_types"),
        round(col("__s2").cast("double")
          / (d(col("n")) * d(col("n"))).cast("double"), 6).as("simpson"),
        round((d(col("n")) * d(col("n"))).cast("double")
          / col("__s2").cast("double"), 6).as("effective_types"))
      .withColumn("gini_simpson", round(lit(1.0) - col("simpson"), 6))
      .select("group", "n", "n_types", "simpson", "gini_simpson",
        "effective_types")
  }

  /**
   * Capture-recapture population estimate (Chapman 1951) — "how many
   * distinct entities exist that we have only PARTIALLY observed":
   * given two independent observation lists A and B of the same
   * population, N̂ = (n_A+1)(n_B+1)/(m+1) − 1 with m = |A∩B|. The
   * coverage auditor for logs/crawls (two scrapers, two days, two
   * mirrors — the overlap tells you what neither saw), nearly unbiased
   * where the naive Lincoln–Petersen n_A·n_B/m blows up at m = 0.
   *
   * Exact: one distinct per side, one key-keyed inner-join count, the
   * Chapman estimate is ONE divide of exact DECIMAL(38,0) products.
   * Output: one row (n_a, n_b, overlap, n_hat, coverage_a, coverage_b)
   * — coverages = n/N̂ compose from the published estimate.
   */
  def captureRecapture(a: DataFrame, b: DataFrame,
      keyCol: String): DataFrame = {
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val ka = a.select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull).distinct().localCheckpoint(true)
    val kb = b.select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull).distinct().localCheckpoint(true)
    val m = ka.join(kb, "k").agg(count(lit(1)).as("overlap"))
    val na = ka.agg(count(lit(1)).as("n_a"))
    val nb = kb.agg(count(lit(1)).as("n_b"))
    na.crossJoin(nb).crossJoin(m)
      .withColumn("n_hat", round(
        ((d(col("n_a")) + 1) * (d(col("n_b")) + 1)).cast("double")
          / (col("overlap") + 1L).cast("double") - lit(1.0), 6))
      .withColumn("coverage_a", when(col("n_hat") > 0,
        round(col("n_a").cast("double") / col("n_hat"), 6)))
      .withColumn("coverage_b", when(col("n_hat") > 0,
        round(col("n_b").cast("double") / col("n_hat"), 6)))
  }

  def benford(df: DataFrame, valCol: String): DataFrame = {
    val cents = (col(valCol).cast("decimal(18,2)") * 100).cast("bigint")
    val digits = df.where(col(valCol) > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    val n = df.where(col(valCol) > 0).count()
    val expected = BenfordShares.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("digit"), lit(s).as("share"))
    }
    val exp = df.sparkSession.range(1)
      .select(explode(array(expected: _*)).as("e")).select("e.*")
    val joined = exp.join(digits, Seq("digit"), "left")
      .select(col("digit"),
        coalesce(col("observed"), lit(0L)).as("observed"),
        round(lit(n.toDouble) * col("share"), 6).as("expected"),
        round(
          (coalesce(col("observed"), lit(0L)).cast("double") - lit(n.toDouble) * col("share"))
            * (coalesce(col("observed"), lit(0L)).cast("double") - lit(n.toDouble) * col("share"))
            / (lit(n.toDouble) * col("share")), 12).as("__term"))
    val chi2 = joined.agg(
      round(sum(col("__term").cast("decimal(20,12)")).cast("double"), 6).as("chi2"))
    joined.crossJoin(broadcast(chi2)).drop("__term")
  }

  /**
   * Drift between two profiles of the same column set: per column the
   * null-rate delta, the cardinality ratio (new/old), and numeric range
   * shifts — every value a pure rounded function of the two profiles, so
   * an external engine reproduces it from its own recount.
   */
  def drift(oldP: DataFrame, newP: DataFrame): DataFrame = {
    val o = oldP.alias("o")
    val n = newP.alias("n")
    def nullFrac(side: String) =
      col(s"$side.n_null").cast("double") / col(s"$side.n").cast("double")
    o.join(n, col("o.column") === col("n.column"), "full_outer")
      .select(
        coalesce(col("o.column"), col("n.column")).as("column"),
        col("o.n").as("n_old"), col("n.n").as("n_new"),
        round(nullFrac("n") - nullFrac("o"), 6).as("null_frac_delta"),
        round(col("n.n_distinct").cast("double")
          / col("o.n_distinct").cast("double"), 6).as("distinct_ratio"),
        round(col("n.min_num") - col("o.min_num"), 6).as("min_shift"),
        round(col("n.max_num") - col("o.max_num"), 6).as("max_shift"))
  }
}
