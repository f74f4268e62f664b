package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-bucketed sampling and dataset splitting for training
 * pipelines.
 *
 * Why not `df.sample` / `randomSplit`: both draw from per-partition RNG
 * streams, so the selected rows change with partitioning, task retries and
 * cluster size — a training/eval split made that way is not reproducible,
 * and a row can silently move from train to test between runs. Hash
 * bucketing keys the decision on the ROW ID alone: `md5(salt ':' id)` is
 * stable across engines, partitionings, retries and scale factors, can be
 * re-derived years later, and changing the salt draws an independent
 * sample. This is the standard technique for leakage-safe train/val/test
 * assignment at corpus scale.
 *
 * Mechanics: the first 8 hex chars of the md5 are compared lexicographically
 * against a cutoff — for fixed-width lowercase hex that equals comparing
 * the 32-bit value, so a fraction f keeps ~f of ids with no hex→int
 * conversion (portable to any SQL engine with md5/substr, which is what the
 * DuckDB correctness oracle does). Everything is a codegen'd Column
 * predicate on a scan: no shuffle, no RNG state, fully pushdown-friendly.
 */
object Sampling {

  /** 8-hex-char bucket key for a row id under `salt`. NULL ids stay NULL
    * (concat, not concat_ws — a null id must not collapse to the constant
    * md5(salt) bucket): a null key fails every `<` cutoff, so null-id rows
    * drop out of samples and fall to the LAST split branch — exactly what
    * the portable SQL form `md5(salt || ':' || id)` does. */
  def bucketKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8)

  /** Lexicographic hex cutoff covering `fraction` of the 32-bit space.
    * Exposed so oracles can embed the identical constant. */
  def cutHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    val v = math.round(fraction * 4294967296.0).min(4294967295L).max(0L)
    f"$v%08x"
  }

  /** Keep a deterministic ~`fraction` of rows, keyed on `idCol` + `salt`.
    * Same id + salt → same verdict on every run, engine and partitioning. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    if (fraction >= 1.0) df
    else df.where(bucketKey(col(idCol), salt) < lit(cutHex(fraction)))

  /** Boolean form of `hashSample`'s predicate (for flags/projections). */
  def sampledFlag(id: Column, fraction: Double, salt: String = "sample"): Column =
    if (fraction >= 1.0) lit(true) else bucketKey(id, salt) < lit(cutHex(fraction))

  /**
   * Disjoint, exhaustive split assignment — e.g.
   * `assignSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`
   * adds a `split` column. Weights must sum to ~1; the LAST split absorbs
   * the rounding remainder. A row's assignment never changes unless the
   * salt does — adding data later cannot shuffle existing rows between
   * splits (the leakage-safety property `randomSplit` lacks).
   */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], salt: String = "split"): DataFrame = {
    require(weights.nonEmpty, "assignSplit needs at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-6,
      s"split weights must sum to 1 (got ${weights.map(_._2).sum})")
    val key = bucketKey(col(idCol), salt)
    val cuts = weights.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val branches = weights.init.map(_._1).zip(cuts)
    val expr0 = branches.foldRight(lit(weights.last._1): Column) {
      case ((name, cut), rest) => when(key < lit(cutHex(cut)), name).otherwise(rest)
    }
    df.withColumn("split", expr0)
  }

  /**
   * Per-stratum sampling rates — e.g. keep 100% of rare high-quality docs
   * but 5% of boilerplate: `fractions` maps stratum value → fraction;
   * strata absent from the map keep `defaultFraction`. One codegen'd CASE
   * predicate, no shuffle, no per-stratum pass (the `sampleBy` alternative
   * builds the same predicate from RNG, losing reproducibility).
   */
  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "strata"): DataFrame =
    df.where(stratifiedFlag(col(idCol), col(strataCol), fractions,
      defaultFraction, salt))

  /**
   * EXACT-count stratified split: per stratum, rank rows by a caller-
   * supplied deterministic order column (a hash of the id — uniform but
   * reproducible) and mark the first round(frac·n_s) as the held-out
   * split. [[sampleStratified]]'s per-row coin gives each stratum a
   * BINOMIAL split size (±√n noise — fine for sampling, wrong for "give
   * me exactly 10% per source" eval protocol splits); this is the
   * rank-relative twin with exact per-stratum counts. One window
   * PARTITIONED by stratum (parallel across strata, the takeTokenBudget
   * discipline) + one broadcast of per-stratum counts. Membership is
   * rank-relative: freeze the snapshot before splitting (same contract
   * as takeTokenBudget). Ties in `orderCol` break by `idCol` so the
   * split is total-order deterministic. The fraction is a RATIONAL
   * num/den so k_test = ⌊(n·num + den/2)/den⌋ is pure integer
   * arithmetic — a double frac would make the half-way rounding depend
   * on binary representation, which no oracle can be trusted to replay.
   * Output: input columns + (n_stratum, k_test, rnk, split∈{test,train}).
   */
  def stratifiedSplitExact(df: DataFrame, idCol: String, strataCol: String,
      fracNum: Long, fracDen: Long, orderCol: Column): DataFrame = {
    require(fracDen >= 1 && fracNum >= 0 && fracNum <= fracDen,
      "fraction num/den must be in [0,1]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol)).orderBy(orderCol.asc, col(idCol).asc)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("k_test", expr(
        s"CAST((n_stratum * $fracNum + ${fracDen / 2}) div $fracDen AS BIGINT)"))
    df.join(broadcast(counts), Seq(strataCol))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("split",
        when(col("rnk") <= col("k_test"), lit("test")).otherwise(lit("train")))
  }

  /** Boolean form of `sampleStratified`'s predicate (for flags/projections
    * — e.g. `Curate` keeps the verdict as a column instead of filtering). */
  def stratifiedFlag(id: Column, strata: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "strata"): Column = {
    val key = bucketKey(id, salt)
    fractions.toSeq.sortBy(_._1).foldRight(
      if (defaultFraction >= 1.0) lit(true)
      else key < lit(cutHex(defaultFraction))) {
      case ((stratum, f), rest) =>
        when(strata === lit(stratum),
          if (f >= 1.0) lit(true) else key < lit(cutHex(f))).otherwise(rest)
    }
  }

  /**
   * Horvitz–Thompson stratified estimate WITH its own audit (HT 1952):
   * estimate a corpus total from the engine's deterministic stratified
   * hash sample by inverse-inclusion weighting — per stratum s with
   * nominal rate r_s, est_s = (Σ_{sampled} y) / r_s — and, because the
   * sample is a PURE FUNCTION of (salt, id), publish the true total
   * beside the estimate: the relative error of the sampling design is
   * itself a reproducible, gateable number (run the audit at full scale
   * once, then trust the cheap estimate at 100 TB).
   *
   * Exactness: sampled/true sums are exact longs (one pass, the flag is
   * a codegen CASE over the md5 key); est takes ONE double divide by
   * the 6dp-quantized rate; rel_err composes from the published values.
   * Strata not named in `rates` are excluded (rate 0 — nothing sampled,
   * nothing estimated) and surface in their own row with NULL est.
   *
   * Output per stratum: (stratum, rate, n, n_sampled, total_units,
   * est_units, rel_err), ordered by stratum.
   */
  /**
   * Priority sampling (Duffield, Lund & Thorup 2007) — the
   * weight-proportional k-sample with an UNBIASED total estimator, the
   * standard answer to "keep k rows but let big rows still speak for
   * their mass" (flow telemetry, revenue-weighted corpus subsampling).
   * Each row gets priority p = w / u with u = (h+1)/2⁵² its salted-md5
   * fraction in (0,1]; the sample is the top-k by priority and every
   * sampled row's estimated weight is max(w, τ) where τ is the
   * (k+1)-th priority — Σ max(w, τ) is unbiased for the true total.
   *
   * Determinism: u is a pure function of (salt, id); priorities are one
   * double divide of exact operands — identical IEEE values on any
   * engine — and the top-k cut carries the (priority desc, id) total
   * order (TakeOrderedAndProject; the threshold row is ONE extra row,
   * never a second scan). The true total is published beside the
   * estimate (the horvitzThompson audit discipline: the design's error
   * is itself a gate number).
   *
   * Output: k rows (`idCol`, w, priority, w_est) ordered by priority
   * desc, each carrying (tau, n, total_w, est_total, rel_err).
   * Published priority/tau/w_est are whole-unit rounded. The
   * "finer grain is below double ULP" claim holds at priority
   * magnitudes ≥ ~1e10, i.e. for cent-scale (≥ 1e2) integer weights;
   * priority = w/u is only GUARANTEED ≥ w, so with single-digit
   * weights and u near 1 the whole-unit grain can collapse genuinely
   * distinct priorities in the PUBLISHED columns. Display/audit
   * ambiguity only: the top-k cut and the tau exclusion both compare
   * the unrounded doubles, so sample membership and the estimator are
   * exact regardless of weight scale.
   */
  def prioritySample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, salt: String = "prio"): DataFrame = {
    require(k >= 1, "k >= 1")
    val two52 = 4503599627370496.0 // 2^52
    val h = graft.functions.GraftFunctions.md5Frac52(
      concat(lit(salt + ":"), col(idCol).cast("string")))
    val base = df.select(col(idCol), weightCol.cast("long").as("w"))
      .where(col("w").isNotNull && col("w") > 0 && col(idCol).isNotNull)
      .withColumn("__p", col("w").cast("double")
        / ((h.cast("double") + 1.0) / lit(two52)))
    val tot = base.agg(count(lit(1)).as("n"), sum(col("w")).as("total_w"))
    val top = base.orderBy(col("__p").desc, col(idCol).asc).limit(k + 1)
      .localCheckpoint(true) // k+1 rows; cut once, reuse for tau + sample
    val tau = top.agg(count(lit(1)).as("__kk"), min(col("__p")).as("__tau"))
    val sample = top.crossJoin(broadcast(tau))
      // with fewer than k+1 rows every row is sampled and tau plays no
      // role (the estimator degenerates to the exact total); priorities
      // TIED at tau are excluded even if that leaves < k rows — the
      // standard Duffield convention, and deterministic (same doubles
      // on every engine)
      .where(col("__kk") <= k || col("__p") > col("__tau"))
      .withColumn("w_est", when(col("__kk") <= k, col("w").cast("double"))
        .otherwise(greatest(col("w").cast("double"), col("__tau"))))
    // decimal-sum the PUBLISHED whole-unit estimates (the Σ doctrine).
    // Priorities/τ/estimates live at w/u ≈ 2⁵²-fraction scale (1e10+ for
    // cent weights) where a 6dp round sits BELOW double ULP and is
    // engine-divergent — whole units are the safe publishing grain.
    // est_total is an exact integer sum of whole-unit estimates — cast
    // straight to double (a round(·, 6) at 1e12 magnitude is itself
    // ULP-mangled in some engines)
    val est = sample.agg(
      sum(round(col("w_est"), 0).cast("decimal(38,0)")).cast("double")
        .as("est_total"))
    sample.crossJoin(broadcast(tot)).crossJoin(broadcast(est))
      .select(col(idCol), col("w"), round(col("__p"), 0).as("priority"),
        round(col("w_est"), 0).as("w_est"),
        when(col("__kk") > k, round(col("__tau"), 0)).as("tau"),
        col("n"), col("total_w"), col("est_total"),
        when(col("total_w") > 0, round(
          (col("est_total") - col("total_w").cast("double"))
            / col("total_w").cast("double"), 6)).as("rel_err"))
      .orderBy(col("priority").desc, col(idCol).asc)
  }

  /**
   * Weighted random sampling WITHOUT replacement (Efraimidis & Spirakis
   * 2006): each row draws key = −ln(u)/w from its salted-md5 uniform
   * u ∈ (0,1], and the k SMALLEST keys are exactly a weight-
   * proportional-without-replacement draw — the one-pass, shuffle-free
   * answer to "sample k rows, heavier rows proportionally more likely,
   * no row twice" (the A-ES reservoir algorithm's batch spelling).
   * Sibling of [[prioritySample]]: that one optimizes for an unbiased
   * TOTAL estimator; this one for exact WOR inclusion semantics.
   *
   * Determinism: u is a pure function of (salt, id); the key is
   * ln (correctly-rounded libm in practice, and the ORDER of keys —
   * all that matters — survives any last-ulp difference except exact
   * ties, which the id tie-break resolves); the cut is
   * orderBy+limit → TakeOrderedAndProject, never a full sort. The
   * PUBLISHED key rounds 12dp for display; the cut uses the unrounded
   * double (the prioritySample publishing doctrine).
   *
   * Output: k rows (`idCol`, w, es_key, rank) ordered by (es_key asc,
   * id).
   */
  def efraimidisSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, salt: String = "es"): DataFrame = {
    require(k >= 1, "k >= 1")
    val two52 = 4503599627370496.0 // 2^52
    val h = graft.functions.GraftFunctions.md5Frac52(
      concat(lit(salt + ":"), col(idCol).cast("string")))
    df.select(col(idCol), weightCol.cast("long").as("w"))
      .where(col("w").isNotNull && col("w") > 0 && col(idCol).isNotNull)
      // u = (h+1)/2^52 ∈ (0,1] — never 0, so ln is always finite
      .withColumn("__key",
        -log((h.cast("double") + 1.0) / lit(two52)) / col("w").cast("double"))
      .orderBy(col("__key").asc, col(idCol).asc).limit(k)
      .select(col(idCol), col("w"), round(col("__key"), 12).as("es_key"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("es_key").asc, col(idCol).asc)).cast("long"))
  }

  def horvitzThompson(df: DataFrame, idCol: String, strataCol: String,
      unitsCol: Column, rates: Map[String, Double],
      salt: String = "ht"): DataFrame = {
    require(rates.nonEmpty, "horvitzThompson: at least one stratum rate")
    require(rates.values.forall(r => r > 0 && r <= 1),
      s"rates in (0,1]: $rates")
    val q6 = rates.map { case (k, v) =>
      k -> math.round(v * 1e6).toDouble / 1e6 }
    val flag = stratifiedFlag(col(idCol), col(strataCol), q6,
      defaultFraction = 0.0, salt)
    val rateCol = q6.toSeq.sortBy(_._1).foldRight(
      lit(null).cast("double")) { case ((k, v), rest) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(rest)
    }
    df.select(col(strataCol).cast("string").as("stratum"),
        rateCol.as("rate"), unitsCol.cast("long").as("y"),
        flag.cast("int").as("__in"))
      .groupBy(col("stratum"), col("rate"))
      .agg(count(lit(1)).as("n"), sum(col("__in")).as("n_sampled"),
        sum(col("y")).as("total_units"),
        sum(col("y") * col("__in")).as("__ssum"))
      .select(col("stratum"), col("rate"), col("n"), col("n_sampled"),
        col("total_units"),
        when(col("rate").isNotNull,
          round(col("__ssum").cast("double") / col("rate"), 6))
          .as("est_units"))
      .withColumn("rel_err", when(
        col("est_units").isNotNull && col("total_units") =!= 0,
        round((col("est_units") - col("total_units").cast("double"))
          / col("total_units").cast("double"), 6)))
      .orderBy(col("stratum"))
  }

  /**
   * Deterministic token-budget corpus assembly: keep a hash-ordered
   * (uniformly random but reproducible) prefix of each stratum until its
   * cumulative token budget is exhausted — "at most N tokens per source,
   * the same pick on every run". One window per stratum (the
   * `packBudget` discipline: parallel across strata, sort within a
   * stratum). Unlike `hashSample`, membership is RANK-relative: new data
   * hashing into the prefix displaces boundary rows, because a budget
   * constrains the TOTAL, not per-row verdicts — freeze the corpus
   * snapshot before cutting budgets.
   *
   * Output: every input column + `cum_tokens` (running total in hash
   * order, ≤ `budget`).
   */
  def takeTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
      strataCol: String, budget: Long, salt: String = "budget"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(bucketKey(col(idCol), salt), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .where(col("cum_tokens") <= budget)
  }

  /**
   * Deterministic per-epoch shuffle key — multi-epoch training wants a
   * DIFFERENT order each epoch but the SAME order on every re-run/retry
   * of that epoch (resumable jobs, reproducible curricula). A pure
   * function of (id, epoch, salt): sort or range-partition by it when
   * writing an epoch's shards — no shuffled copies ever materialize, and
   * a retry of shard 17 of epoch 3 regenerates byte-identical order.
   *
   * Hash families (the Dedup convention): production `xxhash64`
   * (8-byte sort key); `oracleHash = true` md5-hex, engine-reproducible.
   */
  def epochKey(id: Column, epoch: Int, salt: String = "epoch",
      oracleHash: Boolean = false): Column =
    if (oracleHash) md5(concat(lit(s"$salt:$epoch:"), id.cast("string")))
    else xxhash64(lit(salt), lit(epoch), id)

  /**
   * Temperature-scaled stratum rates (mT5/XLM-R α-sampling): the kept
   * corpus follows q(s) ∝ p(s)^α, realized by downsampling only — the
   * rarest stratum keeps everything (rate 1), every other stratum keeps
   * `(cnt_min / cnt_s)^(1-α)`. α=1 is a no-op (natural mix), α=0 targets
   * the uniform mix, α∈(0,1) interpolates. Rates quantize to 6dp so an
   * engine's last-ulp `pow` can't move a hash-bucket cut.
   */
  def temperatureRates(counts: Seq[(String, Long)],
      alpha: Double): Seq[(String, Double)] = {
    require(counts.nonEmpty, "temperatureRates needs at least one stratum")
    require(alpha >= 0 && alpha <= 1, s"alpha out of [0,1]: $alpha")
    val cmin = counts.map(_._2).min
    counts.map { case (s, c) =>
      val r = math.pow(cmin.toDouble / c, 1 - alpha)
      // half-up (matches SQL round half-away-from-zero on positives)
      s -> math.round(r * 1e6).toDouble / 1e6
    }
  }

  /**
   * Deterministic temperature mixing over a stratum column: derive the
   * per-stratum rates from the corpus itself (ONE map-combined count agg;
   * the collect is bounded by the number of strata — languages/sources,
   * an enumerable set), then apply the same hash predicate as
   * `sampleStratified` — one codegen CASE, verdicts a pure function of
   * (id, salt), stable under re-runs and data growth.
   */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, salt: String = "temp"): DataFrame = {
    // null strata are EXCLUDED from rate derivation AND from the output:
    // stratifiedFlag's `===` can never match a null stratum, so letting a
    // null group into the counts could set cnt_min from rows that cannot
    // be kept — silently deflating every other stratum's rate
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val rates = temperatureRates(counts, alpha).toMap
    df.where(stratifiedFlag(col(idCol), col(strataCol), rates,
      defaultFraction = 0.0, salt))
  }

  /**
   * Train/test contamination report: for every doc in `testSplit`, how many
   * of its distinct word `shingleN`-grams also occur anywhere in
   * `trainSplit` — the standard eval-leakage check run before training.
   * Output: (`idCol`, n_shingles, hits, contamination ∈ [0,1]).
   *
   * Shape at scale: both sides explode to (shingle, doc) and meet in ONE
   * shuffle keyed on the shingle — no doc×doc pair join ever forms, so the
   * cost is linear in total shingle volume, not quadratic in corpus size.
   * The train side collapses to its distinct shingle set (map-side partial
   * aggregation); the test side is exploded ONCE and left-joined against
   * it, so one groupBy yields totals and hits together (a second scan of
   * the corpus for totals would double the shingling cost at the design
   * point). For a 100 TB corpus, pre-hash `g` with xxhash64 to shuffle
   * 8-byte keys instead of strings (kept exact here: the correctness
   * oracle counts string-identical n-grams).
   */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], shingleN: Int = 3,
      trainSplit: String = "train", testSplit: String = "test",
      salt: String = "split"): DataFrame = {
    val withSplit = splitShingles(docs, idCol, textCol, splits, shingleN, salt)
    val trainG = withSplit.where(col("split") === trainSplit)
      .select(explode(col("__sh")).as("g"))
    contaminationTail(withSplit, idCol, testSplit, trainG)
  }

  /**
   * Bloom-prefiltered decontamination — the 100 TB shape of
   * `contamination`, SAME exact result. The eval split's distinct
   * shingle set is tiny next to the training corpus, so a broadcast
   * Bloom filter built over it pre-filters the TRAIN side's exploded
   * shingles BEFORE the big distinct shuffle: only true matches and the
   * `fpp` sliver of false positives shuffle at all, instead of every
   * distinct training n-gram. Exactness is preserved by construction —
   * Bloom has NO false negatives (every truly-shared shingle passes) and
   * its false positives are eliminated by the exact equi-join that
   * follows; the gate hash-matches this plan against q79's oracle.
   *
   * The membership test is a (broadcast-value) UDF: Spark's bloom
   * expressions are internal to its runtime-filter rule, with no public
   * Column form — one boolean UDF per TRAIN shingle buys removing the
   * corpus-scale shuffle, the right trade at the design point.
   */
  def contaminationBloom(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], shingleN: Int = 3,
      trainSplit: String = "train", testSplit: String = "test",
      salt: String = "split", fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    val withSplit = splitShingles(docs, idCol, textCol, splits, shingleN, salt)
    val testG = withSplit.where(col("split") === testSplit)
      .select(explode(col("__sh")).as("g")).distinct()
    val expected = math.max(1000L, testG.count())
    val bloom = testG.stat.bloomFilter("g", expected, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bloomB.value.mightContainString(s))
    val trainG = withSplit.where(col("split") === trainSplit)
      .select(explode(col("__sh")).as("g"))
      .where(mightContain(col("g"))) // broadcast-bloom prefilter: candidates only
    contaminationTail(withSplit, idCol, testSplit, trainG)
  }

  /** Shared split+shingle projection (each stage a projection boundary). */
  private def splitShingles(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], shingleN: Int, salt: String): DataFrame = {
    import graft.functions.GraftFunctions.shingles
    assignSplit(docs, idCol, splits, salt)
      .select(col(idCol), col("split"),
        shingles(col(textCol), shingleN).as("__sh"))
  }

  /** Shared tail: distinct the train-side shingles, left-join the test
    * side once, one groupBy yields totals and hits together. */
  /**
   * Deterministic WEIGHTED sampling without replacement, k per group —
   * Efraimidis-Spirakis (IPL 2006) via exponential clocks: each row draws
   * `e_i = −ln(u_i) / w_i` and the k SMALLEST per group win, which samples
   * without replacement with probability proportional to weight. The
   * "draw" u_i is the md5 hash fraction of the row id — no RNG state, so
   * the sample is reproducible across engines, partitionings, retries and
   * years (same contract as [[hashSplit]]), and an independent redraw is a
   * salt away. Selection runs on the bounded top-k-per-key PHYSICAL
   * operator ([[graft.plans.TopK.perKey]]): the shuffle moves k·|groups|
   * rows, never the corpus.
   *
   * The training-data use: quality-weighted corpus subsampling (weight =
   * quality score or length) with an audit-able, re-derivable draw.
   * Weights must be positive; u=0 (probability 2^-52) maps to e=+∞ —
   * deterministically never sampled, identically on both engines.
   */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: Column, k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val seed: Column =
      if (salt.isEmpty) col(idCol).cast("string")
      else concat(lit(salt), lit(":"), col(idCol).cast("string"))
    val u = graft.operators.DistinctSketch.fracMd5(md5(seed))
    val keyed = df.withColumn("__es", -log(u) / weightCol)
    graft.plans.TopK.perKey(keyed, Seq(groupCol), "__es", k, idCol,
        desc = false)
      .drop("__es")
  }

  /**
   * NEYMAN-allocation stratified sampling: per-stratum sample sizes
   * proportional to N_h·S_h (population × spread — the variance-optimal
   * allocation, Neyman 1934) instead of plain proportional, then a
   * deterministic md5-rank draw inside each stratum. S_h comes from
   * DECIMAL-exact moments (the n·Σx²−(Σx)² cancellation in exact
   * decimal, IEEE sqrt at the edge); integer allocations by largest
   * remainder with a stratum-name tiebreak, so Σ n_h == nTotal exactly.
   * The draw is [[weightedSample]]'s contract: pure function of
   * (salt, id) — reproducible anywhere.
   *
   * Output: the selected rows as (stratum, id, rank) with rank 1..n_h.
   */
  def neymanSample(df: DataFrame, strataCol: String, idCol: String,
      valueCol: Column, nTotal: Int, salt: String = ""): DataFrame = {
    require(nTotal >= 1, s"nTotal must be >= 1: $nTotal")
    val g = col(strataCol)
    val x = valueCol.cast("decimal(38,4)")
    val moments = df.groupBy(g).agg(
      count(lit(1)).cast("decimal(38,0)").as("nh"),
      sum(x).as("sx"),
      sum((x * x).cast("decimal(38,8)")).as("sxx"))
    // population variance = (n·Σx² − Σx²)/n², exact until the division
    val varPop = (col("nh") * col("sxx") - col("sx") * col("sx")).cast("double") /
      (col("nh").cast("double") * col("nh").cast("double"))
    val weighted = moments.select(g, col("nh").cast("long").as("nh"),
      (col("nh").cast("double") * sqrt(varPop)).as("w"))
    val totW = Window.partitionBy()
    val alloc = weighted
      .withColumn("__share", lit(nTotal.toDouble) * col("w") / sum(col("w")).over(totW))
      .withColumn("__base", floor(col("__share")).cast("long"))
      .withColumn("__rem", col("__share") - col("__base"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, g.asc)))
      .withColumn("__left",
        lit(nTotal.toLong) - sum(col("__base")).over(totW))
      .withColumn("n_h",
        (col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          // a stratum cannot yield more rows than it has
          .cast("long"))
      .select(g, least(col("n_h"), col("nh")).as("n_h"))
    val seed: Column =
      if (salt.isEmpty) col(idCol).cast("string")
      else concat(lit(salt), lit(":"), col(idCol).cast("string"))
    val drawn = df
      .withColumn("__u", md5(seed))
      .withColumn("rank", row_number().over(
        Window.partitionBy(g).orderBy(col("__u"), col(idCol))).cast("long"))
      .join(broadcast(alloc), strataCol)
      .where(col("rank") <= col("n_h"))
    drawn.select(g, col(idCol), col("rank"))
  }

  private def contaminationTail(withSplit: DataFrame, idCol: String,
      testSplit: String, trainG: DataFrame): DataFrame = {
    val trainSet = trainG.distinct().withColumn("__hit", lit(1L))
    withSplit.where(col("split") === testSplit)
      .select(col(idCol), explode(col("__sh")).as("g"))
      .join(trainSet, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("hits"))
      .select(col(idCol), col("n_shingles"), col("hits"),
        round(col("hits").cast("double") / col("n_shingles"), 6)
          .as("contamination"))
  }
}
