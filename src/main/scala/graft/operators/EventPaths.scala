package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-path mining — the "what do users do next" pair of operators
 * every product-analytics engine ships (ClickHouse sequence functions,
 * funnel-adjacent path analysis):
 *
 *  - [[topSequences]]: most frequent length-n consecutive event chains
 *    across all users;
 *  - [[transitions]]: the first-order Markov transition matrix between
 *    event types, with per-source probabilities.
 *
 * Both are ONE user-partitioned window pass (per-user partitions are
 * activity-bounded, never corpus-sized) followed by a map-combined
 * count rollup whose output cardinality is |event types|^n — tiny and
 * corpus-size-free. No self-joins per step, no per-user collect.
 * Determinism: the within-user order is (ts, tieCol) — a total order —
 * and the top-K cut carries the (cnt desc, path) total order.
 */
object EventPaths {

  /** @return top-K (path "a>b>c", cnt) of consecutive n-chains. */
  def topSequences(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int, topK: Int): DataFrame = {
    require(n >= 2 && n <= 8, "n in 2..8")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val leads = (1 until n).foldLeft(df.withColumn("__e0", col(typeCol))) {
      (d, i) => d.withColumn(s"__e$i", lead(col(typeCol), i).over(w))
    }
    leads
      .where((1 until n).map(i => col(s"__e$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until n).map(i => col(s"__e$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(topK)
  }

  /**
   * Gap-allowed sequential patterns (the PrefixSpan support notion,
   * Pei et al. 2001): support of a→b (or a→b→c) = number of USERS whose
   * event sequence contains the pattern as a not-necessarily-contiguous
   * subsequence — each user votes ONCE however many embeddings exist.
   * [[topSequences]] counts contiguous occurrences; "signup … eventually
   * purchase, anything between" is this operator. Only the first
   * `prefixLen` events per user are mined (the standard bounding device:
   * the embedding join is O(L²)/O(L³) per user, so the per-user prefix
   * IS the scale contract — raise it deliberately, never implicitly).
   * Joins are user-keyed; per-user DISTINCT before the support count.
   * Output: top `topK` rows (pattern "a->b[->c]", len, support) by
   * (support desc, pattern) — TakeOrdered, never a global sort.
   */
  def frequentSubsequences(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, maxLen: Int = 3, topK: Int = 25,
      prefixLen: Int = 12): DataFrame = {
    require(maxLen == 2 || maxLen == 3, "maxLen in {2,3}")
    require(prefixLen >= 2 && prefixLen <= 64,
      "prefixLen in [2,64] — the per-user embedding join is O(L^3)")
    require(topK >= 1, "topK >= 1")
    val w = Window.partitionBy(col("u")).orderBy(col("__ts"), col("__tie"))
    val e = df.select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixLen)
      .select(col("u"), col("t"), col("rn"))
    val a = e.select(col("u"), col("t").as("t1"), col("rn").as("r1"))
    val b = e.select(col("u"), col("t").as("t2"), col("rn").as("r2"))
    val p2 = a.join(b, "u").where(col("r1") < col("r2"))
      .select(col("u"), col("t1"), col("t2")).distinct()
    val s2 = p2.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("support"))
      .select(concat_ws("->", col("t1"), col("t2")).as("pattern"),
        lit(2).as("len"), col("support"))
    val out = if (maxLen == 2) s2 else {
      val c = e.select(col("u"), col("t").as("t3"), col("rn").as("r3"))
      val p3 = a.join(b, "u").where(col("r1") < col("r2"))
        .join(c, "u").where(col("r2") < col("r3"))
        .select(col("u"), col("t1"), col("t2"), col("t3")).distinct()
      val s3 = p3.groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).as("support"))
        .select(concat_ws("->", col("t1"), col("t2"), col("t3")).as("pattern"),
          lit(3).as("len"), col("support"))
      s2.unionByName(s3)
    }
    out.orderBy(col("support").desc, col("pattern").asc).limit(topK)
  }

  /** @return (prev, next, cnt, prob) — prob normalized per prev row. */
  def transitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("prev"), col("__next").as("next"))
      .agg(count(lit(1)).as("cnt"))
    pairs
      .withColumn("prob", col("cnt").cast("double") /
        sum(col("cnt")).over(Window.partitionBy(col("prev"))))
      .select("prev", "next", "cnt", "prob")
  }

  /**
   * Stationary distribution of the [[transitions]] Markov chain — where
   * does the session process SPEND its time in the long run, the
   * steady-state read raw transition counts only hint at. Fixed-point by
   * `iters` synchronous power iterations (the pageRankFixed doctrine:
   * fixed rounds, NO convergence test, INTEGER fixed-point units — both
   * engines run the identical recursion on identical integers):
   * probabilities and mass live in picounits (1e12), p_ij = (c·1e12) //
   * rowSum and each step's v'_j = Σ_i (v_i·p_ij) // 1e12 use floor
   * division over exact BigInt/HUGEINT, so every iterate is engine-
   * independent bit-for-bit. Dangling states (no outgoing transition)
   * become self-loops — deterministic, mass-preserving. The state domain
   * is collected with a LOUD `maxStates` contract (house style: the
   * matrix is bounded by the categorical domain, k² ≤ 4096 cells at the
   * default — driver state is fixed, the heavy lifting — pair counting —
   * stays distributed). Output: one row per state (state, n_out,
   * pi_units, pi), pi = round(pi_units/1e12, 6) after `iters` steps.
   */
  def stationary(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, iters: Int = 16,
      maxStates: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1,64]")
    val spark = df.sparkSession
    import spark.implicits._
    val U = 1000000000000L // picounits
    val ev = df.select(col(userCol).as("__u"), col(typeCol).cast("string").as("__s"),
        col(tsCol).cast("long").as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__s").isNotNull)
    val states = ev.select(col("__s")).distinct().collect()
      .map(_.getString(0)).sorted
    require(states.nonEmpty, "stationary needs at least one event")
    require(states.length <= maxStates,
      s"stationary: ${states.length} states exceeds maxStates=$maxStates — " +
        "this operator collects a k x k matrix; refuse rather than melt the driver")
    val k = states.length
    val idx = states.zipWithIndex.toMap
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__tie"))
    val counts = ev.withColumn("__next", lead(col("__s"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col("__s"), col("__next")).agg(count(lit(1)).as("cnt"))
      .collect() // bounded: ≤ k² ≤ maxStates² rows
    val c = Array.ofDim[Long](k, k)
    counts.foreach(r => c(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val rowSum = c.map(_.sum)
    val p = Array.tabulate(k, k) { (i, j) =>
      if (rowSum(i) == 0L) { if (i == j) U else 0L }
      else (BigInt(c(i)(j)) * U / rowSum(i)).toLong // floor: inputs >= 0
    }
    var v = Array.fill(k)(U / k)
    for (_ <- 1 to iters) {
      v = Array.tabulate(k) { j =>
        var acc = BigInt(0)
        var i = 0
        while (i < k) { acc += BigInt(v(i)) * p(i)(j) / U; i += 1 }
        acc.toLong
      }
    }
    states.zipWithIndex.toSeq.map { case (s, i) => (s, rowSum(i), v(i)) }
      .toDF("state", "n_out", "pi_units")
      .withColumn("pi", round(col("pi_units").cast("double") / lit(1e12), 6))
  }

  /**
   * Entropy rate of the behavior Markov chain — HOW PREDICTABLE is the
   * session process in the long run: [[stationary]] says where the walk
   * spends its time, the entropy rate H = Σᵢ πᵢ·Σⱼ −pᵢⱼ·ln pᵢⱼ says how
   * much surprise each step carries once it's there (0 = deterministic
   * loops, ln k = uniform chaos) — THE one-number drift alarm for "did
   * the event stream's structure change", and e^H is the effective
   * branching factor.
   *
   * Determinism: transition counts and row sums are exact longs (the
   * [[stationary]] machinery verbatim — pair counting distributed, the
   * driver holds only the k×k matrix under the maxStates refusal); π is
   * the same floor-divided picounit power iteration; per-state entropies
   * ride the q313 12dp term shape ((c/r)·ln(r/c), DECIMAL-summed) and
   * the rate is one more 12dp decimal sum of πᵢ·Hᵢ terms. Absorbing
   * states (no outgoing mass) carry zero entropy by definition.
   *
   * Output: one row (n_states, n_transitions, entropy_rate, branching)
   * — 6dp; branching = e^rate.
   */
  def entropyRate(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, iters: Int = 16,
      maxStates: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1,64]")
    val spark = df.sparkSession
    import spark.implicits._
    val U = 1000000000000L
    val ev = df.select(col(userCol).as("__u"), col(typeCol).cast("string").as("__s"),
        col(tsCol).cast("long").as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__s").isNotNull)
    val states = ev.select(col("__s")).distinct().collect()
      .map(_.getString(0)).sorted
    require(states.nonEmpty, "entropyRate needs at least one event")
    require(states.length <= maxStates,
      s"entropyRate: ${states.length} states exceeds maxStates=$maxStates")
    val k = states.length
    val idx = states.zipWithIndex.toMap
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("__tie"))
    val counts = ev.withColumn("__next", lead(col("__s"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col("__s"), col("__next")).agg(count(lit(1)).as("cnt"))
      .collect() // bounded: ≤ k² rows
    val c = Array.ofDim[Long](k, k)
    counts.foreach(r => c(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val rowSum = c.map(_.sum)
    val p = Array.tabulate(k, k) { (i, j) =>
      if (rowSum(i) == 0L) { if (i == j) U else 0L }
      else (BigInt(c(i)(j)) * U / rowSum(i)).toLong
    }
    var v = Array.fill(k)(U / k)
    for (_ <- 1 to iters) {
      v = Array.tabulate(k) { j =>
        var acc = BigInt(0)
        var i = 0
        while (i < k) { acc += BigInt(v(i)) * p(i)(j) / U; i += 1 }
        acc.toLong
      }
    }
    def d12(x: Double): BigDecimal =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-state entropy from exact rationals, the q313 term shape
    val h = Array.tabulate(k) { i =>
      if (rowSum(i) == 0L) 0.0
      else {
        val rd = rowSum(i).toDouble
        (0 until k).foldLeft(BigDecimal(0)) { (a, j) =>
          if (c(i)(j) == 0L) a
          else a + d12(c(i)(j).toDouble / rd * math.log(rd / c(i)(j).toDouble))
        }.toDouble
      }
    }
    val rate = (0 until k).foldLeft(BigDecimal(0)) { (a, i) =>
      a + d12(v(i).toDouble / 1e12 * h(i))
    }.toDouble
    // branching composes from the PUBLISHED 6dp rate (the q313
    // compose-from-published doctrine; the oracle does the same)
    Seq((k.toLong, rowSum.sum, r6(rate), r6(math.exp(r6(rate)))))
      .toDF("n_states", "n_transitions", "entropy_rate", "branching")
  }

  /**
   * Multi-touch conversion attribution — which channel gets credit for
   * each `target` conversion, under the three standard models at once:
   * last-touch (the nearest preceding touch inside the lookback wins),
   * first-touch (the earliest inside the lookback wins), and linear
   * (each touching channel gets its share cnt_c/m of one credit).
   * Shape: ONE user-partitioned RANGE window pass ([ts−lookback, ts−1],
   * strictly-earlier so same-second touches never self-credit) computes
   * per-conversion last/first touch structs ((t, tie, channel) — the
   * unique tie-breaker makes struct max/min a total order) and bounded
   * per-channel counts; the rollup is one aggregation collapsing to
   * |channels| values, so nothing corpus-sized moves after the window.
   * Linear terms round(cnt_c/m, 12) are DECIMAL-summed (the Σ doctrine).
   * Conversions with NO touch in the window credit the synthetic
   * "(direct)" channel in all three models. The channel domain is
   * collected under a LOUD `maxChannels` contract (the [[stationary]]
   * pattern). Output: one row per channel incl "(direct)"
   * (channel, last_touch, first_touch, linear), linear 6dp.
   */
  def attribution(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, target: String, lookback: Long,
      maxChannels: Int = 64): DataFrame = {
    require(lookback >= 1, "lookback >= 1 second")
    val spark = df.sparkSession
    val ev = df.select(col(userCol).as("__u"), col(typeCol).cast("string").as("__c"),
        col(tsCol).cast("long").as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__c").isNotNull && col("__t").isNotNull)
    val channels = ev.select(col("__c")).distinct().collect()
      .map(_.getString(0)).filter(_ != target).sorted
    require(channels.nonEmpty, s"attribution: no touch channels besides '$target'")
    require(channels.length <= maxChannels,
      s"attribution: ${channels.length} channels exceeds maxChannels=$maxChannels")
    val isTouch = col("__c") =!= target
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"))
      .rangeBetween(-lookback, -1)
    val touchStruct = when(isTouch, struct(col("__t"), col("__tie"), col("__c")))
    val cntCols = channels.zipWithIndex.map { case (c, i) =>
      sum(when(col("__c") === c, 1L)).over(w).as(s"__n$i") }
    val conv = ev.select(col("__u") +: col("__c") +:
        max(touchStruct).over(w).as("__last") +:
        min(touchStruct).over(w).as("__first") +: cntCols: _*)
      .where(col("__c") === target)
      .withColumn("__m",
        channels.indices.map(i => coalesce(col(s"__n$i"), lit(0L))).reduce(_ + _))
    val aggCols: Seq[org.apache.spark.sql.Column] =
      sum(when(col("__m") === 0, 1L).otherwise(0L)).as("__direct") +:
      channels.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(when(col("__last.__c") === c, 1L).otherwise(0L)).as(s"__lt$i"),
        sum(when(col("__first.__c") === c, 1L).otherwise(0L)).as(s"__ft$i"),
        sum(when(col("__m") > 0,
          round(coalesce(col(s"__n$i"), lit(0L)).cast("double")
            / col("__m").cast("double"), 12)).cast("decimal(38,12)")).as(s"__ln$i"))
      }
    val r = conv.agg(aggCols.head, aggCols.tail: _*).head() // one bounded row
    val direct = if (r.isNullAt(0)) 0L else r.getLong(0)
    val zero = new java.math.BigDecimal(java.math.BigInteger.ZERO, 12)
    val rows = ("(direct)", direct, direct,
        new java.math.BigDecimal(java.math.BigInteger.valueOf(direct), 0)
          .setScale(12)) +:
      channels.zipWithIndex.map { case (c, i) =>
        (c,
          if (r.isNullAt(1 + 3 * i)) 0L else r.getLong(1 + 3 * i),
          if (r.isNullAt(2 + 3 * i)) 0L else r.getLong(2 + 3 * i),
          if (r.isNullAt(3 + 3 * i)) zero
          else r.getDecimal(3 + 3 * i).setScale(12))
      }
    import spark.implicits._
    rows.toSeq.toDF("channel", "last_touch", "first_touch", "__lin")
      .withColumn("linear", round(col("__lin").cast("double"), 6))
      .drop("__lin")
  }

  /**
   * Weighted multi-touch attribution — the two standard models
   * [[attribution]]'s last/first/linear trio leaves out:
   *
   *  - TIME-DECAY with DYADIC halving: a touch `e` whole half-lives
   *    before the conversion weighs 2^(E−1−e) where E = ⌈lookback/h⌉ —
   *    integer weights by construction (the engine's exact-arithmetic
   *    doctrine; a continuous 2^(−Δ/h) would be transcendental), so each
   *    conversion's per-channel share is ONE divide of exact longs;
   *  - POSITION-BASED (U-shaped 40/20/40): first and last touch get 40%
   *    each, the m−2 middle touches split 20% — as the exact rational
   *    (2(m−2)·[last=c] + 2(m−2)·[first=c] + mid_c) / (5(m−2)) for
   *    m ≥ 3, and ([last=c]+[first=c])/2 for m ≤ 2 (a single touch is
   *    both ends and collects 1.0).
   *
   * Shape: ONE user-partitioned window pass per exponent bucket — bucket
   * e covers conversion-to-touch gaps Δ ∈ [e·h+1, (e+1)·h] (e = (Δ−1)
   * div h; strictly-earlier, so same-second touches never self-credit)
   * as a RANGE frame, so Δ needs no per-pair expression — plus the
   * [[attribution]] first/last structs.
   * Window-aggregate count is |channels|·E + 2, bounded by the
   * `maxChannels`·E ≤ 128 contract. Per-conversion shares round 12dp and
   * DECIMAL-sum (the Σ doctrine); untouched conversions credit
   * "(direct)" 1.0 in both models. Output: one row per channel
   * (channel, n_touched, decay, position), 6dp.
   */
  def attributionWeighted(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, target: String, lookback: Long,
      halflife: Long, maxChannels: Int = 64): DataFrame = {
    require(lookback >= 1 && halflife >= 1, "lookback/halflife >= 1 second")
    require(lookback % halflife == 0,
      "attributionWeighted: lookback must be a whole number of half-lives")
    val nExp = (lookback / halflife).toInt
    require(nExp >= 1 && nExp <= 16, "attributionWeighted: 1..16 half-lives")
    val spark = df.sparkSession
    val ev = df.select(col(userCol).as("__u"), col(typeCol).cast("string").as("__c"),
        col(tsCol).cast("long").as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__c").isNotNull && col("__t").isNotNull)
    val channels = ev.select(col("__c")).distinct().collect()
      .map(_.getString(0)).filter(_ != target).sorted
    require(channels.nonEmpty,
      s"attributionWeighted: no touch channels besides '$target'")
    require(channels.length <= maxChannels && channels.length * nExp <= 128,
      s"attributionWeighted: ${channels.length} channels x $nExp buckets " +
        "exceeds the window-aggregate budget (channels*buckets <= 128)")
    val isTouch = col("__c") =!= target
    def wFrame(e: Int) = Window.partitionBy(col("__u")).orderBy(col("__t"))
      .rangeBetween(-(e + 1L) * halflife, -e.toLong * halflife - 1L)
    val wAll = Window.partitionBy(col("__u")).orderBy(col("__t"))
      .rangeBetween(-lookback, -1)
    val touchStruct = when(isTouch, struct(col("__t"), col("__tie"), col("__c")))
    val cntCols = channels.zipWithIndex.flatMap { case (c, i) =>
      (0 until nExp).map { e =>
        sum(when(col("__c") === c, 1L)).over(wFrame(e)).as(s"__n${i}_$e") }
    }
    val conv = ev.select(col("__u") +: col("__c") +:
        max(touchStruct).over(wAll).as("__last") +:
        min(touchStruct).over(wAll).as("__first") +: cntCols: _*)
      .where(col("__c") === target)
    def num(i: Int): Column = (0 until nExp).map { e =>
      coalesce(col(s"__n${i}_$e"), lit(0L)) * lit(1L << (nExp - 1 - e))
    }.reduce(_ + _)
    def cnt(i: Int): Column = (0 until nExp).map { e =>
      coalesce(col(s"__n${i}_$e"), lit(0L)) }.reduce(_ + _)
    val scored = conv
      .withColumn("__den", channels.indices.map(num).reduce(_ + _))
      .withColumn("__m", channels.indices.map(cnt).reduce(_ + _))
    def posShare(i: Int): Column = {
      val l = when(col("__last.__c") === channels(i), 1L).otherwise(0L)
      val f = when(col("__first.__c") === channels(i), 1L).otherwise(0L)
      val mid = cnt(i) - l - f
      when(col("__m") <= 2, round((l + f).cast("double") / lit(2.0), 12))
        .otherwise(round(
          (lit(2L) * (col("__m") - 2L) * (l + f) + mid).cast("double")
            / (lit(5L) * (col("__m") - 2L)).cast("double"), 12))
    }
    val aggCols: Seq[Column] =
      sum(when(col("__m") === 0, 1L).otherwise(0L)).as("__direct") +:
      channels.zipWithIndex.flatMap { case (_, i) => Seq(
        sum(when(col("__m") > 0, round(
          num(i).cast("double") / col("__den").cast("double"), 12))
          .cast("decimal(38,12)")).as(s"__dc$i"),
        sum(when(col("__m") > 0, posShare(i)).cast("decimal(38,12)"))
          .as(s"__ps$i"),
        sum(when(col("__m") > 0 && cnt(i) > 0, 1L).otherwise(0L))
          .as(s"__nt$i"))
      }
    val r = scored.agg(aggCols.head, aggCols.tail: _*).head() // bounded row
    val direct = if (r.isNullAt(0)) 0L else r.getLong(0)
    val dDec = new java.math.BigDecimal(java.math.BigInteger.valueOf(direct), 0)
      .setScale(12)
    val zero = new java.math.BigDecimal(java.math.BigInteger.ZERO, 12)
    val rows = ("(direct)", direct, dDec, dDec) +:
      channels.zipWithIndex.map { case (c, i) =>
        (c,
          if (r.isNullAt(3 + 3 * i)) 0L else r.getLong(3 + 3 * i),
          if (r.isNullAt(1 + 3 * i)) zero else r.getDecimal(1 + 3 * i).setScale(12),
          if (r.isNullAt(2 + 3 * i)) zero else r.getDecimal(2 + 3 * i).setScale(12))
      }
    import spark.implicits._
    rows.toSeq.toDF("channel", "n_touched", "__dc", "__ps")
      .withColumn("decay", round(col("__dc").cast("double"), 6))
      .withColumn("position", round(col("__ps").cast("double"), 6))
      .drop("__dc", "__ps")
  }

  /**
   * Per-user behavioral entropy — the Shannon entropy of each user's
   * event-type distribution, the predictability read behind bot and
   * scripted-traffic triage (a metronome that only ever "views" scores
   * 0; an organic user mixing k types approaches ln k) and the
   * per-entity complement of the corpus-level
   * [[DistDrift.mutualInformation]] entropies. H = Σ (c/n)·ln(n/c) over
   * the user's type counts; each term is ln of an exact rational times
   * an exact rational (ONE spelling — both engines evaluate the
   * identical IEEE expression), 12dp-rounded, DECIMAL-summed (the Σ
   * doctrine). entropy_norm composes from the PUBLISHED entropy and the
   * 12dp ln(k) — 1.0 means "uses all its types uniformly".
   *
   * Shape: one (user, type) count aggregation, one user rollup — both
   * user-keyed, co-partitioned, output |users| rows.
   *
   * Output: (user, n_events, n_types, entropy, entropy_norm) —
   * entropy_norm NULL for single-type users (ln 1 = 0).
   */
  def behavioralEntropy(df: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    val ut = df.select(col(userCol).as("user"), col(typeCol).as("__t"))
      .where(col("user").isNotNull && col("__t").isNotNull)
      .groupBy(col("user"), col("__t")).agg(count(lit(1)).as("__c"))
    val wU = Window.partitionBy(col("user"))
    val terms = ut
      .withColumn("__n", sum(col("__c")).over(wU))
      .withColumn("__term", round(
        col("__c").cast("double") / col("__n").cast("double")
          * log(col("__n").cast("double") / col("__c").cast("double")), 12))
    terms.groupBy(col("user"))
      .agg(max(col("__n")).as("n_events"), count(lit(1)).as("n_types"),
        round(sum(col("__term").cast("decimal(24,12)")).cast("double"), 6)
          .as("entropy"))
      .withColumn("entropy_norm", when(col("n_types") > 1, round(
        col("entropy") / round(log(col("n_types").cast("double")), 12), 6)))
  }

  /**
   * Per-user inter-arrival statistics — the burstiness read behind bot /
   * scripted-traffic detection: humans are bursty (CV of gaps well above
   * 0), schedulers are metronomes (CV → 0), replayed logs collapse to
   * zero gaps. One user-partitioned lag window + one grouped moment
   * aggregation; moments are EXACT longs (gaps in whole seconds), the
   * variance cancellation n·Σg² − (Σg)² happens in long arithmetic, and
   * CV = √var/mean reduces to √(n·Σg²−(Σg)²)/Σg — one sqrt, one divide,
   * both IEEE-deterministic. Operand bound: n·Σg² must stay < 2^63
   * (≈10⁵ events × 10⁵-second gaps per user clears it by 10³×).
   *
   * Output (users with ≥ `minEvents`): (user, n_events, n_zero_gaps,
   * mean_gap_s, cv_gap, zero_gap_frac).
   */
  def interArrival(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, minEvents: Long = 3L): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col(idCol))
    val gaps = df
      .select(col(userCol).as("__u"), col(tsCol).cast("long").as("__t"),
        col(idCol))
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(w))
      .where(col("__g").isNotNull)
    gaps.groupBy(col("__u").as("user"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__g")).as("__sg"),
        sum(col("__g") * col("__g")).as("__sgg"),
        sum(when(col("__g") === 0L, 1L).otherwise(0L)).as("n_zero_gaps"))
      .where(col("__n") + 1L >= minEvents)
      .select(col("user"), (col("__n") + 1L).as("n_events"), col("n_zero_gaps"),
        round(col("__sg").cast("double") / col("__n").cast("double"), 6)
          .as("mean_gap_s"),
        when(col("__sg") > 0, round(
          sqrt((col("__n") * col("__sgg") - col("__sg") * col("__sg"))
            .cast("double")) / col("__sg").cast("double"), 6)).as("cv_gap"),
        round(col("n_zero_gaps").cast("double") / col("__n").cast("double"), 6)
          .as("zero_gap_frac"))
  }
}
