package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Marketing-style LAST-TOUCH attribution: each conversion event credits
 * its value to the most recent preceding touch event (from a declared
 * touch-type set) by the same user within a lookback window; conversions
 * with no eligible touch are 'direct'.
 *
 * Shape: ONE user-keyed window pass — `last(touch, ignoreNulls)` over
 * (ts, id) with an explicit ROWS frame carries the latest touch forward;
 * no per-conversion lookup join, no self-join of the event stream. The
 * (ts, id) order key is total, so the carried touch is deterministic even
 * under timestamp ties. At 100 TB this is the standard
 * partition-by-user window: activity-bounded partitions, AQE handles
 * whales (same contract as q161's event paths).
 *
 * Reference anchor: none (the reference has no event analytics);
 * extension family alongside funnel (q148) and paths (q161).
 */
object Attribution {

  /** Per-conversion attribution rows: (user, ts, channel, value) where
    * channel is the credited touch type or 'direct'. */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not contain the conversion type")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).cast("long").as("t"), col(typeCol).as("ch")))
    events
      .withColumn("__lt", last(touch, ignoreNulls = true).over(w))
      .where(col(typeCol) === convType)
      .select(col(userCol), col(tsCol),
        when(col("__lt").isNotNull &&
            col(tsCol).cast("long") - col("__lt.t") <= lookbackSec,
          col("__lt.ch")).otherwise(lit("direct")).as("channel"),
        col(valueCol).as("value"))
  }

  /**
   * LINEAR multi-touch attribution: each conversion's value splits
   * EQUALLY across every eligible touch in the lookback; no-touch
   * conversions stay 'direct'. The split is exact INTEGER cents —
   * `cents div k` per touch with the remainder credited to the LATEST
   * touch — so per-channel credits sum to the conversion total to the
   * cent, deterministically (a double split leaks fractions of cents
   * and its sums are order-dependent).
   *
   * Shape: the same single user-keyed window pass as [[lastTouch]], but
   * carrying the RUNNING TOUCH LIST (`collect_list` over the prefix
   * frame — activity-bounded, like q161's paths); conversions filter the
   * list to the lookback and explode. No conversions×touches self-join.
   *
   * Output: (channel, n_credits, credited_cents).
   */
  def linearTouch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and must not contain the conversion type")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).cast("long").as("t"), col(typeCol).as("ch")))
    val convs = events
      .withColumn("__touches", collect_list(touch).over(w))
      .where(col(typeCol) === convType)
      .withColumn("__cents",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("__el", filter(col("__touches"),
        x => col(tsCol).cast("long") - x.getField("t") <= lookbackSec))
      .withColumn("__k", size(col("__el")))
    val direct = convs.where(col("__k") === 0)
      .select(lit("direct").as("channel"), col("__cents").as("credit"))
    val credited = convs.where(col("__k") > 0)
      .select(col("__cents"), col("__k"),
        posexplode(col("__el")).as(Seq("pos", "tch")))
      .select(col("tch.ch").as("channel"),
        (expr("__cents div __k") +
          when(col("pos") === col("__k") - 1, pmod(col("__cents"), col("__k")))
            .otherwise(lit(0L))).as("credit"))
    direct.unionByName(credited)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit")).as("credited_cents"))
  }

  /** Channel roll-up: (channel, n_conversions, total_value) with DECIMAL
    * accumulation so the sum is partition-order independent. */
  def byChannel(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackSec: Long): DataFrame =
    lastTouch(events, userCol, tsCol, idCol, typeCol, valueCol,
        convType, touchTypes, lookbackSec)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(18,2)")).as("__tv"))
      .select(col("channel"), col("n_conversions"),
        col("__tv").cast("double").as("total_value"))

  /**
   * EXACT Shapley-value attribution (Shapley 1953; the game-theoretic
   * credit split marketing knows from Dalessandro et al. 2012): with
   * characteristic function v(T) = converting units whose touched
   * channel set ⊆ T ("could T alone have produced these conversions"),
   * channel c earns φ_c = Σ_{T ⊆ C∖c} |T|!(k−1−|T|)!/k! ·
   * (v(T∪{c}) − v(T)) — the only split that is efficient
   * (Σφ = v(C) − v(∅)), symmetric, and null-player-zero; last/first/
   * linear/position rules (q179/q190/q302/q311) are heuristics, this
   * is the axiomatic answer.
   *
   * `channelCols` = (name, touched?) boolean columns over the per-UNIT
   * relation (one row per user/journey — build it with one upstream
   * aggregation); `convertedCol` marks converting units. EXACT by
   * clearing denominators: φ_c·k! = Σ t!(k−1−t)!·Δ is an exact integer
   * (weights and v are longs), published as ONE double divide by k!,
   * 6dp. Shape: one mask projection + one ≤2^k-row groupBy; the 2^k·k
   * Shapley fold runs on the driver over the bounded collect
   * (`maxChannels` keeps the lattice loud — default 8 → 256 rows).
   *
   * Output per channel: (channel, n_conv, v_full, v_empty, shapley),
   * ordered by channel. v_empty = direct conversions (no declared
   * channel touched) — they belong to no channel by construction.
   */
  def shapleyAttribution(units: DataFrame,
      channelCols: Seq[(String, Column)], convertedCol: Column,
      maxChannels: Int = 8): DataFrame = {
    val k = channelCols.size
    require(k >= 1 && k <= maxChannels,
      s"shapleyAttribution: $k channels > maxChannels=$maxChannels — " +
        "the subset lattice is 2^k; raise the bound deliberately")
    require(channelCols.map(_._1).distinct.size == k, "duplicate channel names")
    val mask = channelCols.zipWithIndex.map { case ((_, c), i) =>
      when(c, lit(1L << i)).otherwise(0L) }.reduce(_ + _)
    val counts = units.where(convertedCol)
      .select(mask.as("m")).groupBy(col("m")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // ≤ 2^k rows
    val full = (1L << k) - 1L
    def v(t: Long): Long =
      counts.iterator.collect { case (m, c) if (m & ~t) == 0L => c }.sum
    val fact = (0 to k).map(i => (1 to i).foldLeft(1L)(_ * _)).toArray
    val kFact = fact(k)
    val nConv = counts.valuesIterator.sum
    val vFull = v(full); val vEmpty = v(0L)
    val rows = channelCols.map(_._1).zipWithIndex.map { case (name, i) =>
      val bit = 1L << i
      var num = 0L
      var t = 0L
      while (t <= full) {
        if ((t & bit) == 0L) {
          val sz = java.lang.Long.bitCount(t)
          num += fact(sz) * fact(k - 1 - sz) * (v(t | bit) - v(t))
        }
        t += 1L
      }
      (name, nConv, vFull, vEmpty,
        BigDecimal(num.toDouble / kFact.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val spark = units.sparkSession
    import spark.implicits._
    rows.toDF("channel", "n_conv", "v_full", "v_empty", "shapley")
  }
}
