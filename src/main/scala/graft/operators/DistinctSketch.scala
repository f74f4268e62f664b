package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.kmvSketch

/**
 * Distinct-count sketches with multiset operations — the re-aggregatable
 * distinct-count layer a 100 TB cube needs: `count(distinct)` cannot be
 * rolled up from finer groups, a KMV sketch can. Build one k-bounded
 * sketch per group in ONE narrow aggregation ([[graft.expr.KmvSketchAgg]]),
 * persist the sketch column next to the summary, then answer
 * distinct-count questions for ANY union of groups (and pairwise
 * intersections via inclusion-exclusion) by merging arrays with pure
 * Spark array functions — no rescan of base data, no token/key shuffle.
 *
 * Determinism contract (what makes these ORACLE-able, not just plausible):
 * the k smallest distinct hashes of a set are order-independent, and the
 * estimator arithmetic below sticks to doubles that are EXACT binary
 * fractions — a 52-bit hash prefix divided by 2^52 — so an independent
 * engine (DuckDB) recomputes the identical bits. Two hash families, same
 * split as the minhash twins (q29/q45):
 *   - md5 hex (oracle family): lexicographic order on lowercase fixed-width
 *     hex IS numeric order; DuckDB has md5.
 *   - xxhash64 >>> 12 (production family): 52-bit non-negative long, one
 *     codegen'd hash per row, no string materialization.
 *
 * Accuracy: relative error ≈ 1/sqrt(k-2) (Beyer et al. 2007) — k=256 gives
 * ~6%, k=4096 ~1.6%. When the true distinct count m < k the sketch holds
 * every distinct hash and the estimate is EXACT (= m, barring 2^-52-rare
 * hash collisions) — which is what lets the production hash family be
 * gated against an exact `count(distinct)` oracle in that regime.
 *
 * Reference anchor: the reference's only distinct machinery is exact
 * unique indexes (`lib/src/core/index_manager.dart`); approximate
 * multiset cardinality is a scale extension (SURVEY §2 pipeline rows).
 */
object DistinctSketch {

  /** 2^52 — the hash-domain size. 52 bits so every hash value, and hence
    * every `frac`, is an EXACT double (53-bit mantissa): both engines'
    * int→double conversion and division are identity-exact, no rounding
    * divergence can enter the estimator. */
  val HashDenom: Double = 4503599627370496.0

  /** md5-family hash column (oracle-reproducible): lowercase 32-char hex. */
  def md5Hash(c: Column): Column = md5(c.cast("string"))

  /** xxhash64-family hash column (production): top 52 bits, non-negative. */
  def xxHash52(c: Column): Column = shiftrightunsigned(xxhash64(c), 12)

  /** Per-group KMV sketch: groupBy(groupCols) → one `kmv` array column of
    * the k smallest distinct values of `hashCol`. One map-side-combined
    * aggregation; state per group is k values. */
  def sketchBy(df: DataFrame, groupCols: Seq[String], hashCol: Column,
      k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kmvSketch(hashCol, k).as("kmv"))

  /** Fraction of the hash domain for an md5 hex hash: first 13 hex chars
    * (52 bits) / 2^52. `conv` is the codegen'd base-16 parse. */
  def fracMd5(h: Column): Column =
    conv(substring(h, 1, 13), 16, 10).cast("long") / lit(HashDenom)

  /** Fraction of the hash domain for a 52-bit long hash. */
  def fracXx(h: Column): Column = h / lit(HashDenom)

  /** Distinct-count estimate from a sketch array: exact when the sketch is
    * under capacity (it then holds EVERY distinct hash), (k-1)/frac(h_k)
    * at capacity. `frac` maps the k-th element to [0,1). */
  def estimate(sk: Column, k: Int, frac: Column => Column): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / frac(element_at(sk, k)))

  /** Merge two sketches: k smallest distinct of the union — pure Spark
    * array functions, valid for any number of unions (associative). For
    * md5-string sketches `array_sort` is lexicographic = numeric. */
  def mergeSketches(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /**
   * HyperLogLog register table (Flajolet et al. 2007) from md5-hex
   * hashes, m = 4096 buckets: bucket = first 3 hex chars, rank = leading
   * zero BITS of the next 64 bits + 1 (65 when all-zero). The rank is
   * derived ENTIRELY in string space — zero-run length by regexp, the
   * sub-nibble bit count by ASCII comparison on the first nonzero hex
   * char ('8'≤c→0, '4'≤c→1, '2'≤c→2, else 3) — so an independent SQL
   * engine reproduces every register byte-for-byte, no integer-parse or
   * bit-op dialect in sight.
   *
   * Registers are the MERGEABLE form: max(r) per bucket unions sketches
   * across any regrouping — the rollup property count(distinct) lacks.
   * One map-side-combined aggregation; ≤ m rows per group survive.
   */
  def hllRegistersMd5(df: DataFrame, groupCols: Seq[String],
      hashCol: Column): DataFrame = {
    val ranked = df
      .select(groupCols.map(col) :+ hashCol.as("__h"): _*)
      .withColumn("__tail", expr("substr(__h, 4, 16)"))
      .withColumn("__z", expr("length(regexp_extract(__tail, '^0*', 0))"))
      .withColumn("__c", expr("substr(__tail, __z + 1, 1)"))
      .withColumn("__r", expr(
        """CASE WHEN __z = 16 THEN 65 ELSE 4 * __z + 1 +
             (CASE WHEN __c >= '8' THEN 0 WHEN __c >= '4' THEN 1
                   WHEN __c >= '2' THEN 2 ELSE 3 END) END"""))
    ranked
      .groupBy(groupCols.map(col) :+ expr("substr(__h, 1, 3)").as("bucket"): _*)
      .agg(max(col("__r")).as("r"))
  }

  /** Merge register tables into a coarser grouping (e.g. a TOTAL rollup):
    * register-wise max — associative, idempotent, no base-data rescan. */
  def mergeRegisters(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))

  /**
   * HLL estimate per group from a register table, in the exact doctrine:
   * the harmonic denominator is kept as the INTEGER
   * Z = Σ 2^(40−r) (ranks > 40 contribute 0, empty buckets 2^40) — exact
   * longs, ≤ 2^52 total, so the one double division at the end is
   * bit-identical on any engine. est_raw = α₁₂·2^64/Z with the published
   * literal α₁₂ = 0.721110, the Flajolet et al. α_m = 0.7213/(1+1.079/m)
   * at m=4096 rounded to 6dp; linear counting (m·ln(m/V)) replaces it below
   * 2.5·m when empty buckets remain — the standard small-range rule,
   * decided on the ROUNDED est_raw so the branch is a pure function of
   * published columns. Output: (groups…, n_nonempty, z_scaled, est_raw,
   * est_linear, est).
   */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_nonempty"),
        sum(expr("CASE WHEN r <= 40 THEN CAST(pow(2, 40 - r) AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END")).as("__znon"))
      .withColumn("z_scaled",
        col("__znon") + (lit(4096L) - col("n_nonempty")) * lit(1099511627776L))
      .withColumn("est_raw",
        round(lit(0.721110) * lit(1.8446744073709552E19) /
          col("z_scaled").cast("double"), 6))
      .withColumn("est_linear", expr(
        """CASE WHEN 4096 - n_nonempty > 0 THEN
             round(4096.0 * ln(4096.0 / CAST(4096 - n_nonempty AS DOUBLE)), 6)
           END"""))
      .withColumn("est", expr(
        """CASE WHEN 4096 - n_nonempty > 0 AND est_raw <= 10240.0
           THEN est_linear ELSE est_raw END"""))
      .select(groupCols.map(col) ++ Seq(col("n_nonempty"), col("z_scaled"),
        col("est_raw"), col("est_linear"), col("est")): _*)

  /**
   * Pairwise distinct-overlap between groups via inclusion-exclusion:
   * for each pair (a, b) of rows of `sketches` (output of [[sketchBy]]
   * with ONE group column), estimate |A|, |B|, |A∪B| from the sketches and
   * |A∩B| = max(0, |A| + |B| − |A∪B|). The join is sketch-row × sketch-row
   * — |groups|² tiny rows, never data-row-scale. Per-side estimates are
   * rounded to 6dp FIRST and the intersection computed from the rounded
   * values, so the derived column is a pure function of published columns
   * (cross-engine reproducible regardless of internal precision).
   *
   * Output: (g_a, g_b, est_a, est_b, est_union, est_intersect), g_a < g_b.
   */
  def overlap(sketches: DataFrame, groupCol: String, k: Int,
      frac: Column => Column): DataFrame = {
    val a = sketches.select(col(groupCol).as("g_a"), col("kmv").as("kmv_a"))
    val b = sketches.select(col(groupCol).as("g_b"), col("kmv").as("kmv_b"))
    val r6 = (c: Column) => round(c, 6)
    a.join(b, col("g_a") < col("g_b"))
      .select(
        col("g_a"), col("g_b"),
        r6(estimate(col("kmv_a"), k, frac)).as("est_a"),
        r6(estimate(col("kmv_b"), k, frac)).as("est_b"),
        r6(estimate(mergeSketches(col("kmv_a"), col("kmv_b"), k), k, frac))
          .as("est_union"))
      .withColumn("est_intersect",
        r6(greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union"))))
  }
}
