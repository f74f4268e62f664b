package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retrieval ranking evaluation — the missing judge for the retrieval
 * family (BM25 q117/q196, hybrid RRF q209, exact/ANN vector search):
 * given a ranked result list per query and a relevance set, publish the
 * standard figures of merit. All exact/deterministic: P@k and RR are
 * rationals of counts; the binary nDCG terms 1/log₂(rank+1) are
 * 12dp-rounded and DECIMAL-summed (the Σ doctrine — partition order
 * cannot flip the 6dp publish), with ideal DCG over min(k, |relevant|)
 * positions. Shapes: one broadcast-join flag pass over the (≤ |queries|
 * ·k)-row result relation + a per-query aggregation — the corpus is
 * never touched; evaluation cost is independent of corpus size.
 */
object RankEval {

  /**
   * @param results  (qid, id, rank) — rank 1-based, ≤ some cutoff
   * @param relevant (qid, id) — the ground-truth set per query
   * @return per qid: (qid, n_rel, n_results, p_at_k, rr, ndcg, ap) —
   *         rr NULL when nothing relevant was retrieved, ndcg/ap NULL
   *         when the query has no relevant items at all; ap is the
   *         AP@k MAP summand (precision at each hit averaged over
   *         min(k, |relevant|))
   */
  def rankingEval(results: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val rel = relevant.select(col("qid"), col("id")).distinct()
    val nRel = rel.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val flagged = results.select(col("qid"), col("id"), col("rank"))
      .where(col("rank") <= k)
      .join(rel.withColumn("__r", lit(1L)), Seq("qid", "id"), "left")
      .withColumn("rel", coalesce(col("__r"), lit(0L)))
      // cumulative hits by rank: a window PARTITIONED by qid over <= k
      // rows per query - the AP@k precision-at-each-hit numerators
      .withColumn("__cum", sum(col("rel")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("rank"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val perQ = flagged.groupBy(col("qid")).agg(
      count(lit(1)).as("n_results"),
      sum(col("rel")).as("__hits"),
      min(when(col("rel") === 1L, col("rank"))).as("__first"),
      sum(when(col("rel") === 1L,
        round(lit(1.0) / log2(col("rank").cast("double") + 1.0), 12))
        .otherwise(lit(0.0)).cast("decimal(24,12)")).as("__dcg"),
      sum(when(col("rel") === 1L,
        round(col("__cum").cast("double") / col("rank").cast("double"), 12))
        .otherwise(lit(0.0)).cast("decimal(24,12)")).as("__apn"))
    val withIdeal = perQ.join(nRel, Seq("qid"), "left")
      .na.fill(0L, Seq("n_rel"))
      .withColumn("__m", least(lit(k.toLong), col("n_rel")))
      .withColumn("__idcg", expr(
        """aggregate(
             transform(sequence(CAST(1 AS BIGINT), greatest(__m, CAST(1 AS BIGINT))),
               i -> round(1.0D / log2(CAST(i AS DOUBLE) + 1.0D), 12)),
             CAST(0 AS DECIMAL(24,12)),
             (a, x) -> CAST(a + CAST(x AS DECIMAL(24,12)) AS DECIMAL(24,12)))"""))
    withIdeal.select(col("qid"), col("n_rel"), col("n_results"),
      round(col("__hits").cast("double") / lit(k.toDouble), 6).as("p_at_k"),
      when(col("__first").isNotNull,
        round(lit(1.0) / col("__first").cast("double"), 6)).as("rr"),
      when(col("n_rel") > 0,
        round(col("__dcg").cast("double") / col("__idcg").cast("double"), 6))
        .as("ndcg"),
      // AP@k (the MAP summand): precision-at-each-hit averaged over
      // min(k, |relevant|) - exact-rational 12dp terms, decimal-summed
      when(col("n_rel") > 0,
        round(col("__apn").cast("double") / col("__m").cast("double"), 6))
        .as("ap"))
  }
}
