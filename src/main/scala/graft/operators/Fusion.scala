package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Rank fusion for hybrid retrieval: reciprocal-rank fusion (Cormack,
 * Clarke & Büttcher, SIGIR 2009) over any number of ranked lists —
 * the standard way to combine lexical (BM25) and vector rankings
 * without score calibration, since only RANKS enter the formula:
 *
 *   rrf(d) = Σ_systems 1/(k₀ + rank_s(d))
 *
 * Determinism: each reciprocal is 12dp-rounded and the sum runs over
 * exact decimals (the engine's Σ doctrine — with ≥3 systems a double
 * sum would be partition-order-dependent), one cast to double at the
 * end. Inputs are already top-N-bounded per system, so the fusion
 * relation is |systems|·N rows — one tiny aggregation, TakeOrdered tail.
 *
 * Reference anchor: none (the reference has no retrieval surface);
 * composes the q117 BM25 and q32 vector-search families.
 */
object Fusion {

  /** Fuse `rankings` — (tag, DataFrame with `idCol` + a 1-based `rank`
    * column) — into (id, n_systems, rrf), top-`topK` by (rrf desc, id). */
  def rrf(rankings: Seq[(String, DataFrame)], idCol: String,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, s"k0 >= 1: $k0")
    val tagged = rankings.map { case (_, df) =>
      df.select(col(idCol), col("rank").cast("double").as("__r"))
    }.reduce(_ unionByName _)
    tagged
      .withColumn("__c",
        round(lit(1.0) / (lit(k0.toDouble) + col("__r")), 12)
          .cast("decimal(16,12)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_systems"),
        round(sum(col("__c")).cast("double"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(topK)
  }
}
