package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-call corpus curation — the composed flagship of the pipeline
 * surface: a single declarative plan that scores, dedups, splits and
 * mixes a document corpus and returns one VERDICT ROW PER DOCUMENT with
 * every intermediate flag exposed (nothing is silently dropped; the
 * caller filters on `final_keep` — or audits why a row failed, which is
 * the half of curation dashboards usually bolt on afterwards).
 *
 * Stages (all existing gated operators, composed — no new semantics):
 *  1. quality: `TextAnalysis.textProfile` kernel → `qualityFromProfile`
 *     (q27 semantics), gated at `minQuality`.
 *  2. exact dedup: fingerprint groups, keeper = min doc id (q25).
 *  3. near dedup (`nearDedup = true`): minhash band collision with the
 *     "no smaller collider" keeper policy — a doc is `near_keeper` iff
 *     no SMALLER id shares any band key (the q88 streaming / q112
 *     incremental notion; deterministic and conservative on chains:
 *     a–b–c drops both b and c, no CC walk needed).
 *  4. split: leakage-safe md5-bucket assignment (q75).
 *  5. source mix: per-source keep rates on an independent salt (q94).
 *  6. `final_keep` = quality_ok AND is_keeper AND is_near_keeper AND
 *     mix_keep (split stays metadata — train/val/test all need the same
 *     cleaning).
 *
 * Shape at scale: ONE kernel projection pass (profile + fingerprint
 * computed together), ONE fp-keyed shuffle for exact keepers, and —
 * when near-dedup is on — one band-keyed shuffle (ids-only buckets,
 * the bandCollisionPairs discipline). Split and mix are pure codegen
 * projections of (id, salt). Quality is identical across an exact-dup
 * group (same text ⇒ same profile), so stage order cannot change the
 * verdict set.
 */
object Curate {
  def curate(docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source",
      minQuality: Double = 0.5,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      mixFractions: Map[String, Double] = Map.empty,
      mixDefault: Double = 1.0,
      nearDedup: Boolean = false,
      shingleN: Int = 3,
      minhashK: Int = 12,
      bands: Int = 4,
      minhashOracleFamily: Boolean = false): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"), col(sourceCol).as("source"),
      graft.functions.GraftFunctions.textStats(col(textCol))
        .getField("fp").as("__fp"),
      TextAnalysis.textProfile(col(textCol)).as("__p"))
    val scored = base
      .withColumn("quality", TextAnalysis.qualityFromProfile(col("__p")))
      .withColumn("quality_ok", (col("quality") >= minQuality).cast("int"))
    val keepers = scored.groupBy("__fp").agg(min(col("doc_id")).as("__keeper"))
    val withNear = if (!nearDedup) {
      scored.join(keepers, "__fp").withColumn("__near_loser", lit(false))
    } else {
      val losers = Dedup.bandCollisionPairs(
          docs.select(col(idCol), col(textCol)), idCol, textCol,
          shingleN, minhashK, bands, oracleHash = minhashOracleFamily)
        .select(col("b").as("doc_id")).distinct()
        .withColumn("__near_loser", lit(true))
      scored.join(keepers, "__fp").join(losers, Seq("doc_id"), "left")
        .withColumn("__near_loser", coalesce(col("__near_loser"), lit(false)))
    }
    val flagged = Sampling.assignSplit(withNear, "doc_id", splits)
      .withColumn("is_keeper", (col("doc_id") === col("__keeper")).cast("int"))
      .withColumn("is_near_keeper", (!col("__near_loser")).cast("int"))
      .withColumn("mix_keep", Sampling.stratifiedFlag(col("doc_id"),
        col("source"), mixFractions, mixDefault).cast("int"))
    flagged
      .withColumn("final_keep",
        (col("quality_ok") === 1 && col("is_keeper") === 1 &&
          col("is_near_keeper") === 1 && col("mix_keep") === 1).cast("int"))
      .select("doc_id", "source", "split", "quality", "quality_ok",
        "is_keeper", "is_near_keeper", "mix_keep", "final_keep")
  }
}
