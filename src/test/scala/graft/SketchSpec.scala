package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.heavyHitterCandidates

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("MG candidates are a superset of true heavy hitters across partitions") {
    // 10k rows: "hot" appears 4000x, "warm" 2000x, the rest unique —
    // capacity 8, threshold N/8: hot and warm MUST survive partial
    // sketches + merges, whatever else does
    val words = (Seq.fill(4000)("hot") ++ Seq.fill(2000)("warm") ++
      (0 until 4000).map(i => s"u$i"))
    val df = words.toDF("w").repartition(13)
    val cand = df.agg(heavyHitterCandidates(col("w"), 8).as("c"))
      .head().getSeq[String](0).toSet
    assert(cand.contains("hot") && cand.contains("warm"))
    assert(cand.size <= 8)
  }

  test("heavyHitters equals the exact computation") {
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the dog and the cat"),
      (3L, "a b c d e f g h")).toDF("doc_id", "text")
    // 17 tokens: the=5, cat=2; threshold cnt*4 > 17 -> cnt >= 5 -> {the}
    val got = graft.pipeline.CorpusStats.heavyHitters(docs, "doc_id", "text",
        capacity = 8, fracDen = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 5L))
  }

  test("capacity below the guarantee bound is rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.pipeline.CorpusStats.heavyHitters(docs, "doc_id", "text",
        capacity = 8, fracDen = 32)
    }
  }
}
