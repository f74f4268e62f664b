package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusStats

/** Persisted BM25 index: build/serve parity, delta maintenance. */
class Bm25IndexSpec extends SparkSpec {

  private val docs = engine.table("documents")
  private val terms = Seq("spark", "vector", "stream")

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getAs[Long]("rank"),
      r.getAs[Double]("score"))).toSeq

  test("served index ranks exactly like the direct search") {
    val idx = java.nio.file.Files.createTempDirectory("bm25i").toString + "/idx"
    CorpusStats.bm25BuildIndex(docs, "doc_id", "text", idx)
    val served = ranks(CorpusStats.bm25QueryIndex(spark, idx, "doc_id", terms))
    val direct = ranks(CorpusStats.bm25Search(docs, "doc_id", "text", terms))
    assert(served == direct)
  }

  test("delta update == from-scratch rebuild; duplicate ids fail loudly") {
    val idx = java.nio.file.Files.createTempDirectory("bm25d").toString + "/idx"
    val v0 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val delta = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    CorpusStats.bm25BuildIndex(v0, "doc_id", "text", idx)
    CorpusStats.bm25UpdateIndex(delta, "doc_id", "text", idx)
    val served = ranks(CorpusStats.bm25QueryIndex(spark, idx, "doc_id", terms))
    val rebuilt = ranks(CorpusStats.bm25Search(docs, "doc_id", "text", terms))
    assert(served == rebuilt)
    intercept[IllegalArgumentException] {
      CorpusStats.bm25UpdateIndex(delta, "doc_id", "text", idx) // re-ingest
    }
  }

  test("phraseSearch: exact positions, order-sensitive, repeated-token phrase") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x a b a b y"),            // "a b" at 1 and 3
      (2L, "b a b a"),                // "a b" at 1 only
      (3L, "a x b"),                  // gap breaks the phrase
      (4L, "The Cat the dog the cat the")) // case-folded, repeated token
      .toDF("doc_id", "text")
    def hits(ph: String): Map[Long, (Long, Long)] =
      CorpusStats.phraseSearch(docs, "doc_id", "text", ph).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hits("a b") == Map(1L -> (2L, 1L), 2L -> (1L, 1L)))
    // order matters: "b a" is a different phrase
    assert(hits("b a") == Map(1L -> (1L, 2L), 2L -> (2L, 0L)))
    // a repeated phrase token must fill BOTH its offsets
    assert(hits("the cat the") == Map(4L -> (2L, 0L)))
    assert(hits("q z") == Map.empty)
  }
}
