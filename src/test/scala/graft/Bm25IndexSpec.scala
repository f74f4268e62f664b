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
}
