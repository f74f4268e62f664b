package graft

import org.apache.spark.sql.functions._

import graft.vector.VectorSearch

/** ANN paths vs the exact oracle on TESTDATA embeddings (SURVEY.md §2.10). */
class VectorSearchSpec extends SparkSpec {

  private lazy val embs = engine.table("embeddings")
  private lazy val query: Seq[Double] =
    embs.where(col("vec_id") === 3).select("embedding").head.getSeq[Float](0).map(_.toDouble)

  test("exact: self is nearest with distance 0 (cosine)") {
    val top = VectorSearch.exact(embs, "vec_id", "embedding", query, topK = 5, metric = "cosine")
      .collect()
    assert(top.head.getLong(0) == 3L)
    assert(top.head.getDouble(1) == 0.0)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) <= p(1)))
    assert(top.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("exact: distanceThreshold filters (tostore.dart:493-511)") {
    val all = VectorSearch.exact(embs, "vec_id", "embedding", query, topK = 100, metric = "l2")
    val thr = all.collect()(10).getDouble(1)
    val filtered = VectorSearch.exact(embs, "vec_id", "embedding", query,
      topK = 100, metric = "l2", distanceThreshold = Some(thr))
    assert(filtered.collect().forall(_.getDouble(1) <= thr))
  }

  test("all three metrics produce consistent top-1 = self") {
    Seq("l2", "cosine", "innerProduct").foreach { m =>
      val top = VectorSearch.exact(embs, "vec_id", "embedding", query, topK = 1, metric = m)
        .collect()
      assert(top.head.getLong(0) == 3L, s"metric $m")
    }
  }

  test("IVF: recall@10 ≥ 0.7 with nprobe=3/nlist=8; full probe = exact") {
    val model = VectorSearch.ivfTrain(embs, "embedding", nlist = 8)
    val indexed = VectorSearch.ivfIndex(embs, model, "embedding").cache()
    val exact = VectorSearch.exact(embs, "vec_id", "embedding", query, topK = 10, metric = "cosine")
      .collect().map(_.getLong(0)).toSet
    val ann = VectorSearch.ivfSearch(indexed, model, "vec_id", "embedding", query,
      topK = 10, nprobe = 3).collect().map(_.getLong(0)).toSet
    assert((exact & ann).size >= 7, s"recall too low: ${(exact & ann).size}/10")
    val full = VectorSearch.ivfSearch(indexed, model, "vec_id", "embedding", query,
      topK = 10, nprobe = 8).collect().map(_.getLong(0)).toSet
    assert(full == exact) // probing every cell degenerates to exact
    indexed.unpersist()
  }

  test("ivfCell assigns every row to a valid cell") {
    val model = VectorSearch.ivfTrain(embs, "embedding", nlist = 4)
    val cells = VectorSearch.ivfIndex(embs, model, "embedding")
      .select("__ivf_cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.forall(c => c >= 0 && c < 4))
  }

  test("LSH similarity join returns only pairs within maxL2, a<b") {
    val out = VectorSearch.lshSimilarityJoin(embs.limit(200), "vec_id", "embedding",
      maxL2 = 1.2).collect()
    assert(out.forall(_.getDouble(2) <= 1.2))
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
