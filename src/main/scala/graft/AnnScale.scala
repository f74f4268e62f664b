package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * sf1 ANN-recall rehearsal (BASELINE.md "ANN contract floors" caveat):
 * runs the three recall reports (IVF / PQ / graph) on a scaled fixture
 * TWICE — once with the gate-frozen index parameters (what the sf0.1
 * gates hardcode) and once with the index sized per its OWN documented
 * scale contract:
 *
 *  - IVF: gate params carry as-is — cell count is a recall/scan-fraction
 *    trade, not a per-row budget, so nlist=8 is run for both rows.
 *  - PQ: codebook capacity must grow with the corpus (the gate's
 *    k=16/subspace was sized for 2k vectors); scaled row uses k=64.
 *  - graph: the shard count is the contract knob — `graphBuild`'s
 *    Scaladoc sizes `shards ≈ corpus / targetShardRows` with per-shard
 *    rows HELD CONSTANT (a fixed beam cannot search a 10× shard at the
 *    same recall); scaled row uses shards = ceil(n / 500), matching the
 *    sf0.1 gate's ~500-row shards.
 *
 * Prints ONE JSON line with every (param, recall, cost-fraction) row so
 * BASELINE.md can record both the contract-sized floors and the
 * frozen-param degradation curve. Exercised against both ScaleGen
 * geometries ("clustered" = production rehearsal, "hash" = adversarial
 * isotropic twin).
 */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf1c")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = embs.count()
    val scaledShards = math.ceil(n / 500.0).toInt

    // index-BUILD cost, each family timed in isolation at its
    // contract-scaled params (the recall reports below rebuild
    // internally; these are the clean build-only numbers a capacity
    // plan needs): IVF = k-means train + cell assignment over the
    // corpus; PQ = driver Lloyd per subspace over ≤262k train rows
    // (the documented hashSample contract caps this at scale); graph =
    // per-shard Vamana with ~targetShardRows rows per shard, shard
    // count carrying the corpus growth
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val ivfBuildSec = time {
      val m = graft.vector.VectorSearch.ivfTrain(embs, "embedding", nlist = 8)
      graft.vector.VectorSearch.ivfIndex(embs, m, "embedding").count()
    }
    val pqBuildSec = time {
      graft.vector.VectorSearch.pqTrainCapped(embs, "vec_id", "embedding",
        m = 8, k = 64)
    }
    val graphBuildSec = time {
      graft.vector.GraphAnn.graphBuild(embs, "vec_id", "embedding",
        shards = scaledShards, maxDegree = 8, efConstruction = 24).count()
    }

    // locale-safe decimal rendering for the JSON line (an f"%.1f" would
    // print a comma under comma-decimal default locales)
    def j1(v: Double): String =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString

    def fmt3(rows: Seq[(Any, Double, Double)]): String = rows
      .map { case (p, r, f) => s"""[$p,$r,$f]""" }.mkString("[", ",", "]")

    val ivf = graft.vector.VectorSearch.ivfRecallReport(embs, "vec_id",
        "embedding", java.nio.file.Files.createTempDirectory("annscale").toString + "/emb",
        queryIds = 0L until 8L, nprobes = Seq(1, 2, 4, 8), topK = 10, nlist = 8)
      .orderBy("nprobe").collect()
      .map(r => (r.getInt(0): Any, r.getDouble(1), r.getDouble(2))).toSeq

    def pq(k: Int) = graft.vector.VectorSearch.pqRecallReport(embs, "vec_id",
        "embedding", queryIds = 0L until 8L, rerankFactors = Seq(1, 2, 8, 20),
        topK = 10, m = 8, k = k)
      .orderBy("rerank_factor").collect()
      .map(r => (r.getInt(0): Any, r.getDouble(1), r.getDouble(2))).toSeq

    def graph(shards: Int) = graft.vector.GraphAnn.graphRecallReport(embs,
        "vec_id", "embedding", queryIds = Seq(3L, 7L, 11L),
        efs = Seq(8, 32, 128), topK = 10, shards = shards, maxDegree = 8,
        efConstruction = 24)
      .orderBy("ef_search").collect()
      .map(r => (r.getInt(0): Any, r.getDouble(1), r.getDouble(2))).toSeq

    val out = s"""{"dir":"$dir","n":$n,"scaled_shards":$scaledShards,""" +
      s""""build_sec":{"ivf_nlist8":${j1(ivfBuildSec)},"pq_m8_k64":${j1(pqBuildSec)},"graph_scaled":${j1(graphBuildSec)}},""" +
      s""""ivf_nlist8":${fmt3(ivf)},""" +
      s""""pq_frozen_k16":${fmt3(pq(16))},"pq_scaled_k64":${fmt3(pq(64))},""" +
      s""""graph_frozen_sh4":${fmt3(graph(4))},""" +
      s""""graph_scaled":${fmt3(graph(scaledShards))}}"""
    println(out)
    spark.stop()
  }
}
