package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomIndex

/** File-level bloom data-skipping sidecar: no false negatives (lookup ==
  * full-scan filter, always), real skipping on a clustered layout. */
class BloomIndexSpec extends SparkSpec {

  private def writeClustered(nFiles: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"
    engine.table("orders").repartition(nFiles, col("o_custkey"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("lookup == full-scan filter for every probed key (no false negatives)") {
    val dir = writeClustered(8)
    val idx = BloomIndex.buildIndex(spark, dir, "o_custkey").cache()
    val keys = engine.table("orders").select("o_custkey").distinct()
      .orderBy("o_custkey").limit(25).collect().map(_.getLong(0))
    val base = spark.read.parquet(dir)
    keys.foreach { k =>
      val got = BloomIndex.lookup(spark, dir, idx, "o_custkey", k)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      val want = base.where(col("o_custkey") === k)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"key $k: $got != $want")
    }
    idx.unpersist()
  }

  test("clustered layout: point lookup scans 1 file of 8 (false positives rare)") {
    val dir = writeClustered(8)
    val idx = BloomIndex.buildIndex(spark, dir, "o_custkey").cache()
    val keys = engine.table("orders").select("o_custkey").distinct()
      .limit(20).collect().map(_.getLong(0))
    val stats = keys.map(k => BloomIndex.pruneStats(spark, dir, idx, "o_custkey", k))
    assert(stats.forall(_._1 == 8))
    assert(stats.forall(_._2 >= 1)) // own file always positive
    // hash-clustered: each key lives in exactly one file; across 20 probes
    // the mean scan must stay close to 1 (a full-scan fallback would be 8)
    val mean = stats.map(_._2).sum.toDouble / stats.length
    assert(mean < 2.0, s"mean files scanned $mean")
    idx.unpersist()
  }

  test("absent key: empty result, schema intact; sidecar is |files|-sized") {
    val dir = writeClustered(4)
    val idx = BloomIndex.buildIndex(spark, dir, "o_custkey")
    assert(idx.count() == 4)
    val miss = BloomIndex.lookup(spark, dir, idx, "o_custkey", -99999L)
    assert(miss.count() == 0)
    assert(miss.columns.contains("o_orderkey"))
  }

  test("index on a string column skips too (any column, any layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_s").toString + "/t"
    engine.table("customer").repartition(6, col("c_mktsegment"))
      .write.mode("overwrite").parquet(dir)
    val idx = BloomIndex.buildIndex(spark, dir, "c_mktsegment")
    val got = BloomIndex.lookup(spark, dir, idx, "c_mktsegment", "BUILDING")
      .count()
    val want = engine.table("customer")
      .where(col("c_mktsegment") === "BUILDING").count()
    assert(got == want && want > 0)
    val (total, scanned) = BloomIndex.pruneStats(spark, dir, idx, "c_mktsegment", "BUILDING")
    assert(scanned < total)
  }

  test("delta update: only new files bloomed, lookup stays exact, geometry guarded") {
    val base = java.nio.file.Files.createTempDirectory("graft_bloomd").toString
    val dir = base + "/t"
    val orders = engine.table("orders")
    orders.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .repartition(4, col("o_custkey")).write.mode("overwrite").parquet(dir)
    val idxPath = base + "/idx"
    BloomIndex.writeIndex(BloomIndex.buildIndex(spark, dir, "o_custkey"), idxPath)
    val before = spark.read.parquet(idxPath).count()
    orders.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .repartition(2, col("o_custkey")).write.mode("append").parquet(dir)
    val added = BloomIndex.updateIndex(spark, dir, "o_custkey", idxPath)
    assert(added == 2L)
    assert(spark.read.parquet(idxPath).count() == before + 2)
    // idempotent: nothing new on a second call
    assert(BloomIndex.updateIndex(spark, dir, "o_custkey", idxPath) == 0L)
    val idx = spark.read.parquet(idxPath)
    val k = orders.select("o_custkey").head().getLong(0)
    val got = BloomIndex.lookup(spark, dir, idx, "o_custkey", k)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val want = spark.read.parquet(dir).where(col("o_custkey") === k)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && want.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      BloomIndex.updateIndex(spark, dir, "o_custkey", idxPath, mBits = 1 << 10)
    }
    assert(e.getMessage.contains("geometry"))
  }
}
