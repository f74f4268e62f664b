package graft

import org.apache.spark.sql.functions._

import graft.operators.SecondaryIndex

/** Range-capable value→PK secondary index with measured file pruning. */
class SecondaryIndexSpec extends SparkSpec {

  private def fixture(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    engine.table("orders").repartition(6, col("o_orderkey"))
      .write.mode("overwrite").parquet(base + "/t")
    SecondaryIndex.build(spark, base + "/t", "o_totalprice", "o_orderkey",
      base + "/idx", nFiles = 8)
    (base + "/t", base + "/idx")
  }

  test("range lookup == full-scan BETWEEN; point probe too") {
    val (tdir, idx) = fixture()
    val base = spark.read.parquet(tdir)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val got = keys(SecondaryIndex.lookupRange(spark, tdir, idx,
      "o_totalprice", "o_orderkey", 50000.0, 80000.0))
    val want = keys(base.where(col("o_totalprice").between(50000.0, 80000.0)))
    assert(got == want && want.nonEmpty)
    // point probe: lo == hi on an existing value
    val v = base.select("o_totalprice").head().getDouble(0)
    assert(keys(SecondaryIndex.lookupRange(spark, tdir, idx,
        "o_totalprice", "o_orderkey", v, v))
      == keys(base.where(col("o_totalprice") === v)))
  }

  test("narrow probe prunes index files; empty range stays empty with schema") {
    val (tdir, idx) = fixture()
    val (total, scanned) = SecondaryIndex.pruneStats(spark, idx,
      "o_totalprice", 100000.0, 101000.0)
    assert(total == 8 && scanned < total && scanned >= 1)
    val none = SecondaryIndex.lookupRange(spark, tdir, idx,
      "o_totalprice", "o_orderkey", -10.0, -5.0)
    assert(none.count() == 0 && none.columns.contains("o_custkey"))
  }

  test("delta update: serve == full rebuild; re-indexing a pk fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft_sidxd").toString
    val orders = engine.table("orders")
    orders.repartition(6, col("o_orderkey"))
      .write.mode("overwrite").parquet(base + "/t")
    orders.where(pmod(col("o_orderkey"), lit(3)) =!= 0)
      .write.mode("overwrite").parquet(base + "/t0")
    SecondaryIndex.build(spark, base + "/t0", "o_totalprice", "o_orderkey",
      base + "/idx", nFiles = 4)
    SecondaryIndex.update(spark,
      orders.where(pmod(col("o_orderkey"), lit(3)) === 0),
      "o_totalprice", "o_orderkey", base + "/idx")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val got = keys(SecondaryIndex.lookupRange(spark, base + "/t", base + "/idx",
      "o_totalprice", "o_orderkey", 50000.0, 80000.0))
    val want = keys(spark.read.parquet(base + "/t")
      .where(col("o_totalprice").between(50000.0, 80000.0)))
    assert(got == want && want.nonEmpty)
    // sidecar grew by exactly the fresh files, none rewritten
    val stats = spark.read.parquet(base + "/idx_stats")
    assert(stats.count() > 4)
    val e = intercept[IllegalArgumentException] {
      SecondaryIndex.update(spark, orders.limit(1),
        "o_totalprice", "o_orderkey", base + "/idx")
    }
    assert(e.getMessage.contains("already indexed"))
  }
}
