package graft

import java.nio.file.Files

import graft.query.QueryCache
import graft.schema._

/** Opt-in query-result cache: reference TreeCache semantics
  * (query_executor.dart:42-49) — hit/miss, write invalidation, TTL,
  * budget eviction, and the off-by-default contract. */
class QueryCacheSpec extends SparkSpec {

  private def freshEngine(): Graft = {
    val wh = Files.createTempDirectory("graft_qcache").toString
    val e = Graft.withWarehouse(spark, sfDir, wh)
    e.createTable(TableSchema("items", PrimaryKeyConfig("id", PkStrategy.Sequential),
      Seq(FieldSchema("name", GType.GText, nullable = false),
        FieldSchema("qty", GType.GInteger))))
    e.batchInsert("items", (1 to 20).map(i =>
      Map("id" -> i, "name" -> s"n$i", "qty" -> i)))
    e
  }

  test("off by default; useQueryCache hits on the second identical run") {
    val e = freshEngine()
    val q = e.query("items").where("qty", ">", 5).orderByAsc("id")
    q.run(); q.run()
    assert(e.queryCache.stats._1 == 0, "default chains must not populate the cache")

    val c = q.useQueryCache()
    val r1 = c.run()
    val r2 = c.run()
    val (entries, bytes, hits, misses) = e.queryCache.stats
    assert(entries == 1 && hits == 1 && misses == 1 && bytes > 0)
    assert(r2.data == r1.data) // cached result IS the first result
    // a DIFFERENT query misses (key covers the full builder state)
    e.query("items").where("qty", ">", 6).useQueryCache().run()
    assert(e.queryCache.stats._1 == 2)
  }

  test("every write path invalidates entries touching the table") {
    val e = freshEngine()
    val c = e.query("items").where("qty", ">", 5).orderByAsc("id").useQueryCache()
    assert(c.run().data.size == 15)
    e.update("items").set("qty", 0).where("id", "=", 6).apply()
    assert(e.queryCache.stats._1 == 0, "update must invalidate")
    assert(c.run().data.size == 14, "post-write read must see the new data")
    e.delete("items").where("id", "=", 7).apply()
    assert(e.queryCache.stats._1 == 0, "delete must invalidate")
    assert(c.run().data.size == 13)
  }

  test("TTL expires entries; budget evicts LRU first; oversized entries skip") {
    val e = freshEngine()
    val c = e.query("items").useQueryCache(ttlMs = Some(1L))
    c.run()
    Thread.sleep(5)
    c.run() // expired → re-executed, re-cached
    assert(e.queryCache.stats._3 == 0 && e.queryCache.stats._4 == 2)

    val tiny = new QueryCache(maxBytes = 1L)
    var execs = 0
    def fake() = { execs += 1
      new graft.query.QueryResult(Seq(org.apache.spark.sql.Row("x")),
        hasMore = false, hasPrev = false, None, None, 0L, null) }
    tiny.getOrRun("k", Set("t"), None)(fake())
    tiny.getOrRun("k", Set("t"), None)(fake())
    assert(execs == 2, "an entry larger than the whole budget must not cache")

    val small = new QueryCache(maxBytes = 400L)
    small.getOrRun("a", Set("t"), None)(fake())
    small.getOrRun("b", Set("t"), None)(fake())
    // ~100 B each → both fit; drop budget → LRU ("a") evicts first
    small.getOrRun("a", Set("t"), None)(fake()) // touch a → b is now LRU
    small.setBudget(150L)
    assert(small.stats._1 == 1)
    small.getOrRun("a", Set("t"), None)(fake())
    assert(small.stats._3 >= 1, "the MRU entry must have survived the budget cut")
  }

  test("cache is shared across switchSpace/watched copies, keys carry the space") {
    val e = freshEngine()
    val c = e.query("items").useQueryCache()
    c.run()
    assert(e.switchSpace("other").queryCache eq e.queryCache)
    val hub = new graft.streaming.WatchHub
    val ew = e.watched(hub)
    assert(ew.queryCache eq e.queryCache)
    // a write through the WATCHED copy still invalidates the shared cache
    ew.update("items").set("qty", 1).where("id", "=", 1).apply()
    assert(e.queryCache.stats._1 == 0)
  }

  test("Graft.memory: ephemeral engine with pre-created schemas (ToStore.memory)") {
    val e = Graft.memory(spark, Seq(
      TableSchema("tmp", PrimaryKeyConfig("id", PkStrategy.Sequential),
        Seq(FieldSchema("v", GType.GText, nullable = false)))))
    e.insert("tmp", Map("id" -> 1, "v" -> "x"))
    assert(e.query("tmp").count() == 1L)
    e.deleteDatabase() // ephemeral contract: one call wipes everything
    assert(!new java.io.File(e.warehouse.get).exists())
  }

  test("lifecycle paths that bypass notifyWrite still invalidate: dropTable") {
    val e = freshEngine()
    e.query("items").useQueryCache().run()
    assert(e.queryCache.stats._1 == 1)
    e.dropTable("items")
    assert(e.queryCache.stats._1 == 0,
      "dropTable deletes files directly — the cache must not serve the ghost")
  }
}
