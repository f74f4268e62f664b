package graft

import org.apache.spark.sql.SparkSession

/** Library usage demo + smoke probe: fluent chain, pagination metadata,
  * cursor walk, and the reference's safety guards (offset cap,
  * condition-less update refusal). Run:
  *   sbt "runMain graft.Demo /root/testdata/sf0.001"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.localSession("graft-demo", cores = 8)
    val db = Graft(spark, dir)

    // fluent chain with loose typing ("45" on a DOUBLE column)
    val top = db.query("lineitem")
      .where("l_quantity", ">", "45")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderByDesc("l_extendedprice")
      .orderByAsc("l_orderkey", "l_linenumber")
      .limit(5)
    println("page1:")
    val page1 = top.run()
    page1.data.foreach(r => println(s"  $r"))
    println(s"hasMore=${page1.hasMore} nextCursor=${page1.nextCursor.isDefined}")
    println("page2 via cursor:")
    page1.next().data.foreach(r => println(s"  $r"))

    // scalar shortcuts
    println(s"count=${db.query("orders").whereEqual("o_orderstatus", "F").count()}")
    println(s"exists=${db.query("orders").whereEqual("o_orderstatus", "ZZZ").exists()}")

    // guard rails
    try db.query("lineitem").orderByAsc("l_orderkey").offset(999999).limit(1).toDF.count()
    catch { case e: IllegalArgumentException => println(s"offset guard: ${e.getMessage}") }
    try graft.write.Writes.updatePreview(db.table("orders"), Nil, graft.expr.Cond.True)
    catch { case e: IllegalArgumentException => println(s"update guard: ${e.getMessage}") }

    // vector search: top-3 neighbours of embedding #0
    import org.apache.spark.sql.functions.col
    val q0 = db.table("embeddings").where(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble)
    println("vectorSearch top-3:")
    db.vectorSearch("embeddings", "embedding", q0, topK = 3, pkField = "vec_id")
      .collect().foreach(r => println(s"  $r"))

    // near-dup detection on documents (LSH candidates + exact verify)
    val dupes = graft.pipeline.Dedup.minhashPairs(
      db.table("documents"), "doc_id", "text", shingleN = 3, k = 12, bands = 4,
      threshold = 0.5).count()
    println(s"near-dup pairs (jaccard>=0.5): $dupes")

    // reactive watch: initial emission + re-run on a published change
    val hub = new graft.streaming.WatchHub
    @volatile var emissions = 0
    val sub = hub.watch(db.query("region").orderByAsc("r_regionkey")) { _ => emissions += 1 }
    hub.publish(graft.streaming.ChangeEvent("insert", "region", None, None,
      new java.sql.Timestamp(0)))
    sub.close()
    println(s"watch emissions (subscribe + 1 event): $emissions")

    // managed warehouse: CRUD chain + KV
    val wh = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val mdb = Graft.withWarehouse(spark, dir, wh)
    import graft.schema._
    mdb.createTable(TableSchema("inventory", PrimaryKeyConfig("id"),
      Seq(FieldSchema("item", GType.GText, nullable = false),
        FieldSchema("qty", GType.GInteger))))
    mdb.batchInsert("inventory", Seq(
      Map("id" -> "1", "item" -> "bolt", "qty" -> 10),
      Map("id" -> "2", "item" -> "nut", "qty" -> 3)))
    mdb.update("inventory").increment("qty", 5).where("item", "=", "bolt").apply()
    println(s"inventory after update: ${mdb.table("inventory").orderBy("id").collect().toSeq}")
    mdb.kv.set("checkpoint", "2024-06-12", ttlMs = Some(3600000L))
    println(s"kv checkpoint: ${mdb.kv.get("checkpoint")}")

    spark.stop()
  }
}
