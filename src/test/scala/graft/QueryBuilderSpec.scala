package graft

import org.apache.spark.sql.functions._

import graft.expr.Cond
import graft.query.Agg

/** Query-chain semantics over TESTDATA sf0.001 (SURVEY.md §2.2-§2.7). */
class QueryBuilderSpec extends SparkSpec {

  test("select with alias + table-qualified fields (query_builder.dart:93-108)") {
    val df = engine.query("customer")
      .select("c_custkey", "c_name as name", "customer.c_acctbal as bal")
      .limit(5).toDF
    assert(df.columns.toSeq == Seq("c_custkey", "name", "bal"))
  }

  test("default limit 1000 applied; noDefaultLimit removes it (data_store_config.dart:208)") {
    assert(engine.query("lineitem").toDF.count() == 1000)
    assert(engine.query("lineitem").noDefaultLimit.toDF.count() > 1000)
  }

  test("having references aggregate output name (query_builder.dart:679-690)") {
    val rows = engine.query("orders")
      .groupBy("o_orderpriority")
      .agg(Agg.count(alias = "cnt"))
      .having(Cond.Leaf("cnt", ">", 100))
      .toDF.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("cnt") > 100))
  }

  test("count() counts all rows regardless of field nulls (query_aggregation.dart:126-128)") {
    val df = engine.query("customer")
      .leftJoin("orders", "customer.c_custkey", "=", "orders.o_custkey")
      .limit(50)
    // Agg.count compiles to count(1): rows with null o_orderkey still count
    val viaAgg = engine.query("orders").agg(Agg.count(alias = "cnt")).toDF
      .collect()(0).getAs[Long]("cnt")
    assert(viaAgg == engine.table("orders").count())
    assert(df.toDF.count() == 50)
  }

  test("join column flattening: conflicted names keep table prefix (query_builder.dart:705-823)") {
    val df = engine.query("nation")
      .join("region", "nation.n_regionkey", "=", "region.r_regionkey")
      .noDefaultLimit.toDF
    // no shared field names between nation/region → all flattened bare
    assert(df.columns.forall(!_.contains(".")))
    assert(df.columns.contains("n_name") && df.columns.contains("r_name"))
  }

  test("scalar shortcuts sum/avg/min/max (query_builder.dart:349-372)") {
    val q = engine.query("lineitem").where("l_quantity", ">", 45)
    assert(q.minOf("l_quantity").exists(_.asInstanceOf[Double] > 45.0))
    assert(q.maxOf("l_quantity").isDefined)
    assert(q.sumOf("l_quantity").isDefined)
    assert(engine.query("orders").whereEqual("o_orderstatus", "NOPE").sumOf("o_totalprice").isEmpty)
  }

  test("orderBy: desc puts nulls last, asc nulls first (value_matcher.dart:100-102,163-166)") {
    val df = engine.query("customer")
      .leftJoin("orders", "customer.c_custkey", "=", "orders.o_custkey")
      .select("o_orderkey")
      .noDefaultLimit
    val asc = df.orderByAsc("o_orderkey").toDF.collect()
    val desc = df.orderByDesc("o_orderkey").toDF.collect()
    if (asc.exists(_.isNullAt(0))) {
      assert(asc.head.isNullAt(0))
      assert(desc.last.isNullAt(0))
    }
  }

  test("cursor pagination: pages are disjoint, ordered, and walkable (query_executor.dart:2866-3000)") {
    val qb = engine.query("lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderByDesc("l_extendedprice")
      .orderByAsc("l_orderkey", "l_linenumber")
      .limit(20)
    val p1 = qb.run()
    assert(p1.size == 20 && p1.hasMore && p1.nextCursor.isDefined)
    val p2 = p1.next()
    assert(p2.size == 20)
    val k1 = p1.data.map(r => (r.getLong(0), r.getInt(1))).toSet
    val k2 = p2.data.map(r => (r.getLong(0), r.getInt(1))).toSet
    assert((k1 & k2).isEmpty)
    // page2 continues exactly where page1 ended (matches OFFSET 20)
    val offset = qb.offset(20).run()
    assert(p2.data.map(_.toSeq) == offset.data.map(_.toSeq))
  }

  test("orWhere as first predicate filters (does not OR onto True)") {
    val n = engine.query("orders").orWhere("o_orderstatus", "=", "F").count()
    assert(n == engine.table("orders").where(col("o_orderstatus") === "F").count())
    // still ORs once a predicate exists
    val both = engine.query("orders")
      .whereEqual("o_orderstatus", "F").orWhere("o_orderstatus", "=", "O").count()
    assert(both > n)
  }

  test("cursor works when sort field is not selected (sort-by-nonselected support)") {
    val qb = engine.query("lineitem")
      .select("l_orderkey", "l_linenumber")
      .orderByDesc("l_extendedprice")
      .orderByAsc("l_orderkey", "l_linenumber")
      .limit(15)
    val p1 = qb.run()
    assert(p1.size == 15 && p1.hasMore)
    assert(p1.data.head.schema.fieldNames.toSeq == Seq("l_orderkey", "l_linenumber"))
    val p2 = p1.next()
    val viaOffset = qb.offset(15).run()
    assert(p2.data.map(_.toSeq) == viaOffset.data.map(_.toSeq))
  }

  test("prev() returns the immediately preceding page (not the prefix head)") {
    val qb = engine.query("lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderByDesc("l_extendedprice")
      .orderByAsc("l_orderkey", "l_linenumber")
      .limit(10)
    val p1 = qb.run()
    val p2 = p1.next()
    val p3 = p2.next()
    assert(p2.hasPrev && p3.hasPrev)
    val back = p3.prev()
    assert(back.data.map(_.toSeq) == p2.data.map(_.toSeq))
    // and back again from the recovered page
    assert(back.prev().data.map(_.toSeq) == p1.data.map(_.toSeq))
  }

  test("cursor rejects foreign queries (query_executor.dart:416-450)") {
    val qb1 = engine.query("lineitem").orderByAsc("l_orderkey").limit(5)
    val tok = qb1.run().nextCursor.get
    val qb2 = engine.query("orders").orderByAsc("o_orderkey").limit(5)
    // simulate handing page-1's cursor to a different query: decode fails
    val r1 = qb2.run()
    assert(r1.nextCursor.forall(_ != tok))
    intercept[IllegalArgumentException] {
      // re-enter via the public pagination surface with a foreign token
      val hacked = new graft.query.QueryResult(r1.data, true, false, Some(tok), None, 0, qb2)
      hacked.next()
    }
  }

  test("offset beyond maxQueryOffset rejected (data_store_config.dart:209)") {
    intercept[IllegalArgumentException] {
      engine.query("lineitem").orderByAsc("l_orderkey").offset(10001).limit(1).toDF.count()
    }
  }

  test("distinct on fields: projected + deduped (query_builder.dart:143-148)") {
    val rows = engine.query("orders").distinct("o_orderstatus").noDefaultLimit.toDF.collect()
    assert(rows.map(_.getString(0)).toSet.size == rows.length)
  }

  test("FK auto-join resolves from registry (query_builder.dart:851-951)") {
    import graft.schema._
    val eng2 = new Graft(spark, sfDir) // fresh registry: don't leak schemas to shared engine
    eng2.registry.register("default", TableSchema(
      name = "orders",
      primaryKey = PrimaryKeyConfig("o_orderkey"),
      foreignKeys = Seq(ForeignKeySchema(Seq("o_custkey"), "customer", Seq("c_custkey")))))
    val df = eng2.query("orders").joinWithForeignKey("customer")
      .groupBy("c_mktsegment").agg(Agg.count(alias = "cnt")).toDF
    assert(df.count() == 5)
    // reverse direction resolves too
    val rev = eng2.query("customer").joinWithForeignKey("orders")
    assert(rev.toDF.columns.nonEmpty)
    // unknown FK → clean error
    intercept[IllegalArgumentException] { eng2.query("orders").joinWithForeignKey("region") }
  }
}
