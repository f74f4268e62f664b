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

  test("cursor over JOIN: joined-field ordering gets no tokens; token use errors (query_executor.dart:291-336)") {
    val joined = engine.query("orders")
      .join("customer", "orders.o_custkey", "=", "customer.c_custkey")
      .select("o_orderkey", "c_name")
      .limit(5)
    // ordering by a JOINED table's field → first page silently non-cursor
    val p1 = joined.orderByAsc("customer.c_name").run()
    assert(p1.size == 5 && p1.nextCursor.isEmpty && p1.prevCursor.isEmpty)
    // the BARE spelling of a joined-table field is the same ambiguity
    val p1b = joined.orderByAsc("c_name").run()
    assert(p1b.nextCursor.isEmpty && p1b.prevCursor.isEmpty)
    // ordering by MAIN-table fields across the same join still cursors
    val pMain = joined.orderByAsc("orders.o_orderkey").run()
    assert(pMain.nextCursor.isDefined)
    // handing a token into the unsupported shape is an explicit error
    val tok = pMain.nextCursor.get
    val err = intercept[IllegalArgumentException] {
      new graft.query.QueryResult(Nil, true, false, Some(tok), None, 0,
        joined.orderByAsc("customer.c_name")).next()
    }
    assert(err.getMessage.contains("only supports ordering by main table fields"))
  }

  test("loose-typed join keys: string-canonical compare (1 matches '1', '1.0' does not — query_executor.dart:1526-1533)") {
    import java.nio.file.Files
    import graft.schema._
    val wh = Files.createTempDirectory("graft_loose").toString
    val e = Graft.withWarehouse(spark, sfDir, wh)
    e.createTable(TableSchema("lt_a", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("tag", GType.GText))))
    e.createTable(TableSchema("lt_b", PrimaryKeyConfig("pk", PkStrategy.None),
      Seq(FieldSchema("k", GType.GInteger))))
    e.batchInsert("lt_a", Seq(
      Map("id" -> "1", "tag" -> "one"),
      Map("id" -> "2", "tag" -> "two"),
      Map("id" -> "1.0", "tag" -> "onepointoh")))
    e.batchInsert("lt_b", Seq(
      Map("pk" -> "x", "k" -> 1), Map("pk" -> "y", "k" -> 2), Map("pk" -> "z", "k" -> 9)))
    val rows = e.query("lt_a").join("lt_b", "lt_a.id", "=", "lt_b.k")
      .select("id", "tag", "k").orderByAsc("id").toDF.collect()
    // string-canonical: "1"<->1 and "2"<->2 match; "1.0" vs 1 must NOT
    // (Spark's native numeric coercion would match it)
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq == Seq(("1", 1L), ("2", 2L)))
    // same-typed keys stay native (sanity: the main-path join is unchanged)
    val n = engine.query("orders")
      .join("customer", "orders.o_custkey", "=", "customer.c_custkey").count()
    assert(n > 0)
    // numeric-vs-numeric mismatches (long vs double) keep NATIVE numeric
    // coercion — string compare would drop "100" vs "100.0"-style matches
    val loose = engine.query("orders")
      .join("lineitem", "orders.o_orderkey", "=", "lineitem.l_quantity")
      .noDefaultLimit.count()
    val native = engine.table("orders").join(engine.table("lineitem"),
      col("o_orderkey") === col("l_quantity")).count()
    assert(loose == native && native > 0)
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

  test("composite-FK auto-join: first pair ON, residual pairs WHERE (query_builder.dart:210-253)") {
    import graft.schema._
    val wh = java.nio.file.Files.createTempDirectory("graft_cfk").toString
    val e = Graft.withWarehouse(spark, sfDir, wh)
    e.createTable(TableSchema("pt", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("k1", GType.GText), FieldSchema("k2", GType.GText))))
    e.createTable(TableSchema("ct", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("a1", GType.GText), FieldSchema("a2", GType.GText)),
      foreignKeys = Seq(ForeignKeySchema(Seq("a1", "a2"), "pt", Seq("k1", "k2")))))
    e.batchInsert("pt", Seq(
      Map("id" -> "p1", "k1" -> "x", "k2" -> "1"),
      Map("id" -> "p2", "k1" -> "x", "k2" -> "2")))
    e.batchInsert("ct", Seq(
      Map("id" -> "c1", "a1" -> "x", "a2" -> "1"),
      Map("id" -> "c2", "a1" -> "x", "a2" -> "2"),
      Map("id" -> "c3", "a1" -> "x", "a2" -> "9")))
    // ON a1=k1 alone over-matches (every ct row × both pt rows = 6);
    // the residual a2=k2 filter narrows to the 2 exact matches
    val rows = e.query("ct").joinWithForeignKey("pt")
      .select("ct.id as cid", "pt.id as pid").noDefaultLimit.toDF.collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("c1", "p1"), ("c2", "p2")))
  }

  test("self-join via 'table as alias' target; conflicted names keep prefixes") {
    val qb = engine.query("nation")
      .join("nation as n2", "nation.n_regionkey", "=", "n2.n_regionkey")
      .noDefaultLimit
    val df = qb.toDF
    // every nation pairs with each nation of its region (including itself)
    val expected = {
      val n = engine.table("nation")
      n.groupBy("n_regionkey").count().agg(sum(col("count") * col("count"))).head.getLong(0)
    }
    assert(df.count() == expected)
    assert(df.columns.contains("nation.n_name") && df.columns.contains("n2.n_name"))
    // repeated bare target auto-aliases as table_2
    val auto = engine.query("nation")
      .join("nation", "nation.n_regionkey", "=", "nation_2.n_regionkey")
      .noDefaultLimit.toDF
    assert(auto.count() == expected)
    // when the FIRST occurrence is itself a join, the second still gets _2
    val viaJoins = engine.query("region")
      .join("nation", "region.r_regionkey", "=", "nation.n_regionkey")
      .join("nation", "region.r_regionkey", "=", "nation_2.n_regionkey")
      .noDefaultLimit.toDF
    assert(viaJoins.columns.contains("nation_2.n_name"))
    // explicit duplicate aliases are rejected up front
    intercept[IllegalArgumentException] {
      engine.query("region")
        .join("nation as n", "region.r_regionkey", "=", "n.n_regionkey")
        .join("nation as n", "region.r_regionkey", "=", "n.n_regionkey")
    }
  }

  test("numeric-string PK ordering survives non-default spaces") {
    import graft.schema._
    val wh = java.nio.file.Files.createTempDirectory("graft_sp").toString
    val e = Graft.withWarehouse(spark, sfDir, wh).switchSpace("s2")
    e.createTable(TableSchema("nsp", PrimaryKeyConfig("id", PkStrategy.Sequential),
      Seq(FieldSchema("v", GType.GInteger))))
    e.batchInsert("nsp", Seq("1", "2", "3", "10", "20").zipWithIndex.map {
      case (id, i) => Map[String, Any]("id" -> id, "v" -> i)
    })
    val ids = e.query("nsp").orderByAsc("id").toDF.collect().map(_.getString(0)).toSeq
    // golden: ['1','2','3','10','20'] (database_tester.dart:1587-1603)
    assert(ids == Seq("1", "2", "3", "10", "20"))
  }

  test("sql() resolves quoted identifiers and subquery relations (parser-based)") {
    val n = engine.sql("SELECT count(*) AS c FROM `nation`").head.getLong(0)
    assert(n == 25)
    val sub = engine.sql(
      """SELECT n_name FROM nation
         WHERE n_regionkey IN (SELECT r_regionkey FROM `region` WHERE r_name = 'ASIA')
         ORDER BY n_name""").collect()
    assert(sub.length == 5)
    // tables referenced ONLY inside a CTE definition resolve too
    // (UnresolvedWith.cteRelations are not plan children at parse time)
    val cte = engine.sql(
      """WITH x AS (SELECT n_regionkey, count(*) AS c FROM nation GROUP BY 1)
         SELECT count(*) FROM x""").head.getLong(0)
    assert(cte == 5)
  }

  test("cursor pages stay stable over a NON-UNIQUE sort key (automatic PK tie-break, query_executor.dart:1063-1074)") {
    import graft.schema._
    val wh = java.nio.file.Files.createTempDirectory("graft_tb").toString
    val e = Graft.withWarehouse(spark, sfDir, wh)
    e.createTable(TableSchema("pg", PrimaryKeyConfig("id", PkStrategy.None),
      Seq(FieldSchema("grp", GType.GText))))
    // every row shares the same sort-key value → without a tie-break the
    // page boundaries would be arbitrary
    e.batchInsert("pg", (1 to 10).map(i => Map[String, Any]("id" -> f"r$i%02d", "grp" -> "same")))
    var page = e.query("pg").orderByAsc("grp").limit(3).run()
    var seen = page.data.map(_.getAs[String]("id")).toVector
    while (page.hasMore) {
      page = page.next()
      seen = seen ++ page.data.map(_.getAs[String]("id"))
    }
    assert(seen.size == 10 && seen.distinct.size == 10) // no dupes, no loss
    assert(seen == seen.sorted) // PK tie-break gives a deterministic total order
  }
}
