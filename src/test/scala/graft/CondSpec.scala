package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.Cond

/** Condition-tree semantics (SURVEY.md §2.3): the 14 operators, the
  * reference's null quirks, loose typing, and AND/OR grouping laws. */
class CondSpec extends SparkSpec {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("age", LongType),
      StructField("name", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 20L, "alice"), Row(2L, 30L, "bob"), Row(3L, null, "carol"),
      Row(4L, 40L, null), Row(5L, 20L, "al"))), schema)
  }

  private def ids(c: Cond): Set[Long] = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.where(c.toColumn(col, types.get)).select("id").collect().map(_.getLong(0)).toSet
  }

  test("loose typing: string literal matches numeric column (reference database_tester.dart:1611-1619)") {
    assert(ids(Cond.Leaf("age", "=", "20")) == Set(1L, 5L))
    assert(ids(Cond.Leaf("age", ">", "25")) == Set(2L, 4L))
  }

  test("!= matches NULL (no null-guard in reference evaluator, value_matcher.dart:574-575)") {
    assert(ids(Cond.Leaf("age", "!=", 20)) == Set(2L, 3L, 4L))
  }

  test("NOT IN matches NULL; IN does not (value_matcher.dart:584-589)") {
    assert(ids(Cond.Leaf("age", "NOT IN", Seq(20, 30))) == Set(3L, 4L))
    assert(ids(Cond.Leaf("age", "IN", Seq(20, 30))) == Set(1L, 2L, 5L))
  }

  test("range operators never match NULL (value_matcher.dart:577-583)") {
    assert(ids(Cond.Leaf("age", ">", 0)) == Set(1L, 2L, 4L, 5L))
    assert(ids(Cond.Leaf("age", "<=", 100)) == Set(1L, 2L, 4L, 5L))
    assert(ids(Cond.Leaf("age", "BETWEEN", (10, 30))) == Set(1L, 2L, 5L))
  }

  test("LIKE wildcards, case-sensitive, anchored (value_matcher.dart:318-331)") {
    assert(ids(Cond.Leaf("name", "LIKE", "al%")) == Set(1L, 5L))
    assert(ids(Cond.Leaf("name", "LIKE", "al")) == Set(5L))
    assert(ids(Cond.Leaf("name", "LIKE", "%o%")) == Set(2L, 3L))
    assert(ids(Cond.Leaf("name", "LIKE", "AL%")) == Set.empty[Long])
    assert(ids(Cond.Leaf("name", "LIKE", "a_")) == Set(5L))
  }

  test("IS / IS NOT null (value_matcher.dart:517-527,606-608)") {
    assert(ids(Cond.Leaf("name", "IS", null)) == Set(4L))
    assert(ids(Cond.Leaf("name", "IS NOT", null)) == Set(1L, 2L, 3L, 5L))
  }

  test("map form: {field:{op:val}} multi-op = OR of ops (value_matcher.dart:551-561)") {
    val c = Cond.fromMap(Map("age" -> Map(">" -> 35, "<" -> 25)))
    assert(ids(c) == Set(1L, 4L, 5L))
    val c2 = Cond.fromMap(Map("AND" -> Seq(Map("age" -> 20), Map("name" -> "alice"))))
    assert(ids(c2) == Set(1L))
  }

  // property-style: seeded random leaves; AND/OR grouping laws hold
  // against set algebra on the evaluated id-sets (the condition-tree
  // builder, query_condition.dart:116-409, is the subtlest pure logic).
  private def randomLeaf(rnd: scala.util.Random): Cond = {
    val f = if (rnd.nextBoolean()) "age" else "id"
    val op = Seq("=", ">", "<", "!=")(rnd.nextInt(4))
    Cond.Leaf(f, op, rnd.nextLong(46))
  }

  test("property: AND/OR flattening + grouping match set algebra (20 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val (a, b, c) = (randomLeaf(rnd), randomLeaf(rnd), randomLeaf(rnd))
      val (ia, ib, ic) = (ids(a), ids(b), ids(c))
      assert(ids(Cond.and(Cond.and(a, b), c)) == (ia & ib & ic))
      assert(ids(Cond.or(Cond.or(a, b), c)) == (ia | ib | ic))
      assert(ids(Cond.and(a, Cond.True)) == ia)
      assert(ids((a || b) && c) == ((ia | ib) & ic))
      assert(ids(a || (b && c)) == (ia | (ib & ic)))
    }
  }
}
