package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies inserted/deleted/updated/unchanged with null-safe compares") {
    val oldDf = Seq(
      (1L, Some("a"), Some(1.0)),  // unchanged
      (2L, Some("b"), Some(2.0)),  // updated (value change)
      (3L, Some("c"), None),       // updated (null -> value)
      (4L, None, None),            // unchanged (null <=> null)
      (5L, Some("e"), Some(5.0))   // deleted
    ).toDF("id", "s", "v")
    val newDf = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (3L, Some("c"), Some(3.0)),
      (4L, None, Option.empty[Double]),
      (6L, Some("f"), Some(6.0))   // inserted
    ).toDF("id", "s", "v")
    val got = SnapshotDiff.diff(oldDf, newDf, "id", Seq("s", "v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      1L -> "unchanged", 2L -> "updated", 3L -> "updated",
      4L -> "unchanged", 5L -> "deleted", 6L -> "inserted"))
  }

  test("changes drops unchanged rows and q133's construction yields all three classes") {
    val orders = engine.table("orders")
    val oldSnap = orders.where(pmod(col("o_orderkey"), lit(7)) =!= 1)
    val newSnap = orders.where(pmod(col("o_orderkey"), lit(5)) =!= 2)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(3)) === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
    val byType = SnapshotDiff.changes(oldSnap, newSnap,
        "o_orderkey", Seq("o_totalprice", "o_orderstatus"))
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // modular construction guarantees each class is non-empty:
    // inserted = %7==1 && %5!=2, deleted = %5==2 && %7!=1,
    // updated = both present && %3==0
    assert(byType.keySet == Set("inserted", "deleted", "updated"))
    assert(byType.values.forall(_ > 0))
  }
}
