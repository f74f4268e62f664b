package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-path mining — the "what do users do next" pair of operators
 * every product-analytics engine ships (ClickHouse sequence functions,
 * funnel-adjacent path analysis):
 *
 *  - [[topSequences]]: most frequent length-n consecutive event chains
 *    across all users;
 *  - [[transitions]]: the first-order Markov transition matrix between
 *    event types, with per-source probabilities.
 *
 * Both are ONE user-partitioned window pass (per-user partitions are
 * activity-bounded, never corpus-sized) followed by a map-combined
 * count rollup whose output cardinality is |event types|^n — tiny and
 * corpus-size-free. No self-joins per step, no per-user collect.
 * Determinism: the within-user order is (ts, tieCol) — a total order —
 * and the top-K cut carries the (cnt desc, path) total order.
 */
object EventPaths {

  /** @return top-K (path "a>b>c", cnt) of consecutive n-chains. */
  def topSequences(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, n: Int, topK: Int): DataFrame = {
    require(n >= 2 && n <= 8, "n in 2..8")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val leads = (1 until n).foldLeft(df.withColumn("__e0", col(typeCol))) {
      (d, i) => d.withColumn(s"__e$i", lead(col(typeCol), i).over(w))
    }
    leads
      .where((1 until n).map(i => col(s"__e$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until n).map(i => col(s"__e$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(topK)
  }

  /** @return (prev, next, cnt, prob) — prob normalized per prev row. */
  def transitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("prev"), col("__next").as("next"))
      .agg(count(lit(1)).as("cnt"))
    pairs
      .withColumn("prob", col("cnt").cast("double") /
        sum(col("cnt")).over(Window.partitionBy(col("prev"))))
      .select("prev", "next", "cnt", "prob")
  }
}
