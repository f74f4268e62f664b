package graft

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.col

/** Physical-plan shape contracts for the round-11 data-bound additions
  * (the DistDriftSpec window-partitioning discipline, widened): the three
  * operators whose cost class most invites an accidental cartesian or a
  * single-task window must provably not contain one. Asserted on the
  * EXECUTED plan (AQE finalized), subqueries included. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def offenders(df: DataFrame,
      allowScalarBnl: Boolean): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.WindowExec
    df.collect() // materialize so AQE finalizes the executed plan
    val expanded: Seq[SparkPlan] =
      df.queryExecution.executedPlan.collectWithSubqueries {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
    expanded.flatMap(_.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Some(s"unpartitioned window: $w")
      case _: CartesianProductExec => Some("cartesian product")
      case b: BroadcastNestedLoopJoinExec if !allowScalarBnl =>
        Some(s"broadcast nested loop: $b")
      case _ => None
    }.flatten)
  }

  test("adamicAdar plan: no cartesian, no BNL, no unpartitioned window") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"))
      .toDF("src", "dst")
    val bad = offenders(graft.operators.GraphOps.adamicAdar(edges, topK = 10),
      allowScalarBnl = false)
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("phraseSearch plan: no cartesian, no BNL, no unpartitioned window") {
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "cat sat alone"))
      .toDF("doc_id", "text")
    val bad = offenders(
      graft.pipeline.CorpusStats.phraseSearch(docs, "doc_id", "text", "cat sat"),
      allowScalarBnl = false)
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("decisionStump plan: no cartesian, no unpartitioned window " +
      "(the 1-row totals broadcast is the allowed scalar BNL)") {
    val df = (1 to 200).map(i => (i.toDouble, i % 3 == 0)).toDF("s", "y")
    val bad = offenders(
      graft.operators.FeatureEng.decisionStump(df, col("s"), F.col("y")),
      allowScalarBnl = true)
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
