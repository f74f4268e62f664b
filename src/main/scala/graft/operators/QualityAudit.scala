package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit — the validation pass a pipeline runs
 * over a corpus BEFORE spending a training run on it: null checks,
 * range checks, uniqueness, and referential integrity, each reported as
 * a violation count per named rule. The write path enforces constraints
 * at insert time (`write/Writes` + q69); this is the complementary
 * batch audit of data already at rest, where enforcement wasn't ours.
 *
 * Shape at scale: every row-level rule (not-null, range) folds into ONE
 * shared aggregation pass over the table — adding rules adds columns,
 * not scans. Uniqueness is one key-grouped count (map-side combined);
 * referential integrity is one left-anti join against the (broadcast
 * when small) dimension. Results are 1-row frames unioned into the
 * (rule, violations) report — nothing collects on the driver.
 */
object QualityAudit {

  sealed trait Rule { def name: String }
  /** value must not be NULL */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null:$col"
  }
  /** non-NULL values must lie in [lo, hi] (NULLs are NotNull's job) */
  final case class Bounds(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"range:$col"
  }
  /** key must identify at most one row; violations = extra rows per key */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique:${cols.mkString(",")}"
  }
  /** every non-NULL value must exist in the dimension's key column */
  final case class RefIntegrity(col: String, dim: DataFrame, dimKey: String)
      extends Rule {
    val name = s"ref:$col"
  }

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val rowRules = rules.collect {
      case r: NotNull => r.name ->
        sum(when(col(r.col).isNull, 1L).otherwise(0L))
      case r: Bounds => r.name ->
        sum(when(col(r.col).isNotNull &&
          (col(r.col) < lit(r.lo) || col(r.col) > lit(r.hi)), 1L).otherwise(0L))
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      val agg = df.agg(rowRules.head._2.as("c0"),
        rowRules.tail.zipWithIndex.map { case ((_, c), i) => c.as(s"c${i + 1}") }: _*)
      // unpivot the single row into (rule, violations)
      parts += agg.select(explode(map(
        rowRules.zipWithIndex.flatMap { case ((n, _), i) =>
          Seq(lit(n), coalesce(col(s"c$i"), lit(0L)))
        }: _*)).as(Seq("rule", "violations")))
    }
    rules.foreach {
      case u: Unique =>
        parts += df.groupBy(u.cols.map(col): _*)
          .agg(count(lit(1)).as("cnt")).where(col("cnt") > 1)
          .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("violations"))
          .select(lit(u.name).as("rule"), col("violations"))
      case r: RefIntegrity =>
        parts += df.where(col(r.col).isNotNull)
          .join(r.dim.select(col(r.dimKey).as(r.col)).distinct(),
            Seq(r.col), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("rule"), col("violations"))
      case _ => ()
    }
    parts.reduce(_ unionByName _)
  }
}
