package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Aggregation spec — the reference's `Agg` factory
 * (/root/reference/lib/src/model/query_aggregation.dart:20-44). The complete
 * function set is count/sum/avg/min/max (query_aggregation.dart:1-7).
 *
 * Reference-exact semantics (SURVEY.md §2.5):
 *  - `count(field)` counts ALL rows regardless of nulls in `field`
 *    (query_aggregation.dart:126-128) → compiled to `count(lit(1))`;
 *  - sum/avg/min/max skip nulls (Spark default matches);
 *  - default output name is `"fn(field)"`.
 */
final case class Agg(
    fn: String,
    field: String,
    alias: Option[String] = None,
    colOverride: Option[Column] = None) {
  def as(a: String): Agg = copy(alias = Some(a))
  def outputName: String = alias.getOrElse(s"$fn($field)")

  def toColumn(resolve: String => Column): Column = {
    def in: Column = colOverride.getOrElse(resolve(field))
    val c = fn match {
      case "count" => count(lit(1)) // reference count counts all rows
      case "sum"   => sum(in)
      case "avg"   => avg(in)
      case "min"   => min(in)
      case "max"   => max(in)
      case other   => throw new IllegalArgumentException(s"unknown aggregate $other")
    }
    c.as(outputName)
  }
}

object Agg {
  def count(field: String = "*", alias: String = null): Agg = Agg("count", field, Option(alias))
  def sum(field: String, alias: String = null): Agg = Agg("sum", field, Option(alias))
  def avg(field: String, alias: String = null): Agg = Agg("avg", field, Option(alias))
  def min(field: String, alias: String = null): Agg = Agg("min", field, Option(alias))
  def max(field: String, alias: String = null): Agg = Agg("max", field, Option(alias))

  // Engine superset: aggregate over an arbitrary Column expression (the
  // reference only aggregates bare fields; exact-decimal money sums and
  // computed measures need expressions).
  def sumCol(c: Column, alias: String): Agg = Agg("sum", alias, Some(alias), Some(c))
  def avgCol(c: Column, alias: String): Agg = Agg("avg", alias, Some(alias), Some(c))
  def minCol(c: Column, alias: String): Agg = Agg("min", alias, Some(alias), Some(c))
  def maxCol(c: Column, alias: String): Agg = Agg("max", alias, Some(alias), Some(c))
}
