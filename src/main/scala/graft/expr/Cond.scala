package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Boolean condition tree — the engine's only query language, mirroring the
 * reference's `QueryCondition` AST (AND/OR/leaf nodes,
 * /root/reference/lib/src/query/query_condition.dart:5-409 and
 * value_matcher.dart:716-758), re-expressed as an immutable Scala ADT that
 * compiles to a single Catalyst `Column`. Compiling to one Column (instead
 * of plan surgery) keeps the whole predicate inside Catalyst so pushdown,
 * boolean simplification and parquet min/max pruning are free.
 *
 * Reference-exact semantics preserved (SURVEY.md §2.3):
 *   - loose typing: literals are cast to the column's type, so
 *     where("age","=","20") matches integer 20;
 *   - `!=` and `NOT IN` match NULL values (null-guard absent in the
 *     reference evaluator, value_matcher.dart:574-589);
 *   - `>,>=,<,<=,BETWEEN,LIKE,IN` never match NULL;
 *   - LIKE uses SQL %/_ wildcards, case-sensitive, anchored.
 */
sealed trait Cond {
  def &&(other: Cond): Cond = Cond.and(this, other)
  def ||(other: Cond): Cond = Cond.or(this, other)

  /** Compile to a Catalyst Column. `resolve` maps a field name to its
    * Column; `typeOf` returns the column's Spark type for literal coercion. */
  def toColumn(resolve: String => Column, typeOf: String => Option[DataType]): Column
}

object Cond {
  case object True extends Cond {
    def toColumn(r: String => Column, t: String => Option[DataType]): Column = lit(true)
  }

  final case class And(children: Seq[Cond]) extends Cond {
    def toColumn(r: String => Column, t: String => Option[DataType]): Column =
      children.map(_.toColumn(r, t)).reduceOption(_ && _).getOrElse(lit(true))
  }

  final case class Or(children: Seq[Cond]) extends Cond {
    def toColumn(r: String => Column, t: String => Option[DataType]): Column =
      children.map(_.toColumn(r, t)).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** One comparison; `op` is the reference operator token. */
  final case class Leaf(field: String, op: String, value: Any) extends Cond {
    def toColumn(resolve: String => Column, typeOf: String => Option[DataType]): Column = {
      val c = resolve(field)
      val vt = typeOf(field)
      def v: Column = coerce(value, vt)
      def vs: Seq[Column] = value match {
        case xs: Seq[_]     => xs.map(coerce(_, vt))
        case xs: Array[_]   => xs.toSeq.map(coerce(_, vt))
        case other          => Seq(coerce(other, vt))
      }
      op match {
        case "=" | "==="        => c === v
        case "!=" | "<>"        => c.isNull || c =!= v // null != x is true in the reference
        case ">"                => c > v
        case ">="               => c >= v
        case "<"                => c < v
        case "<="               => c <= v
        case "IN"               => c.isin(vs: _*)
        case "NOT IN"           => c.isNull || !c.isin(vs: _*) // null NOT IN list → true
        case "BETWEEN"          => value match {
          case (a, b) => c.between(coerce(a, vt), coerce(b, vt))
          case xs: Seq[_] if xs.size == 2 => c.between(coerce(xs(0), vt), coerce(xs(1), vt))
          case other => throw new IllegalArgumentException(s"BETWEEN needs (start,end), got $other")
        }
        case "LIKE"             => c.like(value.toString)
        case "NOT LIKE"         => !c.like(value.toString)
        case "IS"               => c.isNull     // IS NULL (missing field counts as null)
        case "IS NOT"           => c.isNotNull
        case other              => throw new IllegalArgumentException(s"unknown operator $other")
      }
    }
  }

  def and(cs: Cond*): Cond = {
    val flat = cs.flatMap { case And(xs) => xs; case True => Nil; case c => Seq(c) }
    if (flat.isEmpty) True else if (flat.size == 1) flat.head else And(flat)
  }

  def or(cs: Cond*): Cond = {
    val flat = cs.flatMap { case Or(xs) => xs; case c => Seq(c) }
    if (flat.size == 1) flat.head else Or(flat)
  }

  /** Loose-type literal coercion (reference QueryCondition.normalize,
    * query_condition.dart:743-813): the literal is cast to the column type
    * at build time, Catalyst-natively. */
  private[graft] def coerce(value: Any, target: Option[DataType]): Column = {
    val base = value match {
      case null                      => lit(null)
      case c: Column                 => c
      case ts: java.sql.Timestamp    => lit(ts)
      case d: java.sql.Date          => lit(d)
      case i: java.time.Instant      => lit(java.sql.Timestamp.from(i))
      case bd: BigDecimal            => lit(bd.underlying())
      case other                     => lit(other)
    }
    target match {
      case Some(t) if !isLiteralOfType(value, t) => base.cast(t)
      case _                                     => base
    }
  }

  private def isLiteralOfType(value: Any, t: DataType): Boolean = (value, t) match {
    case (_: String, StringType)                   => true
    case (_: Long | _: Int, LongType)              => true
    case (_: Int, IntegerType)                     => true
    case (_: Double | _: Float, DoubleType)        => true
    case (_: Boolean, BooleanType)                 => true
    case (_: java.sql.Timestamp, TimestampType)    => true
    case (_: java.time.Instant, TimestampType)     => true
    case _                                         => false
  }

  // ---- map-form parser (reference query_condition.dart:477-521):
  // {'AND': [...]}, {'OR': [...]}, {field: {op: val}}, {field: val}
  def fromMap(m: Map[String, Any]): Cond = {
    val parts = m.toSeq.map {
      case ("AND", xs: Seq[_]) => and(xs.map(x => fromMap(x.asInstanceOf[Map[String, Any]])): _*)
      case ("OR", xs: Seq[_])  => or(xs.map(x => fromMap(x.asInstanceOf[Map[String, Any]])): _*)
      case (field, ops: Map[_, _]) =>
        // multiple ops on one field in one map = OR of ops (value_matcher.dart:551-561)
        or(ops.asInstanceOf[Map[String, Any]].toSeq.map { case (op, v) => Leaf(field, op, v) }: _*)
      case (field, v) => Leaf(field, "=", v)
    }
    and(parts: _*)
  }
}
