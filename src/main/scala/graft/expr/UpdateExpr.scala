package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Scalar expression AST for atomic updates/upserts — the reference's `Expr`
 * (/root/reference/lib/src/model/expr.dart:29-342). This is the ONLY scalar
 * expression language in the reference's query path; it appears in
 * update()/upsert() value maps and is evaluated per-row server side.
 *
 * Compiles to a Catalyst Column, so an UPDATE becomes
 * `withColumn(f, when(pred, expr).otherwise(old))` — fully codegen'd.
 */
sealed trait UExpr {
  def toColumn(resolve: String => Column, isUpdate: Column): Column

  def +(o: UExpr): UExpr = UExpr.Bin("+", this, o)
  def -(o: UExpr): UExpr = UExpr.Bin("-", this, o)
  def *(o: UExpr): UExpr = UExpr.Bin("*", this, o)
  def /(o: UExpr): UExpr = UExpr.Bin("/", this, o)
  def %(o: UExpr): UExpr = UExpr.Bin("%", this, o)
  def unary_- : UExpr = UExpr.Neg(this)
}

object UExpr {
  /** Expr.field(name) — expr.dart:221-230 */
  final case class Field(name: String) extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = r(name)
  }
  /** Expr.value(v) — expr.dart:232-239 */
  final case class Value(v: Any) extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = lit(v)
  }
  /** Expr.now() server timestamp — expr.dart:241-249 */
  case object Now extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = current_timestamp()
  }
  final case class Bin(op: String, l: UExpr, rhs: UExpr) extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = {
      val (a, b) = (l.toColumn(r, u), rhs.toColumn(r, u))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
        case "%" => a % b
      }
    }
  }
  final case class Neg(e: UExpr) extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = -e.toColumn(r, u)
  }
  /** min/max/round/floor/ceil/abs — expr.dart:259-311 */
  final case class Fn(name: String, args: Seq[UExpr]) extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = {
      import org.apache.spark.sql.{functions => F}
      val cs = args.map(_.toColumn(r, u))
      name match {
        case "min"   => least(cs: _*)
        case "max"   => greatest(cs: _*)
        case "abs"   => F.abs(cs.head)
        case "floor" => F.floor(cs.head)
        case "ceil"  => F.ceil(cs.head)
        case "round" =>
          if (cs.size > 1) F.round(cs.head, args(1).asInstanceOf[Value].v.asInstanceOf[Int])
          else F.round(cs.head)
      }
    }
  }
  /** isUpdate()/isInsert() + ifElse — upsert branch predicates
    * (expr.dart:121-158, 313-341). `isUpdate` column is supplied by the
    * upsert merge (true where the target row matched). */
  case object IsUpdate extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = u
  }
  case object IsInsert extends UExpr {
    def toColumn(r: String => Column, u: Column): Column = !u
  }
  final case class IfElse(cond: UExpr, ifTrue: UExpr, ifFalse: UExpr) extends UExpr {
    def toColumn(r: String => Column, u: Column): Column =
      when(cond.toColumn(r, u), ifTrue.toColumn(r, u)).otherwise(ifFalse.toColumn(r, u))
  }

  def field(n: String): UExpr = Field(n)
  def value(v: Any): UExpr = Value(v)
  def now: UExpr = Now
  def min(a: UExpr, b: UExpr): UExpr = Fn("min", Seq(a, b))
  def max(a: UExpr, b: UExpr): UExpr = Fn("max", Seq(a, b))
  def abs(e: UExpr): UExpr = Fn("abs", Seq(e))
  def floor(e: UExpr): UExpr = Fn("floor", Seq(e))
  def ceil(e: UExpr): UExpr = Fn("ceil", Seq(e))
  def round(e: UExpr): UExpr = Fn("round", Seq(e))
  /** clamp sugar (update_builder.dart:151-166) */
  def clamp(e: UExpr, lo: UExpr, hi: UExpr): UExpr = min(max(e, lo), hi)
}
