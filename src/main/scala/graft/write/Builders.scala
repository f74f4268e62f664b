package graft.write

import org.apache.spark.sql.DataFrame

import graft.Graft
import graft.expr.{Cond, UExpr}

/**
 * Fluent update chain — the reference's `UpdateBuilder`
 * (/root/reference/lib/src/chain/update_builder.dart:4-245) with its sugar
 * ops (increment/decrement/multiply/divide/min/max/clamp/
 * setServerTimestamp/compute, update_builder.dart:32-209).
 *
 * Terminal ops: `preview` (pure DataFrame of the post-update state — what
 * the correctness gate checks) and `apply()` (atomic overwrite of the
 * managed table).
 */
final case class UpdateBuilder(
    engine: Graft,
    table: String,
    sets: Seq[(String, UExpr)] = Nil,
    cond: Cond = Cond.True,
    allowAll: Boolean = false) {

  import UExpr._

  def set(field: String, v: Any): UpdateBuilder = copy(sets = sets :+ (field -> value(v)))
  def setExpr(field: String, e: UExpr): UpdateBuilder = copy(sets = sets :+ (field -> e))
  def compute(field: String, e: UExpr): UpdateBuilder = setExpr(field, e)
  def increment(field: String, by: Any = 1): UpdateBuilder =
    setExpr(field, UExpr.field(field) + value(by))
  def decrement(field: String, by: Any = 1): UpdateBuilder =
    setExpr(field, UExpr.field(field) - value(by))
  def multiply(field: String, by: Any): UpdateBuilder =
    setExpr(field, UExpr.field(field) * value(by))
  def divide(field: String, by: Any): UpdateBuilder =
    setExpr(field, UExpr.field(field) / value(by))
  def minWith(field: String, v: Any): UpdateBuilder =
    setExpr(field, UExpr.min(UExpr.field(field), value(v)))
  def maxWith(field: String, v: Any): UpdateBuilder =
    setExpr(field, UExpr.max(UExpr.field(field), value(v)))
  def clampTo(field: String, lo: Any, hi: Any): UpdateBuilder =
    setExpr(field, UExpr.clamp(UExpr.field(field), value(lo), value(hi)))
  def setServerTimestamp(field: String): UpdateBuilder = setExpr(field, UExpr.now)

  def where(field: String, op: String, v: Any): UpdateBuilder =
    copy(cond = cond && Cond.Leaf(field, op, v))
  def condition(c: Cond): UpdateBuilder = copy(cond = cond && c)
  def allowUpdateAll: UpdateBuilder = copy(allowAll = true)

  /** Post-update state, side-effect free. */
  def preview: DataFrame =
    Writes.updatePreview(engine.table(table), sets, cond, allowAll)

  /** Execute against the managed table (read → transform → atomic swap). */
  def apply(): Unit = Writes.overwrite(engine, table, preview)
}

/** Fluent delete chain (reference delete_builder.dart:4-39). */
final case class DeleteBuilder(
    engine: Graft,
    table: String,
    cond: Cond = Cond.True,
    allowAll: Boolean = false) {

  def where(field: String, op: String, v: Any): DeleteBuilder =
    copy(cond = cond && Cond.Leaf(field, op, v))
  def condition(c: Cond): DeleteBuilder = copy(cond = cond && c)
  def allowDeleteAll: DeleteBuilder = copy(allowAll = true)

  def preview: DataFrame = Writes.deletePreview(engine.table(table), cond, allowAll)
  def apply(): Unit = Writes.overwrite(engine, table, preview, op = "delete")
}
