package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro-Winkler similarity — the record-linkage standard (Winkler 1990)
 * Spark lacks (it ships only `levenshtein`). Textbook semantics, pinned
 * by the q138 gate against DuckDB's `jaro_winkler_similarity`:
 * match window `max(|s|,|t|)/2 - 1`, greedy left-to-right match marking,
 * transpositions = out-of-order matches / 2 (integer), and the Winkler
 * prefix boost `j + min(4, prefix)·0.1·(1−j)` applied only when the Jaro
 * score exceeds 0.7. Operates on UTF-16 code units (identical to code
 * points for the BMP text ER runs on).
 *
 * Kernel discipline as in [[TextHashKernel]]: one static call per pair,
 * codegen'd, no allocation beyond two boolean arrays.
 */
object StringSimKernel {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val l1 = s.length
    val l2 = t.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val used1 = new Array[Boolean](l1)
    val used2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!used2(j) && s.charAt(i) == t.charAt(j)) {
          used1(i) = true; used2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of s against matched chars of t
    var k = 0
    var j2 = 0
    i = 0
    var outOfOrder = 0
    while (i < l1) {
      if (used1(i)) {
        while (!used2(j2)) j2 += 1
        if (s.charAt(i) != t.charAt(j2)) outOfOrder += 1
        j2 += 1
      }
      i += 1
    }
    k = outOfOrder / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - k) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s.charAt(p) == t.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

/** jaroWinkler(a, b) → DOUBLE in [0, 1], codegen'd. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernel.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.StringSimKernel.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
