package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native codegen'd vector kernels. The higher-order-function formulations
 * (`aggregate(zip_with(...))`) are CodegenFallback in Spark — every element
 * goes through interpreted, boxed evaluation, which dominates O(N²)
 * similarity joins (measured: 49 s → ~8 s on the sf0.1 near-dup bench).
 * These expressions emit a tight primitive loop inside whole-stage codegen.
 *
 * Numeric contract (oracle parity): elements are widened to double and
 * accumulated LEFT-TO-RIGHT from 0.0 — bit-identical to the HOF versions
 * they replace. Arrays of FLOAT or DOUBLE; unequal lengths use the common
 * prefix; null elements are treated as 0 (embeddings are dense).
 */
trait VecKernel { self: Expression =>
  override def dataType: DataType = DoubleType

  protected def elemGet(e: Expression, arr: String, i: String): String =
    // null elements read as 0 — matches the interpreted path exactly
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => s"($arr.isNullAt($i) ? 0.0d : (double) $arr.getFloat($i))"
      case DoubleType => s"($arr.isNullAt($i) ? 0.0d : $arr.getDouble($i))"
      case t => throw new IllegalArgumentException(s"vector kernel needs ARRAY<FLOAT|DOUBLE>, got $t")
    }

  protected def elemEval(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => if (arr.isNullAt(i)) 0.0 else arr.getFloat(i).toDouble
      case DoubleType => if (arr.isNullAt(i)) 0.0 else arr.getDouble(i)
      case t => throw new IllegalArgumentException(s"vector kernel needs ARRAY<FLOAT|DOUBLE>, got $t")
    }
}

/** dot(a, b) — Σ aᵢ·bᵢ in codegen. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecKernel {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elemEval(left, x, i) * elemEval(right, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${elemGet(left, a, i)}) * (${elemGet(right, b, i)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ² — callers take sqrt for the L2 norm. */
case class VecNormSq(child: Expression) extends UnaryExpression with VecKernel {

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val v = elemEval(child, x, i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = ${elemGet(child, a, i)};
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign-LSH signature kernel: project onto `planes` pseudo-random ±1
  * hyperplanes (weight(p,d) from xxhash64(p,d) parity — Spark's XXH64 with
  * its seed 42, so the kernel is bit-identical to the Column formulation
  * `when(xxhash64(lit(p), lit(d)) % 2 === 0, 1.0).otherwise(-1.0)`) and
  * emit the '0'/'1' sign bit-string. Replaces a planes×dim literal
  * expression tree (~8k Catalyst nodes at planes=32, dim=64; ~18k at
  * dim=1536) with one codegen call. A null element poisons the plane's dot
  * to null → bit '0', as the HOF chain does. */
object VecLshKernel {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.types.UTF8String

  def signBits(vec: ArrayData, planes: Int, isFloat: Boolean): UTF8String = {
    val n = vec.numElements()
    val out = new Array[Byte](planes)
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var poisoned = false
      val hp = XXH64.hashInt(p, 42L)
      var d = 0
      while (d < n && !poisoned) {
        if (vec.isNullAt(d)) poisoned = true
        else {
          val w = if (XXH64.hashInt(d, hp) % 2 == 0) 1.0 else -1.0
          val v = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          dot += v * w
        }
        d += 1
      }
      out(p) = if (!poisoned && dot >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** signLsh(vec, planes) → CHAR(planes) '0'/'1' bit-string, codegen'd. */
case class SignLshExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = StringType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"signLsh needs ARRAY<FLOAT|DOUBLE>, got $t")
    }

  override def nullSafeEval(a: Any): Any =
    VecLshKernel.signBits(a.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VecLshKernel.signBits($a, $planes, $isFloat)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Σ (aᵢ-bᵢ)² — callers take sqrt for the L2 distance. */
case class VecDistSq(left: Expression, right: Expression)
    extends BinaryExpression with VecKernel {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = elemEval(left, x, i) - elemEval(right, y, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (${elemGet(left, a, i)}) - (${elemGet(right, b, i)});
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC (asymmetric distance) kernel: Σ_s lut[s][codes[s]] — the PQ scan's
  * hot loop. The HOF formulation (`aggregate(sequence, ...,
  * element_at(element_at(lut,...)))`) is CodegenFallback: every code
  * crosses the interpreted boundary with boxing, per row, on the one
  * column a 100 TB PQ serving scan actually reads. One static call with a
  * tight primitive loop instead. A null/short code array, a null LUT row,
  * or an out-of-range code yields null (the HOF's non-ANSI behavior;
  * encode never produces any of these). */
object PqAdcKernel {
  def adc(lut: ArrayData, codes: ArrayData, wide: Boolean): java.lang.Double = {
    val m = lut.numElements()
    if (codes.numElements() < m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (lut.isNullAt(s) || codes.isNullAt(s)) return null
      val row = lut.getArray(s)
      val c = if (wide) codes.getLong(s).toInt else codes.getInt(s)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** pqAdc(lut ARRAY<ARRAY<DOUBLE>>, codes ARRAY<INT|LONG>) → DOUBLE. */
case class PqAdcExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def wide: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType                            => true
      case IntegerType | ShortType | ByteType  => false
      case t => throw new IllegalArgumentException(s"pqAdc needs integral codes, got $t")
    }

  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdcKernel.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], wide)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      s"""
      java.lang.Double ${ev.value}_r = graft.expr.PqAdcKernel.adc($lut, $codes, $wide);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** int8 dequantize kernel: code.toFloat * scale per element, one static
  * call instead of an interpreted `transform` lambda per row — the only
  * non-codegen step left in the two-stage int8 scan. Null elements
  * propagate; float arithmetic matches the Column form (FLOAT × FLOAT
  * in Spark evaluates as a java float multiply). */
object Int8Kernel {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def dequantize(quant: InternalRow): ArrayData = {
    if (quant.isNullAt(0)) return null // transform(null, ...) → null array
    val q = quant.getArray(0)
    val n = q.numElements()
    val out = new Array[Any](n)
    // scale null (unreachable from quantizeInt8, defensive): the HOF
    // multiplies every element by null → array of null elements
    val scaleNull = quant.isNullAt(1)
    val scale = if (scaleNull) 0f else quant.getFloat(1)
    var i = 0
    while (i < n) {
      out(i) =
        if (scaleNull || q.isNullAt(i)) null
        else java.lang.Float.valueOf(q.getByte(i).toFloat * scale)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** dequantizeInt8(STRUCT<q ARRAY<BYTE>, scale FLOAT>) → ARRAY<FLOAT>. */
case class DequantizeInt8Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Int8Kernel.dequantize(a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
      ${ev.value} = graft.expr.Int8Kernel.dequantize($a);
      if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
