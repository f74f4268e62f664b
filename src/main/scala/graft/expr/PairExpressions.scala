package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen kernels for the bucket-pair dedup families. The HOF
 * formulations (`Dedup.pairsOfHof`: array_sort → flatten(transform ×
 * transform × slice); `size(array_intersect(a, b))` verify) are
 * CodegenFallback and allocate a slice / hash set per element or call —
 * at q44-scale buckets that is millions of interpreted lambda
 * invocations. These kernels produce BYTE-IDENTICAL output in one tight
 * JVM loop each; DedupSpec pins kernel == HOF on real data.
 */
object PairKernel {

  /** All unordered pairs of a bucket's id array, sorted ascending —
    * byte-identical to `pairsOfHof`: sort ascending nulls LAST
    * (array_sort), pairs (s[i], s[j]) for j > i in (i asc, j asc) order.
    * C(n,2) must fit an int (the HOF's flatten has the same bound). */
  def sortedPairs(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    val xs = arr.toObjectArray(et)
    val base = TypeUtils.getInterpretedOrdering(et)
    val cmp = new java.util.Comparator[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int =
        if (a == null && b == null) 0
        else if (a == null) 1 // nulls LAST — array_sort's default
        else if (b == null) -1
        else base.compare(a.asInstanceOf[Any], b.asInstanceOf[Any])
    }
    java.util.Arrays.sort(xs.asInstanceOf[Array[AnyRef]], cmp)
    val nPairs = n.toLong * (n - 1) / 2
    require(nPairs <= Int.MaxValue - 16,
      s"sortedPairs: bucket of $n ids -> $nPairs pairs exceeds array bounds" +
        " — tighten maxBucket")
    val out = new Array[Any](nPairs.toInt)
    var p = 0
    var i = 0
    while (i < n) {
      val a = xs(i)
      var j = i + 1
      while (j < n) {
        out(p) = new GenericInternalRow(Array[Any](a, xs(j)))
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** |A ∩ B| for two SORTED-ASCENDING string arrays with DISTINCT
    * non-null elements (the shingle-array invariant: ShingleKernel
    * dedups, callers pre-sort with array_sort). Equals
    * `size(array_intersect(a, b))` on those inputs — intersect SIZE is
    * order-free — with a zero-allocation merge walk instead of a hash
    * set per call. */
  def intersectSizeSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** All n-char grams of `text` (one per start position, duplicates
    * KEPT), empty when the text is shorter than n — byte-identical to
    * the HOF `when(length(t) >= n, transform(sequence(1, length(t)-(n-1)),
    * i => substring(t, i, n))).otherwise(array())`. Gram slicing is
    * character-based (the substring contract); byte ranges are computed
    * from one boundary pass. */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val l = text.numChars()
    if (l < n) return new GenericArrayData(new Array[Any](0))
    val bytes = text.getBytes
    val offs = new Array[Int](l + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      // step with UTF8String's OWN first-byte width so the walk matches
      // numChars byte-for-byte on ANY input: the hand-rolled ladder
      // counted stray continuation bytes (0x80-0xBF) as 2-byte chars
      // where numChars counts 1, leaving tail offsets at 0 on malformed
      // UTF-8 (zero/negative gram ranges — the r16 advisor's finding)
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(l) = bytes.length
    val m = l - n + 1
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val off = offs(i)
      out(i) = UTF8String.fromBytes(bytes, off, offs(i + n) - off)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** sortedPairs(ids) → ARRAY<STRUCT<a, b>>, codegen'd. */
case class SortedPairsExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  // analysis-time contract (r16 advice): array input required — the
  // dataType cast below would otherwise throw an unreadable CCE
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(ArrayType)
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = {
    val at = child.dataType.asInstanceOf[ArrayType]
    ArrayType(StructType(Seq(
      StructField("a", at.elementType, at.containsNull),
      StructField("b", at.elementType, at.containsNull))), containsNull = false)
  }

  override def nullSafeEval(a: Any): Any =
    PairKernel.sortedPairs(a.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etRef = ctx.addReferenceObj("elemType", elemType)
    defineCodeGen(ctx, ev, a =>
      s"graft.expr.PairKernel.sortedPairs($a, (org.apache.spark.sql.types.DataType) $etRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** intersectSizeSorted(a, b) → INT over sorted-distinct string arrays. */
case class IntersectSizeSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    PairKernel.intersectSizeSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.PairKernel.intersectSizeSorted($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** charGrams(text, n) → ARRAY<STRING> of every n-char gram, codegen'd. */
case class CharGramsExpr(child: Expression, n: Int) extends UnaryExpression
    with ExpectsInputTypes {
  require(n >= 1, s"charGrams: n must be >= 1, got $n")
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    PairKernel.charGrams(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.PairKernel.charGrams($a, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
