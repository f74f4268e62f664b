package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * EXACT second-moment aggregate for quantized embedding vectors — the
 * one-pass long fast path of the `covCells` / `embeddingCka` cell
 * aggregations (see `graft.pipeline.CorpusStats`).
 *
 * The HOF/explode formulation generates n·d² (i, j, xᵢ·xⱼ) rows through
 * two `posexplode`s and hash-aggregates them into d² cells as
 * DECIMAL(38,0) sums. Exact, but the per-row machinery (generate → hash
 * probe per pair) dominates: at n=2,000 / d=64 that is 8.2M generated
 * rows for 8.2M multiply-adds of actual work. This aggregate runs the
 * whole outer-product accumulation as ONE tight JVM loop per row into a
 * flat long buffer — upper triangle only (the Gram matrix is symmetric).
 *
 * EXACTNESS CONTRACT: callers must pre-probe max|x| and n and take this
 * path ONLY when n·max|x|² (and hence every partial sum) provably fits a
 * signed 64-bit long — under that bound long sums are EXACTLY the
 * decimal(38,0) sums (integer arithmetic, order-free), so downstream
 * values are byte-identical to the explode path. Above the bound callers
 * MUST fall back to the decimal explode formulation (they do — see
 * `covCells`); this class never checks, because by then a wrap already
 * lost the sum. The probe-then-choose shape is the house fast-path
 * doctrine (kmeansLloyd / silhouetteSimplified's long distance class).
 *
 * Buffer layout (all longs): [n, s₀..s_{d-1}, c₀₀, c₀₁.., c₀_{d-1},
 * c₁₁.., c_{d-1,d-1}] — count, per-axis sums, upper-triangular products
 * row-major; length 1 + d + d(d+1)/2. `eval` returns it as ARRAY<LONG>.
 *
 * A row whose array length ≠ d throws loudly — callers probe min==max
 * size first, so this only fires on a logic error, never silently
 * zero-fills (the ragged-corpus discipline of the explode path).
 */
case class VecOuterAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 1024, s"VecOuterAgg: d=$d outside [1,1024]")

  private val bufLen = 1 + d + d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != d)
        throw new IllegalArgumentException(
          s"VecOuterAgg: row has ${arr.numElements()} elements, expected $d " +
            "— probe dims before choosing the long fast path")
      // copy once with a LOUD null check (the explode path's null-skip
      // would silently under-count products while n counts the row —
      // refuse instead), then run the outer product on a local array
      // (no per-element ArrayData virtual calls in the inner loop)
      val x = new Array[Long](d)
      var i = 0
      while (i < d) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            "VecOuterAgg: null vector element — filter null elements " +
              "before the moment pass")
        x(i) = arr.getLong(i)
        i += 1
      }
      buf(0) += 1L
      i = 0
      var off = 1 + d
      while (i < d) {
        val xi = x(i)
        buf(1 + i) += xi
        var j = i
        while (j < d) {
          buf(off) += xi * x(j)
          off += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val boxed = new Array[AnyRef](buf.length)
    var i = 0
    while (i < buf.length) { boxed(i) = java.lang.Long.valueOf(buf(i)); i += 1 }
    new GenericArrayData(boxed)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecOuterAgg =
    copy(child = newChildren.head)
}

object VecOuterAgg {
  /** Strict long-safety bound for the fast path: every partial product
    * sum is ≤ n·qAbs² and every axis sum ≤ n·qAbs; demand BOTH under
    * 2⁶² (one spare bit of headroom) via BigInt so the check itself
    * cannot wrap. qAbs = max over rows of max|xᵢ|. */
  def longSafe(n: Long, qAbs: Long): Boolean = {
    val bound = BigInt(1) << 62
    BigInt(n) * BigInt(qAbs) * BigInt(qAbs) < bound &&
      BigInt(n) * BigInt(qAbs) < bound
  }

  /** Upper-triangle offset of cell (i, j), i ≤ j, within the eval array
    * (AFTER the [n, sums] prefix): row-major over j ≥ i. */
  def triOff(d: Int, i: Int, j: Int): Int =
    1 + d + i * d - i * (i - 1) / 2 + (j - i)
}
