package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries heavy-hitter CANDIDATE sketch as a custom
 * `TypedImperativeAggregate` — the mergeable-summaries machinery
 * (Agarwal et al. 2012) Spark exposes for exactly this shape: partial
 * sketches build map-side per partition, merge associatively at the
 * final aggregate, and the whole pass is ONE narrow aggregation with
 * `capacity`-bounded state, never a token-keyed shuffle.
 *
 * Guarantee (survives merges): for any item, true count − counter ≤
 * N/(capacity+1). So every item with true count > N/(capacity+1) is in
 * the candidate set; the 2-pass exact pattern (q141) then joins the
 * BROADCAST candidates back and exact-counts only them — the classic
 * way to compute exact heavy hitters over 100 TB without ever shuffling
 * the full token stream: sketch pass (narrow) + candidate-filtered count
 * (shuffle of matching tokens only).
 *
 * The sketch's internal contents are deliberately NOT the result — only
 * the superset property matters, which is deterministic; the verified
 * exact counts are the gated output.
 */
case class MisraGriesCandidates(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def decrementAll(m: mutable.HashMap[String, Long], d: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    m.foreach { case (k, v) =>
      if (v <= d) dead += k else m.update(k, v - d)
    }
    dead.foreach(m.remove)
  }

  override def update(m: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      m.get(w) match {
        case Some(c) => m.update(w, c + 1)
        case None if m.size < capacity => m.update(w, 1L)
        case None => decrementAll(m, 1L) // the Misra-Gries step
      }
    }
    m
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything —
      // the mergeable-summaries reduction that preserves the error bound
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      decrementAll(a, d)
    }
    a
  }

  override def eval(m: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      m.keysIterator.map(UTF8String.fromString).toArray[AnyRef])

  override def serialize(m: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesCandidates =
    copy(child = newChildren.head)
}
