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

/**
 * KMV (K-Minimum-Values) distinct-count sketch (Bar-Yossef et al. 2002;
 * Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
 * Operations", SIGMOD 2007) as a custom `TypedImperativeAggregate`: keep
 * the `k` smallest DISTINCT hash values seen. State is k-bounded, merges
 * are associative set unions (take the k smallest of the union), so the
 * whole pass is ONE narrow map-side-combined aggregation — the mergeable
 * distinct-count summary you pre-compute per partition/group of a 100 TB
 * cube and re-aggregate to ANY coarser grouping without rescanning base
 * data (unlike `count(distinct)`, which cannot be rolled up).
 *
 * The sketch IS deterministic: the k smallest distinct hashes of a multiset
 * do not depend on scan/merge order. With a deterministic hash both the
 * sketch and every estimate derived from it are exactly reproducible —
 * which is what lets an external oracle recompute them bit-for-bit.
 *
 * Estimator (computed downstream from the array, not here):
 *   m < k  → exact: the sketch holds EVERY distinct hash, estimate = m
 *   m == k → (k-1) / frac(h_k), h_k the k-th smallest hash as a fraction
 *            of the hash domain.
 * Set ops: union = merge arrays, keep k smallest distinct (pure Spark
 * array functions); intersection via inclusion-exclusion on estimates.
 *
 * `child` must be the HASH column: either a lowercase fixed-width hex
 * string (md5 — lexicographic order == numeric order; DuckDB-reproducible
 * oracle family, like q29) or a non-negative long (xxhash64 >>> 12, the
 * 52-bit production family). Reference anchor: the reference keeps exact
 * per-table unique indexes (`lib/src/core/index_manager.dart`) and has no
 * approximate distinct machinery; this is a scale extension.
 */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[AnyRef]] {

  require(k >= 2, "k must be >= 2")

  // resolved lazily — the ctor runs on the UNRESOLVED child (kexp wraps a
  // plain column reference); dataType only exists after analysis
  @transient private lazy val isString: Boolean = child.dataType == StringType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(if (isString) StringType else LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv child must be STRING (hex hash) or BIGINT (non-negative hash), got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[AnyRef] =
    new java.util.TreeSet[AnyRef]()

  private def add(s: java.util.TreeSet[AnyRef], v: AnyRef): Unit = {
    // TreeSet gives distinctness for free; cap at k by evicting the largest
    if (s.size < k) { s.add(v); () }
    else if (s.last().asInstanceOf[Comparable[AnyRef]].compareTo(v) > 0) {
      if (s.add(v)) s.pollLast()
      ()
    }
  }

  override def update(s: java.util.TreeSet[AnyRef],
      input: InternalRow): java.util.TreeSet[AnyRef] = {
    val v = child.eval(input)
    if (v != null) {
      val key: AnyRef =
        if (isString) v.asInstanceOf[UTF8String].toString
        else java.lang.Long.valueOf(v.asInstanceOf[Long])
      add(s, key)
    }
    s
  }

  override def merge(a: java.util.TreeSet[AnyRef],
      b: java.util.TreeSet[AnyRef]): java.util.TreeSet[AnyRef] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(s: java.util.TreeSet[AnyRef]): Any = {
    val arr = new Array[AnyRef](s.size)
    val it = s.iterator()
    var i = 0
    while (it.hasNext) {
      arr(i) = if (isString) UTF8String.fromString(it.next().asInstanceOf[String])
               else it.next()
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(s: java.util.TreeSet[AnyRef]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(s.size)
    val it = s.iterator()
    while (it.hasNext) {
      if (isString) out.writeUTF(it.next().asInstanceOf[String])
      else out.writeLong(it.next().asInstanceOf[java.lang.Long].longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[AnyRef] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new java.util.TreeSet[AnyRef]()
    var i = 0
    while (i < n) {
      s.add(if (isString) in.readUTF() else java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/**
 * Bloom bitset as a mergeable aggregate: `child` is a 64-bit hash column
 * (xxhash64 — computed codegen in the scan, the agg only sets bits), the
 * buffer a fixed `mBits`-bit set, merges are bitwise OR. `numHashes` bit
 * positions per value via Kirsch-Mitzenmacher double hashing
 * (pos_i = h1 + i·h2 mod m) — the membership probe recomputes the same
 * positions from the same xxhash64, so there are NO false negatives by
 * construction; false positives only cost extra reads, never wrong rows.
 *
 * Built per FILE (group = `input_file_name()`), this is the data-skipping
 * sidecar that gives point lookups on a NON-layout column O(matching
 * files) IO instead of a full scan — the shared-nothing analogue of the
 * reference's secondary B+Tree indexes (`lib/src/core/index_manager.dart`:
 * value → rowid; here value → file, Parquet row groups do the rest).
 */
case class BloomBitsetAgg(
    child: Expression,
    mBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 64 && (mBits & 63) == 0, "mBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 16, "numHashes in [1,16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBitsetAgg.set(bits, v.asInstanceOf[Long], mBits, numHashes)
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(bits: Array[Long]): Any = {
    val boxed = new Array[AnyRef](bits.length)
    var i = 0
    while (i < bits.length) { boxed(i) = java.lang.Long.valueOf(bits(i)); i += 1 }
    new GenericArrayData(boxed)
  }

  override def serialize(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsetAgg =
    copy(child = newChildren.head)
}

/**
 * EXACT id-bitmap aggregate for BOUNDED integer domains: one bit per id,
 * merges are bitwise OR. Where [[KmvSketchAgg]] estimates distinct counts
 * for unbounded domains, this is the exact-set complement when ids are
 * dense and bounded (user ids, enum dims — the roaring-bitmap warehouse
 * pattern, simplified to a flat bitset because the domain is declared):
 * per-group bitmaps persist next to the summary, and audience
 * intersections/unions become codegen `zip_with`/`bit_count` array math
 * on |domain|/8 bytes — the users are never shuffled again.
 *
 * Out-of-range ids fail LOUDLY (a silent drop would fake exactness).
 */
case class IdBitmapAgg(
    child: Expression,
    maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(maxId >= 1 && maxId <= (1 << 26),
    s"maxId in [1, 2^26] (8 MiB bitmap ceiling): $maxId")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def words: Int = (maxId + 63) / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= maxId)
        throw new IllegalArgumentException(
          s"IdBitmapAgg: id $id outside declared domain [0, $maxId)")
      bits((id >>> 6).toInt) |= (1L << (id & 63))
    }
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(bits: Array[Long]): Any = {
    val boxed = new Array[AnyRef](bits.length)
    var i = 0
    while (i < bits.length) { boxed(i) = java.lang.Long.valueOf(bits(i)); i += 1 }
    new GenericArrayData(boxed)
  }

  override def serialize(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IdBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IdBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IdBitmapAgg =
    copy(child = newChildren.head)
}

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005) as a mergeable
 * aggregate: `depth` rows of `width` counters; each item (presented as
 * its xxhash64) increments one counter per row at Kirsch-Mitzenmacher
 * positions; merge is element-wise add. Point-frequency estimate =
 * min over rows ([[graft.operators.FreqSketch.estimate]]) — always ≥ the
 * true count, equal when the item avoids collision in ANY row (the
 * regime the gate pins: width >> |distinct| ⇒ estimates ARE the exact
 * counts). Completes the mergeable-sketch shelf: Misra-Gries (heavy
 * hitters), KMV (distinct), bitmaps (exact sets), bloom (membership),
 * count-min (frequencies) — one narrow aggregation each, never a
 * key-shuffle of the stream.
 */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width >= 16 && width <= (1 << 22), s"width in [16, 2^22]: $width")
  require(depth >= 1 && depth <= 8, s"depth in [1,8]: $depth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(cnt: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val h1 = h & 0xffffffffL
      val h2 = (h >>> 32) | 1L
      var d = 0
      while (d < depth) {
        val p = ((h1 + d.toLong * h2) % width + width) % width
        cnt(d * width + p.toInt) += 1L
        d += 1
      }
    }
    cnt
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(cnt: Array[Long]): Any = {
    val boxed = new Array[AnyRef](cnt.length)
    var i = 0
    while (i < cnt.length) { boxed(i) = java.lang.Long.valueOf(cnt(i)); i += 1 }
    new GenericArrayData(boxed)
  }

  override def serialize(cnt: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cnt.length * 8)
    cnt.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object BloomBitsetAgg {
  /** Kirsch-Mitzenmacher positions for a 64-bit hash. Shared by the
    * build-side aggregate and the probe side (bit tests on the sidecar). */
  def positions(hash64: Long, mBits: Int, numHashes: Int): Array[Int] = {
    val h1 = (hash64 & 0xffffffffL).toInt
    val h2 = ((hash64 >>> 32) | 1L).toInt // odd → cycles the full ring
    Array.tabulate(numHashes) { i =>
      val p = (h1.toLong + i.toLong * h2.toLong) % mBits
      (if (p < 0) p + mBits else p).toInt
    }
  }

  private[expr] def set(bits: Array[Long], hash64: Long, mBits: Int, numHashes: Int): Unit =
    positions(hash64, mBits, numHashes).foreach { p =>
      bits(p >>> 6) |= (1L << (p & 63))
    }
}
