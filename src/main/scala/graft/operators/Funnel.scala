package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Ordered-funnel analysis over an event stream — the `windowFunnel` shape
 * every event-analytics engine ships (ClickHouse, Amplitude), computed in
 * ONE narrow aggregation pass instead of K sequential agg+join rounds.
 *
 * Contract (deterministic, SQL-oracle-able min-chaining):
 *   t1 = min ts of a step-1 event;
 *   t(i) = min ts of a step-i event with ts > t(i-1) and ts - t1 <= window;
 *   level = number of steps achieved.
 * The window is anchored at t1 (greedy-from-earliest). This is the exact
 * chained-`min` formulation the oracle recomputes with K CTEs; the
 * aggregate computes it in one pass because each per-user partial buffers
 * only that user's funnel-step events (non-step events never enter the
 * buffer), merges associatively, and resolves the chain at eval.
 *
 * Scale: one hash aggregation keyed by user — partials build map-side per
 * partition, only (user → buffered step events) crosses the exchange.
 * State per user is bounded by that user's funnel-relevant event count
 * (the same bound ClickHouse's windowFunnel carries); a funnel over K
 * steps at 100 TB shuffles K-step events once, never the full event log
 * K times, and never re-joins the event table per step.
 */
case class FunnelChainAgg(
    ts: Expression,
    step: Expression,
    numSteps: Int,
    windowMicros: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  require(numSteps >= 1 && numSteps <= 8, "numSteps must be in 1..8")
  require(windowMicros > 0, "windowMicros must be positive")

  override def children: Seq[Expression] = Seq(ts, step)
  override def nullable: Boolean = false
  // achieved chain timestamps (epoch micros), length = level
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty

  // pack (ts, step) into one long: sort order == (ts, step) order.
  // ts is epoch micros (fits 2^51 for any realistic date), step < 8.
  override def update(buf: mutable.ArrayBuffer[Long],
      input: InternalRow): mutable.ArrayBuffer[Long] = {
    val s = step.eval(input)
    if (s != null) {
      val si = s.asInstanceOf[Number].intValue()
      if (si >= 0 && si < numSteps) {
        val t = ts.eval(input)
        if (t != null) buf += (t.asInstanceOf[Number].longValue() * 8L + si)
      }
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[Long],
      b: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = { a ++= b; a }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val achieved = new Array[Long](numSteps)
    var level = 0
    var anchor = 0L
    var prev = 0L
    var i = 0
    while (i < arr.length && level < numSteps) {
      val t = arr(i) / 8L
      val s = (arr(i) % 8L).toInt
      if (s == level) {
        if (level == 0) { anchor = t; prev = t; achieved(0) = t; level = 1 }
        else if (t > prev && t - anchor <= windowMicros) {
          achieved(level) = t; prev = t; level += 1
        }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(achieved, level))
  }

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { b += in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelChainAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelChainAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FunnelChainAgg =
    copy(ts = newChildren(0), step = newChildren(1))
}

object Funnel {

  import graft.functions.GraftFunctions.{kcol, kexp}

  /** Aggregate column: achieved chain timestamps (micros), length = level. */
  def funnelChain(ts: Column, stepIdx: Column, numSteps: Int,
      windowMicros: Long): Column =
    kcol(FunnelChainAgg(kexp(ts.cast("timestamp")), kexp(stepIdx),
      numSteps, windowMicros).toAggregateExpression())

  /**
   * Per-user funnel levels: (user, level, ts1..tsK epoch-micros, null past
   * the achieved level). Every user in `df` appears (level 0 when the
   * funnel never starts) — non-step events keep the group alive without
   * entering the buffer, so this stays ONE shuffle with no users-dimension
   * join.
   */
  def levels(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8, "1..8 steps")
    val stepIdx = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (name, i)) => when(col(typeCol) === lit(name), lit(i)).otherwise(acc)
    }
    val chained = df
      .groupBy(col(userCol))
      .agg(funnelChain(col(tsCol), stepIdx, steps.size, windowMicros).as("chain"))
    val withSteps = steps.indices.foldLeft(
        chained.withColumn("level", size(col("chain")))) { (d, i) =>
      d.withColumn(s"ts${i + 1}",
        when(size(col("chain")) >= i + 1, element_at(col("chain"), i + 1)))
    }
    withSteps.drop("chain")
  }
}
