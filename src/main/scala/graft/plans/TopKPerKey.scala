package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/**
 * Bounded top-k-per-key as a WHOLE physical operator — the brief's
 * option (c): custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
 * registered through `SparkSessionExtensions`. The DataFrame idiom
 * (`row_number().over(Window.partitionBy(keys).orderBy(...)) <= k`)
 * SORTS every key's full row set; this operator keeps a k-bounded heap
 * per key instead, in TWO stages like hash aggregation: a partial stage
 * before the exchange caps every partition's contribution at k rows per
 * key — at 100 TB the shuffle moves k·|keys| rows, not the table — and
 * a final stage after a `ClusteredDistribution(keys)` exchange (planner-
 * inserted) merges heaps and emits ranks 1..k.
 *
 * Exactness: top-k under a total order (ordering + unique tie-break) is
 * self-decomposable — the global top-k of a key is contained in the
 * union of its per-partition top-k's — so the two-stage result is
 * identical to the window formulation, which is what the q143 oracle
 * checks.
 */
final case class TopKPerKeyNode(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, rankAttr, child) =>
      val partial = TopKPerKeyExec(keys, ordering, k, rankAttr,
        partial = true, planLater(child))
      TopKPerKeyExec(keys, ordering, k, rankAttr,
        partial = false, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  /** Per-partition: group rows by key into k-bounded heaps (worst row at
    * the heap head, so a better row evicts it in O(log k)). */
  private def heapsOf(it: Iterator[InternalRow]):
      java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, child.output)
    val ord = GenerateOrdering.generate(ordering, child.output)
    val worstFirst = ord.reversed()
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k, worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.offer(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.offer(row.copy())
      }
    }
    heaps
  }

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { it =>
      val heaps = heapsOf(it)
      import scala.jdk.CollectionConverters._
      if (partial) {
        // emit the surviving ≤k rows per key, unranked — the exchange
        // moves only these
        heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
      } else {
        val ord = GenerateOrdering.generate(ordering, child.output)
        val outProj = UnsafeProjection.create(output, child.output :+ rankAttr)
        val joined = new JoinedRow
        heaps.values().asScala.iterator.flatMap { heap =>
          val rows = heap.toArray(new Array[InternalRow](heap.size))
          java.util.Arrays.sort(rows, ord)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            val rank = new GenericInternalRow(1)
            rank.setLong(0, i + 1L)
            outProj(joined(r, rank))
          }
        }
      }
    }
}

/** DataFrame-level entry point. */
object TopK {
  /** Top `k` rows per `keyCols` group under `orderCol` (desc by default)
    * with `tieCol` ascending as the unique tie-break, ranked 1..k —
    * semantically `row_number().over(partitionBy(keys).orderBy(...)) <= k`,
    * physically the two-stage bounded-heap operator above. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int, tieCol: String, desc: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute = plan.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val ordering = Seq(
      SortOrder(attr(orderCol), if (desc) Descending else Ascending),
      SortOrder(attr(tieCol), Ascending))
    val rank = AttributeReference("rank", LongType, nullable = false)()
    org.apache.spark.sql.graftshim.GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKeyNode(keyCols.map(attr), ordering, k, rank, plan))
  }
}
