package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Native top-k-per-group operator (custom LogicalPlan + Strategy +
  * SparkPlan, the full preference-(c) stack from the build contract).
  *
  * Why not `row_number().over(window)`: the window operator SORTS every
  * group's full row set (O(n log n) per partition and a full
  * wide-row sort buffer). This operator keeps a bounded heap of k rows
  * per group per partition — O(n log k), no sort, and only
  * `requiredChildDistribution` clustering (one hash shuffle, same as
  * the window, but no Sort node).
  *
  * At 100 TB: for k ≪ group size (the common "3 best per brand" shape)
  * the heap pass is the difference between spilling a sort buffer per
  * group and streaming the scan.
  *
  * Memory contract: the operator holds O(groups-per-partition × k)
  * retained rows per task and does NOT spill (the window operator
  * buffers the same retained rows PLUS a full sort buffer, but its
  * sort can spill). It is therefore the right operator when k ≪ group
  * size; for extreme group cardinality, raise
  * `spark.sql.shuffle.partitions` so groups-per-partition × k × rowsize
  * fits in task memory — the ClusteredDistribution requirement means
  * more partitions directly shrink the per-task footprint.
  * TopKSpec exercises a 100k-group stress case.
  */
final case class TopKPerGroupNode(
    k: Int, groupCols: Seq[Expression], order: Seq[SortOrder], child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    k: Int, groupCols: Seq[Expression], order: Seq[SortOrder], child: SparkPlan,
    partial: Boolean = false)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** All rows of a group must meet in one partition — except in the
    * GLOBAL form (no group columns), which plans as two nodes like a
    * partial aggregation: a `partial` heap per input partition (no
    * distribution requirement, k rows out per partition) feeding a
    * final single-partition heap over ≤ k·partitions rows. A plain
    * AllTuples child would funnel the ENTIRE relation through one
    * task; the partial pass keeps the heavy reduction parallel. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else if (groupCols.isEmpty)
      org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  /** The heap filters rows WITHIN partitions — the child's (group-
    * clustered) partitioning survives. Advertising it lets Catalyst
    * elide the shuffle a downstream groupBy(groupCols) would otherwise
    * re-insert over the already-clustered top-k output. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val groupLocal = groupCols
    val orderLocal = order
    Bridge.mapPartitionsInternal(child.execute()) { rows =>
      val groupProj = UnsafeProjection.create(groupLocal, childOutput)
      val ordering = new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(
        orderLocal, childOutput)
      // per-group bounded "worst-first" heap: peek = currently-worst
      // kept row, evicted when a better row arrives
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val heapCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ordering.compare(b, a) // reverse: worst at the head
      }
      rows.foreach { r =>
        val key = groupProj(r)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, heapCmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(r.asInstanceOf[UnsafeRow].copy())
        } else if (ordering.compare(r, heap.peek()) < 0) {
          // r sorts strictly before the current worst → replace
          heap.poll()
          heap.add(r.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, groupCols, order, child) if groupCols.isEmpty =>
      // global top-k: partial per-partition heaps, then the final heap
      TopKPerGroupExec(k, groupCols, order,
        TopKPerGroupExec(k, groupCols, order, planLater(child),
          partial = true)) :: Nil
    case TopKPerGroupNode(k, groupCols, order, child) =>
      TopKPerGroupExec(k, groupCols, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast}

  /** Register the strategy (idempotent per session). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.sessionState.experimentalMethods.extraStrategies.contains(TopKStrategy)) {
      spark.sessionState.experimentalMethods.extraStrategies =
        spark.sessionState.experimentalMethods.extraStrategies :+ TopKStrategy
    }

  def asc(name: String): SortOrder =
    SortOrder(UnresolvedAttribute(name), Ascending, NullsFirst, Seq.empty)
  def desc(name: String): SortOrder =
    SortOrder(UnresolvedAttribute(name), Descending, NullsLast, Seq.empty)

  /** Top-k rows per group by `order` (lexicographic over the given
    * SortOrders — include a unique tie-break key for deterministic
    * selection); output unordered across groups — compose with orderBy
    * for deterministic display. */
  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String], order: Seq[SortOrder]): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val lp = df.queryExecution.analyzed
    val groupExprs: Seq[Expression] = groupCols.map(c =>
      lp.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"no column $c")))
    val resolvedOrder = order.map(o => o.copy(child = o.child match {
      case u: UnresolvedAttribute =>
        lp.output.find(_.name == u.name).getOrElse(
          throw new IllegalArgumentException(s"no column ${u.name}"))
      case e => e
    }))
    Bridge.ofRows(spark, TopKPerGroupNode(k, groupExprs, resolvedOrder, lp))
  }

  /** Single-key convenience overload. */
  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String], order: SortOrder): DataFrame =
    perGroup(df, k, groupCols, Seq(order))
}
