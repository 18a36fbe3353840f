package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The SURVEY.md §4 preference-order (c) case, end to end: a
  * whole-operator semantic Spark's built-ins only express wastefully —
  * "first k rows per key under an ordering" — as a custom LogicalPlan
  * + planner Strategy + physical operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]) or session-locally via
  * `experimental.extraStrategies`.
  *
  * The built-in formulation (`row_number().over(partitionBy(key)
  * .orderBy(...)) <= k`, what q64's LATERAL also plans to) must SORT
  * every key's entire group to emit its first k — at 100 TB that is a
  * full shuffle+sort of the corpus for a k-row-per-key answer.
  * [[TopKPerKeyExec]] declares the same ClusteredDistribution (so the
  * planner inserts the same hash exchange) but replaces the sort with
  * per-key bounded heaps: O(n log k) comparisons, O(keys·k) memory,
  * nothing else materialized. The exchange stays the only wire cost;
  * the sort — the part that scales with GROUP size, not k — is gone.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] to [[TopKPerKeyExec]]; matches nothing else. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Co-locate each key's rows; the planner satisfies this with the
    * same hash exchange a window aggregate would get — AQE coalesces
    * it like any other shuffle. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortExprs, childOutput)
      // max-heap of the kept rows per key: peek = worst kept; a new row
      // enters iff it beats the worst (classic bounded top-k)
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (_, heap) =>
        val rows = new Array[InternalRow](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.GraftShims

  /** DataFrame-level entry: first `k` rows per `keys` group under
    * `order` (use `col.desc`/`col.asc` Columns). Registers the
    * strategy session-locally (idempotent) so callers need no
    * extensions wiring. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int)
      (implicit s: SparkSession): DataFrame = {
    if (!s.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val sortOrder = order.map(GraftShims.catalystExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftShims.dataFrame(s,
      TopKPerKey(keys.map(GraftShims.catalystExpression), sortOrder, k,
        GraftShims.logicalPlan(df)))
  }
}
