package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Per-group TOP-K as a first-class operator — the whole-operator
  * Catalyst extension route (SURVEY §4.3(c)): custom logical node +
  * planner [[Strategy]] + two-phase physical [[TopKPerGroupExec]], the
  * full `LogicalPlan`/`SparkStrategy`/`SparkPlan` chain, installable via
  * `SparkSessionExtensions.injectPlannerStrategy` ([[graft.GraftExtensions]])
  * or per-session through [[TopKPerGroup.install]].
  *
  * Why Spark's built-ins don't cover it: the declarative form —
  * `row_number() OVER (PARTITION BY g ORDER BY s) <= k` — plans as a
  * full shuffle of EVERY row followed by a full per-partition SORT of
  * every row, then discards all but k per group. Global top-k has a
  * dedicated operator (`TakeOrderedAndProject`, per-partition bounded
  * heaps) but grouped top-k has none; this node is that operator:
  *
  *  - '''partial phase''' (before the exchange): each input partition
  *    keeps a bounded k-heap PER GROUP — state is distinct-groups ×
  *    k rows, and only those survivors enter the shuffle. At 100 TB
  *    with G groups, the exchange carries ≤ partitions × G × k rows
  *    instead of every row.
  *  - '''final phase''' (declares `ClusteredDistribution(group)`;
  *    `EnsureRequirements` inserts the hash exchange, or elides it if
  *    the child is already co-partitioned): merges the partial winners
  *    with the same heaps — never a sort of anything bigger than G × k.
  *
  * Determinism contract: `order` must be a TOTAL order (include a
  * unique tie-break column, exactly as a deterministic `row_number`
  * window requires); heap eviction is then order-insensitive and the
  * result equals the window form row-for-row (spec-asserted, and q30
  * hash-matches the window-form DuckDB oracle through the driver gate).
  */
case class TopKPerGroupPlan(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(group.nonEmpty, "TopKPerGroup needs at least one group column")
  require(k > 0, "TopKPerGroup needs k > 0")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Both phases of the physical operator (they run the same bounded-heap
  * pass; the final phase additionally demands co-partitioning on the
  * group keys, which is what splits the plan into partial → exchange →
  * final). Heap state per task is #groups-in-partition × k rows. */
case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) ClusteredDistribution(group) :: Nil
    else UnspecifiedDistribution :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // compare(a, b) < 0  ⇔  a ranks ahead of b in the requested order
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // heap head = the worst row currently kept for its group
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        var heap = heaps.get(keyProj(row))
        if (heap == null) {
          // initial capacity is NOT limit: k can legitimately exceed the
          // group size (heap grows on demand, never past rows-in-group)
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16), ordering.reverse)
          heaps.put(keyProj(row).copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        numOutputRows.add(h.size.toLong)
        h.iterator().asScala
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: expand the logical node into the two-phase form.
  * `planLater(child)` keeps everything below fully Catalyst-planned
  * (pushdown, pruning, AQE all still apply under the operator). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(group, order, k, child) =>
      val partial = TopKPerGroupExec(group, order, k, finalPhase = false, planLater(child))
      TopKPerGroupExec(group, order, k, finalPhase = true, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Idempotently add the strategy to the session's planner. */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraStrategies
    if (!existing.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies = existing :+ TopKPerGroupStrategy
  }

  /** Top `k` rows per `groupCols` group, ordered by `orderCols`
    * ((column, descending) pairs — include a unique tie-break). Columns
    * are resolved against the analyzed child, so the wrapped plan needs
    * no further analysis. */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[(String, Boolean)],
            k: Int): DataFrame = {
    install(df.sparkSession)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (name, desc) =>
      val dir = if (desc) Descending else Ascending
      SortOrder(attr(name), dir, dir.defaultNullOrdering, Seq.empty)
    }
    GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }
}
