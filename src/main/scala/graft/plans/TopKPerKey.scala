package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (the custom-operator ladder's option (c),
  * all four pieces): a logical `TopKPerKeyNode`, a planner
  * [[TopKPerKeyStrategy]], and a physical [[TopKPerKeyExec]] that
  * computes the exact top-k rows per key WITHOUT a per-key sort.
  *
  * The built-in formulation (`row_number().over(partitionBy(key)
  * .orderBy(...)) <= k`) makes WindowExec SORT every key group in
  * full — O(n log n) per partition and, with skewed keys, a straggler
  * per hot key. This operator instead keeps a bounded k-row heap per
  * key: a PARTIAL pass over each input partition emits at most k
  * candidates per (partition, key) — the map-side combine rank-filter
  * lacks — then a key-clustered FINAL pass merges candidates. The
  * shuffle carries at most k·partitions rows per key instead of the
  * key's full row set; work is O(n log k) total.
  *
  * The exchange between the two passes is NOT hand-built: the final
  * exec declares `ClusteredDistribution(keys)` and Spark's
  * EnsureRequirements inserts (and AQE tunes) the shuffle — the
  * operator composes with the planner rather than around it.
  * Reference semantics: flight/server.go's full-scan-then-limit is
  * the degenerate k-per-singleton-key case of this operator. */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    orders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, orders, k, child) =>
      val partialPass: SparkPlan =
        TopKPerKeyExec(keys, orders, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, orders, k, partial = false, partialPass) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. `partial = true` runs on arbitrary
  * partitioning (per-partition candidates); `partial = false`
  * requires key-clustered input and is exact. "Top" means the first
  * k rows under `orders` (e.g. `n DESC, user ASC` keeps the k
  * highest-n rows, ties to the smallest user). */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    orders: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val orderExprs = orders
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // first-k-under-orders == k minima of the row comparator; the
      // heap's head is the WORST kept row (reverse ordering), evicted
      // when a better candidate arrives
      val cmp = RowOrdering.create(orderExprs, childOutput)
      val heapOrd = new Ordering[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          cmp.compare(a, b)
      }
      val heaps = mutable.LinkedHashMap.empty[
        UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](heapOrd))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // emit each key's survivors in output order (cheap: ≤ k rows)
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }
}

/** Dataset-level entry point + session registration. */
object TopKPerKey {
  /** Install the strategy on an existing session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** Top-k rows per key group, `orderCols` as (name, ascending). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    register(df.sparkSession)
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute = lp.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${lp.output.map(_.name).mkString(", ")}"))
    val orders = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc)
        org.apache.spark.sql.catalyst.expressions.Ascending
      else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyCols.map(attr), orders, k, lp))
  }
}
