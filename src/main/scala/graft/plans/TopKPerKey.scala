package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** SURVEY.md §2.6 O2 depth — a whole-operator Catalyst extension
  * (LogicalPlan + SparkStrategy + SparkPlan) for per-key top-k.
  *
  * Why a custom operator: the built-in formulation
  * (`row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`)
  * plans a WindowExec, which SORTS every partition in full — O(n log n)
  * per partition and a full spill surface — to keep k rows per key. This
  * operator holds a bounded k-element heap per key: O(n log k), no sort,
  * state proportional to keys×k rather than rows. At 100 TB with
  * billions of rows per key group, that asymptotic gap is the job.
  *
  * Semantics: for each distinct key, emit the first k rows of that key
  * under `order` (ties included arbitrarily unless the order is total —
  * pass a tiebreak column for determinism, exactly as you would to the
  * window form). Output order within/across keys is unspecified, like
  * any aggregate.
  *
  * Memory contract: the map-side (partial) pass bounds its state at
  * `maxPartialKeys` heaps and streams overflow rows through unpruned, so
  * it is safe at any key cardinality. The FINAL pass holds one k-row heap
  * per key of its partition with no spill fallback — that is O(output) of
  * the operator itself (every retained row is an output row), the same
  * memory class as TakeOrderedAndProject's driver-side array. When
  * keys×k per partition can't fit an executor, raise shuffle
  * partitions so each final partition's key slice fits — the exchange on
  * `keys` distributes state linearly with partition count — or fall back
  * to the window form, which sorts and therefore spills.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy: lower the logical node to a PARTIAL exec (map-side,
  * no distribution requirement) feeding a FINAL exec (clustered). Top-k
  * is algebraically composable — topK(A ∪ B) = topK(topK(A) ∪ topK(B)) —
  * so the partial pass prunes each input partition to ≤ k rows per key
  * BEFORE the exchange, exactly like partial aggregation: the shuffle
  * carries ≤ partitions×keys×k rows instead of every row. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: TopKPerKeyPlan =>
      val cap = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.maxPartialKeys",
          TopKPerKeyExec.DefaultMaxPartialKeys.toString).toInt
      val partial = TopKPerKeyExec(p.keys, p.order, p.k, planLater(p.child),
        partial = true, maxPartialKeys = cap)
      TopKPerKeyExec(p.keys, p.order, p.k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

object TopKPerKeyExec {
  /** Map-side state cap: distinct keys held per partition in the partial
    * pass. Beyond it, rows pass through unpruned — the partial pass is
    * advisory (topK(A ∪ B) = topK(topK(A) ∪ B)), so pass-through is always
    * correct and the final pass does the pruning. This is the same shape as
    * partial HashAggregate's sort-based fallback: bounded memory on the map
    * side no matter the key cardinality. Override with
    * `spark.graft.topk.maxPartialKeys`. */
  val DefaultMaxPartialKeys: Int = 1 << 16
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false,
    maxPartialKeys: Int = TopKPerKeyExec.DefaultMaxPartialKeys) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  /** The partial pass runs wherever the data already is (map-side, no
    * requirement). For the final pass, rows of one key must be co-located
    * for the heap to be complete — the planner inserts the hash exchange
    * on the keys. With no keys the top-k is GLOBAL, so all tuples must
    * reach one partition (for global top-k prefer orderBy.limit →
    * TakeOrderedAndProject; this operator's value is the grouped case —
    * and the partial pass caps what that single partition receives). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    // only the map-side pass may shed state: the final pass must see every
    // key's complete heap, and there each key appears in exactly one
    // partition already pruned to ≤ partitions×k rows
    val capKeys = if (partial) maxPartialKeys else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      // codegen'd comparator over the child schema; serializable
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // per key: a max-heap under `ord` so the WORST retained row is on
      // top and evicted first — classic bounded top-k
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      val absorbed = iter.flatMap { row =>
        val probe = keyProj(row) // reused buffer; copied only on insert
        heaps.get(probe) match {
          case Some(heap) =>
            if (heap.size < kLocal) {
              heap.enqueue(rowProj(row).copy())
            } else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(rowProj(row).copy())
            }
            None
          case None if heaps.size < capKeys =>
            val heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
              ord.asInstanceOf[Ordering[UnsafeRow]])
            heap.enqueue(rowProj(row).copy())
            heaps.put(probe.copy(), heap)
            None
          case None =>
            // state cap hit: forward unpruned, the final pass re-merges
            Some(rowProj(row))
        }
      }
      // `++` is by-name: the heap drain runs only after the input is fully
      // absorbed, while pass-through rows above stream without buffering
      absorbed ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
