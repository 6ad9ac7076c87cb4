package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim

/** Per-group top-k as a first-class operator: custom `LogicalPlan` node +
  * `SparkStrategy` + physical `SparkPlan` pair (SURVEY §4.2 stretch).
  *
  * Why not `row_number().over(w) <= k`? The window form shuffles and
  * sorts EVERY row of every group. This operator runs a bounded-heap
  * partial pass before the exchange, so only ≤ k rows per (group ×
  * input-partition) are shuffled, then a final heap pass per group — the
  * shuffle shrinks from |rows| to ~k·|groups|·p fragments, and nothing
  * is globally sorted. Ties must be broken by the caller's ordering
  * (same contract as the window form).
  *
  * Memory model: each task holds O(k · |groups in its partition|) rows
  * on-heap with no spilling — right when the group key is a bounded
  * entity (customers, users). For near-unique group keys prefer the
  * window rank ≤ k form, whose sort spills via UnsafeExternalSorter;
  * a spillable-map variant is the known follow-up.
  */
case class TopKPerGroupNode(k: Int, part: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

case class TopKPerGroupExec(k: Int, part: Seq[Expression],
    order: Seq[SortOrder], partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(part) :: Nil

  // Rows pass through unchanged, so the child's (post-exchange)
  // clustering survives — without this, a downstream groupBy on the same
  // key would re-shuffle rows that are already clustered.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val partExprs = part
    val orderExprs = order
    val childOutput = child.output
    val emitSorted = !partial
    if (kk <= 0) return child.execute().mapPartitions(_ => Iterator.empty)
    child.execute().mapPartitions({ iter =>
      val baseOrd = GenerateOrdering.generate(orderExprs, childOutput)
      // PriorityQueue head = MAX by cmp = the worst row currently kept.
      val cmp: Ordering[UnsafeRow] = (a: UnsafeRow, b: UnsafeRow) => baseOrd.compare(a, b)
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      // Children emit UnsafeRow in practice; don't assume it (a custom
      // upstream operator may emit generic rows).
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { r =>
        val row = r match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new mutable.PriorityQueue[UnsafeRow]()(cmp)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap += row.copy()
        else if (cmp.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
      }
      heaps.valuesIterator.flatMap { h =>
        val rows = h.toArray
        if (emitSorted) { java.util.Arrays.sort(rows, cmp); rows.iterator }
        else rows.iterator
      }.map(_.asInstanceOf[InternalRow])
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Plans the logical node as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, part, order, child) =>
      TopKPerGroupExec(k, part, order, partial = false,
        TopKPerGroupExec(k, part, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Top-k rows per group, ordered by `orderSpec` (name → ascending?),
    * which must be fully tie-broken. Attributes are resolved eagerly
    * against the analyzed child (lazy Column wrappers stay unresolved
    * inside custom logical nodes).
    */
  def apply(df: DataFrame, k: Int, partNames: Seq[String],
      orderSpec: Seq[(String, Boolean)]): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(partNames.nonEmpty,
      "partNames must be non-empty (for global top-k use orderBy(...).limit(k))")
    require(orderSpec.nonEmpty, "orderSpec must be non-empty")
    val spark: SparkSession = df.sparkSession
    graftshim.addStrategy(spark, TopKStrategy)
    val analyzed = df.queryExecution.analyzed
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def attr(n: String): Attribute = {
      val matches = analyzed.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.mkString(", ")}")
      }
    }
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    graftshim.ofRows(spark,
      TopKPerGroupNode(k, partNames.map(attr), order, analyzed))
  }
}
