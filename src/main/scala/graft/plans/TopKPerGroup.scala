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
  * partial pass before the exchange, so only ~k rows per (group ×
  * input-partition) are shuffled, then a final streaming pass per group.
  * Ties must be broken by the caller's ordering (same contract as the
  * window form).
  *
  * Memory model — SPILL-SAFE at both stages:
  *   - partial: the heap map tracks its retained bytes and, past
  *     `spark.graft.topk.maxPartialBytes` (default 64 MB), FLUSHES its
  *     contents downstream and restarts empty. Extra emitted rows are
  *     harmless (the final stage re-filters), so a near-unique group key
  *     degrades the partial pass to ~pass-through instead of OOM.
  *   - final: declares `requiredChildOrdering` = (group keys, caller
  *     order), so EnsureRequirements plants a SortExec — which spills
  *     through UnsafeExternalSorter — after the exchange, and the
  *     operator itself just streams each sorted partition emitting the
  *     first k rows per group: O(1) memory beyond the sort.
  */
case class TopKPerGroupNode(k: Int, part: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

case class TopKPerGroupExec(k: Int, part: Seq[Expression],
    order: Seq[SortOrder], partial: Boolean, maxPartialBytes: Long,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(part) :: Nil

  // Final pass: rows must arrive grouped AND ordered — EnsureRequirements
  // inserts the (spillable) SortExec that makes the streaming scan valid.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(part.map(SortOrder(_, Ascending)) ++ order)

  // Rows pass through unchanged, so the child's (post-exchange)
  // clustering survives — without this, a downstream groupBy on the same
  // key would re-shuffle rows that are already clustered.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  // The final pass preserves its child's sort too, so a downstream
  // window over the same (partition, order) spec skips its sort.
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    if (k <= 0) return child.execute().mapPartitions(_ => Iterator.empty)
    if (partial) doExecutePartial() else doExecuteFinal()
  }

  /** Streaming final pass over (group, order)-sorted input: count rows
    * per group-key run, emit the first k of each. Group equality is byte
    * equality of the projected UnsafeRow key — consistent with sort
    * order (UnsafeRow writes normalize -0.0 and NaN). */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val kk = k
    val partExprs = part
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = null
        private var emittedInGroup = 0
        private var pending: InternalRow = null
        // Fetch lazily (inside hasNext), NEVER ahead of handing out the
        // previous row: the upstream sort iterator reuses one row
        // buffer, so prefetching in next() would overwrite the row the
        // consumer is about to read.
        private def fetch(): Unit =
          while (pending == null && iter.hasNext) {
            val r = iter.next()
            val key = keyProj(r)
            if (curKey == null || key != curKey) {
              curKey = key.copy(); emittedInGroup = 0
            }
            if (emittedInGroup < kk) { emittedInGroup += 1; pending = r }
          }
        override def hasNext: Boolean = { fetch(); pending != null }
        override def next(): InternalRow = {
          fetch()
          if (pending == null) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }, preservesPartitioning = true)
  }

  /** Bounded-heap partial pass with size-tracked flushing. */
  private def doExecutePartial(): RDD[InternalRow] = {
    val kk = k
    val partExprs = part
    val orderExprs = order
    val childOutput = child.output
    // Guard against direct construction with a negative cap: the consume
    // loop's `retained <= capBytes` would then never admit a row while
    // hasNext spins forever on a non-empty input.
    val capBytes = math.max(maxPartialBytes, 0L)
    child.execute().mapPartitions({ iter =>
      val baseOrd = GenerateOrdering.generate(orderExprs, childOutput)
      // PriorityQueue head = MAX by cmp = the worst row currently kept.
      val cmp: Ordering[UnsafeRow] = (a: UnsafeRow, b: UnsafeRow) => baseOrd.compare(a, b)
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      // Children emit UnsafeRow in practice; don't assume it (a custom
      // upstream operator may emit generic rows).
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      new Iterator[InternalRow] {
        private val heaps =
          mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
        // Retained bytes across all heaps; crossing capBytes drains
        // everything downstream — the final stage re-filters, so
        // over-emitting is safe and a near-unique key column can never
        // OOM this task. Accounting adds ~48 B of JVM overhead per row
        // (UnsafeRow + byte[] headers, queue slot) and ~64 B per map
        // entry on top of getSizeInBytes, so narrow rows can't blow the
        // real heap a large multiple past the cap.
        private val rowOverhead = 48L
        private var retained = 0L
        private var out: Iterator[InternalRow] = Iterator.empty
        private def drain(): Iterator[InternalRow] = {
          val rows = heaps.valuesIterator.flatMap(_.iterator).toArray
          heaps.clear(); retained = 0L
          rows.iterator.map(_.asInstanceOf[InternalRow])
        }
        private def consume(): Unit = {
          while (iter.hasNext && retained <= capBytes) {
            val r = iter.next()
            val row = r match {
              case u: UnsafeRow => u
              case other => toUnsafe(other)
            }
            val key = keyProj(row)
            val heap = heaps.get(key) match {
              case Some(h) => h
              case None =>
                val h = new mutable.PriorityQueue[UnsafeRow]()(cmp)
                val kc = key.copy()
                heaps.put(kc, h)
                retained += kc.getSizeInBytes + 64L
                h
            }
            if (heap.size < kk) {
              val rc = row.copy(); heap += rc
              retained += rc.getSizeInBytes + rowOverhead
            } else if (cmp.compare(row, heap.head) < 0) {
              retained -= heap.dequeue().getSizeInBytes + rowOverhead
              val rc = row.copy(); heap += rc
              retained += rc.getSizeInBytes + rowOverhead
            }
          }
          if (retained > capBytes || (!iter.hasNext && heaps.nonEmpty)) out = drain()
        }
        override def hasNext: Boolean = {
          while (!out.hasNext && (iter.hasNext || heaps.nonEmpty)) consume()
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          out.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Plans the logical node as partial → (exchange + sort inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, part, order, child) =>
      val default = 64L * 1024 * 1024
      // Malformed or negative conf must not crash planning or (worse)
      // wedge the partial iterator: clamp to ≥ 0 (0 = flush-per-row,
      // i.e. pass-through).
      val cap = math.max(0L,
        try java.lang.Long.parseLong(
          org.apache.spark.sql.internal.SQLConf.get.getConfString(
            "spark.graft.topk.maxPartialBytes", default.toString))
        catch { case _: NumberFormatException => default })
      TopKPerGroupExec(k, part, order, partial = false, cap,
        TopKPerGroupExec(k, part, order, partial = true, cap,
          planLater(child))) :: Nil
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
