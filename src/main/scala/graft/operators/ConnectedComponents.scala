package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair graph,
  * labelling every node with the minimum doc_id of its component
  * ("canonical survivor" in a dedup pipeline).
  *
  * Shape (the standard two-level CC used at scale — local contraction
  * then label propagation, cf. Kiveris et al. "Connected Components in
  * MapReduce and Beyond", SoCC'14 — public literature):
  *
  *   1. **Per-partition union-find pre-pass** (`mapPartitions`):
  *      edges are coalesced to a partition count proportional to
  *      |edges|, each task runs union-by-min + path compression over its
  *      slice and emits one star edge (node → localRoot) per node it
  *      saw. This contracts intra-partition chains to depth 1 before
  *      anything iterative runs — with one partition (any corpus whose
  *      edge set fits one task, e.g. the fixtures) the result is ALREADY
  *      the fixpoint and the loop below exits after a single
  *      verification round.
  *   2. **Min-label propagation with pointer jumping** over the
  *      contracted star edges, state = one (doc_id, canon) table holding
  *      ONLY edge-incident nodes (isolated docs — the majority in a
  *      near-dup graph — skip the loop entirely and are unioned back at
  *      the end with canon = self). Each superstep cuts lineage with an
  *      eager checkpoint (reliable when a checkpoint dir is set — see
  *      [[graft.GraftSession]] — localCheckpoint fallback otherwise) and
  *      the driver reads only a convergence sum. Pointer jumping halves
  *      the remaining label distance per round → O(log diameter) rounds
  *      on the already-contracted graph.
  *
  * 100 TB: |edges| in a J ≥ 0.8 near-dup graph is O(dup pairs), orders
  * of magnitude below |docs|; the pre-pass partition count scales with
  * |edges| (bounded, ~2M edges per task), the loop state is |edge
  * nodes| rows hash-partitioned on doc_id, and nothing driver-side ever
  * exceeds one long per action.
  */
object ConnectedComponents {

  /** (doc_id, canon) for every row of `docs`, where canon = min doc_id
    * in the node's component under `pairs` (first two columns = the two
    * endpoint ids; endpoints must be ⊆ docs.doc_id). Unordered — callers
    * add their own sort.
    */
  def canonLabels(docs: DataFrame, pairs: DataFrame,
      edgesPerPartition: Long = 2000000L): DataFrame = {
    val s: SparkSession = docs.sparkSession
    import s.implicits._
    val p = pairs.toDF("a", "b")
      .select(col("a").cast("long"), col("b").cast("long"))
      .persist()
    val nEdges = p.count()
    if (nEdges == 0L) {
      p.unpersist()
      return docs.select(col("doc_id"), col("doc_id").as("canon"))
    }
    val nParts = math.min(2048L, (nEdges - 1L) / edgesPerPartition + 1L).toInt

    // --- 1. local union-find contraction -----------------------------
    // coalesce (narrow, no shuffle — the cached pair blocks merge
    // in-place); union-by-min makes each local root the minimum id of
    // its local component, so star edges never point "up".
    val star = p.as[(Long, Long)].rdd.coalesce(nParts)
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x0: Long): Long = {
          var r = x0
          while (parent(r) != r) r = parent(r)
          var x = x0
          while (x != r) { val nx = parent(x); parent(x) = r; x = nx }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keysIterator.map(k => (k, find(k))).toArray.iterator
      }.toDF("doc_id", "root")

    // Contracted edge set, both directions, pre-hashed on the probe key
    // so every loop join reuses ONE exchange. Partition count follows
    // |edges|, not spark.sql.shuffle.partitions — tiny graphs get tiny
    // (cheap) supersteps, huge graphs get proportionate parallelism.
    val edges = star.select(col("doc_id").as("ei"), col("root").as("ej"))
      .union(star.select(col("root").as("ei"), col("doc_id").as("ej")))
      .repartition(nParts, col("ej"))
      .persist()

    // --- 2. min-label propagation on edge-incident nodes only --------
    // Seed = the pre-pass result itself (min local root per node): with
    // one partition this is already the global fixpoint.
    val seed = star.groupBy(col("doc_id"))
      .agg(min(col("root")).as("canon"))
    def materialize(df: DataFrame): DataFrame =
      if (s.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    var labels = materialize(seed.repartition(nParts, col("doc_id")))
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      // Round-16: the convergence probe is decoupled from the step.
      // Min-labels only ever decrease, so the fixpoint test is "does
      // ANY node see a neighbor label below its own" — a limit(1)
      // count over the improving rows. The final (always-run)
      // verification round therefore costs one early-out semi-join
      // instead of the full jump-join + checkpoint write + sum it
      // paid before; nbrMin is persisted per round so non-converged
      // rounds don't recompute it for the step.
      val nbrMin = edges.join(labels, edges("ej") === labels("doc_id"))
        .groupBy(edges("ei").as("nid")).agg(min(col("canon")).as("nc"))
        .persist()
      val improving = labels
        .join(nbrMin, labels("doc_id") === nbrMin("nid"))
        .filter(col("nc") < col("canon")).limit(1).count()
      if (improving == 0L) {
        nbrMin.unpersist()
        converged = true
      } else {
        val stepped = labels.join(nbrMin, labels("doc_id") === nbrMin("nid"), "left")
          .select(labels("doc_id"),
            least(col("canon"), coalesce(col("nc"), col("canon"))).as("canon"))
        // Pointer jumping: canon := canon's canon — O(log diameter)
        // rounds. `stepped` is deliberately NOT materialized:
        // recomputing it twice inside the fused round job beats a
        // second job per round.
        val jump = stepped.select(col("doc_id").as("jd"), col("canon").as("jc"))
        val next = materialize(stepped
          .join(jump, stepped("canon") === jump("jd"), "left")
          .select(stepped("doc_id"),
            least(stepped("canon"), coalesce(col("jc"), stepped("canon"))).as("canon")))
        // Release the PREVIOUS round's pinned blocks — without this the
        // loop holds one full labels copy per superstep until driver GC.
        org.apache.spark.sql.graftshim.unpersistCheckpoint(labels)
        nbrMin.unpersist()
        labels = next
      }
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    // Isolated docs never entered the loop; canon = self.
    val isolated = docs.join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("canon"))
    labels.select(col("doc_id"), col("canon")).union(isolated)
  }
}
