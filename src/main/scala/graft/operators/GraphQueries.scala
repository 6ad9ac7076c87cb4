package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** §2.23 Graph analytics (SURVEY.md, round-6 second amendment):
  * fixed-point PageRank — the second distributed-iteration primitive
  * next to dedup_cluster_canon's connected components (label
  * propagation finds WHICH rows relate; PageRank ranks HOW CENTRAL each
  * one is — the dedup survivor-selection and seed-page weighting step
  * of web-corpus curation pipelines).
  *
  * Determinism is the design driver: float PageRank sums contributions
  * in shuffle arrival order, so two runs (or two engines) differ in
  * final ulps and an exact oracle is impossible. Ranks here are SCALED
  * LONGS (1.0 ≡ 1,000,000) and every update is integer arithmetic —
  * `new = 150000 + 85·Σ(rank div deg) div 100`, the damping-0.85
  * update with truncating division on non-negative operands, identical
  * in Spark (`div`) and DuckDB (`//`). Replay-stable to the bit, which
  * is what an incremental 100 TB re-crawl diff actually needs; the
  * truncation bias (< 1e-6 per hop) is the documented price.
  *
  * Scale: each of the 5 fixed iterations is one edge⋈rank equi-join +
  * one dst-keyed partial-agg shuffle — the textbook Pregel round as
  * plain DataFrame ops, run with ConnectedComponents.scala's
  * materialization discipline: the (edges ⋈ deg) table persists ONCE
  * for the whole loop, each superstep's ranks are eagerly
  * checkpointed (truncating lineage — without this the single lazy
  * plan re-scanned lineitem 22× with zero exchange reuse, measured),
  * and the previous round's blocks release as soon as the next is
  * materialized, so driver/executor state is one ranks copy + the
  * edge cache regardless of iteration count. Graph: the
  * part↔supplier bipartite graph of distinct lineitem pairs, both
  * directions, so every node has out-degree ≥ 1 and the dangling-mass
  * term vanishes by construction.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Iters = 5

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> ((s, dir) => {
      def materialize(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
        else df.localCheckpoint(true)
      val pairs = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val edges = pairs
        .select((col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .unionAll(pairs.select((col("l_suppkey") * 2 + 1).as("src"),
          (col("l_partkey") * 2).as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      // One cached copy of (src, dst, deg) serves every superstep; the
      // per-superstep checkpoint truncates lineage so iteration N's
      // plan is one join + one agg, never a replay of rounds 1..N−1.
      val ed = edges.join(deg, Seq("src")).persist()
      var ranks = materialize(deg.select(col("src").as("node"),
        lit(1000000L).as("rank")))
      for (_ <- 1 to Iters) {
        val next = materialize(ed
          .join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("rank div deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("85 * sc div 100")).as("rank")))
        org.apache.spark.sql.graftshim.unpersistCheckpoint(ranks)
        ranks = next
      }
      ed.unpersist()
      ranks.orderBy("node")
    }),

    // TRIANGLE COUNTING over a hash-sparsified co-occurrence graph —
    // the clustering-structure primitive next to PageRank's centrality
    // (community detection, link-spam scoring, graph feature
    // engineering). Graph: parts co-purchased in the same order
    // (distinct a<b pairs), DOULION-style deterministically sparsified
    // — keep an edge iff md5(a_b) starts in '0'..'3' (p = 1/4), the
    // same replayable md5 convention the sampling keys use (no rand()
    // anywhere; Tsourakakis et al., KDD'09: count/p³ estimates the
    // full-graph total). Counting uses the oriented-wedge form: on
    // a<b edges, wedge (a<b<c) via e1.b = e2.a, closed by an exact
    // (a,c) edge probe — each triangle found exactly once, then
    // credited to all three corners.
    //
    // Scale: orientation (a<b) caps wedge generation by the SQUARE of
    // the out-degree of the MIDDLE node under the total order — the
    // standard trick that tames power-law hubs (a hub's wedges split
    // across its lower neighbors instead of deg² at one node). The
    // sparsification pushes to the scan side (p² of wedges survive),
    // and all three legs are equi-joins on edge keys — shuffle-bounded
    // by |E|, never |V|². The three self-join legs are the same
    // distinct-edge subplan, so the exchange is built once and reused
    // (ReusedExchange, pinned in PlanAuditSpec).
    "graph_triangle_count" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val e = pp.as("x").join(pp.as("y"),
          col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        .filter(substring(md5(concat(col("a").cast("string"), lit("_"),
          col("b").cast("string")).cast("binary")), 1, 1)
          .isin("0", "1", "2", "3"))
      // Closing-edge probe under renamed columns (ea, eb) — same
      // underlying distinct-edge subplan, so the exchange still reuses.
      val closing = e.select(col("a").as("ea"), col("b").as("eb"))
      val tri = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e1.b").as("b"),
          col("e2.b").as("c"))
        .join(closing, col("a") === col("ea") && col("c") === col("eb"))
        .select(col("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
        .orderBy("node")
    })
  )

  /** The same 5 integer-arithmetic supersteps, unrolled as CTEs. */
  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> {
      val prelude =
        """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
          |edges AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |    FROM pairs
          |  UNION ALL
          |  SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
          |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
          |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank
          |  FROM deg)""".stripMargin
      val steps = (1 to Iters).map { i =>
        s"""r$i AS (SELECT e.dst AS node,
           |  CAST(150000 + (85 * SUM(r.rank // d.deg)) // 100 AS BIGINT) AS rank
           |  FROM edges e JOIN deg d ON e.src = d.src
           |  JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst)""".stripMargin
      }.mkString(",\n")
      s"$prelude,\n$steps\nSELECT node, rank FROM r$Iters ORDER BY node"
    },
    "graph_triangle_count" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem),
        |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM pp x JOIN pp y ON x.ok = y.ok AND x.p < y.p),
        |e AS (SELECT a, b FROM e0
        |  WHERE substring(md5(CAST(a AS VARCHAR) || '_'
        |    || CAST(b AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')),
        |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, count(*) AS n_tri FROM n
        |GROUP BY 1 ORDER BY node""".stripMargin
  )
}
