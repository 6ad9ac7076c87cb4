package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Unit + property coverage for the CC operator behind
  * dedup_cluster_canon: known small graphs, the empty-edge fast path,
  * forced multi-partition pre-pass vs the single-partition fast path,
  * and a seeded random graph checked against a driver-side union-find
  * oracle. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[Long], pairs: Seq[(Long, Long)],
      edgesPerPartition: Long = 2000000L): Map[Long, Long] =
    ConnectedComponents.canonLabels(
      docs.toDF("doc_id"),
      pairs.toDF("doc_i", "doc_j"),
      edgesPerPartition)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find oracle (union by min). */
  private def oracle(docs: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    docs.map(d => d -> find(d)).toMap
  }

  test("chains, a pair, and isolated docs get min-id canon labels") {
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val got = run(docs, pairs)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
  }

  test("no edges: every doc is its own canon") {
    val got = run(Seq(5L, 6L, 7L), Seq.empty)
    assert(got === Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }

  test("multi-partition pre-pass agrees with the single-partition fast path") {
    // Long path graph — the worst case for label propagation — split
    // across many tiny edge partitions so cross-partition stitching and
    // pointer jumping actually run.
    val docs = (0L to 60L)
    val path = (0L until 60L).map(i => (i, i + 1))
    val one = run(docs, path)
    val many = run(docs, path, edgesPerPartition = 3L)
    assert(one === many)
    assert(one.values.toSet === Set(0L))
  }

  test("seeded random graph matches a driver-side union-find oracle") {
    val rnd = new scala.util.Random(42)
    val docs = (0L until 300L)
    val pairs = Seq.fill(150)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val exp = oracle(docs, pairs)
    assert(run(docs, pairs) === exp)
    assert(run(docs, pairs, edgesPerPartition = 10L) === exp)
  }

  test("harness sessions have a reliable checkpoint dir for the CC loop") {
    GraftSession.ensureCheckpointDir(spark)
    assert(spark.sparkContext.getCheckpointDir.isDefined)
    // Idempotent: a second call must not move an already-set dir.
    val dir = spark.sparkContext.getCheckpointDir
    GraftSession.ensureCheckpointDir(spark)
    assert(spark.sparkContext.getCheckpointDir === dir)
  }
}
