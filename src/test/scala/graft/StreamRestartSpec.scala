package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Doc, GraftStreams}

/** Checkpoint-recovery lock for the stateful streaming surface: the
  * near-dup scaladoc promises each candidate pair EXACTLY ONCE — that
  * must hold across a stop + restart from the checkpoint, i.e. the
  * banded state store has to come back (new docs still pair with
  * pre-restart docs) without re-emitting pre-restart pairs. Composed
  * end-to-end through sinkToParquet so the exactly-once file sink is
  * what the assertion reads.
  */
class StreamRestartSpec extends SparkSpec {

  test("nearDupCandidates + sinkToParquet: restart recovers state, emits no duplicate pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val mem = MemoryStream[Doc]
    val t0 = 1700000000000L
    val toks = Seq("a", "b", "c", "d")
    def start() = GraftStreams.sinkToParquet(
      GraftStreams.nearDupCandidates(mem.toDS()), s"$root/data", s"$root/ckpt")

    // Run 1: two near-dup docs → the pair (1,2) emits once.
    val q1 = start()
    mem.addData(Doc(1L, t0, toks), Doc(2L, t0 + 1000, toks))
    q1.processAllAvailable()
    q1.stop()

    // Run 2 from the SAME checkpoint: doc 3 must pair with BOTH
    // pre-restart docs (state recovered), and (1,2) must not re-emit.
    val q2 = start()
    mem.addData(Doc(3L, t0 + 2000, toks))
    q2.processAllAvailable()
    q2.stop()

    val emitted = spark.read.parquet(s"$root/data")
      .groupBy("doc_i", "doc_j").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(emitted.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"wrong pair set after restart: $emitted")
    assert(emitted.values.forall(_ == 1L),
      s"a pair was emitted more than once across the restart: $emitted")
  }

  test("funnelTransitions: restart recovers stage state, re-emits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_funnel_rs").toString
    val mem = MemoryStream[graft.streaming.Event]
    val t0 = 1700000000000L
    val stages = Seq("view", "click", "purchase")
    def ev(id: Long, ms: Long, uid: Long, tp: String) =
      graft.streaming.Event(id, ms, uid, tp, 1.0)
    def start() = GraftStreams.sinkToParquet(
      GraftStreams.funnelTransitions(mem.toDS(), stages),
      s"$root/data", s"$root/ckpt")

    // Run 1: user 7 reaches view + click; user 8 purchases without
    // viewing (must never emit).
    val q1 = start()
    mem.addData(ev(1, t0, 7, "view"), ev(2, t0 + 1000, 7, "click"),
      ev(3, t0 + 500, 8, "purchase"))
    q1.processAllAvailable()
    q1.stop()

    // Run 2 from the SAME checkpoint: user 7's purchase must advance to
    // stage 3 (the recovered state knows the click time), stages 1-2
    // must not re-emit, and a pre-click-time purchase for user 8's
    // fresh view chain must respect strict ordering.
    val q2 = start()
    mem.addData(ev(4, t0 + 2000, 7, "purchase"), ev(5, t0 + 3000, 8, "view"))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(s"$root/data")
      .select("user_id", "stage", "ms")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set((7L, 1, t0), (7L, 2, t0 + 1000), (7L, 3, t0 + 2000),
      (8L, 1, t0 + 3000)),
      s"wrong transitions across restart: $rows")
  }
}
