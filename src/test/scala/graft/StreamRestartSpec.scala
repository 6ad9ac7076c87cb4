package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Doc, Event, GraftStreams}

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
    // must not re-emit, and user 8's click at the SAME ms as their
    // fresh view must be rejected by the strict (>) stage ordering.
    val q2 = start()
    mem.addData(ev(4, t0 + 2000, 7, "purchase"), ev(5, t0 + 3000, 8, "view"),
      ev(6, t0 + 3000, 8, "click"))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(s"$root/data")
      .select("user_id", "stage", "ms")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set((7L, 1, t0), (7L, 2, t0 + 1000), (7L, 3, t0 + 2000),
      (8L, 1, t0 + 3000)),
      s"wrong transitions across restart: $rows")
  }

  test("left-outer intervalJoin: restart recovers join state, pads unmatched after expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ivj_rs").toString
    val memL = MemoryStream[graft.streaming.Event]
    val memR = MemoryStream[graft.streaming.Event]
    val t0 = 1700000000000L
    def ev(id: Long, ms: Long, uid: Long, tp: String) =
      graft.streaming.Event(id, ms, uid, tp, 1.0)
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_millis(col("ts_ms")))
    def start() = GraftStreams.sinkToParquet(
      GraftStreams.intervalJoin(withTs(memL.toDF()), withTs(memR.toDF()),
        key = "user_id", within = "1 hour", joinType = "left_outer"),
      s"$root/data", s"$root/ckpt")

    // Run 1: clicks for users 9 (will match) and 5 (never matches);
    // one in-window purchase for user 9 → (1, 3) emits.
    val q1 = start()
    memL.addData(ev(1, t0, 9, "click"), ev(2, t0, 5, "click"))
    memR.addData(ev(3, t0 + 600 * 1000, 9, "purchase"))
    q1.processAllAvailable()
    q1.stop()

    // Run 2 from the SAME checkpoint: a second in-window purchase must
    // pair with the RECOVERED click state (1, 4) without re-emitting
    // (1, 3); then far-future sentinels on BOTH inputs advance the
    // watermark past t0 + 1h so user 5's recovered unmatched click
    // emits its null padding — state AND outer semantics survive the
    // restart.
    val q2 = start()
    memR.addData(ev(4, t0 + 1800 * 1000, 9, "purchase"))
    q2.processAllAvailable()
    val far = t0 + 7L * 24 * 3600 * 1000
    Seq(far, far + 3600 * 1000L).zipWithIndex.foreach { case (ts, i) =>
      memL.addData(ev(900 + i, ts, 999, "click"))
      memR.addData(ev(910 + i, ts, 999, "purchase"))
      q2.processAllAvailable()
    }
    q2.stop()

    val rows = spark.read.parquet(s"$root/data")
      .filter(col("user_id") =!= 999)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSet == Set((1L, 3L), (1L, 4L), (2L, -1L)),
      s"wrong pairs across restart: ${rows.toSeq.sorted}")
    assert(rows.length == 3,
      s"a pair or padding row re-emitted across the restart: ${rows.toSeq.sorted}")
  }

  test("sessionFirstTouch: restart recovers session state, emits each session exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root =
      java.nio.file.Files.createTempDirectory("graft_attrib_rs").toString
    val mem = MemoryStream[Event]
    val t0 = 1700000000000L
    val H = 3600 * 1000L
    def ev(id: Long, ms: Long, uid: Long, et: String) =
      Event(id, ms, uid, et, 1.0)
    def start() = GraftStreams.sinkToParquet(
      GraftStreams.sessionFirstTouch(
        mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms")))),
      s"$root/data", s"$root/ckpt")

    // Run 1: user 7's session A (click → purchase) finalizes when
    // user 8's event 3 h on pushes the watermark past A's end; user
    // 8's session B is still OPEN (un-emitted state) at stop.
    val q1 = start()
    mem.addData(ev(1, t0, 7, "click"), ev(2, t0 + 60000, 7, "purchase"))
    q1.processAllAvailable()
    val t8 = t0 + 3 * H
    mem.addData(ev(3, t8, 8, "view"))
    q1.processAllAvailable()
    q1.stop()

    // Run 2 from the SAME checkpoint: user 8's purchase 1 min after
    // their view must MERGE into recovered session B (one session,
    // not two), session A must not re-emit, and two watermark pushes
    // finalize B and then user 7's new session C.
    val q2 = start()
    mem.addData(ev(4, t8 + 60000, 8, "purchase"))
    q2.processAllAvailable()
    mem.addData(ev(5, t0 + 9 * H, 7, "view")) // closes B, opens C
    q2.processAllAvailable()
    mem.addData(ev(6, t0 + 15 * H, 9, "view")) // closes C; stays open
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(s"$root/data")
      .select("user_id", "start_ms", "end_ms", "first_touch",
        "n_events", "n_purchases")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    // Exactly once per session — no (user, start) appears twice.
    val keys = rows.map(r => (r._1, r._2)).toSeq
    assert(keys.distinct.size == keys.size,
      s"a session emitted more than once across the restart: ${rows.toSeq}")
    // A emitted in run 1 and ONLY run 1; B merged across the restart
    // (2 events incl. the purchase); C finalized; 9's session open.
    assert(rows.toSet == Set(
      (7L, t0, t0 + 60000, "click", 2L, 1L),
      (8L, t8, t8 + 60000, "view", 2L, 1L),
      (7L, t0 + 9 * H, t0 + 9 * H, "view", 1L, 0L)),
      s"wrong sessions across restart: ${rows.toSeq.sortBy(r => (r._1, r._2))}")
  }

  test("funnelTransitions idle eviction contract (TestGroupState — no live query)") {
    // A ProcessingTimeTimeout query schedules continuous no-data
    // batches to fire timeouts, so a wall-clock eviction test spins;
    // instead drive the exact per-key handler the query installs
    // through Spark's TestGroupState harness.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val t0 = 1700000000000L
    val stages = Seq("view", "click")
    val fn = GraftStreams.idleEvictingFunc[Seq[Long], (Long, Int, String, Long)](
      Some("1 second"))(GraftStreams.funnelFold(stages))
    def ev(id: Long, ms: Long, tp: String) =
      graft.streaming.Event(id, ms, 7L, tp, 1.0)

    // 1: fresh user reaches stage 1 → state written, idle timeout armed.
    val s1 = TestGroupState.create[Seq[Long]](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout(), 1000L, Optional.empty(), false)
    val out1 = fn(7L, Iterator(ev(1, t0, "view")), s1).toSeq
    assert(out1 == Seq((7L, 1, "view", t0)), s"stage-1 emit: $out1")
    assert(s1.isUpdated && s1.getTimeoutTimestampMs.get == 2000L,
      "state not written or timeout not armed at batch time + 1s")

    // 2: noise user (no stage-1 match) → NO state row, NO timeout —
    // unbounded domains don't accumulate entries for funnel-less users.
    val s2 = TestGroupState.create[Seq[Long]](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout(), 1000L, Optional.empty(), false)
    val out2 = fn(8L, Iterator(ev(2, t0, "click")), s2).toSeq
    assert(out2.isEmpty && !s2.isUpdated && !s2.getTimeoutTimestampMs.isPresent,
      "noise user leaked state or a timeout registration")

    // 3: timed-out invocation → state removed, nothing emitted.
    val s3 = TestGroupState.create[Seq[Long]](Optional.of(Seq(t0)),
      GroupStateTimeout.ProcessingTimeTimeout(), 5000L, Optional.empty(), true)
    val out3 = fn(7L, Iterator.empty, s3).toSeq
    assert(out3.isEmpty && s3.isRemoved, "timed-out state not removed")

    // 4: the user returns AFTER eviction: a click (stage 2 of the old
    // funnel) emits nothing from empty state; a later view restarts
    // the funnel at stage 1.
    val s4 = TestGroupState.create[Seq[Long]](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout(), 9000L, Optional.empty(), false)
    val out4 = fn(7L, Iterator(ev(3, t0 + 2000, "click"), ev(4, t0 + 3000, "view")),
      s4).toSeq
    assert(out4 == Seq((7L, 1, "view", t0 + 3000)),
      s"post-eviction funnel did not restart at stage one: $out4")

    // 5: a fold returning None for a key WITH stored state must remove
    // it — not leave it live under the old timeout timestamp (where it
    // would be evicted mid-activity later). The shipped folds never hit
    // this branch (they return Some whenever prior state exists), so
    // drive it with a state-dropping fold directly.
    val dropAll = GraftStreams.idleEvictingFunc[Seq[Long], (Long, Int, String, Long)](
      Some("1 second"))((_, _, _) => (None, Seq.empty))
    val s5 = TestGroupState.create[Seq[Long]](Optional.of(Seq(t0)),
      GroupStateTimeout.ProcessingTimeTimeout(), 5000L, Optional.of(6000L), false)
    val out5 = dropAll(7L, Iterator(ev(5, t0 + 4000, "view")), s5).toSeq
    assert(out5.isEmpty && s5.isRemoved,
      "fold returning None with existing state must remove the stale state row")
  }
}
