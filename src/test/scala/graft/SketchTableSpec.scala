package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{Event, GraftStreams}

/** The incrementally-maintained daily-sketch table (GraftStreams
  * dailyUserSketches / mergeDailySketches / slidingDistinctFromSketches):
  * a foreachBatch fold over micro-batches must land within the sketch
  * error band of exact, replay deterministically, and match the manual
  * batch-split fold — the stored-stats-table story behind
  * agg_wau_hll_sliding, driven end to end.
  */
class SketchTableSpec extends SparkSpec {
  import spark.implicits._

  private def allEvents = Tables.events(spark, sf)
    .select(col("event_id"), unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
      col("user_id"), col("event_type"), col("value"))
    .as[Event]

  private def estimates(table: DataFrame): Map[Long, Long] =
    GraftStreams.slidingDistinctFromSketches(table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def exactWau: Map[Long, Long] =
    SparkEntry.queries("agg_wau_sliding_distinct")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // lazy val: the exact-quantile split job runs once per suite; the
  // DataFrames stay lazy plans, so each fold still re-executes them
  // (which is what the replay-determinism check needs).
  private lazy val batches: Seq[DataFrame] = {
    val ids = allEvents.toDF().stat.approxQuantile("event_id", Array(0.33, 0.66), 0.0)
    Seq(allEvents.filter(col("event_id") <= ids(0)).toDF(),
      allEvents.filter(col("event_id") > ids(0) && col("event_id") <= ids(1)).toDF(),
      allEvents.filter(col("event_id") > ids(1)).toDF())
  }

  private def fold(bs: Seq[DataFrame]): DataFrame =
    bs.tail.foldLeft(GraftStreams.dailyUserSketches(bs.head.as[Event])) {
      (st, b) => GraftStreams.mergeDailySketches(st,
        GraftStreams.dailyUserSketches(b.as[Event])).localCheckpoint(true)
    }

  test("incremental 3-batch fold: estimates within 5% of exact, replay-identical") {
    val exact = exactWau
    val est = estimates(fold(batches))
    assert(est.nonEmpty)
    est.foreach { case (day, e) =>
      val x = exact(day).toDouble
      assert(x > 0 && math.abs(e - x) / x <= 0.05,
        s"sketch-table WAU off at day $day: est=$e exact=$x")
    }
    // Same batches folded again must give bit-identical estimates —
    // a backfill replay cannot move the dashboard.
    assert(estimates(fold(batches)) == est)
  }

  test("emitted-days contract: fully-quiet windows are OMITTED, where the exact sibling emits 0") {
    // Two activity islands ten days apart. A day-d sketch contributes
    // to trailing windows of days d..d+6 and the output clamps at the
    // table's max day, so days 7-9 (whose trailing windows contain no
    // sketch at all) must be ABSENT — the slidingDistinctFromSketches
    // scaladoc's contract, and the exact spot a dashboard swapping
    // agg_wau_sliding_distinct (which zero-fills its lo..hi spine and
    // emits those days as 0) for the sketch key would silently change
    // output shape without joining onto its own spine.
    val ev = Seq(
      Event(1L, 0L * 86400000L + 5L, 100L, "view", 1.0),
      Event(2L, 1L * 86400000L + 5L, 101L, "view", 1.0),
      Event(3L, 10L * 86400000L + 5L, 200L, "view", 1.0))
      .toDS()
    val out = GraftStreams.slidingDistinctFromSketches(
      GraftStreams.dailyUserSketches(ev), windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 10L),
      s"emitted days changed: ${out.keySet.toSeq.sorted}")
    // Days 8-9 omitted (quiet), day 7 still served by day-1's sketch;
    // estimates on tiny exact-size sets are exact.
    assert(out(0L) == 1L && out(1L) == 2L && out(7L) == 1L && out(10L) == 1L,
      s"estimates moved: $out")
  }

  test("foreachBatch streaming maintenance == the manual batch-split fold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    var state: DataFrame = null
    val q = mem.toDS().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], _: Long) =>
        val delta = GraftStreams.dailyUserSketches(batch)
        state = (if (state == null) delta
          else GraftStreams.mergeDailySketches(state, delta))
          .localCheckpoint(true)
        ()
      }.start()
    try {
      batches.foreach { b =>
        mem.addData(b.as[Event].collect().toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(estimates(state) == estimates(fold(batches)))
  }
}
