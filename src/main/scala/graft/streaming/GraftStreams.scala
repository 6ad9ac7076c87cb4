package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.Det

/** Event record for the typed streaming APIs — the `events` table schema
  * with an epoch-millis timestamp (what a message-bus source delivers). */
case class Event(event_id: Long, ts_ms: Long, user_id: Long,
    event_type: String, value: Double)

/** Document record for the streaming near-dup API: id, epoch-millis
  * arrival/event time, distinct tokens. */
case class Doc(doc_id: Long, ts_ms: Long, toks: Seq[String])

/** Candidate near-duplicate pair emitted by
  * [[GraftStreams.nearDupCandidates]]: `doc_i < doc_j`, `est_jac` =
  * fraction of agreeing MinHash components (4-dp, same rounding as the
  * batch `SimilarityJoin.minhashCandidates`), `ts_ms` = the later doc's
  * event time. */
case class NearDupCand(doc_i: Long, doc_j: Long, est_jac: Double, ts_ms: Long)

// Internal shapes for the banded-LSH state machine.
private[streaming] case class DocSig(band: Int, bh: Int, doc_id: Long,
    ts_ms: Long, sig: Seq[Int], ts: java.sql.Timestamp)
private[streaming] case class BucketDoc(doc_id: Long, ts_ms: Long,
    sig: Seq[Int], keys: Seq[Int])
private[streaming] case class Bucket(docs: Seq[BucketDoc])

/** Deployable Structured Streaming entry points (§2.10).
  *
  * Each transform takes a STREAMING DataFrame/Dataset of events (any
  * source: Kafka-style via `Event`, files via [[eventsFromParquetDir]])
  * and returns the streaming result to hand to `writeStream` — the same
  * logical plans the batch-declared `StreamQueries` run, so batch and
  * streaming results agree by construction (asserted in
  * StreamingParitySpec, which drives exactly these functions).
  *
  * Scale: every transform keys its state by a bounded entity
  * (window×type, user, event_id under a watermark), so state-store size
  * is O(active keys), and watermarks bound how long a key stays live —
  * except [[runningMax]], whose lifetime-max state is inherently
  * per-user-forever unless its `idleTimeout` eviction is enabled (see
  * its scaladoc for the trade-off).
  */
object GraftStreams {

  /** File-source replay of an `events.parquet` directory. The fixture's
    * `ts` has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * across generations (see graft.Tables.events); a streaming read
    * needs the schema UP FRONT, so probe it with a one-off batch read
    * (planning-time only, reads footers not data) and declare `ts`
    * accordingly — LONG nanos floor-divided to µs for the NANOS
    * generation, native TIMESTAMP otherwise. TIMESTAMP instead of NTZ
    * because event-time watermarks require TIMESTAMP (equal values
    * under the engine's pinned UTC session timezone).
    *
    * Deliberate documented side effect (same contract as Tables.events):
    * nanosAsLong stays set for the session — restoring it mid-plan risks
    * executor-side re-reads under the old conf, so later NANOS parquet
    * columns surface as LONG nanos (visible in the schema, never a
    * silently wrong timestamp). */
  def eventsFromParquetDir(spark: SparkSession, dir: String,
      tsIsNanos: Option[Boolean] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The probe reads footers only. A still-EMPTY staging dir (create
    // dir → build stream → start copying files, the standard
    // file-source pattern) can't be probed — fall back to the current
    // generation's native TIMESTAMP declaration rather than failing
    // stream construction. CHECKPOINT/RESTART IMPLICATION: the probe
    // freezes the ts declaration at STREAM-CONSTRUCTION time. If
    // NANOS-generation files land in a dir that probed empty (or
    // TIMESTAMP files in one that probed NANOS), the declared schema
    // mismatches the files and the read fails mid-stream; and a query
    // restarted from a checkpoint re-probes, so a restart AFTER files
    // arrived can resolve a different declaration than its first run.
    // Long-lived mixed-generation streams should not depend on probe
    // timing — pass the generation explicitly via `tsIsNanos`.
    val tsIsNanosLong = tsIsNanos.getOrElse {
      try spark.read.parquet(dir).schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    }
    val tsDecl = if (tsIsNanosLong) "ts LONG" else "ts TIMESTAMP"
    val schema = s"event_id LONG, $tsDecl, user_id LONG, " +
      "event_type STRING, value DOUBLE, props STRING"
    val raw = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir)
    if (tsIsNanosLong)
      // Shared floor-division nanos→micros (see its scaladoc for why
      // plain `div` is wrong pre-epoch).
      raw.withColumn("ts",
        timestamp_micros(graft.Tables.nanosFloorDivMicros("ts")))
    else raw
  }

  /** Per-day HLL user sketches of one events frame — the stored
    * stats-table row the sliding-distinct dashboards read (the
    * `agg_wau_hll_sliding` input shape). Works on a full batch frame
    * or a single micro-batch. */
  def dailyUserSketches(events: Dataset[Event]): DataFrame =
    events.toDF()
      .select(expr("ts_ms div 86400000").as("day"), col("user_id"))
      .groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))

  /** Fold one day-sketch delta into the stored table. HLL unions are
    * associative and commutative over the sketch bytes, so any batch
    * split of the same events converges to the same table a given fold
    * ORDER produces, and every fold's ESTIMATES sit in the same error
    * band as a one-shot build (exact byte equality between union-built
    * and directly-built sketches is NOT a DataSketches guarantee — the
    * agg_hll_partitioned_union property documents the same fact). This
    * is the foreachBatch maintenance step: the corpus is scanned once
    * per micro-batch, never re-scanned, and the table grows by
    * O(new days) sketch rows. SketchTableSpec pins incremental ≡
    * replay and the estimate band vs exact. */
  def mergeDailySketches(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("day")
      .agg(hll_union_agg(col("sk")).as("sk"))

  /** The trailing-window distinct-user curve answered FROM the stored
    * sketches — no raw-event access, any window width reads the same
    * table (the agg_wau_hll_sliding read path, parameterized).
    *
    * EMITTED-DAYS CONTRACT: a day appears in the output only if some
    * daily sketch CONTRIBUTES to its trailing window (i.e. the table
    * has a row within the preceding `windowDays` days). The exact
    * sibling `agg_wau_sliding_distinct` instead zero-fills a complete
    * lo..hi calendar spine, so the two keys disagree on fully-quiet
    * days: the exact key emits them as 0, this one omits them. A
    * dashboard swapping the exact key for this sketch key must join
    * onto its own spine with coalesce(0) if it needs the zero days
    * (deliberate here: the sketch table is the only input, and
    * fabricating a spine wider than the table's day range would guess
    * at corpus bounds the sketches don't record). PropertySpec pins
    * the estimate band on the days both keys emit. */
  def slidingDistinctFromSketches(table: DataFrame,
      windowDays: Int = 7): DataFrame = {
    // Guard, not clamp: sequence(start, stop) steps BACKWARD when
    // stop < start, so windowDays <= 0 would silently produce a bogus
    // reversed window with plausible-looking estimates.
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val bounds = table.agg(max(col("day")).as("hi"))
    table
      .select(col("sk"), explode(sequence(col("day"),
        col("day") + (windowDays - 1))).as("wday"))
      .join(broadcast(bounds), col("wday") <= col("hi"))
      .groupBy("wday")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_est"))
      .select(col("wday").as("day"), col("wau_est"))
      .orderBy("day")
  }

  /** Stream-STATIC broadcast enrichment + tumbling counts — the most
    * common production streaming pattern: every micro-batch joins
    * against a static dimension snapshot (no watermark needed on the
    * dim side — it is not a stream; Spark re-plans the broadcast per
    * batch, which is also why a periodically-reloaded dim table picks
    * up changes between batches without restarts). The enriched rows
    * then flow into the same 1-day tumbling agg as
    * [[tumblingCounts]]. `dim` must carry `dim_user_id` and the
    * attribute columns; rows with no dim match drop (inner join — the
    * enrichment contract; left-join with a sentinel is the caller's
    * one-line variant). Batch and streaming run THIS one declaration —
    * parity by construction (StreamingParitySpec). */
  def enrichedTumblingCounts(events: DataFrame, dim: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") === col("dim_user_id"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("n_name"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").cast("date").as("day"), col("n_name"),
        col("n"), col("sum_value"))

  /** Per-(1-day tumbling window × event_type) counts and exact sums. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("n"), col("sum_value"))

  /** 24h-wide window sliding every 6h, count + order-independent avg. */
  def slidingAvg(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.davg(col("value")).as("avg_value"))
      .select(unix_millis(col("w.start").cast("timestamp")).as("start_ms"),
        col("event_type"), col("n"), col("avg_value"))

  /** Per tumbling hour × event_type counts — the STREAMING AGGREGATE
    * half of an hourly top-k dashboard. Ranking is deliberately NOT
    * here: a rank over a streaming agg isn't Append-expressible (a new
    * row re-ranks its whole window), so the production shape is this
    * windowed agg feeding a downstream rank (foreachBatch or a batch
    * view over the sink table) — exactly what the declared
    * `stream_hourly_topk` key and its parity test compose. State per
    * (hour, type) is one count register; the watermark retires closed
    * hours from the store. */
  def hourlyTypeCounts(events: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start").cast("timestamp")).as("hour_ms"),
        col("event_type"), col("n"))

  /** Static per-(type, hour-of-day) baseline for [[rateAlerts]]:
    * observed-hour count + total events per slot, computed ONCE from a
    * batch events table (the deployment shape: yesterday's corpus
    * builds the baseline, today's stream is judged against it). The
    * denominator counts OBSERVED hours — an hour with zero events of a
    * type contributes no row, which biases the mean up (conservative
    * for alerting) and keeps both engines' arithmetic integer-exact. */
  def hourlyBaseline(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("unix_millis(cast(ts as timestamp)) div 3600000")
          .as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
      .select(col("event_type"), (col("hour") % 24).as("hod"), col("n"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("base_hours"),
        sum(col("n")).cast("long").as("base_sum"))

  /** Hourly per-type counts flagged against the static [[hourlyBaseline]]
    * (stream-static join downstream of the windowed agg): alert when
    * n · base_hours > 3 · base_sum — the integer-exact "3× the mean
    * hourly rate for this hour-of-day" rule, no division anywhere. */
  def rateAlerts(events: DataFrame, baseline: DataFrame): DataFrame =
    hourlyTypeCounts(events)
      .withColumn("hod", expr("(hour_ms div 3600000) % 24"))
      .join(baseline, Seq("event_type", "hod"))
      .select(col("hour_ms"), col("event_type"), col("n"),
        col("base_hours"), col("base_sum"),
        (col("n") * col("base_hours") > col("base_sum") * 3).as("alert"))

  /** Gap-based sessions per user via the native session_window state
    * (merging windows); emits (user_id, start_ms, end_ms, n_events,
    * sum_value) per closed-or-current session. The watermark is what
    * lets closed sessions leave the state store (and is REQUIRED for
    * Append-mode output). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(min(unix_millis(col("ts").cast("timestamp"))).as("start_ms"),
        max(unix_millis(col("ts").cast("timestamp"))).as("end_ms"),
        count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .drop("w")

  /** SESSIONIZED FIRST-TOUCH ATTRIBUTION as a stateful streaming op —
    * the production form of the batch `attribution_first_touch`
    * carry-forward: every session is credited to the event that OPENED
    * it, with the session's purchase activity summarized alongside.
    * One session_window aggregation carries the whole computation, so
    * the streaming state per (user, open session) is a handful of
    * registers (min/max/count + two min_by pairs) — no event log is
    * retained, and a closed session's state leaves the store once the
    * watermark passes its end (which is also what lets Append mode
    * emit it exactly once, finalized).
    *
    * first_touch / first_purchase_id use `min_by` over the
    * (event-ms, event_id) struct: event_id uniqueness makes the
    * ordering total, so the "first" is deterministic under ANY arrival
    * order — batch, shuffled micro-batches, or replay. `min_by` skips
    * rows whose ordering expression is null, which is what scopes
    * first_purchase_id to purchase rows only (null when the session
    * has none).
    *
    * GAP SEMANTICS: session_window merges an event into the previous
    * session iff its gap is STRICTLY LESS than `gap` (windows
    * [t,t+gap) merge on overlap), i.e. a gap of exactly 30 min SPLITS
    * — whereas the lag-rule batch keys (`ts_sessionize`,
    * `stream_session_windows`) split only on gap > 30 min. The oracle
    * for the declared key encodes the `>=` rule; the fixture has no
    * exact-30-min same-user gap at any SF, so the two rules agree
    * there (StreamingParitySpec ties the lag-rule keys to each other;
    * this key is the native-session_window face).
    *
    * On a batch frame the watermark node is analyzer-eliminated and
    * this SAME function is the declared batch key — parity by
    * construction, asserted incl. late-data drops in
    * StreamingParitySpec. */
  def sessionFirstTouch(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val ms = unix_millis(col("ts").cast("timestamp"))
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        min(ms).as("start_ms"),
        max(ms).as("end_ms"),
        min_by(col("event_type"), struct(ms, col("event_id")))
          .as("first_touch"),
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", lit(1)))
          .as("n_purchases"),
        min_by(col("event_id"),
          when(col("event_type") === "purchase",
            struct(ms, col("event_id"))))
          .as("first_purchase_id"))
      .drop("w")
  }

  /** Exactly-once-per-event_id stream: duplicates arriving within the
    * watermark horizon are dropped; state for an id is reclaimed once the
    * watermark passes it. Uses dropDuplicatesWithinWatermark — plain
    * dropDuplicates("event_id") would never evict (Spark only builds the
    * eviction predicate when the event-time column is in the key set),
    * growing state by every id ever seen. */
  def dedupByEventId(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** One epoch's idempotent write: a fixed per-batch directory with mode
    * Overwrite, so re-running the same batch id replaces its own output
    * instead of appending duplicates. */
  private[graft] def writeEpoch(batch: DataFrame, dir: String, id: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$dir/epoch=$id")

  /** Exactly-once parquet sink via foreachBatch. Structured Streaming
    * guarantees at-least-once delivery of each micro-batch to
    * foreachBatch; after a failure the restarted query REPLAYS the last
    * uncommitted batch id. [[writeEpoch]] makes that replay idempotent
    * (same id → same directory, overwritten), which upgrades the sink to
    * exactly-once end-to-end given the source-side replay the
    * `checkpoint` directory provides. Readers see the result as one
    * hive-partitioned dataset (`epoch=` becomes a partition column —
    * drop it or prune by it for incremental consumption). */
  def sinkToParquet(df: DataFrame, dir: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeEpoch(batch.toDF(), dir, id))
      .start()

  /** Streaming UPSERT MAINTENANCE of a [[graft.sources.VersionedTable]]:
    * every micro-batch MERGEs into the table (type-1 whole-row upsert
    * on `keys`), so the table's LATEST version is always the
    * up-to-date materialization of the stream — the
    * foreachBatch-into-a-lakehouse-table pattern (Delta's
    * `foreachBatch + MERGE` idiom on this repo's commit-log format).
    *
    * Delivery semantics, stated precisely: foreachBatch is
    * at-least-once (a batch can REPLAY after a crash), and this sink
    * is IDEMPOTENT under replay at the TABLE level — re-merging the
    * same batch produces an identical current snapshot (upsert is
    * idempotent), though it commits a new version (the history
    * records the replay; readers of `latest` never see duplicates).
    * That is exactly-once RESULTS without exactly-once version
    * numbering — the honest contract, pinned in VersionedTableSpec.
    *
    * Concurrency: merge's optimistic loop means a co-writer (e.g. a
    * batch backfill) can interleave between micro-batches safely —
    * a lost race re-reads and re-merges.
    */
  def mergeSink(df: DataFrame, root: String, keys: Seq[String],
      checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.sources.VersionedTable.merge(
            batch.sparkSession, root, batch.toDF(), keys): Unit
        })
      .start()

  /** Stream-stream interval join: each `left` row matched to the `right`
    * rows with the same `key` whose event time falls in
    * [left.ts, left.ts + within]. Emits (l_id, r_id, key, lag_ms).
    *
    * Both sides need a watermark plus the time-range condition — that is
    * what lets Spark bound join state: a left row leaves the state store
    * once the watermark passes `ts + within` (no right match can still
    * arrive), a right row once the watermark passes its own `ts`. An
    * inner stream-stream join emits matches immediately (Append mode);
    * only rows arriving behind the watermark are dropped. On a batch
    * frame the watermark node is eliminated by the analyzer
    * (EliminateEventTimeWatermark), so the SAME function is the batch
    * declaration — batch/stream parity by construction, asserted in
    * StreamingParitySpec.
    *
    * `joinType = "left_outer"` adds the semantics people actually debug
    * in production stream-stream joins: a left row with NO in-interval
    * right match is emitted null-padded (r_id, lag_ms = NULL) — but only
    * once the watermark passes `l_ts + within`, because until then a
    * match could still arrive. Matched rows still emit immediately; the
    * padded row is the thing that waits for expiry. State bounds are the
    * inner join's (the outer form holds no extra state — it emits the
    * padding at exactly the moment the inner form would have discarded
    * the row). On a batch frame this is a plain left-outer range join,
    * so the padded rows appear with no delay — same result set, parity
    * asserted incl. padding in StreamingParitySpec.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      within: String = "1 hour", watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_id"), col(key).as("l_key"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_id"), col(key).as("r_key"),
        col("ts").as("r_ts"))
    l.join(r, col("l_key") === col("r_key")
        && col("r_ts") >= col("l_ts")
        && col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"), joinType)
      .select(col("l_id"), col("r_id"), col("l_key").as(key),
        (unix_millis(col("r_ts").cast("timestamp"))
          - unix_millis(col("l_ts").cast("timestamp"))).as("lag_ms"))
  }

  /** STREAMING near-duplicate detection — banded MinHash LSH over an
    * unbounded doc stream (the incremental twin of
    * `SimilarityJoin.minhashCandidates`). Each arriving doc is
    * signature-hashed scan-side (`MinHashSig`, no shuffle), exploded
    * into `bands` LSH keys, and matched via per-bucket state against
    * docs whose event time is still within the watermark horizon. Emits
    * each candidate pair EXACTLY ONCE with its estimated Jaccard
    * (agreeing-component fraction): of all band buckets a pair shares,
    * only the LOWEST-indexed one emits — each bucket recomputes both
    * docs' band keys locally from the stored signatures, so no
    * cross-bucket coordination or second stateful stage is needed.
    *
    * Scale/state: a bucket holds (id, ts, k-int signature) per live doc
    * — tokens are NOT stored, which is what bounds state on an unbounded
    * stream; the price is estimated (not exact-verified) similarity.
    * Docs leave state once the watermark passes their event time, and a
    * whole bucket idle past the watermark is reclaimed via event-time
    * timeout. Late rows (event time behind the watermark) are dropped,
    * matching aggregate-watermark semantics. Pairing window ≈ the
    * watermark delay: two near-dup docs arriving further apart than
    * `watermark` are not reported — pick the horizon accordingly (a
    * crawl pipeline dedups the recent window here and the full corpus in
    * the nightly batch join).
    */
  def nearDupCandidates(docs: Dataset[Doc], numHashes: Int = 32,
      bands: Int = 16, watermark: String = "1 hour"): DataFrame = {
    require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = numHashes / bands
    val sigd = graft.operators.SimilarityJoin.nonEmptyDocs(docs.toDF())
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", watermark)
      .withColumn("sig", graft.functions.MinHashSig(col("toks"), numHashes))
      .select(
        posexplode(
          graft.operators.SimilarityJoin.bandKeysExpr("sig", bands, r)),
        col("doc_id"), col("ts_ms"), col("sig"), col("ts"))
      .select(col("pos").as("band"), col("col").as("bh"),
        col("doc_id"), col("ts_ms"), col("sig"), col("ts"))
      .as[DocSig]
    sigd.groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState[Bucket, NearDupCand](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state: GroupState[Bucket]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var live = state.getOption.map(_.docs).getOrElse(Seq.empty)
              .filter(_.ts_ms >= wm).toVector
            // Deterministic within-trigger order; drop late arrivals.
            val fresh = rows.filter(_.ts_ms >= wm).toSeq
              .sortBy(d => (d.ts_ms, d.doc_id))
            val out = Vector.newBuilder[NearDupCand]
            fresh.foreach { d =>
              // Re-delivery of a live doc_id (at-least-once source) must
              // not re-emit its pairs.
              if (!live.exists(_.doc_id == d.doc_id)) {
                // All band keys once per arriving doc; stored docs carry
                // theirs — pair checks are O(bands) comparisons, not
                // O(bands·r) re-hashes per pair.
                val dKeys = allBandKeys(d.sig, bands, r)
                live.foreach { x =>
                  if (firstSharedBand(x.keys, dKeys) == band) {
                    val lo = math.min(x.doc_id, d.doc_id)
                    val hi = math.max(x.doc_id, d.doc_id)
                    out += NearDupCand(lo, hi, estJaccard(x.sig, d.sig),
                      math.max(x.ts_ms, d.ts_ms))
                  }
                }
                live :+= BucketDoc(d.doc_id, d.ts_ms, d.sig, dKeys)
              }
            }
            if (live.isEmpty) state.remove()
            else {
              state.update(Bucket(live))
              // Wake once every stored doc is past the horizon, so idle
              // buckets release their state.
              state.setTimeoutTimestamp(
                math.max(live.map(_.ts_ms).max, wm) + 1)
            }
            out.result().iterator
          }
      }.toDF("doc_i", "doc_j", "est_jac", "ts_ms")
  }

  /** All band keys of a signature (SimilarityJoin.bandKey per band). */
  private[graft] def allBandKeys(sig: Seq[Int], bands: Int, r: Int): Seq[Int] = {
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      out(b) = graft.operators.SimilarityJoin.bandKey(sig, b, r)
      b += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Lowest band index whose precomputed keys agree — the one bucket
    * allowed to emit a shared pair. -1 if none (unreachable when both
    * docs really share the caller's bucket). */
  private[graft] def firstSharedBand(a: Seq[Int], b: Seq[Int]): Int = {
    var i = 0
    while (i < a.length) {
      if (a(i) == b(i)) return i
      i += 1
    }
    -1
  }

  /** Agreeing-component fraction, rounded like the batch est_jac
    * (r4d = HALF_UP at 4 dp; k/numHashes · 10⁴ is exact in double for
    * power-of-two hash counts, so math.round matches Spark's round). */
  private[graft] def estJaccard(a: Seq[Int], b: Seq[Int]): Double = {
    var m = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) m += 1; i += 1 }
    math.round(m.toDouble / a.length * 10000.0) / 10000.0
  }

  /** Streaming ordered-funnel state machine — the stateful counterpart
    * of the batch `funnel_stages` key: per user, advance through
    * `stages` (stage k+1 needs an event of stages(k)'s type STRICTLY
    * after the stage-k time; stage 1 needs any event of stages(0)'s
    * type), emitting one (user_id, stage, event_type, ms) row per
    * newly-reached stage. Because each stage records the FIRST
    * qualifying event in time order, an in-order replay produces
    * exactly the batch chain-of-min-aggs result (asserted both ways in
    * StreamingParitySpec).
    *
    * Within a trigger a user's rows process in (ts_ms, event_id) order;
    * cross-trigger disorder follows the no-retroactivity rule of any
    * streaming state machine: a stage-k event arriving AFTER a later
    * trigger already passed its window is not revisited — the exactness
    * trade every incremental funnel makes. State is ≤ |stages| longs
    * per user, bounded by construction, so the default NoTimeout is
    * right on a bounded user domain; on an unbounded one pass
    * `idleTimeout` (same contract as [[runningMax]]): a user idle that
    * long is evicted, and a later return RESTARTS their funnel from
    * stage one — the documented trade of exactness for bounded state. */
  def funnelTransitions(events: Dataset[Event], stages: Seq[String],
      idleTimeout: Option[String] = None): DataFrame = {
    require(stages.nonEmpty, "funnelTransitions needs at least one stage")
    import events.sparkSession.implicits._
    idleEvictingByUser[Seq[Long], (Long, Int, String, Long)](
      events, idleTimeout)(funnelFold(stages)).toDF(
      "user_id", "stage", "event_type", "ms")
  }

  /** The pure per-trigger funnel fold — package-visible so the
    * eviction/state contract is unit-testable via TestGroupState
    * without a live query (a ProcessingTimeTimeout query schedules
    * continuous no-data batches, which makes wall-clock eviction tests
    * spin). Returning None for a user who never matched stage one
    * stores nothing and arms no timeout — noise users on an unbounded
    * domain cost zero state rows. */
  private[graft] def funnelFold(stages: Seq[String])(
      uid: Long, sortedEvs: Seq[Event],
      prior: Option[Seq[Long]]): (Option[Seq[Long]], Seq[(Long, Int, String, Long)]) = {
    var times = prior.getOrElse(Seq.empty[Long])
    val out = Seq.newBuilder[(Long, Int, String, Long)]
    sortedEvs.foreach { e =>
      val k = times.length
      if (k < stages.length && e.event_type == stages(k) &&
          (k == 0 || e.ts_ms > times.last)) {
        times = times :+ e.ts_ms
        out += ((uid, k + 1, stages(k), e.ts_ms))
      }
    }
    (if (times.nonEmpty) Some(times) else None, out.result())
  }

  /** THE shared idle-eviction plumbing behind [[funnelTransitions]] and
    * [[runningMax]] — one copy of the contract both scaladocs describe.
    * `fold` sees the user's trigger rows pre-sorted by (ts_ms,
    * event_id) plus the prior state and returns (next state, output
    * rows); returning None means "keep no state for this key" — it
    * stores nothing, arms no timeout, and REMOVES any state a prior
    * trigger stored (without the remove, stale state would survive
    * under its old timeout timestamp and could be evicted
    * mid-activity). With `idleTimeout` set, a key idle that long is
    * evicted on a later trigger (hasTimedOut → remove) and a returning
    * user starts from empty state. */
  private def idleEvictingByUser[S: org.apache.spark.sql.Encoder,
      O: org.apache.spark.sql.Encoder](events: Dataset[Event],
      idleTimeout: Option[String])(
      fold: (Long, Seq[Event], Option[S]) => (Option[S], Seq[O])): Dataset[O] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[S, O](OutputMode.Append(), timeoutConf)(
        idleEvictingFunc(idleTimeout)(fold))
  }

  /** The per-key GroupState handler [[idleEvictingByUser]] installs —
    * package-visible for TestGroupState unit tests of the timeout /
    * remove / no-state-no-timeout contract. */
  private[graft] def idleEvictingFunc[S, O](idleTimeout: Option[String])(
      fold: (Long, Seq[Event], Option[S]) => (Option[S], Seq[O]))
      : (Long, Iterator[Event], GroupState[S]) => Iterator[O] = {
    case (uid, evs, state: GroupState[S]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val (next, rows) = fold(uid,
          evs.toSeq.sortBy(e => (e.ts_ms, e.event_id)), state.getOption)
        next match {
          case Some(ns) =>
            state.update(ns)
            idleTimeout.foreach(state.setTimeoutDuration)
          case None =>
            // Fold contract: None = keep no state. Drop a prior
            // trigger's state rather than leaving it live under a stale
            // timeout (it would otherwise evict mid-activity later).
            if (state.exists) state.remove()
        }
        rows.iterator
      }
  }

  /** Per-user running maximum emitted per event — the custom-state
    * surface (flatMapGroupsWithState, one double register per user).
    * Within a trigger, a group's rows are processed in (ts_ms, event_id)
    * order; cross-trigger order is the stream's delivery order, as for
    * any per-key streaming state machine.
    *
    * State note — the EXCEPTION to this object's watermark-bounded
    * rule: a lifetime running max is inherently O(total users ever
    * seen). With the default `idleTimeout = None` state never evicts —
    * right when the user-id domain is bounded. On an unbounded domain
    * pass `Some("2 hours")`-style processing-time idleness: a user idle
    * that long is evicted (and a later return RESTARTS their max — the
    * documented trade of exactness for bounded state). */
  def runningMax(events: Dataset[Event],
      idleTimeout: Option[String] = None): DataFrame = {
    import events.sparkSession.implicits._
    idleEvictingByUser[Double, (Long, Long, Double)](events, idleTimeout) {
      (uid, sortedEvs, prior) =>
        var cur = prior.getOrElse(Double.MinValue)
        val rows = sortedEvs.map { e =>
          cur = math.max(cur, e.value)
          (uid, e.event_id, cur)
        }
        (Some(cur), rows)
    }.toDF("user_id", "event_id", "running_max")
  }

  /** [[runningMax]] on Spark 4's transformWithState — the successor
    * arbitrary-state API (SPARK-46815): named, individually-typed
    * state variables on a StatefulProcessorHandle instead of one
    * opaque GroupState blob, lifecycle hooks, per-variable TTL, and
    * state readable offline through the state data source. Semantics
    * here are IDENTICAL to the flatMapGroupsWithState form (pinned in
    * StreamingParitySpec) — one double register per user — so the two
    * faces document the migration path. Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass` =
    * ...RocksDBStateStoreProvider); the HDFS-backed default does not
    * implement the TWS operator's column-family layout. */
  class RunningMaxProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Long, Double)] {
    @transient private var maxState:
      org.apache.spark.sql.streaming.ValueState[Double] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      maxState = getHandle.getValueState[Double]("max",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Double)] = {
      var cur = if (maxState.exists()) maxState.get() else Double.MinValue
      // Same deterministic within-trigger order as the fMGWS form.
      val out = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id)).map { e =>
        cur = math.max(cur, e.value)
        (key, e.event_id, cur)
      }
      maxState.update(cur)
      out.iterator
    }
  }

  def runningMaxTws(events: Dataset[Event]): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningMaxProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "event_id", "running_max")
  }
}
