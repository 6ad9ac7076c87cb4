package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.events
import graft.Det._

/** §2.10 Streaming operators, batch-declared face (SURVEY.md).
  *
  * Each op here is the oracle-verified BATCH query over `events`; the
  * Structured Streaming variant (readStream + watermark / session_window /
  * flatMapGroupsWithState) lives in the scalatest parity suite
  * (`graft.StreamingParitySpec`), asserted to produce identical results.
  * Batch windowing uses the same `window()` expression streaming uses, so
  * the logical semantics are shared by construction.
  *
  * Scale: tumbling/sliding windows are hash-aggs keyed by (window, type) —
  * partial agg bounds shuffle by group count. Sessionization shuffles once
  * on user_id; state per key is O(1) (`max`/`sum` accumulators), matching
  * what the streaming state store would hold.
  */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  private def wUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  val queries: Map[String, Q] = Map(
    // Per 1-day tumbling window × event_type. Batch and streaming run
    // the SAME GraftStreams.tumblingCounts (the watermark node is
    // analyzer-eliminated on batch frames) — parity by construction,
    // not by copy, like stream_interval_join below.
    "stream_tumbling_counts" -> ((s, dir) =>
      GraftStreams.tumblingCounts(events(s, dir))
        .orderBy("day", "event_type")),

    // BUS-DECODE PARITY (§2.211) — the Kafka-adapter decode declared
    // as an oracle-checked key: events re-published in the bus record
    // shape (StreamSource.toBusRecords → staged parquet, the write a
    // backfill job does when re-publishing history), read back and
    // DECODED by the exact transform the KafkaShapedSource stream
    // applies (shared StreamSource.decodeBusRecords), then the
    // canonical tumbling count. The oracle aggregates the events
    // TABLE directly, so any encode/decode defect — JSON double
    // roundtrip, epoch-ms truncation, payload schema drift, a
    // corrupt-row gate that drops good rows — is a hash fail.
    // Build-once staging (the _SUCCESS marker discipline of
    // ScanQueries.writeOnce; keys run sequentially per application).
    "stream_bus_decode" -> ((s, dir) => {
      import graft.operators.ScanQueries
      val stage = s"${ScanQueries.scratch(s, dir)}/bus_records"
      if (!new java.io.File(stage, "_SUCCESS").exists())
        StreamSource.toBusRecords(events(s, dir))
          .write.mode("overwrite").parquet(stage)
      GraftStreams.tumblingCounts(StreamSource.decodeBusRecords(
          s.read.schema(StreamSource.BusRecordSchema).parquet(stage)))
        .orderBy("day", "event_type")
    }),

    // STREAM-STATIC broadcast enrichment (the deploy-anywhere
    // streaming pattern: facts stream, dimensions are a table) — the
    // batch face of GraftStreams.enrichedTumblingCounts; the
    // MemoryStream parity test drives the same declaration. Dim =
    // customer⋈nation keyed by the fixture's user_id + 1 = c_custkey
    // convention; daily nation-level counts out.
    "stream_enrich_static" -> ((s, dir) => {
      val dim = graft.Tables.t(s, dir, "customer")
        .join(graft.Tables.t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select((col("c_custkey") - 1).as("dim_user_id"), col("n_name"))
      GraftStreams.enrichedTumblingCounts(events(s, dir), dim)
        .orderBy("day", "n_name")
    }),

    // 24h-wide window sliding every 6h (epoch-aligned, 4 windows/event);
    // same shared-declaration pattern.
    "stream_sliding_avg" -> ((s, dir) =>
      GraftStreams.slidingAvg(events(s, dir))
        .orderBy("start_ms", "event_type")),

    // Gap-based sessions (gap > 30 min splits), lag + cumulative-sum form.
    "stream_session_windows" -> ((s, dir) => {
      val ms = unix_millis(col("ts").cast("timestamp"))
      val gapMs = 30L * 60 * 1000
      val newSession = when(
        ms - lag(ms, 1).over(wUser) > gapMs || lag(ms, 1).over(wUser).isNull, 1L)
        .otherwise(0L)
      events(s, dir)
        .withColumn("ms", ms)
        .withColumn("sess", sum(newSession).over(
          wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
          count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "sess")
    }),

    // SESSIONIZED FIRST-TOUCH ATTRIBUTION (round-7 verdict ask #4):
    // batch and streaming run the SAME GraftStreams.sessionFirstTouch
    // (watermark analyzer-eliminated on batch) — one session_window agg
    // whose per-key state is O(1) registers, the production streaming
    // form of attribution_first_touch. Native session_window gap rule
    // (exact-30-min gap SPLITS; see the function's scaladoc — the
    // fixture has no such gap, and the oracle encodes >= to match).
    "stream_attribution_first_touch" -> ((s, dir) =>
      GraftStreams.sessionFirstTouch(events(s, dir))
        .orderBy("user_id", "start_ms")),

    // RATE ALERTS (§2.114) — the on-call page behind every streaming
    // pipeline: hourly per-type counts judged against a STATIC
    // per-(type, hour-of-day) baseline (the stream-static shape —
    // yesterday's corpus builds the baseline, today's stream is
    // scored). Batch and streaming run the SAME GraftStreams
    // .rateAlerts over the same hourlyBaseline (watermark analyzer-
    // eliminated here); StreamingParitySpec replays the fixture
    // through a MemoryStream against the identical baseline frame.
    // The alert is the INTEGER rule n·base_hours > 3·base_sum — 3×
    // the slot's mean rate with no division anywhere.
    "stream_rate_alert" -> ((s, dir) => {
      val base = GraftStreams.hourlyBaseline(events(s, dir))
      GraftStreams.rateAlerts(events(s, dir), base)
        .orderBy("hour_ms", "event_type")
    }),

    // HOURLY TOP-K TRENDING — the dashboard composition over a
    // STREAMING aggregate: GraftStreams.hourlyTypeCounts is the
    // watermarked windowed agg (shared declaration — the watermark
    // node analyzer-eliminates on this batch frame), and the top-2
    // rank runs DOWNSTREAM of it through the custom TopKPerGroup
    // operator + row_number — the foreachBatch/sink-view pattern,
    // because Append mode cannot re-rank a window when a late row
    // lands (see hourlyTypeCounts' scaladoc). StreamingParitySpec
    // replays the fixture through a MemoryStream, ranks the sink
    // table, and pins stream == this batch face.
    "stream_hourly_topk" -> ((s, dir) => {
      val counts = GraftStreams.hourlyTypeCounts(events(s, dir))
      val w = Window.partitionBy(col("hour_ms"))
        .orderBy(col("n").desc, col("event_type"))
      graft.plans.TopKPerGroup(counts, k = 2, partNames = Seq("hour_ms"),
          orderSpec = Seq(("n", false), ("event_type", true)))
        .withColumn("rk", row_number().over(w).cast("long"))
        .orderBy("hour_ms", "rk")
    }),

    // Dedup on event_id (streaming face: watermark + dropDuplicates).
    // Batch face uses window rank=1 — dropDuplicates' survivor choice is
    // nondeterministic if the key ever carries conflicting payloads.
    "stream_dedup_watermark" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("user_id"), col("event_type"), col("ts"))
      events(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
        .orderBy("event_id")
    }),

    // Stream-stream interval join: purchases within 1h after a click by
    // the same user. Batch and streaming run the SAME GraftStreams
    // .intervalJoin (the watermark node is analyzer-eliminated on batch
    // frames), so this declared key IS the streaming logical plan.
    "stream_interval_join" -> ((s, dir) => {
      val e = events(s, dir)
      GraftStreams.intervalJoin(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"),
          key = "user_id", within = "1 hour")
        .orderBy("l_id", "r_id")
    }),

    // LEFT-OUTER stream-stream interval join (round-5 verdict ask #3):
    // same GraftStreams.intervalJoin, joinType = left_outer — clicks
    // with no purchase within the hour surface null-padded instead of
    // vanishing. In streaming the padded row emits only after the
    // watermark passes click.ts + 1h (a match could still arrive until
    // then); on this batch frame the padding is immediate — identical
    // result set, parity incl. the padded rows in StreamingParitySpec.
    "stream_interval_join_outer" -> ((s, dir) => {
      val e = events(s, dir)
      GraftStreams.intervalJoin(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "purchase"),
          key = "user_id", within = "1 hour", joinType = "left_outer")
        .orderBy(col("l_id"), col("r_id"))
    }),

    // Per-user running max emitted per event (streaming face:
    // flatMapGroupsWithState with a max register per key).
    "stream_stateful_runningmax" -> ((s, dir) => {
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          max(col("value")).over(
            wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_max"))
        .orderBy("user_id", "event_id")
    }),

    // STREAMING CDC APPLY, batch face: one Cdc.merge of the whole
    // change log into the base snapshot (≡ etl_cdc_apply's latest-wins
    // by the tombstone-carry argument in graft.operators.Cdc — the
    // merge is the SAME function CdcStreamSpec drives one micro-batch
    // at a time through foreachBatch, pinning incremental ≡ one-shot
    // including the delete-then-update reactivation case that breaks
    // physical-delete merges).
    "stream_cdc_apply" -> ((s, dir) => {
      import graft.operators.Cdc
      import graft.Tables.t
      Cdc.present(Cdc.merge(Cdc.base(t(s, dir, "customer")),
        Cdc.log(t(s, dir, "orders"))))
    }),

    // STREAMING MERGE SINK (§2.65) — the foreachBatch + MERGE
    // lakehouse-maintenance pattern as a DECLARED key: a stream of
    // per-user "latest state" rows upserts into a VersionedTable every
    // micro-batch, so the table's current version is always the
    // materialized latest-event-per-user. The batch face replays the
    // fixture in THREE ts-ordered slices through the SAME
    // VersionedTable.merge the streaming sink calls (the §2.10
    // batch-declaration convention — GraftStreams.mergeSink over a
    // MemoryStream is pinned ≡ this result in StreamingParitySpec);
    // last-write-wins across ordered slices ≡ global argmax, which is
    // exactly what the oracle computes. Replay-idempotent at the
    // table level (re-merging a slice changes nothing but the version
    // count — the mergeSink scaladoc's exactly-once-results
    // contract).
    "stream_vtab_merge" -> ((s, dir) =>
      graft.sources.VersionedTable
        .readLatest(s, streamMergeTable(s, dir))
        .select(col("user_id"), col("last_day"), col("last_type"),
          col("last_value"))
        .orderBy("user_id"))
  )

  /** Scratch VersionedTable maintained by three ordered merge "batches"
    * (the mergeSink fold, driven manually — same Session-memoized
    * rebuild discipline as ScanQueries' versioned scratch tables). */
  private def streamMergeTable(s: SparkSession, dir: String): String = {
    import graft.sources.VersionedTable
    import graft.operators.ScanQueries
    val root = s"${ScanQueries.scratch(s, dir)}/vtab_stream_merge"
    if (VersionedTable.latestVersion(root) != 2L) {
      ScanQueries.deleteRecursively(new java.io.File(root))
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        col("value"), col("ts"), col("event_id"),
        graft.Tables.epochDay("ts").as("day"))
      val b = e.agg(min(col("day")), max(col("day"))).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
      def latest(df: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("day").as("last_day"),
            col("event_type").as("last_type"),
            col("value").as("last_value"))
      }
      VersionedTable.commit(s, root,
        latest(e.filter(col("day") <= c1)), "overwrite")
      VersionedTable.merge(s, root,
        latest(e.filter(col("day") > c1 && col("day") <= c2)),
        keys = Seq("user_id"))
      VersionedTable.merge(s, root,
        latest(e.filter(col("day") > c2)), keys = Seq("user_id")): Unit
    }
    root
  }

  val oracle: Map[String, String] = Map(
    // Hourly counts vs the observed-hour baseline; the alert rule is
    // the integer comparison, no division.
    "stream_rate_alert" ->
      """WITH h AS (SELECT event_type,
        |    (epoch_ms(ts) // 3600000) * 3600000 AS hour_ms,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, (hour_ms // 3600000) % 24 AS hod,
        |    count(*) AS base_hours, CAST(sum(n) AS BIGINT) AS base_sum
        |  FROM h GROUP BY 1, 2)
        |SELECT h.hour_ms, h.event_type, h.n, b.base_hours, b.base_sum,
        |  h.n * b.base_hours > b.base_sum * 3 AS alert
        |FROM h JOIN b ON b.event_type = h.event_type
        |  AND b.hod = (h.hour_ms // 3600000) % 24
        |ORDER BY h.hour_ms, h.event_type""".stripMargin,
    // Global argmax per user ≡ last-write-wins over ts-ordered merges.
    "stream_vtab_merge" ->
      s"""WITH e AS (SELECT user_id, event_type, value, ts, event_id,
         |    ${sqlEpochDay("ts")} AS day FROM events),
         |r AS (SELECT user_id, day AS last_day, event_type AS last_type,
         |    value AS last_value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM e)
         |SELECT user_id, last_day, last_type, last_value
         |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "stream_tumbling_counts" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |count(*) AS n, ${sqlSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    // The bus roundtrip is invisible in the output: decode(encode(x))
    // must equal reading the table — the oracle IS the direct table
    // aggregate.
    "stream_bus_decode" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |count(*) AS n, ${sqlSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "stream_enrich_static" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, n_name,
         |  count(*) AS n, ${sqlSum("value")} AS sum_value
         |FROM events
         |JOIN customer ON c_custkey = user_id + 1
         |JOIN nation ON n_nationkey = c_nationkey
         |GROUP BY 1, 2 ORDER BY day, n_name""".stripMargin,
    "stream_hourly_topk" ->
      """WITH c AS (SELECT epoch_ms(ts) - epoch_ms(ts) % 3600000 AS hour_ms,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT hour_ms, event_type, n,
        |    row_number() OVER (PARTITION BY hour_ms
        |      ORDER BY n DESC, event_type) AS rk
        |  FROM c)
        |SELECT hour_ms, event_type, n, rk FROM r
        |WHERE rk <= 2 ORDER BY hour_ms, rk""".stripMargin,
    "stream_sliding_avg" ->
      s"""SELECT (epoch_ms(ts) - epoch_ms(ts) % 21600000) - 21600000 * k AS start_ms,
         |  event_type, count(*) AS n, ${sqlAvg("value")} AS avg_value
         |FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) ks
         |GROUP BY 1, 2 ORDER BY start_ms, event_type""".stripMargin,
    "stream_session_windows" ->
      s"""WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events),
         |flagged AS (SELECT *, CASE WHEN ms - lag(ms, 1) OVER w > 1800000
         |    OR lag(ms, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |sessions AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM flagged)
         |SELECT user_id, CAST(sess AS BIGINT) AS sess, min(ms) AS start_ms, max(ms) AS end_ms,
         |  count(*) AS n_events, ${sqlSum("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,
    // Native session_window rule: gap >= 30 min splits (strict-overlap
    // merge), unlike the lag-rule keys' >. first_touch/first_purchase_id
    // via IGNORE-NULLS first_value windows (DuckDB arg_min can't order
    // by a struct); (ms, event_id) is a total order so both are
    // deterministic. CASTs keep every output column BIGINT (the round-6
    // HUGEINT lesson).
    "stream_attribution_first_touch" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |  FROM events),
        |f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |    OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
        |  FROM f),
        |g AS (SELECT *,
        |  first_value(event_type) OVER ws AS first_touch,
        |  first_value(CASE WHEN event_type = 'purchase' THEN event_id END
        |    IGNORE NULLS) OVER ws AS first_purchase_id
        |  FROM s WINDOW ws AS (PARTITION BY user_id, sess
        |    ORDER BY ms, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
        |  min(first_touch) AS first_touch, count(*) AS n_events,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
        |    AS n_purchases,
        |  min(first_purchase_id) AS first_purchase_id
        |FROM g GROUP BY user_id, sess ORDER BY user_id, start_ms""".stripMargin,
    "stream_dedup_watermark" ->
      """SELECT event_id, user_id, event_type, ts_ms FROM (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY user_id, event_type, ts) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "stream_stateful_runningmax" ->
      """SELECT user_id, event_id,
        |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "stream_interval_join" ->
      """SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id,
        |  epoch_ms(p.ts) - epoch_ms(c.ts) AS lag_ms
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY l_id, r_id""".stripMargin,
    // etl_cdc_apply's CTE without the action tag (the streaming state
    // does not carry it) — same latest-wins, same branches.
    "stream_cdc_apply" ->
      """WITH base AS (SELECT c_custkey AS key, c_name AS name,
        |    c_acctbal AS acctbal FROM customer),
        |cdc AS (SELECT
        |    CASE WHEN o_custkey % 10 = 0 THEN -o_custkey - 1
        |         ELSE o_custkey END AS key,
        |    o_orderkey AS version,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    ROUND(o_totalprice / 100.0 * 10000) / 10000 AS new_bal
        |  FROM orders),
        |latest AS (SELECT key, version, op, new_bal FROM (
        |    SELECT *, row_number() OVER (PARTITION BY key
        |      ORDER BY version DESC) AS rn FROM cdc) WHERE rn = 1)
        |SELECT coalesce(b.key, l.key) AS key,
        |  coalesce(b.name, 'new-' || coalesce(b.key, l.key)) AS name,
        |  CASE WHEN l.op = 'U' THEN l.new_bal ELSE b.acctbal END AS acctbal,
        |  l.version AS version
        |FROM base b FULL OUTER JOIN latest l ON b.key = l.key
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY key""".stripMargin,
    // NULLS FIRST pins DuckDB's null placement to Spark's asc default
    // (nulls first) — a padded row and a matched row can share an l_id.
    "stream_interval_join_outer" ->
      """SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id,
        |  epoch_ms(p.ts) - epoch_ms(c.ts) AS lag_ms
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY l_id, r_id NULLS FIRST""".stripMargin
  )
}
