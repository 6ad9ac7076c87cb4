package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Det

/** Event record for the typed streaming APIs — the `events` table schema
  * with an epoch-millis timestamp (what a message-bus source delivers). */
case class Event(event_id: Long, ts_ms: Long, user_id: Long,
    event_type: String, value: Double)

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

  /** File-source replay of an `events.parquet` directory. Spark 4 refuses
    * parquet TIMESTAMP(NANOS); read nanos as long (legacy conf) and
    * convert to a µs TIMESTAMP — same recipe as the batch loader
    * (graft.Tables.events) except TIMESTAMP instead of NTZ, because
    * event-time watermarks require TIMESTAMP (equal values under the
    * engine's pinned UTC session timezone).
    *
    * Deliberate documented side effect (same contract as Tables.events):
    * nanosAsLong stays set for the session — restoring it mid-plan risks
    * executor-side re-reads under the old conf, so later NANOS parquet
    * columns surface as LONG nanos (visible in the schema, never a
    * silently wrong timestamp). */
  def eventsFromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir)
      // FLOOR division nanos→micros: `ts div 1000` truncates toward
      // zero, which would round pre-epoch (negative) timestamps 1 µs
      // UP. Integer-only floor-div (no double cast — 1e18 nanos is past
      // double's 2^53 exact range).
      .withColumn("ts",
        timestamp_micros(expr("(ts - ((ts % 1000) + 1000) % 1000) div 1000")))
  }

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

  /** Exactly-once-per-event_id stream: duplicates arriving within the
    * watermark horizon are dropped; state for an id is reclaimed once the
    * watermark passes it. Uses dropDuplicatesWithinWatermark — plain
    * dropDuplicates("event_id") would never evict (Spark only builds the
    * eviction predicate when the event-time column is in the key set),
    * growing state by every id ever seen. */
  def dedupByEventId(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

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
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, (Long, Long, Double)](
        OutputMode.Append(), timeoutConf) {
        case (uid, evs, state: GroupState[Double]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.getOrElse(Double.MinValue)
            val rows = evs.toSeq.sortBy(e => (e.ts_ms, e.event_id)).map { e =>
              cur = math.max(cur, e.value)
              (uid, e.event_id, cur)
            }
            state.update(cur)
            idleTimeout.foreach(state.setTimeoutDuration)
            rows.iterator
          }
      }.toDF("user_id", "event_id", "running_max")
  }
}
