package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bus-adapter seam (round-16 verdict item 6): WHERE the events stream
  * comes from — a Kafka topic, a kinesis shard, a file drop — is a
  * deployment detail; every transform in [[GraftStreams]] consumes one
  * canonical streaming frame. A `StreamSource` owns exactly the
  * construction + decode step, so swapping file-replay for a real bus
  * adapter changes ONE constructor call and zero transforms.
  *
  * The contract every implementation must meet ([[StreamSource.EventSchema]]):
  *
  * {{{ event_id LONG, ts TIMESTAMP, user_id LONG,
  *     event_type STRING, value DOUBLE, props STRING }}}
  *
  * `ts` must be TIMESTAMP (not NTZ) because event-time watermarks
  * require it; under the engine's pinned UTC session timezone the
  * values are identical.
  *
  * No Kafka broker exists in this environment, so the bus adapter is
  * pinned through [[KafkaShapedSource]]: a source whose INPUT is the
  * exact record shape Spark's Kafka source emits (key/value binary +
  * topic/partition/offset/timestamp) staged as parquet files, and whose
  * decode (value bytes → from_json → typed columns) is byte-for-byte
  * the transform a real `spark.readStream.format("kafka")` consumer
  * needs. Going live = replacing the staged-file scan with the kafka
  * reader; the decode select and everything downstream is unchanged.
  */
trait StreamSource extends Serializable {
  /** The canonical streaming events frame (see [[StreamSource.EventSchema]]). */
  def events(spark: SparkSession): DataFrame
}

object StreamSource {
  /** Canonical post-decode schema every source must emit. */
  val EventSchema: String =
    "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE, props STRING"

  /** The wire schema of a bus record — the column set Spark's Kafka
    * source emits (timestamp renamed bus_ts to keep the event-time
    * column unambiguous downstream). */
  val BusRecordSchema: String =
    "key BINARY, value BINARY, topic STRING, partition INT, " +
      "offset LONG, bus_ts TIMESTAMP"

  /** The payload grammar on the bus: one JSON object per record value.
    * ts travels as epoch millis (the fixture's native resolution) —
    * a bus payload should never carry an engine-specific timestamp
    * encoding. */
  private[streaming] val PayloadSchema: String =
    "event_id LONG, ts_ms LONG, user_id LONG, " +
      "event_type STRING, value DOUBLE, props STRING"

  /** DECODE bus records (the [[BusRecordSchema]] column shape) into the
    * canonical events frame — the adapter transform itself, shared by
    * the streaming [[KafkaShapedSource]] and the batch-declared
    * `stream_bus_decode` key (same bytes → same rows whichever engine
    * mode replays them). Corrupt payloads surface as NULL event_ids
    * (from_json's PERMISSIVE contract) and are dropped here — the
    * dead-letter branch of a production adapter; silently passing
    * nulls downstream would poison every keyed state store. */
  def decodeBusRecords(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(PayloadSchema)).as("e"))
      .filter(col("e.event_id").isNotNull)
      .select(col("e.event_id").as("event_id"),
        timestamp_millis(col("e.ts_ms")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"))

  /** ENCODE a batch events frame (Tables.events shape: ts timestamp-like)
    * into bus records — the test fake's producer half, and the shape a
    * replay/backfill job writes when re-publishing history to the bus.
    * Key = event_id bytes (per-entity ordering on a real bus); offset =
    * event_id (unique, monotone per fixture construction). */
  def toBusRecords(events: DataFrame): DataFrame =
    events.select(
      col("event_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
        col("user_id"), col("event_type"), col("value"), col("props")))
        .cast("binary").as("value"),
      lit("events").as("topic"),
      pmod(col("user_id"), lit(4)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").cast("timestamp").as("bus_ts"))
}

/** File-replay source — the fixture path, delegating to the existing
  * probe-aware parquet-dir reader (see its scaladoc for the ts
  * generation handling and checkpoint/restart caveats). */
class ParquetDirSource(dir: String, tsIsNanos: Option[Boolean] = None)
    extends StreamSource {
  override def events(spark: SparkSession): DataFrame =
    GraftStreams.eventsFromParquetDir(spark, dir, tsIsNanos)
}

/** Kafka-shaped source: streams [[StreamSource.BusRecordSchema]] records
  * from a staged parquet directory and DECODES value bytes into the
  * canonical frame. The decode select is the actual Kafka-adapter
  * transform (cast binary → string, from_json with the payload schema,
  * epoch-millis → TIMESTAMP); only the record scan line is
  * environment-specific. Corrupt payloads surface as NULL event_ids
  * (from_json's PERMISSIVE contract) rather than killing the stream —
  * filtered here with a count the dead-letter queue of a production
  * adapter would absorb; silently passing nulls downstream would
  * poison every keyed state store. */
class KafkaShapedSource(dir: String) extends StreamSource {
  override def events(spark: SparkSession): DataFrame =
    StreamSource.decodeBusRecords(spark.readStream
      .schema(StreamSource.BusRecordSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir))
}
