package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaFeatures, MediaPipeline, MediaRow, StubDecoder}

/** Multimodal binary-column plumbing, driven through the PUBLIC
  * `graft.multimodal.MediaPipeline` API: opaque bytes + typed metadata
  * flow through a partition-batched decode with one decoder init per
  * partition. The decode itself is a deterministic STUB (image/audio
  * codecs are absent in this container); everything Spark-side — schema,
  * batching shape, partition preservation, open/close lifecycle — is
  * real, mirroring how a decode step over binary columns runs at scale.
  */
class MultimodalSpec extends SparkSpec {

  test("binary column + metadata survive a partition-batched decode stub") {
    val media = MediaPipeline.fromDocuments(spark, sf)
    val out = MediaPipeline.decodeFeatures(media, parallelism = 4).toDF()

    assert(out.columns.toSeq == Seq("doc_id", "byte_len", "checksum", "n_patches"))
    assert(out.count() == 500)
    assert(out.rdd.getNumPartitions == 4, "decode must preserve partitioning")
    // byte_len of utf-8 ASCII text == n_chars: cross-check vs source column.
    val mismatch = out.join(Tables.t(spark, sf, "documents"), "doc_id")
      .filter(col("byte_len") =!= col("n_chars")).count()
    assert(mismatch == 0)
    // Deterministic across runs.
    val second = MediaPipeline.decodeFeatures(media, parallelism = 4).toDF()
    assert(out.orderBy("doc_id").collect().toSeq ==
      second.orderBy("doc_id").collect().toSeq)
  }

  test("decoder lifecycle: open/close called once per partition") {
    // Counters must survive serialization to the (local-mode) executor;
    // use a JVM-global accumulator-ish holder keyed by partition.
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val counting = new graft.multimodal.MediaDecoder {
      override def open(): Unit = opens.add(1)
      override def features(r: MediaRow): MediaFeatures = StubDecoder.features(r)
      override def close(): Unit = closes.add(1)
    }
    val n = MediaPipeline.decodeFeatures(
      MediaPipeline.fromDocuments(spark, sf), counting, parallelism = 4).count()
    assert(n == 500)
    assert(opens.value == 4, s"expected 4 opens, got ${opens.value}")
    assert(closes.value == 4, s"expected 4 closes, got ${closes.value}")
  }
}
