package graft

import org.apache.spark.sql.functions._

case class MediaRow(doc_id: Long, bytes: Array[Byte], width: Int, height: Int)
case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: Long,
    n_patches: Long)

/** Multimodal binary-column plumbing: opaque bytes + typed metadata flow
  * through a partition-batched "decode" step. The decode itself is a
  * deterministic STUB (image/audio codecs are absent in this container);
  * everything Spark-side — schema, batching shape, partition preservation
  * — is real, mirroring how a decode UDF over binary columns runs at
  * scale (one library init per partition, streamed rows).
  */
class MultimodalSpec extends SparkSpec {

  test("binary column + metadata survive a partition-batched decode stub") {
    import spark.implicits._
    val media = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"),
        (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"))
      .as[MediaRow]
      .repartition(4, col("doc_id"))

    val decoded = media.mapPartitions { rows =>
      // STUB: a real implementation would init a codec here, once per
      // partition, then decode each frame. The fake is deterministic.
      rows.map { r =>
        val checksum = r.bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL)
        val patches = (r.width.toLong / 16) * (r.height.toLong / 16)
        MediaFeatures(r.doc_id, r.bytes.length.toLong, checksum, patches)
      }
    }

    val out = decoded.toDF()
    assert(out.columns.toSeq == Seq("doc_id", "byte_len", "checksum", "n_patches"))
    assert(out.count() == 500)
    assert(out.rdd.getNumPartitions == 4, "decode must preserve partitioning")
    // byte_len of utf-8 ASCII text == n_chars: cross-check vs source column.
    val mismatch = out.join(Tables.t(spark, sf, "documents"), "doc_id")
      .filter(col("byte_len") =!= col("n_chars")).count()
    assert(mismatch == 0)
    // Deterministic across runs.
    val second = media.mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.doc_id, r.bytes.length.toLong,
        r.bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL),
        (r.width.toLong / 16) * (r.height.toLong / 16)))
    }.toDF()
    assert(out.orderBy("doc_id").collect().toSeq ==
      second.orderBy("doc_id").collect().toSeq)
  }
}
