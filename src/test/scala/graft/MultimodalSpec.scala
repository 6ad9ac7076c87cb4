package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaFeatures, MediaPipeline, MediaRow, StubDecoder}

/** Multimodal binary-column plumbing, driven through the PUBLIC
  * `graft.multimodal.MediaPipeline` API: opaque bytes + typed metadata
  * flow through a partition-batched decode with one decoder init per
  * partition. Most tests drive the deterministic STUB decoder (external
  * image/audio codec libraries are absent in this container); the final
  * test swaps in the REAL pure-JVM codec (`ImageIoDecoder`, javax.imageio
  * PNG) behind the same contract and decodes actual image bytes
  * end-to-end — everything Spark-side — schema, batching shape,
  * partition preservation, open/close lifecycle — is identical between
  * the two, which is the contract's whole point.
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

  test("frame sampling keeps every nth frame with correct count and bytes") {
    val media = MediaPipeline.fromDocuments(spark, sf)
    val frames = MediaPipeline.sampleFrames(media, every = 2, parallelism = 4)
    val byDoc = frames.toDF().groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), max(col("frame_idx")).as("max_idx"))
      .join(Tables.t(spark, sf, "documents"), "doc_id")
      // ASCII fixture: bytes == chars, so total frames = ceil(n_chars/64),
      // sampled = ceil(total/2); max sampled idx = largest even < total.
      .withColumn("total", ceil(col("n_chars") / 64.0))
      .filter(col("n_frames") =!= ceil(col("total") / 2.0)
        || col("max_idx") =!= (ceil(col("total") / 2.0) - 1) * 2)
    assert(byDoc.count() == 0, "frame count or sampled indices wrong")
    // Only even frame indices survive every=2, and bytes slice correctly.
    import spark.implicits._
    val bad = frames.filter(f => f.frame_idx % 2 != 0).count()
    assert(bad == 0)
    val one = frames.filter(_.doc_id == 0L).collect().sortBy(_.frame_idx)
    val text = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === 0L).select("text").head().getString(0)
    val expected = text.getBytes("UTF-8").grouped(64).zipWithIndex
      .filter(_._2 % 2 == 0).map(_._1.toSeq).toSeq
    assert(one.map(_.frame_bytes.toSeq).toSeq == expected)
  }

  test("frame decoder lifecycle matches partition count and is lazy-safe under limit") {
    val opens = spark.sparkContext.longAccumulator("fopens")
    val closes = spark.sparkContext.longAccumulator("fcloses")
    val counting = new graft.multimodal.FrameDecoder {
      override def open(): Unit = opens.add(1)
      override def frames(r: MediaRow) = graft.multimodal.StubFrameDecoder.frames(r)
      override def close(): Unit = closes.add(1)
    }
    // limit() abandons iterators mid-partition — close must still fire
    // (via the task-completion listener, not iterator exhaustion).
    val got = MediaPipeline.sampleFrames(
      MediaPipeline.fromDocuments(spark, sf), every = 2, counting,
      parallelism = 4).limit(3).count()
    assert(got == 3)
    assert(closes.value == opens.value,
      s"decoder leak: ${opens.value} opens vs ${closes.value} closes")
  }

  test("REAL codec end-to-end: ImageIO PNG bytes decode through the same pipeline") {
    // Round-8: the decode contract run with an actual pure-JVM codec —
    // real PNG bytes in the binary column, decoded dimensions (not the
    // metadata dims) driving the features. MediaRow's width/height are
    // deliberately WRONG here to prove the decoder reads the raster.
    import org.apache.spark.sql.{Encoders, Dataset}
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    val dims = Seq((1L, 33, 17), (2L, 64, 64), (3L, 16, 48), (4L, 100, 7))
    val media: Dataset[MediaRow] = spark.createDataset(dims.map {
      case (id, w, h) =>
        MediaRow(id, graft.multimodal.ImageIoDecoder.syntheticPng(id, w, h),
          width = 1, height = 1)
    })
    val out = MediaPipeline.decodeFeatures(media,
        decoder = new graft.multimodal.ImageIoDecoder, parallelism = 2)
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, w, h) <- dims) {
      val f = out(id)
      // Real patch counts from the DECODED raster (metadata said 1×1).
      assert(f.n_patches == (w.toLong / 16) * (h.toLong / 16),
        s"doc $id: patches ${f.n_patches} not from decoded ${w}x$h")
      // PNG is lossless: the pixel checksum must equal the rolling hash
      // over the exact pixels syntheticPng wrote, computed independently
      // here (TYPE_INT_RGB decodes with opaque alpha: 0xff prefix).
      var want = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = id * 1103515245L + x * 65537L + y * 257L
        val argb = 0xff000000L | (v & 0xffffff)
        want = (want * 31 + (argb & 0xffffffffL)) & 0xffffffffL
      }
      assert(f.checksum == want,
        s"doc $id: pixel checksum ${f.checksum} != expected $want")
      assert(f.byte_len > 0 && f.byte_len < 4L * w * h + 4096,
        s"doc $id: implausible png size ${f.byte_len}")
    }
    // Undecodable bytes fail LOUDLY with the doc id, not silently.
    val bad = spark.createDataset(Seq(MediaRow(99L,
      Array[Byte](1, 2, 3, 4), 1, 1)))
    val err = intercept[org.apache.spark.SparkException] {
      MediaPipeline.decodeFeatures(bad,
        decoder = new graft.multimodal.ImageIoDecoder).collect()
    }
    assert(err.getMessage != null)
  }

  test("lossy containers are rejected before decode (checksum determinism gate)") {
    // Round-9 advice fix: JPEG decode is implementation-defined across
    // JRE/libjpeg builds, so the same bytes could checksum differently
    // on different executors. The magic-byte gate rejects it loudly.
    import graft.multimodal.ImageIoDecoder
    val png = ImageIoDecoder.syntheticPng(7L, 32, 32)
    assert(ImageIoDecoder.isLosslessContainer(png))
    // A real JPEG byte stream (SOI + JFIF marker prefix) must be refused
    // even though javax.imageio could decode it.
    val jpegMagic = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte, 0, 0x10, 'J', 'F', 'I', 'F', 0)
    assert(!ImageIoDecoder.isLosslessContainer(jpegMagic))
    val err = intercept[Exception] {
      new ImageIoDecoder().features(MediaRow(42L, jpegMagic, 1, 1))
    }
    assert(err.getMessage.contains("42") &&
      err.getMessage.contains("lossless"))
  }
}
