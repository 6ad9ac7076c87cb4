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

  test("ImageIoDecoder.channelStats: PNG roundtrip sums match the gradient closed form") {
    // The §2.209 key's engine half in isolation: encode the seed-keyed
    // gradient to PNG, decode through the new channelStats face, and
    // check per-channel sums against the congruence computed
    // independently here — any color-model or byte-lane mix-up is a
    // sum mismatch.
    val dec = new graft.multimodal.ImageIoDecoder
    for ((id, w, h) <- Seq((5L, 9, 4), (6L, 17, 2), (7L, 3, 8))) {
      val st = dec.channelStats(MediaRow(id,
        graft.multimodal.ImageIoDecoder.syntheticPng(id, w, h), 1, 1))
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = (id * 1103515245L + x * 65537L + y * 257L) & 0xffffff
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
      assert((st.width, st.height, st.n_pixels) == (w.toLong, h.toLong, w.toLong * h),
        s"doc $id dims: $st")
      assert((st.sum_r, st.sum_g, st.sum_b) == (sr, sg, sb),
        s"doc $id channel sums: $st != ($sr,$sg,$sb)")
    }
    // Lossy containers stay rejected on this face too.
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0, 0)
    val e = intercept[IllegalArgumentException] {
      dec.channelStats(MediaRow(8L, jpegish, 1, 1)) }
    assert(e.getMessage.contains("8") && e.getMessage.contains("lossless"))
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

  // ---- round-16: the from-scratch PpmBmpDecoder (no codec library) ----

  test("PPM parser: header grammar (comments/whitespace), exact channel sums") {
    import graft.multimodal.{PpmBmpDecoder, Ppm}
    val dec = new PpmBmpDecoder
    // Hand-built 2x2 P6 with a comment and mixed whitespace: pixels
    // (r,g,b) = (1,2,3) (4,5,6) (7,8,9) (10,11,12).
    val hdr = "P6 # wide\n# a comment line\n 2\t2\n255\n"
      .getBytes("US-ASCII")
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val st = dec.channelStats(MediaRow(1L, hdr ++ px, 2, 2))
    assert((st.width, st.height, st.n_pixels) == (2L, 2L, 4L))
    assert((st.sum_r, st.sum_g, st.sum_b) == (22L, 26L, 30L))
    // P5 grayscale fills r = g = b.
    val g5 = "P5\n3 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30)
    val sg = dec.channelStats(MediaRow(2L, g5, 3, 1))
    assert(sg.n_pixels == 3 && sg.sum_r == 60 && sg.sum_g == 60 && sg.sum_b == 60)
    // Synthesized bytes decode back to the generating congruences.
    val syn = dec.channelStats(MediaRow(9L, Ppm.synthesize(9L, 5L, 4, 3), 4, 3))
    val n = 12
    val expR = (0 until n).map(i => (3 * 9 + 7 * i) % 256).sum
    val expG = (0 until n).map(i => (5 + 11 * i) % 256).sum
    val expB = (0 until n).map(i => (5 * i + 13) % 256).sum
    assert((syn.sum_r, syn.sum_g, syn.sum_b) == (expR.toLong, expG.toLong, expB.toLong))
  }

  test("BMP parser: 24bpp row padding + bottom-up order, parity with PPM pixels") {
    import graft.multimodal.PpmBmpDecoder
    val dec = new PpmBmpDecoder
    // Hand-built 3x2 24bpp BMP, bottom-up, stride 12 (9 data + 3 pad).
    // Display rows: top = (1,2,3)(4,5,6)(7,8,9), bottom = (10,11,12)...
    def bmp(topDown: Boolean): Array[Byte] = {
      val w = 3; val h = 2; val stride = 12
      val out = new Array[Byte](54 + stride * h)
      out(0) = 'B'; out(1) = 'M'
      def le32(o: Int, v: Int): Unit = { out(o) = v.toByte
        out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte
        out(o + 3) = (v >> 24).toByte }
      le32(2, out.length); le32(10, 54); le32(14, 40); le32(18, w)
      le32(22, if (topDown) -h else h)
      out(26) = 1; out(28) = 24; le32(30, 0)
      val rows = Seq( // display order, (r,g,b) per pixel
        Seq((1, 2, 3), (4, 5, 6), (7, 8, 9)),
        Seq((10, 11, 12), (13, 14, 15), (16, 17, 18)))
      for ((row, y) <- rows.zipWithIndex; (px, x) <- row.zipWithIndex) {
        val srcRow = if (topDown) y else h - 1 - y
        val o = 54 + srcRow * stride + x * 3
        out(o) = px._3.toByte; out(o + 1) = px._2.toByte // BGR
        out(o + 2) = px._1.toByte
      }
      out
    }
    for (td <- Seq(false, true)) {
      val st = dec.channelStats(MediaRow(3L, bmp(td), 3, 2))
      assert((st.width, st.height, st.n_pixels) == (3L, 2L, 6L))
      assert((st.sum_r, st.sum_g, st.sum_b) == (51L, 57L, 63L),
        s"topDown=$td channel sums wrong: $st")
    }
  }

  test("PpmBmp decoder: malformed bytes fail loudly with the doc_id") {
    import graft.multimodal.PpmBmpDecoder
    val dec = new PpmBmpDecoder
    val truncated = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)
    val e1 = intercept[Exception] {
      dec.channelStats(MediaRow(77L, truncated, 4, 4)) }
    assert(e1.getMessage.contains("77") && e1.getMessage.contains("truncated"))
    val unknown = Array[Byte]('X', 'Y', 'Z')
    val e2 = intercept[Exception] {
      dec.channelStats(MediaRow(78L, unknown, 1, 1)) }
    assert(e2.getMessage.contains("78"))
    val maxval = "P6\n1 1\n65535\n".getBytes("US-ASCII") ++ Array[Byte](0, 0)
    val e3 = intercept[Exception] {
      dec.channelStats(MediaRow(79L, maxval, 1, 1)) }
    assert(e3.getMessage.contains("79") && e3.getMessage.contains("maxval"))
    // Junk (non-whitespace) after maxval: without the whitespace gate
    // this shifted sample alignment by one byte and decoded silently
    // wrong — must raise with the doc_id instead (r16 advice).
    val junkSep = "P6\n1 1\n255X".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40)
    val e4 = intercept[Exception] {
      dec.channelStats(MediaRow(80L, junkSep, 1, 1)) }
    assert(e4.getMessage.contains("80")
      && e4.getMessage.contains("whitespace after maxval"), e4.getMessage)
    // BMP with a corrupt pixel-array offset: a negative or in-header
    // dataOff made the truncation check MORE permissive and then either
    // threw a bare AIOOBE or silently decoded header bytes as pixels —
    // must raise with the doc_id (r16 advice).
    def badOffBmp(dataOff: Int): Array[Byte] = {
      val out = new Array[Byte](54 + 16)
      out(0) = 'B'; out(1) = 'M'
      def le32(o: Int, v: Int): Unit = { out(o) = v.toByte
        out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte
        out(o + 3) = (v >> 24).toByte }
      le32(2, out.length); le32(10, dataOff); le32(14, 40); le32(18, 2)
      le32(22, 2); out(26) = 1; out(28) = 24; le32(30, 0)
      out
    }
    for (off <- Seq(-8, 0, 20)) {
      val e5 = intercept[Exception] {
        dec.channelStats(MediaRow(81L, badOffBmp(off), 2, 2)) }
      assert(e5.getMessage.contains("81")
        && e5.getMessage.contains("pixel-array offset"),
        s"off=$off: ${e5.getMessage}")
    }
  }

  test("decodeChannelStats: partition-batched end-to-end over synthesized PPMs") {
    import graft.multimodal.{MediaPipeline, MediaRow, Ppm}
    import spark.implicits._
    val rows = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .map { case (id, nc) =>
        MediaRow(id, Ppm.synthesize(id, nc, (nc % 16 + 2).toInt,
          (id % 8 + 2).toInt), (nc % 16 + 2).toInt, (id % 8 + 2).toInt) }
    val st = MediaPipeline.decodeChannelStats(rows, parallelism = 4)
    assert(st.rdd.getNumPartitions == 4)
    val out = st.toDF().orderBy("doc_id").collect()
    assert(out.length == 500)
    // Spot-check one doc against the closed forms.
    val r0 = out.head
    val (id, nc) = (r0.getLong(0),
      Tables.t(spark, sf, "documents").filter(col("doc_id") === r0.getLong(0))
        .head.getAs[Long]("n_chars"))
    val n = ((nc % 16 + 2) * (id % 8 + 2)).toInt
    assert(r0.getLong(3) == n)
    assert(r0.getLong(4) == (0 until n).map(i => (3 * id + 7 * i) % 256).sum)
  }
}
