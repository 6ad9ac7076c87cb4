package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One media item: opaque content bytes + typed metadata. At 100 TB the
  * `bytes` column is the dominant I/O cost; everything else is metadata
  * that should be readable WITHOUT touching the blobs (parquet column
  * pruning does exactly that when a query needs only metadata). */
case class MediaRow(doc_id: Long, bytes: Array[Byte], width: Int, height: Int)

/** Decoded per-item features (the stub's schema: real decoders would add
  * embedding/frame columns the same way). */
case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: Long,
    n_patches: Long)

/** One sampled frame of a (video-like) media item. */
case class MediaFrame(doc_id: Long, frame_idx: Long, frame_bytes: Array[Byte])

/** Per-partition decode contract: `open()` runs ONCE per partition (codec
  * or native-library init — the expensive part a per-row UDF would pay
  * per row), `features` per item, `close()` after the partition drains.
  */
trait MediaDecoder extends Serializable {
  def open(): Unit = ()
  def features(row: MediaRow): MediaFeatures
  def close(): Unit = ()
}

/** Decoders that can additionally emit exact per-channel pixel sums in
  * one decode pass — the face [[MediaPipeline.decodeChannelStats]]
  * batches. Both real decoders implement it: the hand-written
  * [[PpmBmpDecoder]] (streaming, no raster) and the JDK-codec
  * [[ImageIoDecoder]] (PNG/BMP/GIF through javax.imageio). */
trait ChannelStatsDecoder extends MediaDecoder {
  def channelStats(row: MediaRow): ChannelStats
}

/** Frame-extraction contract (video/audio): same per-partition lifecycle
  * as [[MediaDecoder]]; `frames` must return a LAZY iterator so a long
  * medium never materializes all its frames at once. */
trait FrameDecoder extends Serializable {
  def open(): Unit = ()
  def frames(row: MediaRow): Iterator[MediaFrame]
  def close(): Unit = ()
}

/** STUB frame decoder — a real one would hand chunks to a video codec;
  * this one treats the blob as fixed-size 64-byte "frames" (grouped
  * iterator: lazy, O(frame) memory). The sampling/plumbing around it is
  * the production shape. */
object StubFrameDecoder extends FrameDecoder {
  val frameBytes = 64
  override def frames(r: MediaRow): Iterator[MediaFrame] =
    r.bytes.grouped(frameBytes).zipWithIndex.map { case (b, i) =>
      MediaFrame(r.doc_id, i.toLong, b)
    }
}

/** STUB decoder — external image/audio codec LIBRARIES are absent in
  * this environment, so this "decode" is a deterministic fake (rolling
  * checksum + 16×16 patch count) usable on arbitrary bytes. The
  * Spark-side contract around it (binary column, partition batching,
  * one init per partition, streamed rows) is the real production shape;
  * [[ImageIoDecoder]] is the proof — the JDK-built-in codec path behind
  * the identical contract, tested on real PNG bytes in MultimodalSpec. */
object StubDecoder extends MediaDecoder {
  override def features(r: MediaRow): MediaFeatures = {
    val checksum =
      r.bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL)
    val patches = (r.width.toLong / 16) * (r.height.toLong / 16)
    MediaFeatures(r.doc_id, r.bytes.length.toLong, checksum, patches)
  }
}

/** REAL pure-JVM image decode behind the same [[MediaDecoder]] contract
  * the stub documents — javax.imageio, gated to LOSSLESS containers
  * (PNG/BMP/GIF via magic bytes — see
  * [[ImageIoDecoder.isLosslessContainer]]; lossy codecs like JPEG are
  * rejected because their decode is implementation-defined and would
  * break cross-executor checksum determinism). Nothing else in the
  * pipeline changes: swap
  * `StubDecoder` for `ImageIoDecoder` in [[MediaPipeline.decodeFeatures]]
  * and the same binary column, partition batching and task-completion
  * close discipline now run a real codec.
  *
  * Features from the DECODED pixels, not the container bytes: width ×
  * height come from the decoded raster (so n_patches is the real 16×16
  * patch count a ViT-style tokenizer would produce — the MediaRow's
  * metadata dims are NOT trusted), and checksum is the stub's rolling
  * hash over the row-major ARGB pixels — deterministic across JVMs for
  * the same pixel data because PNG decode is exact by spec. Undecodable
  * bytes raise with the doc_id (loud, attributable — the multimodal
  * equivalent of Det.checkedN; a silent skip would make corpus counts
  * drift from manifest counts).
  *
  * Scale note: pixels are read through one bulk `getRGB(x0,y0,w,h,...)`
  * per ROW-STRIP, not per pixel (the per-pixel accessor pays a color
  * model dispatch per call), strip-sized buffer — O(width) extra memory
  * per item regardless of height. */
class ImageIoDecoder extends ChannelStatsDecoder {
  override def open(): Unit =
    // No file-backed scratch cache: decode fully in memory (the bytes
    // already are), and nothing to clean on close.
    javax.imageio.ImageIO.setUseCache(false)
  override def features(r: MediaRow): MediaFeatures = {
    // Container gate BEFORE decode: the determinism claim (checksum
    // stable across JVMs/executors) holds only for LOSSLESS codecs
    // whose decode is exact by spec — PNG, BMP, GIF. JPEG decode is
    // implementation-defined (IDCT rounding differs across
    // JRE/libjpeg builds), so the same bytes could yield different
    // checksums on different executors: rejected loudly here, same
    // doc_id-attributable contract as undecodable bytes.
    require(ImageIoDecoder.isLosslessContainer(r.bytes),
      s"doc ${r.doc_id}: container is not a lossless format " +
        "(PNG/BMP/GIF) — decode would not be checksum-deterministic " +
        "across executors")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.bytes))
    require(img != null,
      s"doc ${r.doc_id}: bytes are not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val strip = new Array[Int](w)
    var cs = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, strip, 0, w)
      var x = 0
      while (x < w) {
        cs = (cs * 31 + (strip(x).toLong & 0xffffffffL)) & 0xffffffffL
        x += 1
      }
      y += 1
    }
    MediaFeatures(r.doc_id, r.bytes.length.toLong, cs,
      (w.toLong / 16) * (h.toLong / 16))
  }

  /** Exact per-channel sums from the decoded raster — same row-strip
    * bulk read as [[features]] (O(width) memory), same lossless-only
    * container gate, so the sums are deterministic across executors. */
  override def channelStats(r: MediaRow): ChannelStats = {
    require(ImageIoDecoder.isLosslessContainer(r.bytes),
      s"doc ${r.doc_id}: container is not a lossless format " +
        "(PNG/BMP/GIF) — decode would not be deterministic across executors")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.bytes))
    require(img != null,
      s"doc ${r.doc_id}: bytes are not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val strip = new Array[Int](w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, strip, 0, w)
      var x = 0
      while (x < w) {
        val p = strip(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    ChannelStats(r.doc_id, w.toLong, h.toLong, w.toLong * h, sr, sg, sb)
  }
}

object ImageIoDecoder {
  /** Magic-byte check for the lossless containers whose decode is
    * exact by spec (PNG / BMP / GIF — what the determinism contract
    * requires). A format gate on BYTES, not on ImageIO's registry:
    * the registry happily hands back a JPEG reader, and lossy decode
    * is exactly what must not reach the checksum. */
  def isLosslessContainer(b: Array[Byte]): Boolean =
    b.length >= 6 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))

  /** Deterministic synthetic PNG (seed-keyed RGB gradient) — the test
    * fixture generator, and a template for backfilling a media column
    * where real blobs are absent. Lossless round-trip: decoding this
    * PNG returns exactly the pixels written. */
  def syntheticPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = seed * 1103515245L + x * 65537L + y * 257L
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}

/** Per-channel pixel statistics — what [[PpmBmpDecoder.channelStats]]
  * produces: the decoded raster's true dims plus exact per-channel
  * sums (means derive downstream; sums stay exact integers through
  * any later rollup). */
case class ChannelStats(doc_id: Long, width: Long, height: Long,
    n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

/** REAL from-scratch image parser — no codec library, not even
  * javax.imageio (the [[ImageIoDecoder]] path): a hand-written binary
  * reader for the two simplest lossless raster containers,
  *
  *  - **PPM/PGM** (P6 binary RGB / P5 binary grayscale): header magic,
  *    whitespace + `#`-comment skipping per the netpbm grammar, maxval
  *    ≤ 255, then `w·h·3` (or `w·h`) raw sample bytes;
  *  - **BMP** (BITMAPINFOHEADER, uncompressed 24 bpp): little-endian
  *    header fields, BGR sample order, 4-byte row padding, bottom-up
  *    (positive height) or top-down (negative) row order.
  *
  * Both decodes are exact by spec, so every derived number is
  * deterministic across JVMs/executors — the same contract gate
  * ImageIoDecoder enforces by magic bytes. Malformed bytes raise with
  * the doc_id (loud, attributable; a silent skip would drift corpus
  * counts from manifests). Grayscale fills r = g = b.
  *
  * Scale note: single forward pass over the byte array, O(1) extra
  * memory (three running sums) — no raster materialization at all,
  * which is what lets the 100 TB blob column stream through
  * [[MediaPipeline.decodeChannelStats]]'s partition batches. */
class PpmBmpDecoder extends ChannelStatsDecoder {

  override def features(r: MediaRow): MediaFeatures = {
    // Rolling checksum over row-major packed-RGB pixels — same hash
    // family as the stub/ImageIo paths.
    var cs = 0L
    val (w, h) = foreachPixel(r) { (rr, gg, bb) =>
      cs = ((cs * 31 + ((rr.toLong << 16) | (gg.toLong << 8) | bb.toLong))
        & 0xffffffffL)
    }
    MediaFeatures(r.doc_id, r.bytes.length.toLong, cs,
      (w / 16) * (h / 16))
  }

  /** Exact per-channel sums from one streaming decode pass. */
  override def channelStats(r: MediaRow): ChannelStats = {
    var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
    val (w, h) = foreachPixel(r) { (rr, gg, bb) =>
      sr += rr; sg += gg; sb += bb; n += 1
    }
    ChannelStats(r.doc_id, w, h, n, sr, sg, sb)
  }

  /** Parse dispatch + pixel visitor: calls `f` once per pixel in
    * row-major DISPLAY order with (r, g, b); returns (width, height).
    * One shared implementation serves the checksum and stats passes. */
  private def foreachPixel(row: MediaRow)(
      f: (Int, Int, Int) => Unit): (Long, Long) = {
    val b = row.bytes
    require(b.length >= 2, s"doc ${row.doc_id}: not an image (too short)")
    if (b(0) == 'P' && (b(1) == '5' || b(1) == '6')) {
      val rgb = b(1) == '6'
      var pos = 2
      def skipWs(): Unit = {
        var go = true
        while (go && pos < b.length) {
          val c = b(pos)
          if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
          else go = false
        }
      }
      def int(): Int = {
        skipWs()
        require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
          s"doc ${row.doc_id}: malformed PPM header")
        var v = 0
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
          v = v * 10 + (b(pos) - '0'); pos += 1
        }
        v
      }
      val w = int(); val h = int(); val maxv = int()
      require(w > 0 && h > 0, s"doc ${row.doc_id}: bad PPM dims $w x $h")
      require(maxv > 0 && maxv <= 255,
        s"doc ${row.doc_id}: PPM maxval $maxv unsupported (need <= 255)")
      // Exactly ONE whitespace byte separates header from samples — and
      // it must actually BE whitespace: skipping junk here would shift
      // sample alignment by a byte and decode silently wrong, breaking
      // the loud/attributable malformed-input contract.
      require(pos < b.length && (b(pos) == ' ' || b(pos) == '\t'
          || b(pos) == '\n' || b(pos) == '\r'),
        s"doc ${row.doc_id}: malformed PPM header (no whitespace after maxval)")
      pos += 1
      val need = w.toLong * h * (if (rgb) 3 else 1)
      require(b.length - pos >= need,
        s"doc ${row.doc_id}: truncated PPM (${b.length - pos} of $need sample bytes)")
      var i = 0L
      while (i < w.toLong * h) {
        if (rgb) {
          val o = pos + (i * 3).toInt
          f(b(o) & 0xff, b(o + 1) & 0xff, b(o + 2) & 0xff)
        } else {
          val v = b(pos + i.toInt) & 0xff
          f(v, v, v)
        }
        i += 1
      }
      (w.toLong, h.toLong)
    } else if (b(0) == 'B' && b(1) == 'M') {
      def le32(o: Int): Int =
        (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      require(b.length >= 54, s"doc ${row.doc_id}: truncated BMP header")
      val dataOff = le32(10)
      val hdrSize = le32(14)
      require(hdrSize >= 40, s"doc ${row.doc_id}: BMP core-header unsupported")
      val w = le32(18)
      val hRaw = le32(22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      require(le16(26) == 1, s"doc ${row.doc_id}: BMP planes != 1")
      require(le16(28) == 24,
        s"doc ${row.doc_id}: only 24 bpp uncompressed BMP supported")
      require(le32(30) == 0, s"doc ${row.doc_id}: compressed BMP unsupported")
      require(w > 0 && h > 0, s"doc ${row.doc_id}: bad BMP dims $w x $hRaw")
      // A width big enough to overflow w*3+3 in Int would wrap stride
      // negative/small and defeat the size check below.
      require(w <= (Int.MaxValue - 3) / 3,
        s"doc ${row.doc_id}: BMP width $w overflows stride arithmetic")
      // dataOff is attacker/corruption-controlled: a negative or
      // in-header value makes `b.length - dataOff` MORE permissive, then
      // pixel reads either throw a bare AIOOBE (no doc_id) or silently
      // decode header bytes as pixels.
      require(dataOff >= 54 && dataOff <= b.length,
        s"doc ${row.doc_id}: bad BMP pixel-array offset $dataOff")
      val stride = (w * 3 + 3) & ~3 // rows pad to 4-byte boundaries
      require(b.length - dataOff >= stride.toLong * h,
        s"doc ${row.doc_id}: truncated BMP pixel array")
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y // display order
        var x = 0
        val base = dataOff + srcRow * stride
        while (x < w) {
          val o = base + x * 3 // BGR on disk
          f(b(o + 2) & 0xff, b(o + 1) & 0xff, b(o) & 0xff)
          x += 1
        }
        y += 1
      }
      (w.toLong, h.toLong)
    } else {
      throw new IllegalArgumentException(
        s"doc ${row.doc_id}: unknown container (not P5/P6 PPM or BMP)")
    }
  }
}

object Ppm {
  /** Deterministic synthetic P6 image: pixel i (row-major) has
    * r = (3·seed + 7i) mod 256, g = (aux + 11i) mod 256,
    * b = (5i + 13) mod 256 — closed forms a SQL oracle reproduces
    * analytically, so a parser bug (header, interleave, padding)
    * surfaces as a channel-mean mismatch. */
  def synthesize(seed: Long, aux: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val header = s"P6\n# synthetic $seed\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0L
    val n = width.toLong * height
    while (i < n) {
      val o = header.length + (i * 3).toInt
      out(o) = ((3 * seed + 7 * i) % 256).toByte
      out(o + 1) = ((aux + 11 * i) % 256).toByte
      out(o + 2) = ((5 * i + 13) % 256).toByte
      i += 1
    }
    out
  }
}

/** Multimodal binary-column plumbing (§2.12): typed media rows through a
  * partition-batched decode. */
object MediaPipeline {

  /** The fixture's stand-in media table: document text bytes as the blob,
    * derived dims as metadata (real datasets carry true image/audio
    * bytes in a parquet BINARY column with the same schema shape). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes"),
        (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Decode features with one decoder init per partition, rows streamed
    * (never materialized — memory is O(1) in partition size, which is
    * what lets a 100 TB blob column flow through a bounded executor).
    * `parallelism > 0` repartitions by doc_id first — use it to spread
    * decode cost when upstream partitioning reflects file layout, not
    * decode cost. */
  def decodeFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder,
      parallelism: Int = 0): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val part =
      if (parallelism > 0) media.repartition(parallelism, col("doc_id"))
      else media
    part.mapPartitions { rows =>
      decoder.open()
      // close() via the task-completion listener, not iterator
      // exhaustion: a limit/take never drains the iterator, and a
      // decode failure aborts it — both would otherwise leak the codec.
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => decoder.close())
      rows.map(decoder.features)
    }
  }

  /** Channel statistics with the same one-init-per-partition streamed
    * lifecycle as [[decodeFeatures]] — the decode pass a multimodal
    * curation pipeline runs to compute normalization stats / flag
    * degenerate images without ever materializing rasters. */
  def decodeChannelStats(media: Dataset[MediaRow],
      decoder: ChannelStatsDecoder = new PpmBmpDecoder,
      parallelism: Int = 0): Dataset[ChannelStats] = {
    implicit val enc = Encoders.product[ChannelStats]
    val part =
      if (parallelism > 0) media.repartition(parallelism, col("doc_id"))
      else media
    part.mapPartitions { rows =>
      decoder.open()
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => decoder.close())
      rows.map(decoder.channelStats)
    }
  }

  /** Every-`every`-th frame of each media item, decoder inited once per
    * partition (lifecycle identical to [[decodeFeatures]]). The frame
    * iterator is lazy end-to-end: a 2-hour video and a 2-second clip
    * both cost O(one frame) of executor memory at any instant. Sampling
    * happens INSIDE the partition before anything is buffered — at
    * `every = 30` (1 fps from 30 fps media) the downstream sees 1/30th
    * of the frame volume. */
  def sampleFrames(media: Dataset[MediaRow], every: Int,
      decoder: FrameDecoder = StubFrameDecoder,
      parallelism: Int = 0): Dataset[MediaFrame] = {
    require(every > 0, s"every must be positive, got $every")
    implicit val enc = Encoders.product[MediaFrame]
    val part =
      if (parallelism > 0) media.repartition(parallelism, col("doc_id"))
      else media
    part.mapPartitions { rows =>
      decoder.open()
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => decoder.close())
      rows.flatMap(r => decoder.frames(r).filter(_.frame_idx % every == 0))
    }
  }
}
