package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches.
  *
  * The decode is PLUGGABLE ([[MediaCodec]]) with two shipped instances:
  * [[ImageIoCodec]] is a REAL image decoder over the JDK's `javax.imageio`
  * (PNG/JPEG/BMP/GIF readers ship in every JRE) — the decode gate runs it
  * end to end on genuine PNG bytes; [[StubCodec]] is a deterministic
  * byte-statistics fake for payload kinds the JDK has no decoder for
  * (audio/video), kept loud by name. Everything around the codec (schema,
  * encoders, partition-batched iteration, feature schema) is the shape a
  * decode / resize / frame-sample stage has at scale: binary in,
  * fixed-width feature row out, no driver involvement, one task per input
  * split. A production build injects its own audio/video codec without
  * touching any of the pipeline code.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      byte_sum: Long, head_byte: Int, checksum8: Long)

  /** The decode seam. Implementations run INSIDE tasks (hence
    * Serializable); construct expensive native state lazily per JVM, not in
    * the constructor — the instance is serialized into every task closure. */
  trait MediaCodec extends Serializable {
    /** One payload → scalar feature triple (content statistic, first-unit
      * signal, content checksum). A real image codec would decode and emit
      * e.g. (pixel sum, dominant channel, perceptual hash). */
    def features(kind: String, payload: Array[Byte]): (Long, Int, Long)
    /** One frame → fixed-width re-encoded frame (the resize/resample step). */
    def resize(frame: Array[Byte], outBytes: Int): Array[Byte]
  }

  /** STUB codec — deterministic byte statistics in place of a real decode
    * (no codecs ship in this container). Loud by name; production builds
    * pass their own [[MediaCodec]]. */
  object StubCodec extends MediaCodec {
    def features(kind: String, payload: Array[Byte]): (Long, Int, Long) = {
      var sum = 0L
      var cs = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b
        cs = (cs * 131 + b) % 1000000007L
        i += 1
      }
      (sum, if (payload.nonEmpty) payload(0) & 0xff else -1, cs)
    }
    def resize(frame: Array[Byte], outBytes: Int): Array[Byte] = {
      val out = new Array[Byte](outBytes)
      if (frame.nonEmpty) {
        val block = math.max(1, frame.length / outBytes)
        var o = 0
        while (o < outBytes) {
          var s = 0L
          var i = o * block
          val end = math.min(frame.length, (o + 1) * block)
          while (i < end) { s += frame(i) & 0xff; i += 1 }
          out(o) = (if (end > o * block) s / (end - o * block) else 0L).toByte
          o += 1
        }
      }
      out
    }
  }

  /** REAL image codec over the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF
    * readers ship in every JRE — no container dependency). PNG is lossless,
    * so features computed from the decoded raster are exactly reproducible
    * by anything that knows the pixel values — which is what lets a SQL
    * oracle verify a genuine decode: the oracle recomputes the pixel sums
    * from the image's generating formula while Spark gets them by decoding
    * actual PNG bytes. Feature triple: (sum of R+G+B over all pixels,
    * packed 24-bit RGB of pixel (0,0), rolling checksum over channels in
    * row-major R,G,B order — same (·131 mod 1e9+7) fold as StubCodec). */
  object ImageIoCodec extends MediaCodec {
    // ImageIO defaults to a disk-backed scratch cache per read/write; tasks
    // decode thousands of small images, so force heap-only once per JVM
    private lazy val init: Unit = javax.imageio.ImageIO.setUseCache(false)

    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      init
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, s"javax.imageio found no decoder for a ${payload.length}-byte payload")
      img
    }

    def features(kind: String, payload: Array[Byte]): (Long, Int, Long) =
      featuresOf(decode(payload))

    /** Raster-only half of [[features]] — callers that already decoded
      * (e.g. [[decodeImages]], which also reports dimensions) pass the
      * image in instead of paying a second decode. */
    def featuresOf(img: java.awt.image.BufferedImage): (Long, Int, Long) = {
      var sum = 0L
      var cs = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sum += r + g + b
          cs = (cs * 131 + r) % 1000000007L
          cs = (cs * 131 + g) % 1000000007L
          cs = (cs * 131 + b) % 1000000007L
          x += 1
        }
        y += 1
      }
      (sum, img.getRGB(0, 0) & 0xffffff, cs)
    }

    /** Real image resize: decode, nearest-neighbor rescale to the largest
      * square whose RGB raster fits `outBytes`, re-encode PNG. Nearest
      * neighbor (not bilinear) keeps the result bit-deterministic across
      * JVMs — each output pixel is a COPY of one input pixel, no float
      * resampling. */
    def resize(frame: Array[Byte], outBytes: Int): Array[Byte] = {
      val img = decode(frame)
      val side = math.max(1, math.sqrt(outBytes / 3.0).toInt)
      val out = new java.awt.image.BufferedImage(side, side,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          out.setRGB(x, y, img.getRGB(x * img.getWidth / side, y * img.getHeight / side))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Deterministic synthetic PNG: a w×h RGB image whose channel values
    * follow `(seed*31 + x*7 + y*13 + c*101) mod 256` (c = 0/1/2 for R/G/B),
    * encoded through the real `javax.imageio` PNG writer. The formula is
    * the contract the decode gate's SQL oracle recomputes — encode and
    * decode both run the genuine codec, only the pixel CONTENT is
    * synthetic (the container ships no image corpus). */
  def synthPng(seed: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def ch(c: Int): Int =
          (((seed * 31 + x * 7 + y * 13 + c * 101) % 256 + 256) % 256).toInt
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a REAL PNG payload per row, seeded by the id column — the
    * binary column carries actual image bytes a stock JRE can decode. The
    * encode runs inside tasks (mapPartitions shape via the row mapper), so
    * payload generation distributes like any other binary ingest. */
  def attachImagePayload(df: DataFrame, idCol: String,
      w: Int = 16, h: Int = 16): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRow(id, "image/png", synthPng(id, w, h)))
  }

  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      pixel_sum: Long, first_px: Int, pixel_checksum: Long)

  /** Decode stage over real image payloads: partition-batched like
    * [[extractFeatures]], but through the genuine [[ImageIoCodec]] — the
    * output columns are functions of the decoded RASTER, not the bytes, so
    * a correct answer proves a working decode. */
  def decodeImages(rows: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val img = ImageIoCodec.decode(r.payload)
        val (sum, first, cs) = ImageIoCodec.featuresOf(img)
        ImageFeatures(r.doc_id, img.getWidth, img.getHeight, sum, first, cs)
      }
    }
  }

  /** Attach a binary payload + metadata to a text table (stand-in for real
    * media bytes; the payload column is genuinely BinaryType). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text/utf-8").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Partition-batched feature extraction — the mapPartitions shape keeps
    * per-batch codec state (decoder instances, buffers) off the row path. */
  def extractFeatures(rows: Dataset[MediaRow],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition codec state (native decoder handles, buffers) is
      // initialized here, once per task, via the codec instance
      it.map { r =>
        val (sum, head, cs) = codec.features(r.kind, r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, sum, head, cs)
      }
    }
  }

  def featurePipeline(spark: SparkSession, df: DataFrame,
      idCol: String, textCol: String,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(attachPayload(df, idCol, textCol).as[MediaRow], codec)
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling: one media payload fans out to every `stride`-th fixed
    * -width frame — the 1→N generator shape of video frame extraction. The
    * "frames" here are byte slices (STUB — a real codec yields decoded
    * images), but the dataflow is the production one: a flatMap generator
    * per payload, fixed frame schema, output row count decoupled from input
    * row count, no driver involvement. At scale the output is typically
    * orders of magnitude larger than the input — repartition AFTER this
    * stage, not before. */
  def sampleFrames(rows: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 2): Dataset[FrameRow] = {
    import rows.sparkSession.implicits._
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    rows.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).iterator.map { f =>
        FrameRow(r.doc_id, f.toLong,
          java.util.Arrays.copyOfRange(r.payload, f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** Resize/re-encode stage: fixed-size output per frame through the
    * codec's `resize` (the default stub averages byte blocks in place of
    * pixel resampling; deterministic). Real shape: binary in, smaller
    * fixed-width binary out, pure per-row map. */
  def resizeFrames(frames: Dataset[FrameRow], outBytes: Int = 16,
      codec: MediaCodec = StubCodec): Dataset[FrameRow] = {
    import frames.sparkSession.implicits._
    frames.map(fr => FrameRow(fr.doc_id, fr.frame_idx, codec.resize(fr.frame, outBytes)))
  }
}
