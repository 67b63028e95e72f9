package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches.
  *
  * The decode is PLUGGABLE ([[MediaCodec]]) with REAL decoders for all
  * three modalities, each JDK-native and each behind an oracle-checked
  * decode gate running on genuine container bytes: [[ImageIoCodec]]
  * (images over `javax.imageio` — PNG/JPEG/BMP/GIF readers ship in every
  * JRE), [[WavCodec]] (audio over `javax.sound.sampled` — WAV PCM), and
  * [[GifVideo]] (multi-frame video-shaped extraction over the animated-GIF
  * reader/writer). [[StubCodec]] remains as a loud-by-name deterministic
  * fake for container formats the JDK cannot decode (e.g. MP4/H.264) and
  * as the test seam for codec injection. Everything
  * around the codec (schema,
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
    /** One frame → re-encoded frame targeting `outBytes` of CONTENT (the
      * resize/resample step). Container codecs emit container bytes:
      * StubCodec/WavCodec hit the byte budget exactly, while a PNG
      * re-encode is variable-length (header + compression) and can exceed
      * a tiny budget — consumers needing byte-exact frames use the stub
      * or a raw-raster codec. */
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
    private[multimodal] lazy val init: Unit = javax.imageio.ImageIO.setUseCache(false)

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
    // encode-only path: force the heap-only ImageIO cache here too — the
    // decode-side init never runs for tasks that only synthesize, and the
    // default disk-backed scratch costs a temp file per image
    ImageIoCodec.init
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

  case class ImageHash(doc_id: Long, dhash: Long)

  /** The dHash kernel over one decoded raster — shared by the image
    * signature and the per-frame video signature: integer grayscale
    * `(r+g+b) div 3` per pixel, 2×1 box average down to a (w/2)×h grid,
    * one bit per horizontal gradient (`right neighbor brighter`),
    * row-major LSB-first. */
  private[multimodal] def dhashOf(img: java.awt.image.BufferedImage): Long = {
    val gw = img.getWidth / 2
    val gh = img.getHeight
    // the hash is ONE long: more than 64 gradient bits would wrap the
    // shift distance (JVM long shifts take distance mod 64) and OR
    // later gradients back onto bits 0..N — a silently garbage
    // signature (a 16×16 image is already 7×16 = 112 bits). Width
    // must give at least one 2-pixel column.
    require(img.getWidth >= 2, s"dhash needs width >= 2, got ${img.getWidth}")
    require((gw - 1).toLong * gh <= 64,
      s"dhash grid ${gw - 1}x$gh = ${(gw - 1) * gh} gradient bits exceeds " +
        "the 64-bit hash: resize the payload first (w=14,h=8 gives the " +
        "standard 48 bits)")
    def gray(x: Int, y: Int): Int = {
      val p = img.getRGB(x, y)
      (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)) / 3
    }
    var hash = 0L
    var bit = 0
    var y = 0
    while (y < gh) {
      var x = 0
      var prev = (gray(0, y) + gray(1, y)) / 2
      while (x < gw - 1) {
        val curr = (gray(2 * (x + 1), y) + gray(2 * (x + 1) + 1, y)) / 2
        if (curr > prev) hash |= 1L << bit
        bit += 1
        prev = curr
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Perceptual difference-hash (dHash) over the DECODED raster — the
    * image-dedup signature ([[dhashOf]] per payload). On the standard
    * 14×8 synthetic payloads that is a 7×8 grid → 48 bits, so the hash
    * feeds `Dedup.hammingNearDup` with the same 12-bit-block parameters
    * as the text SimHash. All-integer arithmetic end to end: the DuckDB
    * oracle reproduces the hash from the pixel formula without decoding a
    * PNG — a match proves the real `javax.imageio` decode round-tripped
    * every pixel. Map-only, zero shuffles. */
  def dhashImages(rows: Dataset[MediaRow]): Dataset[ImageHash] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map(r => ImageHash(r.doc_id, dhashOf(ImageIoCodec.decode(r.payload))))
    }
  }

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

  /** REAL audio codec over the JDK's own `javax.sound.sampled` (the WAV
    * reader/writer ships in every JRE's java.desktop module — no container
    * dependency). WAV PCM is uncompressed, so the decoded samples equal the
    * generating formula exactly, which lets a SQL oracle certify a genuine
    * decode the same way the PNG gate does: the oracle recomputes sample
    * values from the formula while Spark gets them by parsing actual RIFF/
    * WAV bytes back through `AudioSystem`. Feature triple for the generic
    * [[MediaCodec]] seam: (sum of signed samples, first sample, rolling
    * checksum over unsigned sample values — same (·131 mod 1e9+7) fold as
    * the other codecs). */
  object WavCodec extends MediaCodec {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    /** Parse a WAV container to (format, signed 16-bit samples). Loud on
      * anything but mono 16-bit signed PCM — the synthetic corpus is always
      * that shape, and silent format coercion would invalidate the oracle. */
    def decodeSamples(payload: Array[Byte]): (AudioFormat, Array[Int]) = {
      val ais: AudioInputStream = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"WavCodec handles mono 16-bit signed PCM, got $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Int](n)
        val little = !fmt.isBigEndian
        var i = 0
        while (i < n) {
          val b0 = bytes(2 * i) & 0xff
          val b1 = bytes(2 * i + 1) & 0xff
          val u = if (little) (b1 << 8) | b0 else (b0 << 8) | b1
          out(i) = (u << 16) >> 16 // sign-extend 16-bit
          i += 1
        }
        (fmt, out)
      } finally ais.close()
    }

    def features(kind: String, payload: Array[Byte]): (Long, Int, Long) = {
      val (_, samples) = decodeSamples(payload)
      featuresOf(samples)
    }

    /** Sample-domain half of [[features]] — (signed sum, first sample,
      * checksum folded over UNSIGNED values so the accumulator stays
      * non-negative). */
    def featuresOf(samples: Array[Int]): (Long, Int, Long) = {
      var sum = 0L
      var cs = 0L
      var i = 0
      while (i < samples.length) {
        sum += samples(i)
        cs = (cs * 131 + (samples(i) + 32768)) % 1000000007L
        i += 1
      }
      (sum, if (samples.nonEmpty) samples(0) else 0, cs)
    }

    /** Real audio "resize" = nearest-neighbor resample to the sample count
      * that fits `outBytes`, re-encoded as WAV at the source rate. Nearest
      * neighbor (each output sample is a COPY of one input sample, no
      * interpolation) keeps the result bit-deterministic across JVMs. */
    def resize(frame: Array[Byte], outBytes: Int): Array[Byte] = {
      val (fmt, samples) = decodeSamples(frame)
      if (samples.isEmpty) return encodeWav(Array.empty[Int], fmt.getSampleRate)
      val outN = math.max(1, outBytes / 2)
      val out = new Array[Int](outN)
      var i = 0
      while (i < outN) {
        // LONG index math: i·|samples| exceeds Int range already at
        // ~100k samples upsampled toward 1 MiB (the wrapped negative
        // index threw ArrayIndexOutOfBounds mid-task)
        out(i) = samples(((i.toLong * samples.length) / outN).toInt)
        i += 1
      }
      encodeWav(out, fmt.getSampleRate)
    }

    /** Signed 16-bit samples → WAV bytes through the genuine
      * `AudioSystem.write` WAVE encoder (little-endian PCM). */
    def encodeWav(samples: Array[Int], sampleRate: Float): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Deterministic synthetic WAV: `n` mono 16-bit PCM samples following
    * `s(i) = (seed*31 + i*7919) mod 65536 - 32768`, encoded through the real
    * `javax.sound.sampled` WAVE writer. The formula is the contract the
    * audio decode gate's SQL oracle recomputes — encode and decode both run
    * the genuine codec, only the sample CONTENT is synthetic (the container
    * ships no audio corpus). */
  def synthWav(seed: Long, nSamples: Int = 256, sampleRate: Float = 8000f): Array[Byte] = {
    val samples = new Array[Int](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) =
        ((((seed * 31 + i.toLong * 7919) % 65536 + 65536) % 65536) - 32768).toInt
      i += 1
    }
    WavCodec.encodeWav(samples, sampleRate)
  }

  /** Attach a REAL WAV payload per row, seeded by the id column — encode
    * runs inside tasks, same distribution shape as [[attachImagePayload]]. */
  def attachAudioPayload(df: DataFrame, idCol: String,
      nSamples: Int = 256): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRow(id, "audio/wav", synthWav(id, nSamples)))
  }

  case class AudioFeatures(doc_id: Long, n_samples: Long, sample_rate: Int,
      sample_sum: Long, first_sample: Int, sample_checksum: Long)

  /** Decode stage over real WAV payloads: the output columns are functions
    * of the decoded SAMPLES and the parsed container header (rate, count),
    * not the payload bytes — a correct answer proves a working decode. */
  def decodeAudio(rows: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (fmt, samples) = WavCodec.decodeSamples(r.payload)
        val (sum, first, cs) = WavCodec.featuresOf(samples)
        AudioFeatures(r.doc_id, samples.length.toLong,
          fmt.getSampleRate.toInt, sum, first, cs)
      }
    }
  }

  case class AudioHash(doc_id: Long, ahash: Long)

  /** Perceptual audio hash over the DECODED samples — the audio analogue
    * of [[dhashImages]]: the PCM stream splits into `windows + 1` equal
    * energy windows (integer sum of |sample|), and each of the `windows`
    * bits records whether the next window is louder — a loudness-envelope
    * gradient, robust to small per-sample noise exactly as dHash is to
    * small pixel noise. 48 windows-gradient bits by default, so the hash
    * feeds the same `Dedup.hammingNearDup` block join as the text and
    * image signatures. Integer end to end; the oracle replays the synth
    * formula without parsing a WAV — a match proves the
    * `javax.sound.sampled` decode returned every sample. Trailing samples
    * beyond the last full window are ignored. */
  def ahashAudio(rows: Dataset[MediaRow], windows: Int = 48): Dataset[AudioHash] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (_, samples) = WavCodec.decodeSamples(r.payload)
        val nw = windows + 1
        val winLen = samples.length / nw
        require(winLen > 0,
          s"audio of ${samples.length} samples cannot fill $nw windows")
        def energy(w: Int): Long = {
          var s = 0L
          var i = w * winLen
          val end = i + winLen
          while (i < end) { s += math.abs(samples(i).toLong); i += 1 }
          s
        }
        var hash = 0L
        var prev = energy(0)
        var w = 1
        while (w < nw) {
          val curr = energy(w)
          if (curr > prev) hash |= 1L << (w - 1)
          prev = curr
          w += 1
        }
        AudioHash(r.doc_id, hash)
      }
    }
  }

  /** REAL video-shaped codec over the JDK's animated-GIF support: GIF is
    * the one MULTI-FRAME container a stock JRE can both write
    * (`ImageWriter.writeToSequence` + per-frame `GraphicControlExtension`
    * metadata) and read (`ImageReader.getNumImages(true)` + `read(i)`), so
    * the frame-extraction stage of a video pipeline runs genuinely: parse
    * container → enumerate frames → decode each to a raster. Frames use an
    * 8-bit grayscale palette, so GIF's LZW (lossless) plus the identity
    * palette make decoded pixels equal the generating formula exactly —
    * same oracle trick as the PNG and WAV gates. */
  object GifVideo {
    import java.awt.image.{BufferedImage, IndexColorModel}

    private lazy val grayPalette: IndexColorModel = {
      val g = new Array[Byte](256)
      var i = 0; while (i < 256) { g(i) = i.toByte; i += 1 }
      new IndexColorModel(8, 256, g, g, g)
    }

    /** One full-size frame: pixel (x,y) of frame f holds gray level
      * `(seed*31 + f*17 + x*7 + y*13) mod 256`. */
    private def synthFrame(seed: Long, f: Int, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0,
            (((seed * 31 + f * 17 + x * 7 + y * 13) % 256 + 256) % 256).toInt)
          x += 1
        }
        y += 1
      }
      img
    }

    // ImageWriter/ImageReader are stateful and NOT thread-safe; SPI lookup
    // plus instantiation per payload measured as the dominant cost of the
    // video gate (8.2 s at sf0.1 before caching). One instance per task
    // thread amortizes it; instances survive for the executor's lifetime.
    private val writerTL = new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue(): javax.imageio.ImageWriter = {
        javax.imageio.ImageIO.setUseCache(false)
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      }
    }
    private val readerTL = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader = {
        javax.imageio.ImageIO.setUseCache(false)
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      }
    }

    /** Deterministic synthetic animated GIF — a real GIF89a container with
      * `nFrames` full frames (disposal "none", so every frame decodes
      * independently), written by the genuine javax.imageio GIF encoder.
      * The per-frame metadata (palette + frame geometry are identical
      * across frames) is built ONCE per payload and reused. */
    def synthGif(seed: Long, w: Int = 8, h: Int = 8, nFrames: Int = 4): Array[Byte] = {
      val writer = writerTL.get()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var md: javax.imageio.metadata.IIOMetadata = null
        var f = 0
        while (f < nFrames) {
          val img = synthFrame(seed, f, w, h)
          if (md == null) {
            md = writer.getDefaultImageMetadata(
              new javax.imageio.ImageTypeSpecifier(img), null)
            val fmt = md.getNativeMetadataFormatName
            val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
            gce.setAttribute("disposalMethod", "none")
            gce.setAttribute("userInputFlag", "FALSE")
            gce.setAttribute("transparentColorFlag", "FALSE")
            gce.setAttribute("delayTime", "10")
            gce.setAttribute("transparentColorIndex", "0")
            root.appendChild(gce)
            md.setFromTree(fmt, root)
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { ios.close(); writer.reset() }
      bos.toByteArray
    }

    /** Walk every frame COMPOSITED onto the logical screen and hand the
      * canvas to `f` — the ONE reader protocol both extraction paths
      * share. Real-world "optimized" GIFs store later frames as delta
      * sub-rects at an (left, top) offset; hashing or summarizing those
      * raw rects would compare incompatible geometries (and a 1-pixel
      * rect would crash the dHash kernel), so each frame draws onto a
      * persistent canvas at its declared offset. Disposal: none /
      * doNotDispose accumulate (also the fallback for the rare
      * restoreToPrevious); restoreToBackgroundColor clears the frame's
      * rect to black after its snapshot, per the GIF89a contract. */
    private def readComposited[T](payload: Array[Byte])(
        f: java.awt.image.BufferedImage => T): Seq[T] = {
      import javax.imageio.metadata.IIOMetadataNode
      val reader = readerTL.get()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n > 0, s"javax.imageio found no GIF frames in a ${payload.length}-byte payload")
        def attr(node: org.w3c.dom.Node, name: String, dflt: String): String = {
          val a = node.getAttributes
          Option(if (a == null) null else a.getNamedItem(name))
            .map(_.getNodeValue).getOrElse(dflt)
        }
        def childNamed(root: org.w3c.dom.Node, name: String): Option[org.w3c.dom.Node] = {
          var c = root.getFirstChild
          while (c != null && c.getNodeName != name) c = c.getNextSibling
          Option(c)
        }
        // logical screen from the stream metadata; frame 0's own size is
        // the fallback when a stripped stream omits the descriptor
        val first = reader.read(0)
        val (sw, sh) =
          (try {
            val root = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
            childNamed(root, "LogicalScreenDescriptor").map(d =>
              (attr(d, "logicalScreenWidth", "0").toInt,
                attr(d, "logicalScreenHeight", "0").toInt))
              .filter(d => d._1 > 0 && d._2 > 0)
              .getOrElse((first.getWidth, first.getHeight))
          } catch { case _: Exception => (first.getWidth, first.getHeight) })
        val canvas = new java.awt.image.BufferedImage(
          sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          (0 until n).map { fr =>
            val img = if (fr == 0) first else reader.read(fr)
            val md = reader.getImageMetadata(fr).getAsTree("javax_imageio_gif_image_1.0")
            val (left, top) = childNamed(md, "ImageDescriptor").map(d =>
              (attr(d, "imageLeftPosition", "0").toInt,
                attr(d, "imageTopPosition", "0").toInt)).getOrElse((0, 0))
            val disposal = childNamed(md, "GraphicControlExtension")
              .map(attr(_, "disposalMethod", "none")).getOrElse("none")
            g.drawImage(img, left, top, null)
            val out = f(canvas)
            if (disposal == "restoreToBackgroundColor") {
              g.setColor(java.awt.Color.BLACK)
              g.fillRect(left, top, img.getWidth, img.getHeight)
            }
            out
          }
        } finally g.dispose()
      } finally { iis.close(); reader.reset() }
    }

    /** Parse a GIF container and decode every frame — the real 1→N frame
      * extraction a video pipeline runs, with delta-rect frames
      * COMPOSITED onto the logical screen (see [[readComposited]]).
      * Returns (frame_idx, width, height, gray-level sum, rolling
      * checksum over row-major gray levels — the same (·131 mod 1e9+7)
      * fold as the other codecs). */
    def decodeFrames(payload: Array[Byte]): Seq[(Int, Int, Int, Long, Long)] = {
      var f = -1
      readComposited(payload) { img =>
        f += 1
        var sum = 0L
        var cs = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y) & 0xff // grayscale: R==G==B==index
            sum += v
            cs = (cs * 131 + v) % 1000000007L
            x += 1
          }
          y += 1
        }
        (f, img.getWidth, img.getHeight, sum, cs)
      }
    }

    /** Per-frame dHash signatures from a real container decode — the
      * frame-level input to the temporal-majority video signature; frames
      * hash as full composited screens, so delta-rect clips compare on a
      * consistent bit grid. */
    def decodeFrameHashes(payload: Array[Byte]): Seq[Long] =
      readComposited(payload)(dhashOf)

    /** A real "optimized" GIF for the compositing specs: frame 0 is a
      * full screen; every later frame is a SUB-RECT at an offset (the
      * delta encoding real encoders emit), pixel value
      * (seed·31 + f·17 + x·7 + y·13) mod 256 in FRAME-LOCAL coords. */
    def synthDeltaGif(seed: Long, w: Int = 14, h: Int = 8, nFrames: Int = 4,
        rectW: Int = 4, rectH: Int = 3): Array[Byte] = {
      val writer = writerTL.get()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val (fw, fh) = if (f == 0) (w, h) else (rectW, rectH)
          val img = synthFrame(seed, f, fw, fh)
          val md = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img), null)
          val fmt = md.getNativeMetadataFormatName
          val root = md.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          gce.setAttribute("disposalMethod", "doNotDispose")
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("delayTime", "10")
          gce.setAttribute("transparentColorIndex", "0")
          root.appendChild(gce)
          if (f > 0) {
            // offset the delta rect: ImageDescriptor carries the position
            var c = root.getFirstChild
            while (c != null && c.getNodeName != "ImageDescriptor") c = c.getNextSibling
            require(c != null, "GIF writer metadata lacks ImageDescriptor")
            val d = c.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            d.setAttribute("imageLeftPosition", ((f * 3) % (w - rectW)).toString)
            d.setAttribute("imageTopPosition", ((f * 2) % (h - rectH)).toString)
          }
          md.setFromTree(fmt, root)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { ios.close(); writer.reset() }
      bos.toByteArray
    }
  }

  /** REAL MP4 / ISO-BMFF CONTAINER support, pure JVM — ISO/IEC 14496-12
    * box structure parsed from the spec, no codec libraries. What is real:
    * the box walk (32/64-bit sizes, unknown boxes skipped), `ftyp` brand,
    * `mvhd`/`mdhd` timing (v0 and v1), `tkhd` 16.16 geometry, `stsd`
    * sample-entry fourcc, and the `stts`/`stsz`/`stsc`/`stco`/`co64`
    * sample tables EXPANDED to exact per-sample byte ranges — so the
    * frame-sampling stage slices true sample payloads out of `mdat` by
    * offset, the way a production keyframe sampler seeks, without ever
    * decoding them. One level deeper, [[graft.multimodal.H264]] walks each
    * sample's Annex-B NAL units and Exp-Golomb-decodes the SPS (geometry,
    * profile, IDR keyframe flags) — so the remaining seam is RASTER DECODE
    * ONLY: turning a slice payload into pixels needs an entropy decoder
    * the JDK does not ship, and that one step remains behind
    * [[MediaCodec]] (StubCodec by default; production injects its own),
    * the seam the GIF/PNG/WAV paths prove out with real decoders. Synthetic fixtures (`synthMp4`) are STRUCTURALLY VALID
    * MP4 files whose sample bytes follow a formula of (seed, frame,
    * offset), so the DuckDB oracle reproduces every probed value without
    * parsing a container — the same trick as the GIF/PNG/WAV gates. */
  object Mp4Video {
    import java.io.{ByteArrayOutputStream, DataOutputStream}

    /** Everything the container declares about its (first video) track. */
    case class Mp4Meta(brand: String, timescale: Long, durationMs: Long,
        width: Int, height: Int, codec: String,
        sampleOffsets: Array[Long], sampleSizes: Array[Int],
        sampleDeltas: Array[Int],
        avcc: Array[Byte] = Array.emptyByteArray) {
      def nSamples: Int = sampleSizes.length
    }

    // ---- writer (synthetic, structurally valid fixtures) ----------------
    private def beInt(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def beShort(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      beInt(body.length + 8) ++ typ.getBytes("US-ASCII") ++ body
    }
    private def fullBox(typ: String, version: Int, flags: Int,
        parts: Array[Byte]*): Array[Byte] =
      box(typ, (beInt((version << 24) | (flags & 0xffffff)) +:
        parts).toIndexedSeq: _*)
    private val identityMatrix: Array[Byte] =
      beInt(0x10000) ++ beInt(0) ++ beInt(0) ++
      beInt(0) ++ beInt(0x10000) ++ beInt(0) ++
      beInt(0) ++ beInt(0) ++ beInt(0x40000000)

    /** Byte j of sample f: `(seed*31 + f*17 + j*7) mod 256` — the oracle
      * formula (GIF-gate style). */
    def synthSampleByte(seed: Long, f: Int, j: Int): Int =
      (((seed * 31 + f * 17 + j * 7) % 256 + 256) % 256).toInt
    /** Size of sample f: 48 + (seed*7 + f*11) mod 48 — varying so the
      * stsz/stsc/stco expansion is load-bearing, never uniform-stride. */
    def synthSampleSize(seed: Long, f: Int): Int =
      48 + (((seed * 7 + f * 11) % 48 + 48) % 48).toInt

    /** Deterministic synthetic MP4: ftyp + mdat + moov with correct
      * mvhd/tkhd/mdhd timing (25 fps: mvhd ts 1000 / 40 per frame, media
      * ts 90000 / 3600 per frame), an `avc1` stsd entry (fourcc only — no
      * avcC config; nothing here encodes), and exact sample tables.
      * `chunks` > 1 splits samples across mdat chunks round-robin-ish so
      * the general stsc walk is exercised, not just the one-chunk case.
      * `moovFirst` emits the web-streaming "faststart" layout (ftyp +
      * moov + mdat) — the shape where a truncated mdat still box-walks
      * cleanly and only the sample-range validation can catch it. */
    def synthMp4(seed: Long, nSamples: Int = 6, w: Int = 16, h: Int = 9,
        chunks: Int = 1, moovFirst: Boolean = false): Array[Byte] = {
      require(nSamples > 0)
      synthMp4Samples((0 until nSamples).map { f =>
        val size = synthSampleSize(seed, f)
        Array.tabulate[Byte](size)(j => synthSampleByte(seed, f, j).toByte)
      }.toArray, w, h, chunks, moovFirst)
    }

    /** Same container writer, but over CALLER-SUPPLIED sample payloads —
      * the H.264 gates feed real Annex-B access units through here so the
      * NAL walk runs on bytes sliced out of a genuine MP4 (see
      * [[graft.multimodal.H264]]). `sampleEntryExtra` is appended INSIDE
      * the avc1 sample entry after its 78 fixed bytes — where a real
      * muxer puts the `avcC` decoder-configuration box (ISO 14496-15). */
    def synthMp4Samples(samples: Array[Array[Byte]], w: Int, h: Int,
        chunks: Int = 1, moovFirst: Boolean = false,
        sampleEntryExtra: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
      val nSamples = samples.length
      require(nSamples > 0 && chunks > 0 && chunks <= nSamples)
      val sizes = samples.map(_.length)
      val mdatPayload = {
        val bos = new ByteArrayOutputStream()
        samples.foreach(bos.write)
        bos.toByteArray
      }
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), beInt(0x200),
        "isomiso2avc1mp41".getBytes("US-ASCII"))
      val mdat = box("mdat", mdatPayload)
      // chunking: ceil-split the samples into `chunks` runs
      val perChunk = (nSamples + chunks - 1) / chunks
      val chunkSampleCounts =
        (0 until chunks).map(c => math.min(perChunk, nSamples - c * perChunk))
          .filter(_ > 0).toArray
      def chunkOffsetsFrom(firstSampleOffset: Long): Array[Long] = {
        var off = firstSampleOffset
        var s = 0
        chunkSampleCounts.map { cnt =>
          val o = off
          (0 until cnt).foreach { i => off += sizes(s + i) }
          s += cnt
          o
        }
      }
      def moovFor(chunkOffsets: Array[Long]): Array[Byte] = {
      val mvhd = fullBox("mvhd", 0, 0,
        beInt(0), beInt(0), beInt(1000), beInt(nSamples * 40),
        beInt(0x10000), beShort(0x100), beShort(0), beInt(0), beInt(0),
        identityMatrix,
        beInt(0), beInt(0), beInt(0), beInt(0), beInt(0), beInt(0),
        beInt(2))
      val tkhd = fullBox("tkhd", 0, 7,
        beInt(0), beInt(0), beInt(1), beInt(0), beInt(nSamples * 40),
        beInt(0), beInt(0), beShort(0), beShort(0), beShort(0), beShort(0),
        identityMatrix,
        beInt(w << 16), beInt(h << 16))
      val mdhd = fullBox("mdhd", 0, 0,
        beInt(0), beInt(0), beInt(90000), beInt(nSamples * 3600),
        beShort(0x55c4), beShort(0))
      val hdlr = fullBox("hdlr", 0, 0,
        beInt(0), "vide".getBytes("US-ASCII"), beInt(0), beInt(0), beInt(0),
        "VideoHandler".getBytes("US-ASCII") :+ 0.toByte)
      val avc1 = box("avc1",
        new Array[Byte](6), beShort(1),           // reserved, data_ref_index
        beShort(0), beShort(0), new Array[Byte](12),
        beShort(w), beShort(h),
        beInt(0x480000), beInt(0x480000), beInt(0), beShort(1),
        new Array[Byte](32),                       // compressorname
        beShort(24), beShort(0xffff),
        sampleEntryExtra)                          // avcC et al.
      val stsd = fullBox("stsd", 0, 0, beInt(1), avc1)
      val stts = fullBox("stts", 0, 0, beInt(1), beInt(nSamples), beInt(3600))
      val stsc = fullBox("stsc", 0, 0, beInt(chunkSampleCounts.length),
        chunkSampleCounts.zipWithIndex.flatMap { case (cnt, i) =>
          beInt(i + 1) ++ beInt(cnt) ++ beInt(1) }.toArray)
      val stsz = fullBox("stsz", 0, 0, beInt(0), beInt(nSamples),
        sizes.flatMap(beInt))
      val stco = fullBox("stco", 0, 0, beInt(chunkOffsets.length),
        chunkOffsets.flatMap(o => beInt(o.toInt)))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val vmhd = fullBox("vmhd", 0, 1, beShort(0), beShort(0), beShort(0), beShort(0))
      val dref = fullBox("dref", 0, 0, beInt(1), fullBox("url ", 0, 1))
      val dinf = box("dinf", dref)
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
      }
      if (moovFirst) {
        // moov's LENGTH is independent of the offset values (fixed-width
        // ints), so a probe build sizes it and the real build carries the
        // post-moov mdat offsets
        val probeLen = moovFor(chunkOffsetsFrom(0L)).length
        val moov = moovFor(chunkOffsetsFrom(ftyp.length + probeLen + 8L))
        ftyp ++ moov ++ mdat
      } else {
        val moov = moovFor(chunkOffsetsFrom(ftyp.length + 8L))
        ftyp ++ mdat ++ moov
      }
    }

    // ---- parser ---------------------------------------------------------
    private final class Cursor(val buf: Array[Byte]) {
      def u32(off: Long): Long = {
        val i = off.toInt
        ((buf(i) & 0xffL) << 24) | ((buf(i + 1) & 0xffL) << 16) |
          ((buf(i + 2) & 0xffL) << 8) | (buf(i + 3) & 0xffL)
      }
      def u64(off: Long): Long = (u32(off) << 32) | u32(off + 4)
      def fourcc(off: Long): String =
        new String(buf, off.toInt, 4, "US-ASCII")
    }
    /** Walk the boxes of [start, end); call f(type, bodyStart, bodyEnd). */
    private def walk(c: Cursor, start: Long, end: Long)(
        f: (String, Long, Long) => Unit): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size0 = c.u32(off)
        val typ = c.fourcc(off + 4)
        val (bodyStart, size) =
          if (size0 == 1) (off + 16, c.u64(off + 8))
          else if (size0 == 0) (off + 8, end - off) // to end of enclosing box
          else (off + 8, size0)
        require(size >= bodyStart - off && off + size <= end,
          s"corrupt MP4: box $typ size $size at $off exceeds bounds")
        f(typ, bodyStart, off + size)
        off += size
      }
    }

    /** Parse the container. Throws IllegalArgumentException on anything
      * that is not a video MP4 (missing moov/trak/sample tables). */
    def parse(payload: Array[Byte]): Mp4Meta = {
      val c = new Cursor(payload)
      var brand = ""
      var mvhdTs = 0L; var mvhdDur = 0L
      var width = 0; var height = 0
      var codec = ""
      var deltas: Array[Int] = Array.empty
      var sizes: Array[Int] = Array.empty
      var stscEntries: Array[(Int, Int)] = Array.empty // (firstChunk, samplesPerChunk)
      var chunkOffsets: Array[Long] = Array.empty
      var haveTrak = false
      var avccBytes: Array[Byte] = Array.emptyByteArray
      walk(c, 0, payload.length) {
        case ("ftyp", s, _) => brand = c.fourcc(s)
        case ("moov", moovS, moovE) =>
          walk(c, moovS, moovE) {
            case ("mvhd", s, _) =>
              val v = c.buf(s.toInt) & 0xff
              if (v == 1) { mvhdTs = c.u32(s + 20); mvhdDur = c.u64(s + 24) }
              else { mvhdTs = c.u32(s + 12); mvhdDur = c.u32(s + 16) }
            case ("trak", trakS, trakE) if !haveTrak =>
              var isVideo = false
              var w0 = 0; var h0 = 0
              var codec0 = ""
              var avcc0: Array[Byte] = Array.emptyByteArray
              var deltas0: Array[Int] = Array.empty
              var sizes0: Array[Int] = Array.empty
              var stsc0: Array[(Int, Int)] = Array.empty
              var stco0: Array[Long] = Array.empty
              walk(c, trakS, trakE) {
                case ("tkhd", s, _) =>
                  val v = c.buf(s.toInt) & 0xff
                  val base = if (v == 1) s + 4 + 8 + 8 + 4 + 4 + 8 else s + 4 + 4 + 4 + 4 + 4 + 4
                  // base is at reserved[8]+layer...: width sits 52 bytes
                  // after it (8 reserved + 2 layer + 2 alt + 2 volume +
                  // 2 reserved + 36 matrix)
                  w0 = (c.u32(base + 52) >> 16).toInt
                  h0 = (c.u32(base + 56) >> 16).toInt
                case ("mdia", mdiaS, mdiaE) =>
                  walk(c, mdiaS, mdiaE) {
                    case ("hdlr", s, _) =>
                      isVideo = c.fourcc(s + 8) == "vide"
                    case ("minf", minfS, minfE) =>
                      walk(c, minfS, minfE) {
                        case ("stbl", stblS, stblE) =>
                          walk(c, stblS, stblE) {
                            case ("stsd", s, stsdE) =>
                              if (c.u32(s + 4) > 0) {
                                codec0 = c.fourcc(s + 12)
                                // a VIDEO sample entry is 8 bytes of box
                                // header + 78 fixed bytes, then nested
                                // config boxes (avcC for AVC — ISO
                                // 14496-15 §5.3.4)
                                val entryEnd =
                                  math.min(s + 8 + c.u32(s + 8), stsdE)
                                // best-effort: a sample entry whose tail
                                // is vendor padding rather than boxes must
                                // stay probe-able (it was before this
                                // extraction existed) — a malformed tail
                                // just means "no avcC", never a failure
                                if (s + 16 + 78 <= entryEnd)
                                  try walk(c, s + 16 + 78, entryEnd) {
                                    case ("avcC", as, ae) =>
                                      avcc0 = java.util.Arrays.copyOfRange(
                                        c.buf, as.toInt, ae.toInt)
                                    case _ =>
                                  } catch {
                                    // keep any avcC captured before the
                                    // corrupt tail (its bounds were
                                    // validated by walk before f ran)
                                    case _: IllegalArgumentException => ()
                                  }
                              }
                            case ("stts", s, _) =>
                              val n = c.u32(s + 4).toInt
                              deltas0 = (0 until n).toArray.flatMap { i =>
                                val cnt = c.u32(s + 8 + i * 8).toInt
                                val d = c.u32(s + 12 + i * 8).toInt
                                Array.fill(cnt)(d)
                              }
                            case ("stsz", s, _) =>
                              val fixed = c.u32(s + 4)
                              val n = c.u32(s + 8).toInt
                              sizes0 =
                                if (fixed != 0) Array.fill(n)(fixed.toInt)
                                else (0 until n).map(i => c.u32(s + 12 + i * 4).toInt).toArray
                            case ("stsc", s, _) =>
                              val n = c.u32(s + 4).toInt
                              stsc0 = (0 until n).map(i =>
                                (c.u32(s + 8 + i * 12).toInt,
                                  c.u32(s + 12 + i * 12).toInt)).toArray
                            case ("stco", s, _) =>
                              val n = c.u32(s + 4).toInt
                              stco0 = (0 until n).map(i => c.u32(s + 8 + i * 4)).toArray
                            case ("co64", s, _) =>
                              val n = c.u32(s + 4).toInt
                              stco0 = (0 until n).map(i => c.u64(s + 8 + i * 8)).toArray
                            case _ =>
                          }
                        case _ =>
                      }
                    case _ =>
                  }
                case _ =>
              }
              if (isVideo) {
                haveTrak = true
                width = w0; height = h0; codec = codec0; avccBytes = avcc0
                deltas = deltas0; sizes = sizes0
                stscEntries = stsc0; chunkOffsets = stco0
              }
            case _ =>
          }
        case _ =>
      }
      require(haveTrak && sizes.nonEmpty && chunkOffsets.nonEmpty,
        "not a video MP4: no video trak with sample tables found")
      // expand stsc runs (firstChunk, samplesPerChunk) over the chunk list
      // to per-sample absolute offsets
      require(stscEntries.nonEmpty,
        "not a video MP4: stsz/stco present but the stsc table is missing or empty")
      val offsets = new Array[Long](sizes.length)
      var sample = 0
      var chunk = 0
      var entry = 0
      while (chunk < chunkOffsets.length && sample < sizes.length) {
        while (entry + 1 < stscEntries.length &&
            chunk + 1 >= stscEntries(entry + 1)._1) entry += 1
        val spc = stscEntries(entry)._2
        var off = chunkOffsets(chunk)
        var i = 0
        while (i < spc && sample < sizes.length) {
          offsets(sample) = off
          off += sizes(sample)
          sample += 1; i += 1
        }
        chunk += 1
      }
      require(sample == sizes.length,
        s"corrupt MP4: stsc/stco cover $sample of ${sizes.length} samples")
      // every declared sample range must lie INSIDE the payload: with
      // moov-before-mdat, a truncated mdat still box-walks cleanly, and
      // copyOfRange would silently ZERO-PAD the missing tail — wrong
      // sample bytes with no error. Validate once here so sampleBytes is
      // a plain slice.
      var v = 0
      while (v < sizes.length) {
        require(offsets(v) >= 0 && offsets(v) + sizes(v) <= payload.length,
          s"corrupt MP4: sample $v range [${offsets(v)}, ${offsets(v) + sizes(v)}) " +
            s"exceeds the ${payload.length}-byte payload (truncated mdat?)")
        v += 1
      }
      val durMs = if (mvhdTs > 0) mvhdDur * 1000L / mvhdTs else 0L
      Mp4Meta(brand, mvhdTs, durMs, width, height, codec,
        offsets, sizes, deltas, avccBytes)
    }

    /** The bytes of sample `f`, sliced straight from mdat by the expanded
      * tables — a real container seek, no decode (ranges validated against
      * the payload length at parse time). */
    def sampleBytes(payload: Array[Byte], meta: Mp4Meta, f: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(payload,
        meta.sampleOffsets(f).toInt, meta.sampleOffsets(f).toInt + meta.sampleSizes(f))
  }

  /** Attach a REAL (structurally valid) MP4 payload per row, seeded by the
    * id column; ≥2-chunk layout every 3rd row so the stsc expansion stays
    * load-bearing in the gate corpus. */
  def attachMp4Payload(df: DataFrame, idCol: String, nSamples: Int = 6,
      w: Int = 16, h: Int = 9): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRow(id, "video/mp4",
        Mp4Video.synthMp4(id, nSamples, w, h,
          chunks = if (id % 3 == 0) 2 else 1)))
  }

  case class Mp4Probe(doc_id: Long, brand: String, duration_ms: Long,
      width: Int, height: Int, codec: String, n_samples: Int,
      media_bytes: Long, first_sample_sum: Long)

  /** Container-probe stage over real MP4 payloads: every value comes from
    * PARSING the box structure — brand, mvhd duration, tkhd geometry, stsd
    * fourcc, sample count, total sample bytes, and the byte sum of sample
    * 0 sliced from mdat via the expanded stsz/stsc/stco tables. */
  def probeMp4(rows: Dataset[MediaRow]): Dataset[Mp4Probe] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val m = Mp4Video.parse(r.payload)
        val s0 = Mp4Video.sampleBytes(r.payload, m, 0)
        Mp4Probe(r.doc_id, m.brand, m.durationMs, m.width, m.height, m.codec,
          m.nSamples, m.sampleSizes.foldLeft(0L)(_ + _),
          s0.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
      }
    }
  }

  /** Frame sampling over real MP4 containers: every `stride`-th SAMPLE's
    * true bytes, sliced by offset from mdat — the production keyframe-
    * sampler dataflow (1→N flatMap generator; decode of the slices stays
    * behind MediaCodec). */
  def sampleMp4Frames(rows: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    import rows.sparkSession.implicits._
    require(stride > 0, "stride must be positive")
    rows.flatMap { r =>
      val m = Mp4Video.parse(r.payload)
      (0 until m.nSamples by stride).iterator.map(f =>
        FrameRow(r.doc_id, f.toLong, Mp4Video.sampleBytes(r.payload, m, f)))
    }
  }

  /** Attach a REAL animated-GIF payload per row, seeded by the id column —
    * encode runs inside tasks, same shape as the PNG/WAV attach stages. */
  def attachVideoPayload(df: DataFrame, idCol: String,
      w: Int = 8, h: Int = 8, nFrames: Int = 4): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => MediaRow(id, "image/gif", GifVideo.synthGif(id, w, h, nFrames)))
  }

  case class VideoFrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, gray_sum: Long, gray_checksum: Long)

  /** Frame-extraction stage over real GIF payloads: a flatMap generator per
    * payload (1→N, output row count decoupled from input), with the frame
    * features computed from DECODED rasters. At scale the output dwarfs
    * the input — repartition AFTER this stage, not before. */
  def decodeVideoFrames(rows: Dataset[MediaRow]): Dataset[VideoFrameFeatures] = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      GifVideo.decodeFrames(r.payload).map { case (f, w, h, sum, cs) =>
        VideoFrameFeatures(r.doc_id, f, w, h, sum, cs)
      }
    }
  }

  case class VideoHash(doc_id: Long, vhash: Long)

  /** Per-bit strict majority over frame signatures (ties clear the bit) —
    * the fold that makes the clip hash tolerate a MINORITY of edited or
    * corrupted frames. */
  def majorityHash(hs: Seq[Long]): Long = {
    var vh = 0L
    var b = 0
    while (b < 64) {
      var c = 0
      hs.foreach(h => if (((h >>> b) & 1L) == 1L) c += 1)
      if (2 * c > hs.size) vh |= 1L << b
      b += 1
    }
    vh
  }

  /** TEMPORAL-MAJORITY video signature: dHash each decoded (composited)
    * frame, then set bit b of the video hash when MORE THAN HALF the
    * frames set it — a whole-clip perceptual signature that tolerates a
    * few edited/corrupted frames where a first-frame keyframe hash would
    * not, and stays deterministic integer math end to end (the oracle
    * replays it from the pixel formula). Same 48-bit shape as the
    * image/audio/text signatures, so [[graft.dedup.Dedup.hammingNearDup]]'s
    * pigeonhole block join pairs videos with identical parameters — the
    * video leg of the perceptual-dedup triad. Map-only; scales with cores
    * like the other codec kernels. */
  def vhashVideos(rows: Dataset[MediaRow]): Dataset[VideoHash] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map(r => VideoHash(r.doc_id,
        majorityHash(GifVideo.decodeFrameHashes(r.payload))))
    }
  }

  /** Attach a binary payload + metadata to a text table (stand-in for real
    * media bytes; the payload column is genuinely BinaryType). */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text/utf-8").as("kind"),
      // NULL text encodes to a NULL payload, which the codec kernels
      // would dereference mid-task (NPE kills the job); an empty media
      // object is the faithful stand-in
      coalesce(encode(col(textCol), "UTF-8"),
        lit(Array.emptyByteArray)).as("payload"))

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
