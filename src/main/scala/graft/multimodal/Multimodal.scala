package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in partition-sized batches.
  *
  * The decode itself is PLUGGABLE ([[MediaCodec]]): the container has no
  * image/audio codecs, so the default instance ([[StubCodec]]) is a clearly
  * marked deterministic fake — but everything around it (schema, encoders,
  * partition-batched iteration, feature schema) is the real shape a decode /
  * resize / frame-sample stage has at scale: binary in, fixed-width feature
  * row out, no driver involvement, one task per input split. A production
  * build injects a real JPEG/audio/video codec without touching any of the
  * pipeline code — the spec swaps one in and the plumbing is unchanged.
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
