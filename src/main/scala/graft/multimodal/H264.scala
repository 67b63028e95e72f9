package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** H.264 / AVC BITSTREAM STRUCTURE, pure JVM — ITU-T H.264 §7.3/§B.1
  * parsed from the spec, no codec libraries: the Annex-B start-code walk,
  * RBSP emulation-prevention (00 00 03) escape/unescape, Exp-Golomb
  * bit I/O, and a real SPS parse (profile/level, pic-size-in-MBs, frame
  * cropping → exact pixel width/height) plus IDR keyframe flagging by
  * nal_unit_type. This is everything a 100 TB video-curation pipeline
  * needs to build a keyframe INDEX — which samples are seekable, what the
  * coded geometry is, where each NAL's bytes live — without ever entropy-
  * decoding a slice. The remaining seam is RASTER DECODE ONLY: turning a
  * slice payload into pixels stays behind [[Multimodal.MediaCodec]],
  * because CABAC/CAVLC + prediction is a codec the JDK does not ship.
  *
  * Fixtures are the q_mp4_probe trick one level deeper: synthetic streams
  * are STRUCTURALLY VALID (real start codes, real escaped SPS bits that
  * this parser — or any H.264 parser — must actually Exp-Golomb-decode),
  * while slice payload bytes follow a formula of (seed, frame, offset)
  * over 1..255 (zero-free, so no accidental start codes and the DuckDB
  * oracle replays every probed value arithmetically).
  */
object H264 {

  // ---- bit I/O over RBSP ----------------------------------------------

  /** MSB-first bit writer with ue(v) Exp-Golomb and RBSP trailing bits. */
  final class BitWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == 8) { bytes.write(cur); cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    /** Exp-Golomb unsigned: leadingZeros(bitlen(v+1)-1) then v+1. */
    def writeUe(v: Int): Unit = {
      require(v >= 0)
      val x = v + 1L
      val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
      writeBits(0L, len - 1)
      writeBits(x, len)
    }
    /** rbsp_trailing_bits(): stop bit 1, then zero-pad to a byte. */
    def finishRbsp(): Array[Byte] = {
      writeBit(1)
      while (nBits != 0) writeBit(0)
      bytes.toByteArray
    }
  }

  /** MSB-first bit reader with ue(v); bounds-checked. */
  final class BitReader(buf: Array[Byte]) {
    private var pos = 0
    def readBit(): Int = {
      require(pos < buf.length * 8, "SPS truncated: bit read past RBSP end")
      val b = (buf(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1; b
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readUe(): Int = {
      var zeros = 0
      while (readBit() == 0) {
        zeros += 1
        require(zeros < 32, "corrupt Exp-Golomb: 32+ leading zeros")
      }
      ((1L << zeros) - 1 + readBits(zeros)).toInt
    }
  }

  /** Insert emulation-prevention bytes: any 00 00 followed by 00..03
    * becomes 00 00 03 xx (H.264 §7.4.1.1). */
  def rbspEscape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Remove emulation-prevention bytes: 00 00 03 → 00 00. */
  def rbspUnescape(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ebsp.length)
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val b = ebsp(i) & 0xff
      if (b == 3 && zeros >= 2) zeros = 0 // the escape byte itself: drop
      else { out.write(b); zeros = if (b == 0) zeros + 1 else 0 }
      i += 1
    }
    out.toByteArray
  }

  // ---- NAL structure ----------------------------------------------------

  /** One NAL unit: header fields + the escaped payload AFTER the header
    * byte (unescape before bit-parsing). */
  case class Nal(refIdc: Int, nalType: Int, payload: Array[Byte])

  val NalSliceNonIdr = 1
  val NalSliceIdr = 5
  val NalSps = 7
  val NalPps = 8

  /** Walk an Annex-B byte stream (§B.1): NAL units delimited by
    * 00 00 01 start codes (with any number of leading zero bytes — the
    * four-byte 00 00 00 01 form included). Returns units in order. */
  def annexBNals(bytes: Array[Byte]): Vector[Nal] = {
    val out = Vector.newBuilder[Nal]
    val n = bytes.length
    // positions of every 00 00 01
    var starts = List.empty[Int] // start of NAL data (after the 01)
    var i = 0
    while (i + 2 < n) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts ::= (i + 3); i += 3
      } else i += 1
    }
    val ss = starts.reverse.toArray
    var k = 0
    while (k < ss.length) {
      val s = ss(k)
      // NAL data ends where the next start code's zero run begins
      var e = if (k + 1 < ss.length) ss(k + 1) - 3 else n
      while (e > s && bytes(e - 1) == 0) e -= 1 // trailing_zero/leading zeros
      require(e > s, s"empty NAL unit at offset $s")
      val hdr = bytes(s) & 0xff
      require((hdr & 0x80) == 0, f"forbidden_zero_bit set in NAL header 0x$hdr%02x")
      out += Nal((hdr >> 5) & 3, hdr & 0x1f,
        java.util.Arrays.copyOfRange(bytes, s + 1, e))
      k += 1
    }
    out.result()
  }

  // ---- SPS --------------------------------------------------------------

  case class Sps(profileIdc: Int, levelIdc: Int, widthMbs: Int,
      heightMapUnits: Int, cropLeft: Int, cropRight: Int,
      cropTop: Int, cropBottom: Int, frameMbsOnly: Boolean) {
    /** 4:2:0 crop units: X=2; Y=2·(2−frame_mbs_only_flag)/… = 2 for
      * frame pictures (§7.4.2.1.1). */
    def width: Int = widthMbs * 16 - 2 * (cropLeft + cropRight)
    def height: Int =
      heightMapUnits * 16 * (if (frameMbsOnly) 1 else 2) - 2 * (cropTop + cropBottom)
  }

  /** Serialize an SPS RBSP (profile 66/77 — Baseline/Main, which carry no
    * chroma-format extension fields) and escape it. */
  def writeSps(sps: Sps): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(sps.profileIdc, 8)
    w.writeBits(0, 8)                  // constraint flags + reserved
    w.writeBits(sps.levelIdc, 8)
    w.writeUe(0)                       // seq_parameter_set_id
    w.writeUe(0)                       // log2_max_frame_num_minus4
    w.writeUe(2)                       // pic_order_cnt_type (2: no extra fields)
    w.writeUe(1)                       // max_num_ref_frames
    w.writeBit(0)                      // gaps_in_frame_num_value_allowed
    w.writeUe(sps.widthMbs - 1)        // pic_width_in_mbs_minus1
    w.writeUe(sps.heightMapUnits - 1)  // pic_height_in_map_units_minus1
    w.writeBit(if (sps.frameMbsOnly) 1 else 0)
    w.writeBit(1)                      // direct_8x8_inference_flag
    val cropping =
      sps.cropLeft != 0 || sps.cropRight != 0 || sps.cropTop != 0 || sps.cropBottom != 0
    w.writeBit(if (cropping) 1 else 0)
    if (cropping) {
      w.writeUe(sps.cropLeft); w.writeUe(sps.cropRight)
      w.writeUe(sps.cropTop); w.writeUe(sps.cropBottom)
    }
    w.writeBit(0)                      // vui_parameters_present_flag
    rbspEscape(w.finishRbsp())
  }

  private val HighProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** Parse an SPS from its ESCAPED payload (the bytes after the NAL
    * header). Handles the chroma-format branch of the high profiles so
    * real-world SPS headers parse too, not just our fixtures. */
  def parseSps(payload: Array[Byte]): Sps = {
    val r = new BitReader(rbspUnescape(payload))
    val profile = r.readBits(8).toInt
    r.readBits(8)                      // constraints
    val level = r.readBits(8).toInt
    r.readUe()                         // sps_id
    if (HighProfiles.contains(profile)) {
      val chroma = r.readUe()
      if (chroma == 3) r.readBit()     // separate_colour_plane_flag
      r.readUe(); r.readUe()           // bit_depth_{luma,chroma}_minus8
      r.readBit()                      // qpprime_y_zero_transform_bypass
      if (r.readBit() == 1) {          // seq_scaling_matrix_present
        val lists = if (chroma == 3) 12 else 8
        var l = 0
        while (l < lists) {
          if (r.readBit() == 1) skipScalingList(r, if (l < 6) 16 else 64)
          l += 1
        }
      }
    }
    r.readUe()                         // log2_max_frame_num_minus4
    val poc = r.readUe()
    if (poc == 0) r.readUe()           // log2_max_pic_order_cnt_lsb_minus4
    else if (poc == 1) {
      r.readBit(); r.readUe(); r.readUe()
      val n = r.readUe()
      var i = 0
      while (i < n) { r.readUe(); i += 1 }
    }
    r.readUe()                         // max_num_ref_frames
    r.readBit()                        // gaps allowed
    val wMbs = r.readUe() + 1
    val hUnits = r.readUe() + 1
    val frameMbsOnly = r.readBit() == 1
    if (!frameMbsOnly) r.readBit()     // mb_adaptive_frame_field_flag
    r.readBit()                        // direct_8x8_inference_flag
    val (cl, cr, ct, cb) =
      if (r.readBit() == 1) (r.readUe(), r.readUe(), r.readUe(), r.readUe())
      else (0, 0, 0, 0)
    Sps(profile, level, wMbs, hUnits, cl, cr, ct, cb, frameMbsOnly)
  }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var last = 8; var next = 8; var i = 0
    while (i < size) {
      if (next != 0) {
        // se(v): map ue k to (-1)^(k+1) * ceil(k/2)
        val k = r.readUe()
        val delta = if (k % 2 == 0) -(k / 2) else (k + 1) / 2
        next = (last + delta + 256) % 256
      }
      if (next != 0) last = next
      i += 1
    }
  }

  // ---- synthetic fixtures ------------------------------------------------

  /** The oracle formulas (all integer, DuckDB-replayable; corpus doc_ids
    * are multiples of 10, so variation that needs parity uses seed/10). */
  def synthMbW(seed: Long): Int = 1 + (seed % 4).toInt
  def synthMbH(seed: Long): Int = 1 + ((seed / 10) % 3).toInt
  def synthCropRight(seed: Long): Int = (seed % 3).toInt
  def synthCropBottom(seed: Long): Int = ((seed / 10) % 2).toInt
  def synthProfile(seed: Long): Int = if ((seed / 10) % 4 < 2) 66 else 77
  def synthSliceLen(seed: Long, f: Int): Int =
    24 + (((seed * 5 + f * 13) % 24 + 24) % 24).toInt
  /** Slice payload byte j of frame f: 1 + (seed·31 + f·17 + j·7) mod 255 —
    * zero-free, so slices can never fake a start code. */
  def synthSliceByte(seed: Long, f: Int, j: Int): Int =
    1 + (((seed * 31 + f * 17 + j * 7) % 255 + 255) % 255).toInt

  def synthSps(seed: Long): Sps =
    Sps(synthProfile(seed), levelIdc = 30,
      widthMbs = synthMbW(seed), heightMapUnits = synthMbH(seed),
      cropLeft = 0, cropRight = synthCropRight(seed),
      cropTop = 0, cropBottom = synthCropBottom(seed), frameMbsOnly = true)

  private def nalBytes(refIdc: Int, nalType: Int, payload: Array[Byte],
      fourByteStart: Boolean): Array[Byte] = {
    val start: Array[Byte] =
      if (fourByteStart) Array(0, 0, 0, 1) else Array(0, 0, 1)
    start ++ Array((((refIdc & 3) << 5) | (nalType & 0x1f)).toByte) ++ payload
  }

  /** One access unit per frame: IDR frames (every `idrEvery`-th) carry
    * SPS + PPS + IDR slice; the rest a single non-IDR slice. The first
    * start code of an AU uses the four-byte form, the rest three-byte —
    * both §B.1 shapes stay load-bearing. */
  def synthAccessUnit(seed: Long, f: Int, idrEvery: Int): Array[Byte] = {
    val isIdr = f % idrEvery == 0
    val slice = Array.tabulate[Byte](synthSliceLen(seed, f))(j =>
      synthSliceByte(seed, f, j).toByte)
    if (isIdr) {
      val pps = { // minimal PPS RBSP: ids + flags a real parser skips over
        val w = new BitWriter
        w.writeUe(0); w.writeUe(0)     // pps_id, sps_id
        w.writeBit(0); w.writeBit(0)   // entropy_coding_mode, pic_order_present
        w.writeUe(0)                   // num_slice_groups_minus1
        rbspEscape(w.finishRbsp())
      }
      nalBytes(3, NalSps, writeSps(synthSps(seed)), fourByteStart = true) ++
        nalBytes(3, NalPps, pps, fourByteStart = false) ++
        nalBytes(3, NalSliceIdr, slice, fourByteStart = false)
    } else nalBytes(2, NalSliceNonIdr, slice, fourByteStart = true)
  }

  /** A structurally valid MP4 whose samples are the Annex-B access units
    * above; tkhd geometry = the SPS's cropped pixel geometry. */
  def synthH264Mp4(seed: Long, nFrames: Int, idrEvery: Int): Array[Byte] = {
    val sps = synthSps(seed)
    Multimodal.Mp4Video.synthMp4Samples(
      (0 until nFrames).map(synthAccessUnit(seed, _, idrEvery)).toArray,
      sps.width, sps.height, chunks = if (seed % 3 == 0) 2 else 1)
  }

  // ---- Spark stages -------------------------------------------------------

  def attachH264Payload(df: DataFrame, idCol: String,
      nFrames: Int = 6, idrEvery: Int = 3): Dataset[Multimodal.MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => Multimodal.MediaRow(id, "video/mp4",
        synthH264Mp4(id, nFrames, idrEvery)))
  }

  case class H264Probe(doc_id: Long, profile_idc: Int, level_idc: Int,
      width: Int, height: Int, n_nals: Long, n_idr: Long,
      idr_frames: String, slice_byte_sum: Long)

  /** Keyframe-index stage: parse the MP4 container, slice every sample's
    * true bytes out of mdat, walk its Annex-B NALs, Exp-Golomb-decode the
    * SPS for geometry, and flag IDR samples — the exact index a seekable
    * video pipeline needs, with raster decode (and only raster decode)
    * left behind the codec seam. Map-only: one output row per payload,
    * no shuffle except the gate's final ORDER BY. */
  def probeH264(rows: Dataset[Multimodal.MediaRow]): Dataset[H264Probe] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val meta = Multimodal.Mp4Video.parse(r.payload)
      var sps: Sps = null
      var nNals = 0L
      var sliceSum = 0L
      val idr = Vector.newBuilder[Int]
      var f = 0
      while (f < meta.nSamples) {
        val nals = annexBNals(Multimodal.Mp4Video.sampleBytes(r.payload, meta, f))
        nNals += nals.length
        var sawIdr = false
        nals.foreach { nal =>
          nal.nalType match {
            case NalSps => sps = parseSps(nal.payload)
            case NalSliceIdr =>
              sawIdr = true
              sliceSum += nal.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
            case NalSliceNonIdr =>
              sliceSum += nal.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
            case _ =>
          }
        }
        if (sawIdr) idr += f
        f += 1
      }
      require(sps != null, s"doc ${r.doc_id}: no SPS in any sample")
      require(sps.width == meta.width && sps.height == meta.height,
        s"doc ${r.doc_id}: SPS geometry ${sps.width}x${sps.height} != " +
          s"container tkhd ${meta.width}x${meta.height}")
      H264Probe(r.doc_id, sps.profileIdc, sps.levelIdc, sps.width, sps.height,
        nNals, idr.result().length.toLong, idr.result().mkString(","), sliceSum)
    }
  }
}
