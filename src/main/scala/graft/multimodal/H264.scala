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
  * decoding a slice. The I_PCM raster path below additionally decodes
  * REAL pixels from slices whose macroblocks carry literal samples, so
  * the remaining seam is ENTROPY-CODED RESIDUALS ONLY: CAVLC/CABAC +
  * prediction stays behind [[Multimodal.MediaCodec]], because that is a
  * codec the JDK does not ship.
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
    /** Exp-Golomb signed (§9.1.1): se(v) k maps back as
      * v<=0 → k=-2v (even), v>0 → k=2v-1 (odd). */
    def writeSe(v: Int): Unit =
      writeUe(if (v <= 0) -2 * v else 2 * v - 1)
    /** pcm_alignment_zero_bit run: pad the CURRENT byte with zeros
      * (§7.3.5 before I_PCM samples). No-op when already aligned. */
    def alignZero(): Unit = while (nBits != 0) writeBit(0)
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
    /** Exp-Golomb signed (§9.1.1): odd k → (k+1)/2, even k → -k/2. */
    def readSe(): Int = {
      val k = readUe()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def byteAligned: Boolean = (pos & 7) == 0
    /** Consume pcm_alignment_zero_bit padding, requiring each bit 0
      * (§7.3.5: a 1 here means the parse lost sync). */
    def alignToByte(): Unit =
      while (!byteAligned)
        require(readBit() == 0, "pcm_alignment_zero_bit is 1: bitstream desync")
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
      cropTop: Int, cropBottom: Int, frameMbsOnly: Boolean,
      chromaFormatIdc: Int = 1, separateColourPlane: Boolean = false,
      // retained for SLICE HEADER parsing (the I_PCM raster path): the
      // frame_num field width, the POC mode (2 = none in the header),
      // and the POC-lsb width mode 0 would read.
      log2MaxFrameNum: Int = 4, pocType: Int = 2,
      log2MaxPocLsb: Int = 4) {
    /** §7.4.2.1.1: ChromaArrayType 0 (monochrome / separate planes) crops
      * in luma samples; 4:2:0/4:2:2 halve horizontally (SubWidthC=2);
      * only 4:2:0 halves vertically (SubHeightC=2); field coding doubles
      * the vertical unit. */
    private def chromaArrayType: Int =
      if (separateColourPlane) 0 else chromaFormatIdc
    private def cropUnitX: Int =
      if (chromaArrayType == 1 || chromaArrayType == 2) 2 else 1
    private def cropUnitY: Int =
      (if (chromaArrayType == 1) 2 else 1) * (if (frameMbsOnly) 1 else 2)
    def width: Int = widthMbs * 16 - cropUnitX * (cropLeft + cropRight)
    def height: Int =
      heightMapUnits * 16 * (if (frameMbsOnly) 1 else 2) -
        cropUnitY * (cropTop + cropBottom)
  }

  /** Serialize an SPS RBSP (profile 66/77 — Baseline/Main, which carry no
    * chroma-format extension fields, hence always 4:2:0) and escape it. */
  def writeSps(sps: Sps): Array[Byte] = {
    require(!HighProfiles.contains(sps.profileIdc) && sps.chromaFormatIdc == 1 &&
      !sps.separateColourPlane,
      "writeSps emits Baseline/Main (4:2:0) only; high-profile chroma " +
        "shapes are parse-side support")
    require(sps.pocType == 2, "writeSps emits pic_order_cnt_type 2 only " +
      "(no POC fields in slice headers); types 0/1 are parse-side support")
    val w = new BitWriter
    w.writeBits(sps.profileIdc, 8)
    w.writeBits(0, 8)                  // constraint flags + reserved
    w.writeBits(sps.levelIdc, 8)
    w.writeUe(0)                       // seq_parameter_set_id
    w.writeUe(sps.log2MaxFrameNum - 4) // log2_max_frame_num_minus4
    w.writeUe(2)                       // pic_order_cnt_type (2: no extra fields)
    w.writeUe(1)                       // max_num_ref_frames
    w.writeBit(0)                      // gaps_in_frame_num_value_allowed
    w.writeUe(sps.widthMbs - 1)        // pic_width_in_mbs_minus1
    w.writeUe(sps.heightMapUnits - 1)  // pic_height_in_map_units_minus1
    w.writeBit(if (sps.frameMbsOnly) 1 else 0)
    if (!sps.frameMbsOnly) w.writeBit(0) // mb_adaptive_frame_field_flag
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
    var chromaFormatIdc = 1            // implied 4:2:0 for non-high profiles
    var separateColourPlane = false
    if (HighProfiles.contains(profile)) {
      chromaFormatIdc = r.readUe()
      if (chromaFormatIdc == 3)
        separateColourPlane = r.readBit() == 1
      r.readUe(); r.readUe()           // bit_depth_{luma,chroma}_minus8
      r.readBit()                      // qpprime_y_zero_transform_bypass
      if (r.readBit() == 1) {          // seq_scaling_matrix_present
        val lists = if (chromaFormatIdc == 3) 12 else 8
        var l = 0
        while (l < lists) {
          if (r.readBit() == 1) skipScalingList(r, if (l < 6) 16 else 64)
          l += 1
        }
      }
    }
    val log2MaxFrameNum = r.readUe() + 4 // log2_max_frame_num_minus4
    val poc = r.readUe()
    var log2MaxPocLsb = 4
    if (poc == 0) log2MaxPocLsb = r.readUe() + 4
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
    Sps(profile, level, wMbs, hUnits, cl, cr, ct, cb, frameMbsOnly,
      chromaFormatIdc, separateColourPlane,
      log2MaxFrameNum = log2MaxFrameNum, pocType = poc,
      log2MaxPocLsb = log2MaxPocLsb)
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

  /** The PPS fields a slice-header/macroblock parse consumes (§7.3.2.2;
    * the trailing weighted-pred/QP knobs are parsed past but not needed
    * for the I_PCM raster path, where every sample is literal). */
  case class Pps(ppsId: Int, spsId: Int, cabac: Boolean,
      picOrderPresent: Boolean, deblockingControlPresent: Boolean,
      redundantPicCntPresent: Boolean)

  /** Serialize the fixture PPS RBSP (escaped): the FULL mandatory §7.3.2.2
    * field list with every knob at its neutral value — CAVLC entropy, one
    * slice group, no deblocking override, no redundant-count field. (The
    * earlier fixtures stopped after num_slice_groups_minus1, which no
    * conformant decoder would accept; the I_PCM raster path actually
    * parses the PPS, so the fixture must be complete.) */
  def writePps(): Array[Byte] = {
    val w = new BitWriter
    w.writeUe(0); w.writeUe(0)     // pps_id, sps_id
    w.writeBit(0)                  // entropy_coding_mode_flag (CAVLC)
    w.writeBit(0)                  // bottom_field_pic_order_in_frame_present
    w.writeUe(0)                   // num_slice_groups_minus1
    w.writeUe(0); w.writeUe(0)     // num_ref_idx_l{0,1}_default_active_minus1
    w.writeBit(0)                  // weighted_pred_flag
    w.writeBits(0, 2)              // weighted_bipred_idc
    w.writeSe(0)                   // pic_init_qp_minus26
    w.writeSe(0)                   // pic_init_qs_minus26
    w.writeSe(0)                   // chroma_qp_index_offset
    w.writeBit(0)                  // deblocking_filter_control_present_flag
    w.writeBit(0)                  // constrained_intra_pred_flag
    w.writeBit(0)                  // redundant_pic_cnt_present_flag
    rbspEscape(w.finishRbsp())
  }

  /** Parse a PPS from its ESCAPED payload. FMO (slice groups > 1) is
    * refused — its map types change the macroblock-to-slice-group walk
    * and no production training corpus ships it. */
  def parsePps(payload: Array[Byte]): Pps = {
    val r = new BitReader(rbspUnescape(payload))
    val ppsId = r.readUe()
    val spsId = r.readUe()
    val cabac = r.readBit() == 1
    val picOrderPresent = r.readBit() == 1
    val numSliceGroups = r.readUe() + 1
    require(numSliceGroups == 1,
      s"FMO ($numSliceGroups slice groups) is not supported: the slice-group " +
        "map changes macroblock order and nothing modern emits it")
    r.readUe(); r.readUe()         // num_ref_idx_l{0,1}_default_active_minus1
    r.readBit()                    // weighted_pred_flag
    r.readBits(2)                  // weighted_bipred_idc
    r.readSe(); r.readSe(); r.readSe() // qp, qs, chroma_qp_index_offset
    val deblock = r.readBit() == 1
    r.readBit()                    // constrained_intra_pred_flag
    val redundant = r.readBit() == 1
    Pps(ppsId, spsId, cabac, picOrderPresent, deblock, redundant)
  }

  // ---- AVCC form (ISO 14496-15: how MP4 actually carries AVC) -----------

  /** Decoder configuration from an `avcC` box body: NAL length-prefix
    * size plus the out-of-band SPS/PPS NAL units (header byte included,
    * payload escaped — same shape as in-band NALs). */
  case class AvcConfig(lengthSize: Int, sps: Vector[Array[Byte]],
      pps: Vector[Array[Byte]]) {
    /** The first SPS, parsed. */
    def firstSps: Sps = {
      require(sps.nonEmpty, "avcC carries no SPS")
      val hdr = sps.head(0) & 0xff
      require((hdr & 0x1f) == NalSps, f"avcC SPS entry has NAL type ${hdr & 0x1f}")
      parseSps(java.util.Arrays.copyOfRange(sps.head, 1, sps.head.length))
    }
  }

  /** Serialize an AVCDecoderConfigurationRecord (§5.3.3.1). */
  def writeAvcc(cfg: AvcConfig): Array[Byte] = {
    require(cfg.lengthSize == 1 || cfg.lengthSize == 2 || cfg.lengthSize == 4,
      s"NAL length prefix must be 1, 2 or 4 bytes, got ${cfg.lengthSize}")
    // the record's count fields are 5 and 8 bits wide — an overflow would
    // silently corrupt the reserved bits / shift the parse
    require(cfg.sps.nonEmpty && cfg.sps.length <= 31,
      s"numOfSequenceParameterSets is 5 bits: 1..31, got ${cfg.sps.length}")
    require(cfg.pps.length <= 255,
      s"numOfPictureParameterSets is 8 bits: 0..255, got ${cfg.pps.length}")
    require((cfg.sps ++ cfg.pps).forall(_.length <= 0xffff),
      "a parameter set exceeds the 16-bit length field")
    val out = new java.io.ByteArrayOutputStream()
    val sps0 = cfg.firstSps // validates + supplies profile/level bytes
    out.write(1)                                  // configurationVersion
    out.write(sps0.profileIdc)
    out.write(0)                                  // profile_compatibility
    out.write(sps0.levelIdc)
    out.write(0xfc | (cfg.lengthSize - 1))        // reserved + lengthSizeMinusOne
    out.write(0xe0 | cfg.sps.length)              // reserved + numOfSPS
    cfg.sps.foreach { n => out.write(n.length >> 8); out.write(n.length & 0xff); out.write(n, 0, n.length) }
    out.write(cfg.pps.length)
    cfg.pps.foreach { n => out.write(n.length >> 8); out.write(n.length & 0xff); out.write(n, 0, n.length) }
    out.toByteArray
  }

  /** Parse an `avcC` box body. */
  def parseAvcc(b: Array[Byte]): AvcConfig = {
    require(b.length >= 7 && (b(0) & 0xff) == 1,
      s"not an AVCDecoderConfigurationRecord (${b.length} bytes)")
    val lengthSize = (b(4) & 3) + 1
    val nSps = b(5) & 0x1f
    var p = 6
    def readSet(n: Int): Vector[Array[Byte]] = {
      val v = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        require(p + 2 <= b.length, "avcC truncated at a parameter-set length")
        val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
        p += 2
        require(p + len <= b.length, "avcC truncated inside a parameter set")
        v += java.util.Arrays.copyOfRange(b, p, p + len)
        p += len
        i += 1
      }
      v.result()
    }
    val sps = readSet(nSps)
    require(p < b.length, "avcC truncated before the PPS count")
    val pps = { val n = b(p) & 0xff; p += 1; readSet(n) }
    AvcConfig(lengthSize, sps, pps)
  }

  /** Walk a LENGTH-PREFIXED sample (the in-mdat form when an avcC is
    * present): each NAL is preceded by a big-endian length of
    * `lengthSize` bytes — no start codes, no trailing zeros. */
  def lengthPrefixedNals(bytes: Array[Byte], lengthSize: Int): Vector[Nal] = {
    val out = Vector.newBuilder[Nal]
    var p = 0
    while (p < bytes.length) {
      require(p + lengthSize <= bytes.length, s"truncated NAL length at $p")
      var len = 0L
      var i = 0
      while (i < lengthSize) { len = (len << 8) | (bytes(p + i) & 0xffL); i += 1 }
      p += lengthSize
      require(len >= 1 && p + len <= bytes.length,
        s"NAL length $len at $p exceeds the ${bytes.length}-byte sample")
      val hdr = bytes(p) & 0xff
      require((hdr & 0x80) == 0, f"forbidden_zero_bit set in NAL header 0x$hdr%02x")
      out += Nal((hdr >> 5) & 3, hdr & 0x1f,
        java.util.Arrays.copyOfRange(bytes, p + 1, p + len.toInt))
      p += len.toInt
    }
    out.result()
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

  /** The shared fixture PPS RBSP (escaped) — ONE definition, because the
    * Annex-B and AVCC fixtures assert identical stream content. Now the
    * full conformant field list (see [[writePps]]). */
  private def minimalPpsRbsp(): Array[Byte] = writePps()

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
      nalBytes(3, NalSps, writeSps(synthSps(seed)), fourByteStart = true) ++
        nalBytes(3, NalPps, minimalPpsRbsp(), fourByteStart = false) ++
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

  private def beLen(v: Int, n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)

  /** The AVCC spelling of the same stream — how production muxers write
    * AVC into MP4: SPS/PPS live OUT-OF-BAND in an `avcC` box inside the
    * avc1 sample entry, and each mdat sample is a 4-byte-length-prefixed
    * slice NAL (no start codes). Slice payload bytes are the SAME formula
    * as the Annex-B fixtures, so both gates share one oracle family. */
  def synthAvccMp4(seed: Long, nFrames: Int, idrEvery: Int): Array[Byte] = {
    val sps = synthSps(seed)
    val spsNal = Array((3 << 5 | NalSps).toByte) ++ writeSps(sps)
    val ppsNal = Array((3 << 5 | NalPps).toByte) ++ minimalPpsRbsp()
    val avcc = writeAvcc(AvcConfig(4, Vector(spsNal), Vector(ppsNal)))
    val avccBox = {
      val len = avcc.length + 8
      Array(((len >> 24) & 0xff).toByte, ((len >> 16) & 0xff).toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
        "avcC".getBytes("US-ASCII") ++ avcc
    }
    val samples = (0 until nFrames).map { f =>
      val isIdr = f % idrEvery == 0
      val slice = Array.tabulate[Byte](synthSliceLen(seed, f))(j =>
        synthSliceByte(seed, f, j).toByte)
      val nal = Array(((if (isIdr) 3 else 2) << 5 |
        (if (isIdr) NalSliceIdr else NalSliceNonIdr)).toByte) ++ slice
      beLen(nal.length, 4) ++ nal
    }.toArray
    Multimodal.Mp4Video.synthMp4Samples(samples, sps.width, sps.height,
      chunks = if (seed % 3 == 0) 2 else 1, sampleEntryExtra = avccBox)
  }

  def attachAvccPayload(df: DataFrame, idCol: String,
      nFrames: Int = 6, idrEvery: Int = 3): Dataset[Multimodal.MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => Multimodal.MediaRow(id, "video/mp4",
        synthAvccMp4(id, nFrames, idrEvery)))
  }

  /** [[probeH264]]'s AVCC twin: geometry/profile come from the avcC box's
    * out-of-band SPS (extracted from the avc1 sample entry by the
    * container parser), samples walk as length-prefixed NALs. n_nals
    * counts IN-BAND units only — one slice per frame — which is the
    * structural difference between the two carriage forms. */
  def probeH264Avcc(rows: Dataset[Multimodal.MediaRow]): Dataset[H264Probe] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val meta = Multimodal.Mp4Video.parse(r.payload)
      require(meta.avcc.nonEmpty, s"doc ${r.doc_id}: no avcC in the avc1 entry")
      val cfg = parseAvcc(meta.avcc)
      val sps = cfg.firstSps
      require(sps.width == meta.width && sps.height == meta.height,
        s"doc ${r.doc_id}: avcC SPS ${sps.width}x${sps.height} != " +
          s"container tkhd ${meta.width}x${meta.height}")
      var nNals = 0L
      var sliceSum = 0L
      val idr = Vector.newBuilder[Int]
      var f = 0
      while (f < meta.nSamples) {
        val nals = lengthPrefixedNals(
          Multimodal.Mp4Video.sampleBytes(r.payload, meta, f), cfg.lengthSize)
        nNals += nals.length
        var sawIdr = false
        nals.foreach { nal =>
          if (nal.nalType == NalSliceIdr) { sawIdr = true }
          if (nal.nalType == NalSliceIdr || nal.nalType == NalSliceNonIdr)
            sliceSum += nal.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        }
        if (sawIdr) idr += f
        f += 1
      }
      H264Probe(r.doc_id, sps.profileIdc, sps.levelIdc, sps.width, sps.height,
        nNals, idr.result().length.toLong, idr.result().mkString(","), sliceSum)
    }
  }

  // ---- I_PCM raster path (§7.3.5 / §7.4.5): real pixels, no entropy ------

  /** A decoded 4:2:0 frame: full macroblock-grid planes (crop applied by
    * the consumer via the SPS geometry). Values 0..255 as Ints. */
  case class Raster(widthMbs: Int, heightMbs: Int,
      luma: Array[Int], cb: Array[Int], cr: Array[Int]) {
    def w: Int = widthMbs * 16
    def h: Int = heightMbs * 16
  }

  /** Serialize an IDR I-slice whose every macroblock is I_PCM: slice
    * header (§7.3.3 under pocType 2 / CAVLC / IDR), then per MB in raster
    * order mb_type ue(25), pcm_alignment_zero_bit padding, 256 raw luma
    * samples and 64+64 raw Cb/Cr samples (§7.3.5). Returns the ESCAPED
    * payload (I_PCM bytes may be zero, so emulation prevention is
    * load-bearing here, unlike the zero-free formula slices). */
  def writeIpcmSlice(sps: Sps, luma: (Int, Int) => Int,
      cb: (Int, Int) => Int, cr: (Int, Int) => Int,
      isIdr: Boolean = true, frameNum: Int = 0, refIdc: Int = 3): Array[Byte] = {
    require(sps.pocType == 2 && sps.frameMbsOnly && sps.chromaFormatIdc == 1,
      "writeIpcmSlice emits progressive 4:2:0 pocType-2 streams only")
    require(!isIdr || frameNum == 0, "IDR pictures must have frame_num 0")
    val w = new BitWriter
    w.writeUe(0)                        // first_mb_in_slice
    w.writeUe(7)                        // slice_type: I (all slices I)
    w.writeUe(0)                        // pic_parameter_set_id
    w.writeBits(frameNum.toLong, sps.log2MaxFrameNum)
    if (isIdr) w.writeUe(0)             // idr_pic_id
    // pocType 2: no POC fields. I slice: no ref lists, no pred weights.
    if (refIdc != 0) {
      if (isIdr) { w.writeBit(0); w.writeBit(0) } // dec_ref_pic_marking (IDR)
      else w.writeBit(0)                // adaptive_ref_pic_marking_mode_flag
    }
    w.writeSe(0)                        // slice_qp_delta
    var mb = 0
    val nMbs = sps.widthMbs * sps.heightMapUnits
    while (mb < nMbs) {
      val mbX = (mb % sps.widthMbs) * 16
      val mbY = (mb / sps.widthMbs) * 16
      w.writeUe(25)                     // mb_type I_PCM
      w.alignZero()                     // pcm_alignment_zero_bit*
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) { w.writeBits(luma(mbY + yy, mbX + xx) & 0xff, 8); xx += 1 }
        yy += 1
      }
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) { w.writeBits(cb(mbY / 2 + cy, mbX / 2 + cx) & 0xff, 8); cx += 1 }
        cy += 1
      }
      cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) { w.writeBits(cr(mbY / 2 + cy, mbX / 2 + cx) & 0xff, 8); cx += 1 }
        cy += 1
      }
      mb += 1
    }
    rbspEscape(w.finishRbsp())
  }

  /** Decode an I-slice whose macroblocks are all I_PCM into a [[Raster]] —
    * REAL pixels from real H.264 bitstream bytes, no codec library: the
    * slice header is fully parsed (frame_num width, POC mode, deblocking
    * and redundant-count knobs honored from the SPS/PPS actually in the
    * stream), and each macroblock's literal samples are lifted after the
    * alignment run. Anything needing the CAVLC/CABAC residual pipeline
    * (mb_type != 25, P/B slices) refuses loudly — THAT is the remaining
    * codec seam, now narrowed from "raster decode" to "entropy-coded
    * residual decode". */
  def decodeIpcmSlice(sps: Sps, pps: Pps, payload: Array[Byte],
      isIdr: Boolean, refIdc: Int): Raster = {
    require(!pps.cabac,
      "CABAC streams need the arithmetic entropy decoder (the remaining " +
        "codec seam); the I_PCM raster path reads CAVLC-mode bit layout")
    require(sps.frameMbsOnly, "interlaced (field/MBAFF) pictures not supported")
    require(sps.chromaFormatIdc == 1 && !sps.separateColourPlane,
      "only 4:2:0 I_PCM is implemented (MbWidthC=MbHeightC=8)")
    val r = new BitReader(rbspUnescape(payload))
    require(r.readUe() == 0,
      "multi-slice pictures not supported: first_mb_in_slice != 0")
    val sliceType = r.readUe()
    require(sliceType == 2 || sliceType == 7,
      s"slice_type $sliceType is not I: P/B slices need reference frames " +
        "and the residual pipeline")
    r.readUe()                          // pic_parameter_set_id
    r.readBits(sps.log2MaxFrameNum)     // frame_num
    if (isIdr) r.readUe()               // idr_pic_id
    sps.pocType match {
      case 0 =>
        r.readBits(sps.log2MaxPocLsb)
        if (pps.picOrderPresent) r.readSe()
      case 2 =>
      case t => throw new IllegalArgumentException(
        s"pic_order_cnt_type $t slice headers not supported")
    }
    if (pps.redundantPicCntPresent) r.readUe()
    if (refIdc != 0) {
      if (isIdr) { r.readBit(); r.readBit() } // dec_ref_pic_marking (IDR)
      else require(r.readBit() == 0,
        "adaptive_ref_pic_marking on a non-IDR I slice not supported")
    }
    r.readSe()                          // slice_qp_delta
    if (pps.deblockingControlPresent) {
      val idc = r.readUe()
      if (idc != 1) { r.readSe(); r.readSe() }
    }
    val wMbs = sps.widthMbs
    val hMbs = sps.heightMapUnits
    val w = wMbs * 16
    val luma = new Array[Int](w * hMbs * 16)
    val cw = w / 2
    val cbP = new Array[Int](cw * hMbs * 8)
    val crP = new Array[Int](cw * hMbs * 8)
    var mb = 0
    val nMbs = wMbs * hMbs
    while (mb < nMbs) {
      val mbType = r.readUe()
      require(mbType == 25,
        s"mb_type $mbType: only I_PCM macroblocks carry literal samples — " +
          "intra-predicted types need the CAVLC residual decode (the seam)")
      r.alignToByte()
      val mbX = (mb % wMbs) * 16
      val mbY = (mb / wMbs) * 16
      var yy = 0
      while (yy < 16) {
        var xx = 0
        while (xx < 16) {
          luma((mbY + yy) * w + mbX + xx) = r.readBits(8).toInt; xx += 1
        }
        yy += 1
      }
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          cbP((mbY / 2 + cy) * cw + mbX / 2 + cx) = r.readBits(8).toInt; cx += 1
        }
        cy += 1
      }
      cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          crP((mbY / 2 + cy) * cw + mbX / 2 + cx) = r.readBits(8).toInt; cx += 1
        }
        cy += 1
      }
      mb += 1
    }
    require(r.readBit() == 1, "rbsp_stop_one_bit missing after the last MB")
    Raster(wMbs, hMbs, luma, cbP, crP)
  }

  // ---- I_PCM fixtures: pixel formulas the oracle replays -----------------

  def ipcmMbW(seed: Long): Int = 1 + (seed % 2).toInt
  def ipcmMbH(seed: Long): Int = 1 + ((seed / 10) % 2).toInt
  /** Pixel formulas, all integer mod 256 (zeros INCLUDED — emulation
    * prevention must genuinely fire for the bits to survive the mux). */
  def ipcmLuma(seed: Long, f: Int, y: Int, x: Int): Int =
    (((seed * 7 + f * 11 + y * 5 + x * 3) % 256 + 256) % 256).toInt
  def ipcmCb(seed: Long, f: Int, y: Int, x: Int): Int =
    (((seed * 13 + f * 3 + y * 7 + x * 11) % 256 + 256) % 256).toInt
  def ipcmCr(seed: Long, f: Int, y: Int, x: Int): Int =
    (((seed * 17 + f * 5 + y * 13 + x * 7) % 256 + 256) % 256).toInt

  def ipcmSps(seed: Long): Sps =
    Sps(66, levelIdc = 30, widthMbs = ipcmMbW(seed),
      heightMapUnits = ipcmMbH(seed), cropLeft = 0, cropRight = 0,
      cropTop = 0, cropBottom = 0, frameMbsOnly = true)

  /** A structurally valid MP4 of `nFrames` all-I_PCM IDR access units
    * (each SPS+PPS+slice, so every sample decodes independently — the
    * all-keyframe layout a seekable archival intra stream uses). */
  def synthIpcmMp4(seed: Long, nFrames: Int): Array[Byte] = {
    val sps = ipcmSps(seed)
    val samples = (0 until nFrames).map { f =>
      val slice = writeIpcmSlice(sps,
        (y, x) => ipcmLuma(seed, f, y, x),
        (y, x) => ipcmCb(seed, f, y, x),
        (y, x) => ipcmCr(seed, f, y, x))
      nalBytes(3, NalSps, writeSps(sps), fourByteStart = true) ++
        nalBytes(3, NalPps, minimalPpsRbsp(), fourByteStart = false) ++
        nalBytes(3, NalSliceIdr, slice, fourByteStart = false)
    }.toArray
    Multimodal.Mp4Video.synthMp4Samples(samples, sps.width, sps.height,
      chunks = if (seed % 3 == 0) 2 else 1)
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

  def attachIpcmPayload(df: DataFrame, idCol: String,
      nFrames: Int = 3): Dataset[Multimodal.MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => Multimodal.MediaRow(id, "video/mp4", synthIpcmMp4(id, nFrames)))
  }

  case class IpcmDecodeRow(doc_id: Long, width: Int, height: Int,
      n_frames: Long, luma_sum: Long, luma_wsum: Long,
      cb_sum: Long, cr_sum: Long)

  /** RASTER DECODE stage: container parse → NAL walk → SPS/PPS parse →
    * slice-header parse → I_PCM sample lift, all from the real bitstream
    * bytes. Output sums are position-weighted so they pin EVERY pixel of
    * every frame (a permuted or shifted raster changes luma_wsum), and the
    * oracle replays them from the generating formula — a match proves the
    * full bitstream round trip: Exp-Golomb headers, alignment runs, and
    * emulation-prevention escapes included. Map-only, no shuffle except
    * the gate's ORDER BY. Sums cover the full macroblock grid (crop
    * stripping is a consumer concern; the tkhd geometry check pins the
    * cropped size separately). */
  def decodeIpcm(rows: Dataset[Multimodal.MediaRow]): Dataset[IpcmDecodeRow] = {
    import rows.sparkSession.implicits._
    rows.map { r =>
      val meta = Multimodal.Mp4Video.parse(r.payload)
      var lumaSum = 0L
      var lumaWsum = 0L
      var cbSum = 0L
      var crSum = 0L
      var width = 0
      var height = 0
      // parameter sets are STREAM-scoped (§7.4.1.2.1): an SPS/PPS from an
      // earlier access unit governs later non-IDR slices that carry none
      // in-band, so the active sets persist across the sample loop.
      var sps: Sps = null
      var pps: Pps = null
      var f = 0
      while (f < meta.nSamples) {
        val nals = annexBNals(Multimodal.Mp4Video.sampleBytes(r.payload, meta, f))
        nals.foreach { nal =>
          nal.nalType match {
            case NalSps => sps = parseSps(nal.payload)
            case NalPps => pps = parsePps(nal.payload)
            case NalSliceIdr | NalSliceNonIdr =>
              // EVERY slice decodes or refuses loudly inside
              // decodeIpcmSlice — silently skipping one would report
              // sums that exclude its pixels (a wrong answer, not an
              // error). Non-IDR all-intra samples are legal in archival
              // intra streams where only the first AU is IDR.
              require(sps != null && pps != null,
                s"doc ${r.doc_id} frame $f: slice before any SPS/PPS")
              val ras = decodeIpcmSlice(sps, pps, nal.payload,
                isIdr = nal.nalType == NalSliceIdr, refIdc = nal.refIdc)
              width = sps.width; height = sps.height
              var i = 0
              while (i < ras.luma.length) {
                lumaSum += ras.luma(i)
                lumaWsum += (f + 1).toLong * (i + 1) * ras.luma(i)
                i += 1
              }
              i = 0
              while (i < ras.cb.length) {
                cbSum += ras.cb(i); crSum += ras.cr(i); i += 1
              }
            case _ =>
          }
        }
        f += 1
      }
      require(width > 0, s"doc ${r.doc_id}: no slice NAL in any sample")
      IpcmDecodeRow(r.doc_id, width, height, meta.nSamples.toLong,
        lumaSum, lumaWsum, cbSum, crSum)
    }
  }
}
