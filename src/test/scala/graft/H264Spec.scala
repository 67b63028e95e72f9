package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.H264

/** Pins the H.264 structural layer: RBSP escape/unescape, Exp-Golomb bit
  * I/O, SPS write→parse round-trips (crop geometry included), the Annex-B
  * walker's start-code handling, and the end-to-end MP4→sample→NAL→SPS
  * probe against the generating formulas. */
class H264Spec extends AnyFunSuite {

  // shared suite session — never stop() it (see BpeEncodeSpec note)
  private lazy val spark = SparkTest.spark

  test("rbsp escape inserts 03 exactly at 00 00 0x runs and unescape inverts") {
    val cases = Seq(
      Array[Byte](0, 0, 0),                      // 00 00 00 -> 00 00 03 00
      Array[Byte](0, 0, 1),                      // would fake a start code
      Array[Byte](0, 0, 2), Array[Byte](0, 0, 3),
      Array[Byte](0, 0, 4),                      // NOT escaped (>3)
      Array[Byte](1, 0, 0, 0, 0, 1, 7),          // double run
      Array[Byte](), Array[Byte](0), Array[Byte](0, 0))
    for (c <- cases) {
      val esc = H264.rbspEscape(c)
      assert(H264.rbspUnescape(esc).toSeq === c.toSeq, s"case ${c.mkString(",")}")
      // nothing below 00 00 03 survives in the escaped form: 00 00 00 /
      // 00 00 01 / 00 00 02 would alias start codes or RBSP boundaries
      val s = esc.map(_ & 0xff)
      for (i <- 0 until s.length - 2 if s(i) == 0 && s(i + 1) == 0)
        assert(s(i + 2) >= 3,
          s"unescaped 00 00 0${s(i + 2)} at $i in ${s.mkString(",")}")
    }
    assert(H264.rbspEscape(Array[Byte](0, 0, 4)).toSeq === Seq[Byte](0, 0, 4))
  }

  test("exp-golomb writer/reader round-trips 0..1000") {
    val w = new H264.BitWriter
    (0 to 1000).foreach(w.writeUe)
    val r = new H264.BitReader(w.finishRbsp())
    (0 to 1000).foreach(v => assert(r.readUe() === v))
  }

  test("SPS write->parse round-trips across geometry and profiles") {
    for {
      profile <- Seq(66, 77)
      mbW <- Seq(1, 2, 5, 120)      // up to 1920 wide
      mbH <- Seq(1, 3, 68)          // up to 1088 tall
      cropR <- Seq(0, 1, 4)
      cropB <- Seq(0, 1)
    } {
      val sps = H264.Sps(profile, 31, mbW, mbH, 0, cropR, 0, cropB, frameMbsOnly = true)
      val parsed = H264.parseSps(H264.writeSps(sps))
      assert(parsed === sps, s"p=$profile w=$mbW h=$mbH cr=$cropR cb=$cropB")
      assert(parsed.width === mbW * 16 - 2 * cropR)
      assert(parsed.height === mbH * 16 - 2 * cropB)
    }
  }

  test("annex-b walker handles 3- and 4-byte start codes and trailing zeros") {
    val sps = H264.writeSps(H264.Sps(66, 30, 2, 2, 0, 0, 0, 0, frameMbsOnly = true))
    val stream =
      Array[Byte](0, 0, 0, 1, (3 << 5 | 7).toByte) ++ sps ++
        Array[Byte](0, 0, 1, (3 << 5 | 8).toByte, 0x42) ++
        Array[Byte](0, 0, 0, 1, (2 << 5 | 1).toByte, 9, 9, 9)
    val nals = H264.annexBNals(stream)
    assert(nals.map(_.nalType) === Vector(7, 8, 1))
    assert(nals.map(_.refIdc) === Vector(3, 3, 2))
    assert(nals(1).payload.toSeq === Seq[Byte](0x42))
    assert(nals(2).payload.toSeq === Seq[Byte](9, 9, 9))
    // a NAL whose payload was escaped parses back to the same SPS
    assert(H264.parseSps(nals(0).payload) ===
      H264.Sps(66, 30, 2, 2, 0, 0, 0, 0, frameMbsOnly = true))
  }

  test("forbidden_zero_bit and empty NALs are refused") {
    intercept[IllegalArgumentException] {
      H264.annexBNals(Array[Byte](0, 0, 1, 0x80.toByte, 1))
    }
    intercept[IllegalArgumentException] {
      H264.annexBNals(Array[Byte](0, 0, 1))
    }
  }

  test("synthetic access units: IDR carries SPS+PPS, slices are zero-free") {
    for (seed <- Seq(0L, 10L, 30L, 130L); f <- 0 until 6) {
      val au = H264.synthAccessUnit(seed, f, idrEvery = 3)
      val nals = H264.annexBNals(au)
      if (f % 3 == 0) {
        assert(nals.map(_.nalType) === Vector(7, 8, 5))
        assert(nals(2).payload.forall(_ != 0))
        assert(nals(2).payload.length === H264.synthSliceLen(seed, f))
      } else {
        assert(nals.map(_.nalType) === Vector(1))
        assert(nals(0).payload.forall(_ != 0))
      }
    }
  }

  test("end-to-end MP4 probe matches the generating formulas") {
    val ids = Seq(0L, 10L, 20L, 30L, 40L, 130L, 490L)
    val rows = spark.createDataFrame(ids.map(Tuple1(_))).toDF("doc_id")
    val got = H264.probeH264(H264.attachH264Payload(rows, "doc_id"))
      .collect().sortBy(_.doc_id)
    for ((p, id) <- got.zip(ids)) {
      assert(p.profile_idc === H264.synthProfile(id))
      assert(p.level_idc === 30)
      assert(p.width === H264.synthMbW(id) * 16 - 2 * H264.synthCropRight(id))
      assert(p.height === H264.synthMbH(id) * 16 - 2 * H264.synthCropBottom(id))
      assert(p.n_nals === 10L) // 2 IDR AUs x 3 + 4 slices
      assert(p.n_idr === 2L)
      assert(p.idr_frames === "0,3")
      val expectedSum = (0 until 6).map { f =>
        (0 until H264.synthSliceLen(id, f))
          .map(j => H264.synthSliceByte(id, f, j).toLong).sum
      }.sum
      assert(p.slice_byte_sum === expectedSum, s"doc $id")
    }
  }

  test("interlaced SPS (frameMbsOnly=false) round-trips; crop units double") {
    // 1920x1088 interlaced with frame_crop_bottom_offset=2:
    // CropUnitY = SubHeightC * (2 - frame_mbs_only) = 4 -> 1088-8 = 1080
    val sps = H264.Sps(77, 40, 120, 34, 0, 0, 0, 2, frameMbsOnly = false)
    val parsed = H264.parseSps(H264.writeSps(sps))
    assert(parsed === sps)
    assert(parsed.width === 1920)
    assert(parsed.height === 1080)
  }

  test("4:4:4 and monochrome crops use luma-sample units") {
    def build(chroma: Int, cropR: Int, cropB: Int): H264.Sps = {
      val w = new H264.BitWriter
      w.writeBits(100, 8); w.writeBits(0, 8); w.writeBits(40, 8)
      w.writeUe(0)            // sps_id
      w.writeUe(chroma)
      if (chroma == 3) w.writeBit(0) // separate_colour_plane_flag
      w.writeUe(0); w.writeUe(0); w.writeBit(0); w.writeBit(0)
      w.writeUe(0)            // log2_max_frame_num_minus4
      w.writeUe(2)            // poc type
      w.writeUe(1); w.writeBit(0)
      w.writeUe(9)            // 160 wide
      w.writeUe(5)            // 96 tall
      w.writeBit(1); w.writeBit(1)
      w.writeBit(1)           // cropping
      w.writeUe(0); w.writeUe(cropR); w.writeUe(0); w.writeUe(cropB)
      w.writeBit(0)
      H264.parseSps(H264.rbspEscape(w.finishRbsp()))
    }
    // 4:4:4: CropUnitX = CropUnitY = 1 (luma samples)
    val s444 = build(3, 3, 5)
    assert(s444.width === 160 - 3)
    assert(s444.height === 96 - 5)
    // monochrome: also luma units
    val sMono = build(0, 2, 2)
    assert(sMono.width === 160 - 2)
    assert(sMono.height === 96 - 2)
    // 4:2:2: X halves (SubWidthC=2), Y does not (SubHeightC=1)
    val s422 = build(2, 3, 5)
    assert(s422.width === 160 - 6)
    assert(s422.height === 96 - 5)
  }

  test("writeAvcc refuses count/length overflows instead of corrupting") {
    val sps = H264.Sps(66, 30, 1, 1, 0, 0, 0, 0, frameMbsOnly = true)
    val spsNal = Array((3 << 5 | 7).toByte) ++ H264.writeSps(sps)
    val pps = Array((3 << 5 | 8).toByte, 0x42.toByte)
    intercept[IllegalArgumentException] {
      H264.writeAvcc(H264.AvcConfig(4, Vector.fill(32)(spsNal), Vector(pps)))
    }
    intercept[IllegalArgumentException] {
      H264.writeAvcc(H264.AvcConfig(4, Vector(spsNal), Vector.fill(256)(pps)))
    }
    intercept[IllegalArgumentException] {
      H264.writeAvcc(H264.AvcConfig(4, Vector.empty, Vector(pps)))
    }
  }

  test("avcC config round-trips and length-prefixed samples walk") {
    val sps = H264.Sps(77, 31, 3, 2, 0, 1, 0, 1, frameMbsOnly = true)
    val spsNal = Array((3 << 5 | 7).toByte) ++ H264.writeSps(sps)
    val ppsNal = Array((3 << 5 | 8).toByte, 0x42.toByte)
    for (ls <- Seq(1, 2, 4)) {
      val cfg = H264.AvcConfig(ls, Vector(spsNal), Vector(ppsNal))
      val parsed = H264.parseAvcc(H264.writeAvcc(cfg))
      assert(parsed.lengthSize === ls)
      assert(parsed.sps.head.toSeq === spsNal.toSeq)
      assert(parsed.pps.head.toSeq === ppsNal.toSeq)
      assert(parsed.firstSps === sps)
    }
    // length-prefixed walk: two NALs under a 2-byte prefix
    val n1 = Array[Byte]((2 << 5 | 1).toByte, 7, 7)
    val n2 = Array[Byte]((3 << 5 | 5).toByte, 9)
    val sample = Array[Byte](0, 3) ++ n1 ++ Array[Byte](0, 2) ++ n2
    val nals = H264.lengthPrefixedNals(sample, 2)
    assert(nals.map(_.nalType) === Vector(1, 5))
    assert(nals(0).payload.toSeq === Seq[Byte](7, 7))
    // truncation is refused, not zero-padded
    intercept[IllegalArgumentException] {
      H264.lengthPrefixedNals(sample.dropRight(1), 2)
    }
  }

  test("end-to-end AVCC MP4 probe: avcC extracted from avc1, same formulas") {
    val ids = Seq(0L, 10L, 30L, 130L, 490L)
    val rows = spark.createDataFrame(ids.map(Tuple1(_))).toDF("doc_id")
    val got = H264.probeH264Avcc(H264.attachAvccPayload(rows, "doc_id"))
      .collect().sortBy(_.doc_id)
    val annexb = H264.probeH264(H264.attachH264Payload(rows, "doc_id"))
      .collect().sortBy(_.doc_id)
    for (((a, b), id) <- got.zip(annexb).zip(ids)) {
      // identical stream content, different carriage: everything matches
      // except the in-band NAL count (parameter sets moved to avcC)
      assert(a.copy(n_nals = 0) === b.copy(n_nals = 0), s"doc $id")
      assert(a.n_nals === 6L)
      assert(b.n_nals === 10L)
    }
  }

  test("high-profile SPS with chroma branch parses (real-world shape)") {
    // hand-build a profile-100 SPS: chroma_format_idc=1, depths 0, no
    // scaling matrix — the branch our fixtures never take
    val w = new H264.BitWriter
    w.writeBits(100, 8); w.writeBits(0, 8); w.writeBits(40, 8)
    w.writeUe(0)          // sps_id
    w.writeUe(1)          // chroma_format_idc
    w.writeUe(0); w.writeUe(0) // bit depths
    w.writeBit(0)         // transform bypass
    w.writeBit(0)         // no scaling matrix
    w.writeUe(0)          // log2_max_frame_num_minus4
    w.writeUe(2)          // poc type
    w.writeUe(4)          // max_num_ref_frames
    w.writeBit(0)
    w.writeUe(119)        // 1920
    w.writeUe(67)         // 1088
    w.writeBit(1)         // frame_mbs_only
    w.writeBit(1)         // direct_8x8
    w.writeBit(1)         // cropping
    w.writeUe(0); w.writeUe(0); w.writeUe(0); w.writeUe(4) // 1080
    w.writeBit(0)         // vui
    val sps = H264.parseSps(H264.rbspEscape(w.finishRbsp()))
    assert(sps.profileIdc === 100)
    assert(sps.width === 1920)
    assert(sps.height === 1080)
  }

  // ---- I_PCM raster path -------------------------------------------------

  test("PPS write→parse round-trips the full mandatory field list") {
    val pps = H264.parsePps(H264.writePps())
    assert(pps === H264.Pps(0, 0, cabac = false, picOrderPresent = false,
      deblockingControlPresent = false, redundantPicCntPresent = false))
  }

  test("I_PCM slice round-trips every pixel of a 2x1-MB frame") {
    val sps = H264.Sps(66, 30, widthMbs = 2, heightMapUnits = 1,
      0, 0, 0, 0, frameMbsOnly = true)
    def lum(y: Int, x: Int) = (y * 31 + x * 7) % 256
    def cb(y: Int, x: Int) = (y * 13 + x * 3 + 5) % 256
    def cr(y: Int, x: Int) = (y * 11 + x * 17 + 9) % 256
    val slice = H264.writeIpcmSlice(sps, lum, cb, cr)
    val ras = H264.decodeIpcmSlice(sps, H264.parsePps(H264.writePps()),
      slice, isIdr = true, refIdc = 3)
    assert(ras.w === 32 && ras.h === 16)
    for (y <- 0 until 16; x <- 0 until 32)
      assert(ras.luma(y * 32 + x) === lum(y, x), s"luma ($y,$x)")
    for (y <- 0 until 8; x <- 0 until 16) {
      assert(ras.cb(y * 16 + x) === cb(y, x), s"cb ($y,$x)")
      assert(ras.cr(y * 16 + x) === cr(y, x), s"cr ($y,$x)")
    }
  }

  test("I_PCM zero-sample runs force emulation prevention and still decode") {
    val sps = H264.Sps(66, 30, 1, 1, 0, 0, 0, 0, frameMbsOnly = true)
    // all-zero samples: the raw RBSP is a long 00 run — the escaped
    // payload MUST carry 03 bytes or the NAL would alias a start code
    val slice = H264.writeIpcmSlice(sps, (_, _) => 0, (_, _) => 0, (_, _) => 0)
    assert(slice.contains(3.toByte), "no emulation-prevention byte inserted")
    val ras = H264.decodeIpcmSlice(sps, H264.parsePps(H264.writePps()),
      slice, isIdr = true, refIdc = 3)
    assert(ras.luma.forall(_ == 0) && ras.cb.forall(_ == 0) && ras.cr.forall(_ == 0))
    // and the NAL survives an Annex-B walk intact (no fake start code)
    val au = Array[Byte](0, 0, 0, 1, (3 << 5 | 5).toByte) ++ slice
    val nals = H264.annexBNals(au)
    assert(nals.length === 1 && nals(0).payload.toSeq === slice.toSeq)
  }

  test("I_PCM decode refuses what needs the entropy pipeline, loudly") {
    val sps = H264.Sps(66, 30, 1, 1, 0, 0, 0, 0, frameMbsOnly = true)
    val pps = H264.parsePps(H264.writePps())
    val good = H264.writeIpcmSlice(sps, (_, _) => 1, (_, _) => 2, (_, _) => 3)
    // CABAC PPS
    val e1 = intercept[IllegalArgumentException] {
      H264.decodeIpcmSlice(sps, pps.copy(cabac = true), good, isIdr = true, refIdc = 3)
    }
    assert(e1.getMessage.contains("CABAC"))
    // P slice: header with slice_type 5
    val wP = new H264.BitWriter
    wP.writeUe(0); wP.writeUe(5); wP.writeUe(0)
    val e2 = intercept[IllegalArgumentException] {
      H264.decodeIpcmSlice(sps, pps,
        H264.rbspEscape(wP.finishRbsp()), isIdr = false, refIdc = 2)
    }
    assert(e2.getMessage.contains("not I"))
    // intra-predicted macroblock (mb_type 0 = I_4x4): needs residual decode
    val wI = new H264.BitWriter
    wI.writeUe(0); wI.writeUe(7); wI.writeUe(0)
    wI.writeBits(0, 4); wI.writeUe(0)
    wI.writeBit(0); wI.writeBit(0); wI.writeSe(0)
    wI.writeUe(0) // mb_type I_4x4, not I_PCM
    val e3 = intercept[IllegalArgumentException] {
      H264.decodeIpcmSlice(sps, pps,
        H264.rbspEscape(wI.finishRbsp()), isIdr = true, refIdc = 3)
    }
    assert(e3.getMessage.contains("I_PCM"))
    // truncated slice: bit reader must refuse, not wrap
    val e4 = intercept[IllegalArgumentException] {
      H264.decodeIpcmSlice(sps, pps, good.take(20), isIdr = true, refIdc = 3)
    }
    assert(e4.getMessage.contains("past RBSP end"))
  }

  test("non-IDR I_PCM slices decode under the stream-scoped SPS/PPS") {
    // archival intra layout: only sample 0 is IDR and carries SPS/PPS;
    // sample 1 is a non-IDR all-I_PCM slice with nothing in-band — its
    // pixels MUST land in the sums (a silently skipped slice would be a
    // wrong answer, not an error)
    val sps = H264.ipcmSps(0L)
    def slice(f: Int) = H264.writeIpcmSlice(sps,
      (y, x) => H264.ipcmLuma(0L, f, y, x),
      (y, x) => H264.ipcmCb(0L, f, y, x),
      (y, x) => H264.ipcmCr(0L, f, y, x),
      isIdr = f == 0, frameNum = f, refIdc = if (f == 0) 3 else 2)
    def nal(refIdc: Int, typ: Int, payload: Array[Byte]): Array[Byte] =
      Array[Byte](0, 0, 0, 1, (((refIdc & 3) << 5) | (typ & 0x1f)).toByte) ++ payload
    val samples = Array(
      nal(3, 7, H264.writeSps(sps)) ++ nal(3, 8, H264.writePps()) ++
        nal(3, 5, slice(0)),
      nal(2, 1, slice(1)))
    val mp4 = graft.multimodal.Multimodal.Mp4Video.synthMp4Samples(
      samples, sps.width, sps.height, chunks = 1)
    import spark.implicits._
    val got = H264.decodeIpcm(Seq(
      graft.multimodal.Multimodal.MediaRow(0L, "video/mp4", mp4)).toDS())
      .collect()(0)
    var lSum = 0L
    for (f <- 0 until 2; y <- 0 until 16; x <- 0 until 16)
      lSum += H264.ipcmLuma(0L, f, y, x)
    assert(got.n_frames === 2L)
    assert(got.luma_sum === lSum, "non-IDR frame pixels missing from the sum")
  }

  test("end-to-end I_PCM MP4 decode matches the generating pixel formulas") {
    val ids = Seq(0L, 10L, 30L, 130L)
    val rows = spark.createDataFrame(ids.map(Tuple1(_))).toDF("doc_id")
    val got = H264.decodeIpcm(H264.attachIpcmPayload(rows, "doc_id"))
      .collect().sortBy(_.doc_id)
    for ((p, id) <- got.zip(ids)) {
      val w = 16 * H264.ipcmMbW(id)
      val h = 16 * H264.ipcmMbH(id)
      assert(p.width === w && p.height === h && p.n_frames === 3L, s"doc $id")
      var lSum = 0L; var lWsum = 0L; var cbSum = 0L; var crSum = 0L
      for (f <- 0 until 3) {
        for (y <- 0 until h; x <- 0 until w) {
          val v = H264.ipcmLuma(id, f, y, x)
          lSum += v
          lWsum += (f + 1).toLong * (y * w + x + 1) * v
        }
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          cbSum += H264.ipcmCb(id, f, y, x)
          crSum += H264.ipcmCr(id, f, y, x)
        }
      }
      assert(p.luma_sum === lSum && p.luma_wsum === lWsum, s"doc $id luma")
      assert(p.cb_sum === cbSum && p.cr_sum === crSum, s"doc $id chroma")
    }
  }
}
