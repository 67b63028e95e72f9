package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal (binary payload) plumbing over the documents table. */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Binary-column metadata path: BinaryType payload, byte length, head
    // bytes, content hash — all on the binary column, no string detour.
    "q_multimodal_meta" -> ((s, d) => {
      val withBin = Multimodal.attachPayload(Tables.load(s, d, "documents"), "doc_id", "text")
      withBin.select(
        col("doc_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("head_hex"),
        md5(col("payload")).as("content_md5"))
        .orderBy("doc_id")
    }),

    // mapPartitions feature extraction (decode stubbed, plumbing real).
    "q_multimodal_features" -> ((s, d) =>
      Multimodal.featurePipeline(s, Tables.load(s, d, "documents"), "doc_id", "text")
        .toDF().orderBy("doc_id")),

    // REAL image decode, end to end: every document gets a genuine PNG
    // payload (formula-seeded pixels, encoded by javax.imageio's PNG
    // writer inside tasks), and the features come from DECODING those
    // bytes back to a raster — width/height/pixel sums are functions of
    // decoded pixels, not payload bytes. PNG is lossless, so the oracle
    // reproduces the exact values from the generating formula without
    // ever seeing a PNG: a match proves the decode round-trips.
    "q_multimodal_decode" -> ((s, d) => {
      val media = Multimodal.attachImagePayload(
        Tables.load(s, d, "documents"), "doc_id", w = 16, h = 16)
      Multimodal.decodeImages(media).toDF().orderBy("doc_id")
    }),

    // REAL audio decode, end to end: every document gets a genuine WAV
    // payload (formula-seeded 16-bit PCM, encoded by javax.sound.sampled's
    // WAVE writer inside tasks), and the features come from PARSING those
    // bytes back to samples — counts/rate/sums are functions of decoded
    // samples and the container header, not payload bytes. WAV PCM is
    // uncompressed, so the oracle reproduces the exact values from the
    // generating formula without ever seeing a WAV: a match proves the
    // decode round-trips.
    "q_multimodal_audio" -> ((s, d) => {
      val media = Multimodal.attachAudioPayload(
        Tables.load(s, d, "documents"), "doc_id", nSamples = 256)
      Multimodal.decodeAudio(media).toDF().orderBy("doc_id")
    }),

    // REAL video frame extraction, end to end: every document gets a
    // genuine animated-GIF payload (4 formula-seeded 8×8 grayscale frames,
    // written by javax.imageio's GIF encoder inside tasks) and the stage
    // PARSES the container, enumerates frames, and decodes each raster —
    // a true 1→N generator whose output values are functions of decoded
    // pixels. GIF's LZW is lossless and the palette is the identity
    // grayscale ramp, so the oracle reproduces every frame from the
    // generating formula without ever seeing a GIF.
    // The gate corpus is 10×-decimated: the per-payload codec work is the
    // cost (map-only, zero shuffles, embarrassingly parallel), and the gate
    // exists to certify decode PARITY, not volume — the full-volume
    // throughput claim runs in ScaleProbe where it belongs.
    "q_multimodal_video" -> ((s, d) => {
      val media = Multimodal.attachVideoPayload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0),
        "doc_id", w = 8, h = 8, nFrames = 4)
      Multimodal.decodeVideoFrames(media).toDF().orderBy("doc_id", "frame_idx")
    }),

    // Frame sampling: 1→N generator fan-out per payload (every 2nd 64-byte
    // frame), each frame summarized by an exact byte sum. Documents are
    // ASCII, so the oracle reproduces byte slices with substring + ascii().
    "q_multimodal_frames" -> ((s, d) => {
      import s.implicits._
      val media = Multimodal
        .attachPayload(Tables.load(s, d, "documents"), "doc_id", "text")
        .as[Multimodal.MediaRow]
      Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
        .map(fr => (fr.doc_id, fr.frame_idx, fr.frame.length.toLong,
          fr.frame.foldLeft(0L)((acc, b) => acc + (b & 0xff))))
        .toDF("doc_id", "frame_idx", "n_bytes", "byte_sum")
        .orderBy("doc_id", "frame_idx")
    }),

    // REAL MP4/ISO-BMFF container probe: every value is parsed from the
    // box structure of a structurally valid MP4 built inside tasks —
    // ftyp brand, mvhd duration, tkhd 16.16 geometry, stsd fourcc, and
    // the stsz/stsc/stco tables expanded to slice sample 0's true bytes
    // out of mdat (every 3rd doc uses a 2-chunk layout so the stsc walk
    // is load-bearing). Sample bytes follow a formula of (doc_id, frame,
    // offset), so the oracle reproduces every probed value without
    // parsing a container — the GIF/PNG/WAV oracle trick. H.264 payload
    // DECODE stays behind MediaCodec (the one step the JDK cannot do).
    "q_mp4_probe" -> ((s, d) =>
      Multimodal.probeMp4(Multimodal.attachMp4Payload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0), "doc_id"))
        .toDF().orderBy("doc_id")),

    // MP4 frame sampling: every 2nd SAMPLE's true bytes sliced by offset
    // from mdat via the expanded sample tables — the production
    // keyframe-sampler dataflow (1→N generator, no decode).
    "q_mp4_frames" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleMp4Frames(Multimodal.attachMp4Payload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0), "doc_id"),
        stride = 2)
        .map(fr => (fr.doc_id, fr.frame_idx, fr.frame.length.toLong,
          fr.frame.foldLeft(0L)((acc, b) => acc + (b & 0xff))))
        .toDF("doc_id", "frame_idx", "n_bytes", "byte_sum")
        .orderBy("doc_id", "frame_idx")
    }),

    // H.264 keyframe index, no codec: MP4 samples are REAL Annex-B NAL
    // streams (start codes, escaped RBSP); the stage slices each sample
    // from mdat, walks its NALs, Exp-Golomb-decodes the SPS (profile,
    // level, MB geometry, frame cropping -> exact pixel size), and flags
    // IDR samples — the seekable-frame index a video pipeline builds
    // before any decode. Slice payloads follow a zero-free byte formula,
    // so the oracle reproduces every probed value arithmetically while
    // the SPS values only match if the bit-level parse is right.
    "q_h264_nal" -> ((s, d) =>
      graft.multimodal.H264.probeH264(graft.multimodal.H264.attachH264Payload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0), "doc_id"))
        .toDF().orderBy("doc_id")),

    // The AVCC carriage form of the same stream — how production muxers
    // actually write AVC into MP4: SPS/PPS out-of-band in an avcC box
    // (extracted from the avc1 sample entry by the container parser),
    // mdat samples as 4-byte-length-prefixed NALs, no start codes. Same
    // slice-byte formula as q_h264_nal, so the oracle differs only in
    // n_nals (one in-band NAL per frame; parameter sets live in the
    // config box).
    "q_h264_avcc" -> ((s, d) =>
      graft.multimodal.H264.probeH264Avcc(graft.multimodal.H264.attachAvccPayload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0), "doc_id"))
        .toDF().orderBy("doc_id")),

    // H.264 RASTER DECODE, no codec library — the I_PCM subset: fixtures
    // are conformant all-I_PCM IDR streams (real slice headers, real
    // alignment runs, real emulation-prevention escapes around literal
    // zero samples), and the stage lifts every pixel back out through the
    // full parse chain (container → NAL → SPS/PPS → slice header → MB
    // walk). Position-and-frame-weighted sums pin every sample; the
    // oracle replays them from the generating pixel formula. The codec
    // seam is now ENTROPY-CODED RESIDUALS ONLY.
    "q_h264_ipcm" -> ((s, d) =>
      graft.multimodal.H264.decodeIpcm(graft.multimodal.H264.attachIpcmPayload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0), "doc_id"))
        .toDF().orderBy("doc_id")),

    // Perceptual image hashing over REAL decoded PNGs (see
    // Multimodal.dhashImages): every doc gets a genuine 14×8 PNG, the
    // dHash comes from the decoded raster, and the oracle recomputes it
    // from the pixel formula — a match proves the decode round-tripped
    // every pixel through the gray/box/gradient integer pipeline.
    "q_image_dhash" -> ((s, d) =>
      Multimodal.dhashImages(Multimodal.attachImagePayload(
        Tables.load(s, d, "documents"), "doc_id", w = 14, h = 8))
        .toDF().orderBy("doc_id")),

    // Image near-dup via the shared pigeonhole Hamming join
    // (Dedup.hammingNearDup) over the dHashes — image dedup end to end:
    // decode → perceptual hash → blocked exact pairing. The synthetic
    // pixel formula repeats every 256 ids (base = id·31 mod 256), so
    // exact-duplicate images exist and pair at distance 0; the oracle
    // brute-forces the all-pairs Hamming join the block join avoids.
    "q_image_neardup" -> ((s, d) =>
      graft.dedup.Dedup.hammingNearDup(
        Multimodal.dhashImages(Multimodal.attachImagePayload(
          Tables.load(s, d, "documents"), "doc_id", w = 14, h = 8)).toDF(),
        "doc_id", "dhash", maxHamming = 3, bits = 48)
        .orderBy("doc_a", "doc_b")),

    // Perceptual audio hashing over REAL decoded WAVs (see
    // Multimodal.ahashAudio): 245 genuine PCM samples per doc through
    // javax.sound.sampled, 49 five-sample energy windows, 48 loudness-
    // gradient bits; the oracle replays the sample formula — a match
    // proves the decode returned every sample.
    "q_audio_ahash" -> ((s, d) =>
      Multimodal.ahashAudio(Multimodal.attachAudioPayload(
        Tables.load(s, d, "documents"), "doc_id", nSamples = 245))
        .toDF().orderBy("doc_id")),

    // Perceptual VIDEO near-dup — the third leg of the dedup triad: every
    // decoded GIF frame dHashes (real container parse + raster decode),
    // the temporal MAJORITY of each bit forms the clip signature, and the
    // same pigeonhole Hamming block join pairs clips within 3 bits. The
    // oracle replays frame pixels from the generating formula through the
    // identical integer pipeline — brute-forced pairs must match exactly.
    "q_video_vhash" -> ((s, d) =>
      Multimodal.vhashVideos(Multimodal.attachVideoPayload(
        Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0),
        "doc_id", w = 14, h = 8, nFrames = 4))
        .toDF().orderBy("doc_id")),

    "q_video_neardup" -> ((s, d) =>
      graft.dedup.Dedup.hammingNearDup(
        Multimodal.vhashVideos(Multimodal.attachVideoPayload(
          Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0),
          "doc_id", w = 14, h = 8, nFrames = 4)).toDF(),
        "doc_id", "vhash", maxHamming = 3, bits = 48)
        .orderBy("doc_a", "doc_b")),

    // Perceptual AUDIO near-dup — the aHash pairing through the same
    // pigeonhole Hamming block join image dedup uses (never all-pairs):
    // recordings whose loudness envelopes differ in ≤3 gradient bits.
    // 10×-decimated like the other codec gates; the oracle brute-forces
    // all pairs from the replayed sample formula and must match exactly
    // (recall 1.0 by the pigeonhole principle).
    "q_audio_neardup" -> ((s, d) =>
      graft.dedup.Dedup.hammingNearDup(
        Multimodal.ahashAudio(Multimodal.attachAudioPayload(
          Tables.load(s, d, "documents").where(col("doc_id") % 10 === 0),
          "doc_id", nSamples = 245)).toDF(),
        "doc_id", "ahash", maxHamming = 3, bits = 48)
        .orderBy("doc_a", "doc_b")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, 'text/utf-8' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(hex(encode(substring(text, 1, 8)))) AS head_hex,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The stub features are byte folds; documents are ASCII so ascii(char)
    // equals the utf-8 byte and the fold is reproducible in SQL.
    "q_multimodal_features" ->
      """SELECT doc_id, 'text/utf-8' AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(list_reduce(list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |      (acc, x) -> acc + x) AS BIGINT) AS byte_sum,
        |  CAST(ascii(substring(text, 1, 1)) AS INT) AS head_byte,
        |  CAST(list_reduce(list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |      (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS checksum8
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The decode oracle never touches a PNG: it recomputes the pixel
    // channels from the generating formula ch(c) = (doc_id*31 + x*7 +
    // y*13 + c*101) % 256 and folds them in the same row-major R,G,B
    // order the decoder walks the raster. Lossless PNG makes the decoded
    // raster equal the formula exactly — a hash match certifies a real
    // encode→decode round trip through javax.imageio.
    "q_multimodal_decode" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    flatten(flatten(list_transform(range(0, 16), y ->
        |      list_transform(range(0, 16), x ->
        |        list_transform(range(0, 3), c ->
        |          (doc_id*31 + x*7 + y*13 + c*101) % 256))))) AS chans
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(list_sum(chans) AS BIGINT) AS pixel_sum,
        |  CAST(((doc_id*31) % 256) * 65536 + ((doc_id*31 + 101) % 256) * 256
        |    + ((doc_id*31 + 202) % 256) AS INT) AS first_px,
        |  CAST(list_reduce(list_prepend(0::BIGINT, chans),
        |    (acc, v) -> (acc * 131 + v) % 1000000007) AS BIGINT) AS pixel_checksum
        |FROM px ORDER BY doc_id""".stripMargin,

    // The audio oracle never touches a WAV: it recomputes the samples from
    // the generating formula s(i) = (doc_id*31 + i*7919) % 65536 - 32768
    // and folds them in the same ascending-index order the decoder walks
    // the PCM stream. Uncompressed PCM makes the decoded samples equal the
    // formula exactly — a hash match certifies a real encode→decode round
    // trip through javax.sound.sampled.
    "q_multimodal_audio" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 256), i ->
        |      (doc_id*31 + i*7919) % 65536 - 32768) AS samples
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(8000 AS INT) AS sample_rate,
        |  CAST(list_sum(samples) AS BIGINT) AS sample_sum,
        |  CAST((doc_id*31) % 65536 - 32768 AS INT) AS first_sample,
        |  CAST(list_reduce(list_prepend(0::BIGINT,
        |      list_transform(samples, v -> v + 32768)),
        |    (acc, v) -> (acc * 131 + v) % 1000000007) AS BIGINT) AS sample_checksum
        |FROM s ORDER BY doc_id""".stripMargin,

    // The video oracle recomputes each frame's gray levels from the
    // generating formula g = (doc_id*31 + f*17 + x*7 + y*13) % 256 and
    // folds them in the same row-major order the decoder walks the raster.
    "q_multimodal_video" ->
      """WITH fr AS (
        |  SELECT doc_id, f AS frame_idx,
        |    flatten(list_transform(range(0, 8), y ->
        |      list_transform(range(0, 8), x ->
        |        (doc_id*31 + f*17 + x*7 + y*13) % 256))) AS grays
        |  FROM documents, unnest(range(0, 4)) r(f)
        |  WHERE doc_id % 10 = 0)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(list_sum(grays) AS BIGINT) AS gray_sum,
        |  CAST(list_reduce(list_prepend(0::BIGINT, grays),
        |    (acc, v) -> (acc * 131 + v) % 1000000007) AS BIGINT) AS gray_checksum
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin,

    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, i AS frame_idx,
        |    substring(text, CAST(i * 64 + 1 AS INT), 64) AS fr
        |  FROM documents, unnest(range(0, length(text) // 64)) r(i)
        |  WHERE i % 2 = 0)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(length(fr) AS BIGINT) AS n_bytes,
        |  CAST(list_sum([ascii(c) for c in string_split(fr, '')]) AS BIGINT) AS byte_sum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q_mp4_probe" ->
      """SELECT doc_id, 'isom' AS brand, CAST(240 AS BIGINT) AS duration_ms,
        |  CAST(16 AS INT) AS width, CAST(9 AS INT) AS height,
        |  'avc1' AS codec, CAST(6 AS INT) AS n_samples,
        |  CAST(list_sum(list_transform(range(0, 6),
        |    f -> 48 + (doc_id*7 + f*11) % 48)) AS BIGINT) AS media_bytes,
        |  CAST(list_sum(list_transform(range(0, 48 + (doc_id*7) % 48),
        |    j -> (doc_id*31 + j*7) % 256)) AS BIGINT) AS first_sample_sum
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,

    "q_mp4_frames" ->
      """WITH s AS (
        |  SELECT doc_id, f AS frame_idx, 48 + (doc_id*7 + f*11) % 48 AS n_bytes
        |  FROM documents, unnest([0, 2, 4]) r(f)
        |  WHERE doc_id % 10 = 0)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(n_bytes AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(range(0, n_bytes),
        |    j -> (doc_id*31 + frame_idx*17 + j*7) % 256)) AS BIGINT) AS byte_sum
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,

    "q_h264_nal" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 10) % 4 < 2 THEN 66 ELSE 77 END AS INT) AS profile_idc,
        |  CAST(30 AS INT) AS level_idc,
        |  CAST((1 + doc_id % 4) * 16 - 2 * (doc_id % 3) AS INT) AS width,
        |  CAST((1 + (doc_id // 10) % 3) * 16 - 2 * ((doc_id // 10) % 2) AS INT) AS height,
        |  CAST(10 AS BIGINT) AS n_nals,
        |  CAST(2 AS BIGINT) AS n_idr,
        |  '0,3' AS idr_frames,
        |  CAST(list_sum(list_transform(range(0, 6), f ->
        |    list_sum(list_transform(range(0, 24 + (doc_id*5 + f*13) % 24),
        |      j -> 1 + (doc_id*31 + f*17 + j*7) % 255)))) AS BIGINT) AS slice_byte_sum
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,

    "q_h264_avcc" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 10) % 4 < 2 THEN 66 ELSE 77 END AS INT) AS profile_idc,
        |  CAST(30 AS INT) AS level_idc,
        |  CAST((1 + doc_id % 4) * 16 - 2 * (doc_id % 3) AS INT) AS width,
        |  CAST((1 + (doc_id // 10) % 3) * 16 - 2 * ((doc_id // 10) % 2) AS INT) AS height,
        |  CAST(6 AS BIGINT) AS n_nals,
        |  CAST(2 AS BIGINT) AS n_idr,
        |  '0,3' AS idr_frames,
        |  CAST(list_sum(list_transform(range(0, 6), f ->
        |    list_sum(list_transform(range(0, 24 + (doc_id*5 + f*13) % 24),
        |      j -> 1 + (doc_id*31 + f*17 + j*7) % 255)))) AS BIGINT) AS slice_byte_sum
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,

    "q_h264_ipcm" ->
      """WITH g AS (
        |  SELECT doc_id, 16*(1 + doc_id % 2) AS w, 16*(1 + (doc_id // 10) % 2) AS h
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT doc_id,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(3 AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(range(0, 3), f ->
        |    list_sum(list_transform(range(0, h), y ->
        |      list_sum(list_transform(range(0, w), x ->
        |        (doc_id*7 + f*11 + y*5 + x*3) % 256)))))) AS BIGINT) AS luma_sum,
        |  CAST(list_sum(list_transform(range(0, 3), f ->
        |    list_sum(list_transform(range(0, h), y ->
        |      list_sum(list_transform(range(0, w), x ->
        |        (f+1) * (y*w + x + 1) *
        |          ((doc_id*7 + f*11 + y*5 + x*3) % 256))))))) AS BIGINT) AS luma_wsum,
        |  CAST(list_sum(list_transform(range(0, 3), f ->
        |    list_sum(list_transform(range(0, h // 2), y ->
        |      list_sum(list_transform(range(0, w // 2), x ->
        |        (doc_id*13 + f*3 + y*7 + x*11) % 256)))))) AS BIGINT) AS cb_sum,
        |  CAST(list_sum(list_transform(range(0, 3), f ->
        |    list_sum(list_transform(range(0, h // 2), y ->
        |      list_sum(list_transform(range(0, w // 2), x ->
        |        (doc_id*17 + f*5 + y*13 + x*7) % 256)))))) AS BIGINT) AS cr_sum
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_image_dhash" -> (dhashCte + """
        |SELECT doc_id, dhash FROM dh ORDER BY doc_id""".stripMargin),

    "q_image_neardup" -> (dhashCte + """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
        |ORDER BY 1, 2""".stripMargin),

    "q_video_vhash" -> (vhashCte + """
        |SELECT doc_id, vhash FROM vh ORDER BY doc_id""".stripMargin),

    "q_video_neardup" -> (vhashCte + """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hamming
        |FROM vh a JOIN vh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.vhash, b.vhash)) <= 3
        |ORDER BY 1, 2""".stripMargin),

    "q_audio_ahash" -> (ahashCte("") + """
        |SELECT doc_id, ahash FROM ah ORDER BY doc_id""".stripMargin),

    "q_audio_neardup" -> (ahashCte(" WHERE doc_id % 10 = 0") + """
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        |FROM ah a JOIN ah b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY 1, 2""".stripMargin),
  )

  /** SQL replay of the 14×8×4-frame GIF → per-frame dHash →
    * temporal-majority pipeline (`Multimodal.vhashVideos` over `synthGif`
    * pixels — gray of frame f at (x, y) is
    * (id·31 + f·17 + x·7 + y·13) mod 256, identity palette) as a CTE
    * ending in vh(doc_id, vhash); 10×-decimated like the Spark gate. */
  private def vhashCte =
    """WITH cells AS (
      |  SELECT doc_id, f, y, cx,
      |    ( (doc_id*31 + f*17 + (2*cx)*7 + y*13) % 256
      |    + (doc_id*31 + f*17 + (2*cx+1)*7 + y*13) % 256 ) // 2 AS cv
      |  FROM documents, range(4) rf(f), range(7) rcx(cx), range(8) ry(y)
      |  WHERE doc_id % 10 = 0),
      |vbits AS (
      |  SELECT a.doc_id, a.f, (a.y*6 + a.cx) AS bit,
      |    CASE WHEN b.cv > a.cv THEN 1 ELSE 0 END AS v
      |  FROM cells a JOIN cells b
      |    ON a.doc_id = b.doc_id AND a.f = b.f AND a.y = b.y AND b.cx = a.cx + 1
      |  WHERE a.cx < 6),
      |maj AS (
      |  SELECT doc_id, bit, CASE WHEN 2*SUM(v) > 4 THEN 1 ELSE 0 END AS mv
      |  FROM vbits GROUP BY 1, 2),
      |vh AS (SELECT doc_id, CAST(SUM(mv * (1::BIGINT << bit)) AS BIGINT) AS vhash
      |  FROM maj GROUP BY 1)""".stripMargin

  /** SQL replay of the synthetic WAV → PCM → 49 energy windows → 48
    * loudness-gradient bits pipeline (`Multimodal.ahashAudio` over
    * `synthWav` samples) as a CTE ending in ah(doc_id, ahash); `where`
    * scopes the doc corpus (the near-dup gate decimates). */
  private def ahashCte(where: String) =
    s"""WITH s AS (
       |  SELECT doc_id, i // 5 AS w,
       |    abs((doc_id*31 + i*7919) % 65536 - 32768) AS a
       |  FROM documents, range(245) r(i)$where),
       |e AS (SELECT doc_id, w, SUM(a) AS en FROM s GROUP BY 1, 2),
       |bits AS (
       |  SELECT a.doc_id,
       |    CASE WHEN b.en > a.en THEN (1::BIGINT << a.w) ELSE 0 END AS v
       |  FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.w = a.w + 1
       |  WHERE a.w < 48),
       |ah AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS ahash
       |  FROM bits GROUP BY doc_id)""".stripMargin

  /** SQL replay of the 14×8 synthetic image → gray → 2×1 box → gradient
    * dHash pipeline (`Multimodal.dhashImages` over `synthPng` pixels):
    * channel c at (x, y) is (id·31 + x·7 + y·13 + c·101) mod 256, gray is
    * the integer mean of the three channels, the grid cell is the integer
    * mean of the two pixels it covers, and bit y·6+x is set when the
    * right neighbor is brighter. */
  private def dhashCte = // def: referenced from oracleSql above (val init order)
    """WITH px AS (
      |  SELECT doc_id, y, xg,
      |    ( ( (doc_id*31 + (2*xg)*7 + y*13) % 256
      |      + (doc_id*31 + (2*xg)*7 + y*13 + 101) % 256
      |      + (doc_id*31 + (2*xg)*7 + y*13 + 202) % 256 ) // 3
      |    + ( (doc_id*31 + (2*xg+1)*7 + y*13) % 256
      |      + (doc_id*31 + (2*xg+1)*7 + y*13 + 101) % 256
      |      + (doc_id*31 + (2*xg+1)*7 + y*13 + 202) % 256 ) // 3
      |    ) // 2 AS g
      |  FROM documents, range(8) ry(y), range(7) rx(xg)),
      |bits AS (
      |  SELECT a.doc_id,
      |    CASE WHEN b.g > a.g THEN (1::BIGINT << (a.y*6 + a.xg)) ELSE 0 END AS v
      |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y AND b.xg = a.xg + 1
      |  WHERE a.xg < 6),
      |dh AS (
      |  SELECT doc_id, CAST(SUM(v) AS BIGINT) AS dhash FROM bits GROUP BY doc_id)""".stripMargin
}
