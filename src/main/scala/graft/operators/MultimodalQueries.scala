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
  )
}
