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
  )
}
