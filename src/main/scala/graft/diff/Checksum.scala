package graft.diff

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's segment checksum: the low 48 bits (12 hex digits) of the
  * MD5 of the '|'-joined normalized row, read as an integer and shifted by
  * −(2^48−1)/2 so sums of many rows center around zero
  * (reference: data_diff/databases/base.py:411-421,1271-1286).
  *
  * Summed as DECIMAL(38,0): at 48 bits per row even 10^12 rows cannot
  * overflow 38 digits, so the aggregate is exact at any scale. All parts are
  * Spark built-ins (md5/conv/substring/concat_ws) → whole-stage codegen.
  */
object Checksum {
  val Md5HexDigits = 32
  val ChecksumHexDigits = 12
  /** (2^48 − 1) / 2 — reference CHECKSUM_OFFSET. */
  val Offset: Long = ((1L << (ChecksumHexDigits * 4)) - 1) / 2

  /** Per-row 48-bit signed checksum over already-normalized string columns.
    * The hex-tail-as-int slice runs as the custom codegen'd
    * [[graft.functions.Md5Bits48]] — bit-identical to
    * `conv(substring(md5(x), 21, 12), 16, 10)` without the hex-string
    * materialization and base-16 parse per row. */
  def rowChecksum(normCols: Seq[Column]): Column = {
    val joined = concat_ws("|", normCols.map(c => coalesce(c, lit(Normalize.NullSentinel))): _*)
    graft.functions.Md5Bits48.tail(joined) - Offset
  }

  /** Exact aggregate of rowChecksum. */
  def checksumAgg(normCols: Seq[Column]): Column =
    sum(rowChecksum(normCols).cast(DecimalType(38, 0)))

  /** Overflow-safe variant: each normalized item is md5-hex-hashed before
    * concatenation, bounding every item to 32 chars, for engines whose
    * string concatenation overflows (MSSQL). Mirrors the reference's
    * `render_concat` overflow path exactly — including its lack of a
    * per-item COALESCE (reference: data_diff/databases/base.py:423-436) —
    * so the Spark side stays bit-compatible when the remote side declares
    * `preventOverflowWhenConcat`. A NULL item renders as the empty string
    * (MSSQL CONCAT semantics), not skipped — concat_ws would drop the
    * separator too and desynchronize from the remote rendering. */
  def rowChecksumOverflowSafe(normCols: Seq[Column]): Column = {
    // per-item hashes stay hex STRINGS (they are concatenated, matching the
    // remote rendering byte for byte); only the outer slice goes native
    val joined = concat_ws("|", normCols.map(c => coalesce(md5(c), lit(""))): _*)
    graft.functions.Md5Bits48.tail(joined) - Offset
  }
}
