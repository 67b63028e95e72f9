package graft.diff

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical string rendering of a column, so that checksums computed by
  * different engines over the same logical values agree byte-for-byte.
  *
  * Mirrors the reference's `normalize_value_by_type` contract
  * (reference: data_diff/databases/base.py:808-896):
  *  - temporal   → "YYYY-MM-DD HH:MM:SS.ffffff" truncated to the negotiated
  *                 fractional precision, zero-padded to 26 chars
  *  - fractional → decimal string with exactly `fracPrecision` digits after
  *                 the dot (DECIMAL(38,p) cast renders identically in Spark
  *                 and DuckDB)
  *  - integer    → plain decimal string
  *  - boolean    → "0"/"1"
  *  - string     → as-is
  *  - nested     → JSON serialization (reference: databases/base.py:858-864)
  */
object Normalize {
  /** NULL replacement used inside checksum concat
    * (reference: data_diff/databases/base.py:432). */
  val NullSentinel = "<null>"

  def normalize(c: Column, dt: DataType, fracPrecision: Int = 2, tsPrecision: Int = 6): Column =
    dt match {
      case TimestampType | TimestampNTZType =>
        rpad(substring(date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"), 1, 20 + tsPrecision),
          26, "0")
      case DateType =>
        // Date is a TemporalType in the reference and normalizes through the
        // timestamp path — midnight, zero-padded to the 26-char canonical form
        // (reference: data_diff/databases/base.py:808-822) — so a DATE on one
        // side checksums equal to a midnight TIMESTAMP on the other.
        concat(date_format(c, "yyyy-MM-dd"), lit(" 00:00:00.000000"))
      case DoubleType | FloatType =>
        // NaN/±Infinity have no fixed-point rendering; the bare decimal
        // cast mapped them to NULL — silently checksumming EQUAL to a
        // genuine NULL on the other side, so a NaN-vs-NULL difference
        // pruned as clean. They now render as their distinct literal
        // names: never null-colliding, reportable as the diffs they are
        // (a remote engine's rendering will simply disagree and the row
        // surfaces in the leaf compare). Finite overflow (|x| ≳ 1e36 at
        // precision 2) still fails LOUDLY with an ANSI overflow — the
        // same bound every pushdown profile's normalizeNumberSql
        // enforces remotely.
        when(isnan(c), lit("NaN"))
          .when(c === lit(Double.PositiveInfinity), lit("Infinity"))
          .when(c === lit(Double.NegativeInfinity), lit("-Infinity"))
          .otherwise(c.cast(DecimalType(38, fracPrecision)).cast(StringType))
      case _: DecimalType =>
        // decimals cannot hold NaN/Inf; domain contract as above
        c.cast(DecimalType(38, fracPrecision)).cast(StringType)
      case ByteType | ShortType | IntegerType | LongType =>
        c.cast(StringType)
      case BooleanType =>
        c.cast(IntegerType).cast(StringType)
      case StringType => c
      case _: ArrayType | _: StructType | _: MapType => to_json(c)
      case _ => c.cast(StringType)
    }

  /** Is this field tagged as consistently-cased UUID text? */
  private def isUuidClass(f: StructField): Boolean =
    f.dataType == StringType && f.metadata.contains(SchemaTools.StringClassKey) &&
      f.metadata.getString(SchemaTools.StringClassKey).startsWith("uuid")

  /** Casing-canonical rendering for UUID-classed text: a lowercase-UUID side
    * and an uppercase-UUID side must checksum equal (reference:
    * data_diff/databases/base.py:884-887 normalize_uuid trims String_UUID;
    * casing metadata abcs/database_types.py:222-234). Lowercase is the
    * canonical form (RFC 4122); TRIM mirrors the reference's CHAR-padding
    * tolerance. */
  def normalizeUuid(c: Column): Column = lower(trim(c))

  /** Normalized columns for a whole schema (compare columns of a segment).
    * Field metadata (SchemaTools.StringClassKey) upgrades UUID-classed text
    * to the casing-canonical rendering; plain fields are unaffected. */
  def normalizedCols(schema: StructType, names: Seq[String],
      fracPrecision: Int = 2, tsPrecision: Int = 6): Seq[Column] =
    names.map { n =>
      // resolve like the session does: exact first, then case-insensitive
      // — a JDBC side storing "ID" must normalize under the caller's "id"
      // just as TableSegment.scoped already selects it (StructType.apply
      // alone is case-SENSITIVE and crashed the checksum path on the same
      // inputs joindiff handled)
      val f = schema.fields.find(_.name == n)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(n)))
        .getOrElse(throw new IllegalArgumentException(
          s"""column $n not found among ${schema.fieldNames.mkString(", ")}"""))
      if (isUuidClass(f)) normalizeUuid(col(n))
      else normalize(col(n), f.dataType, fracPrecision, tsPrecision)
    }
}
