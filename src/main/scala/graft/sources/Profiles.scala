package graft.sources

import org.apache.spark.sql.types._

import graft.diff.Checksum

/** The remaining engine profiles from the reference's connector set
  * (SURVEY.md §2.1 lists 13 connectors). Each is ~10 lines: the md5→int48
  * checksum formula plus the canonical string renderings, golden-tested
  * against the reference's rendered SQL in `ProfilesSpec`.
  *
  * == Validation status per dialect — read before trusting a profile ==
  *
  * "wire" = the profile's checksum SQL has executed on a LIVE engine of that
  * family in this repo's test suite and matched Spark bit-for-bit; "golden"
  * = the rendered SQL is string-pinned against the reference's dialect
  * output but has never crossed a socket (no such engine exists in the
  * build sandbox). A golden-only profile's formulas come straight from the
  * reference's shipped connectors, and the seeded cross-engine fuzz
  * (`ChecksumFuzzSpec`) exercises the shared rendering contract on two live
  * families (DuckDB's cast-style SQL, Derby's function-style SQL) — but an
  * engine's own parser/driver quirks are only ever proven by a wire test.
  *
  * | profile     | status |
  * |-------------|--------|
  * | duckdb      | wire (live child process: pushdown e2e, checksum fuzz, introspection) |
  * | derby       | wire (live embedded JDBC: pushdown e2e incl. SYS-catalog introspection, checksum fuzz, collation, engine round-trip) |
  * | spark       | wire (in-process SQL round-trip via SparkViewEngine; ALSO over a real TCP socket — HiveThriftSpec boots Spark's own HiveServer2 Thrift endpoint and runs the pushdown loop through the Hive JDBC driver, incl. the partitioned spark.read.jdbc leaf fetch via HiveJdbcDialect) |
  * | postgresql  | golden (+ plain SELECTs exercised over a real JDBC driver in `JdbcEngineSpec`) |
  * | mysql       | golden |
  * | trino       | golden |
  * | snowflake   | golden |
  * | bigquery    | golden |
  * | clickhouse  | golden |
  * | mssql       | golden (overflow-safe concat mode ALSO wire-tested against live DuckDB) |
  * | oracle      | golden |
  * | redshift    | golden |
  * | vertica     | golden |
  * | databricks  | golden |
  *
  * A FOURTH live family is not reachable from this sandbox: adjudicated
  * (r12 task #5 / r13 verdict) — no H2, SQLite, or HSQLDB driver jar
  * exists in any local ivy/coursier cache, the build resolves offline
  * (zero egress), and `/opt/spark/jars` ships only Derby. The day a
  * network (or another embedded-engine jar) exists, wiring one is a
  * one-line `DialectConformanceKit` subclass — see ConformanceKitSpec.
  */

/** Snowflake (reference: data_diff/databases/snowflake.py:65-112).
  * Uses the native md5_number_lower64 and masks to 48 bits. */
object SnowflakeProfile extends SourceProfile {
  val name = "snowflake"
  /** 2^48 − 1, the reference's CHECKSUM_MASK (databases/base.py:1275). */
  val ChecksumMask: Long = (1L << (Checksum.ChecksumHexDigits * 4)) - 1
  def toStringSql(expr: String): String = s"cast($expr as string)"
  def md5AsIntSql(expr: String): String =
    s"BITAND(md5_number_lower64($expr), $ChecksumMask) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"to_char(cast(convert_timezone('UTC', $expr) as timestamp($precision)), 'YYYY-MM-DD HH24:MI:SS.FF6')"
  def normalizeNumberSql(expr: String, precision: Int): String =
    toStringSql(s"cast($expr as decimal(38, $precision))")
  /** convert_timezone('UTC', x) interprets a TIMESTAMP_NTZ/DATE input as
    * SESSION-local before converting — under Snowflake's default
    * America/Los_Angeles session a midnight DATE would render as
    * 08:00:00 and every checksum would mismatch the Spark side's
    * wall-clock form. Forcing the session to UTC makes the conversion a
    * no-op on naive values and correct on TIMESTAMP_TZ/LTZ — the exact
    * forced-UTC discipline the reference applies at connect
    * (data_diff/databases/_connect.py:288-303) and this engine applies
    * to every Spark session. */
  override def connectBootstrapSql: Seq[String] =
    Seq("ALTER SESSION SET TIMEZONE = 'UTC'")
  def normalizeBooleanSql(expr: String): String = toStringSql(s"($expr)::int")
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"REGEXP_INSTR($expr, '[^A-Za-z0-9]') > 0")
  /** HEX_ENCODE hexes the UTF-8 bytes, uppercase by default. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substr(upper(hex_encode($expr)), 1, 32), 32, '0')")
  /** Snowflake VARCHAR defaults to its 16 MB maximum. */
  override def unboundedTextTypeSql: String = "VARCHAR"
}

/** BigQuery (reference: data_diff/databases/bigquery.py:95-201). */
object BigQueryProfile extends SourceProfile {
  val name = "bigquery"
  override def quote(ident: String): String = "`" + ident + "`"
  /** BigQuery's catalog lives per-dataset: `dataset.INFORMATION_SCHEMA
    * .COLUMNS` (reference: databases/bigquery.py select_table_schema); a
    * bare table name has no dataset to introspect against. */
  override def tableSchemaSql(table: String): String = {
    val parts = table.split('.')
    require(parts.length >= 2, s"bigquery table must be dataset-qualified: $table")
    val dataset = parts.init.mkString(".")
    // BQ NUMERIC is fixed at (38,9) and the catalog has no precision columns
    // (reference: databases/bigquery.py:291 hardcodes 38/9); parameterized
    // NUMERIC(p,s) carries its parameters in data_type and sparkType's
    // name-parse takes precedence over these defaults.
    "SELECT column_name, data_type, 6 as datetime_precision, " +
      "38 as numeric_precision, 9 as numeric_scale " +
      // backtick-quoted: hyphenated GCP project ids (`my-project.ds`) are
      // the common case and are a syntax error unquoted
      s"FROM `$dataset`.INFORMATION_SCHEMA.COLUMNS WHERE table_name = ${stringLit(parts.last)}"
  }
  def toStringSql(expr: String): String = s"cast($expr as string)"
  def md5AsIntSql(expr: String): String =
    s"cast(cast( ('0x' || substr(TO_HEX(md5($expr)), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits})) as int64) as numeric) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    if (precision == 6) s"FORMAT_TIMESTAMP('%F %H:%M:%E6S', $expr)"
    else if (precision == 0) s"FORMAT_TIMESTAMP('%F %H:%M:%S.000000', $expr)"
    else {
      val ts6 = s"FORMAT_TIMESTAMP('%F %H:%M:%E6S', $expr)"
      s"RPAD(LEFT($ts6, ${20 + precision}), 26, '0')"
    }
  /** The reference's own rendering (databases/bigquery.py format("%.Nf")).
    * KNOWN SHARED LIMIT: %f coerces NUMERIC/BIGNUMERIC through FLOAT64,
    * so values past ~15 significant digits round before rendering — a
    * 38-digit NUMERIC differing only in its low digits can checksum
    * equal on the BigQuery side (the reference has the identical
    * behavior; BigQuery has no built-in fixed-scale exact-decimal
    * formatter). High-precision NUMERIC compares should CAST the column
    * in a view or use --columns to diff it as text. */
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"format('%.${precision}f', $expr)"
  def normalizeBooleanSql(expr: String): String = toStringSql(s"cast($expr as int)")
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"REGEXP_CONTAINS($expr, '[^A-Za-z0-9]')")
  /** CAST(string AS BYTES) = UTF-8 by definition in BigQuery. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substr(upper(to_hex(cast($expr as bytes))), 1, 32), 32, '0')")
}

/** ClickHouse (reference: data_diff/databases/clickhouse.py:72-170).
  * The number normalization preserves trailing zeros that toString(Decimal)
  * drops: cast at precision+1, add 10^-(p+1), then slice the extra digit —
  * ported verbatim from the reference's documented algorithm. */
object ClickHouseProfile extends SourceProfile {
  val name = "clickhouse"
  /** ClickHouse wraps nullable columns as Nullable(T) in the catalog; the
    * wrapper must unwrap before canonical matching, and the native integer
    * family has its own names (reference: databases/clickhouse.py
    * TYPE_CLASSES). */
  override protected def canonicalTypeName(dataType: String): String = {
    val unwrapped = "^Nullable\\((.*)\\)$".r
      .findFirstMatchIn(dataType.trim).map(_.group(1)).getOrElse(dataType)
    super.canonicalTypeName(unwrapped)
  }
  override protected def extraTypeKinds: Map[String, SourceProfile.TypeKind] = {
    import SourceProfile._
    Map("int8" -> IntegerKind, "int16" -> IntegerKind, "int32" -> IntegerKind,
      "int64" -> IntegerKind, "int128" -> IntegerKind, "int256" -> IntegerKind,
      "uint8" -> IntegerKind, "uint16" -> IntegerKind, "uint32" -> IntegerKind,
      "uint64" -> IntegerKind, "float32" -> FloatKind, "float64" -> FloatKind,
      "datetime64" -> TemporalKind, "fixedstring" -> TextKind)
  }
  def toStringSql(expr: String): String = s"toString($expr)"
  def md5AsIntSql(expr: String): String =
    s"reinterpretAsUInt128(reverse(unhex(lowerUTF8(substr(hex(MD5($expr)), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits}))))) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String = {
    val fractional = s"toUnixTimestamp64Micro(toDateTime64($expr, $precision)) % 1000000"
    val padded = s"lpad(${toStringSql(fractional)}, 6, '0')"
    s"rpad(formatDateTime($expr, '%Y-%m-%d %H:%M:%S') || '.' || $padded, 26, '0')"
  }
  def normalizeNumberSql(expr: String, precision: Int): String =
    if (precision == 0) toStringSql(s"round($expr)")
    else
      s"if($expr >= 0, '', '-') || left(toString(toDecimal128(round(abs($expr), $precision), ${precision + 1}) + toDecimal128(exp10(-${precision + 1}), ${precision + 1})), toUInt8(greatest(floor(log10(abs($expr))) + 1, 1)) + 1 + $precision)"
  def normalizeBooleanSql(expr: String): String = toStringSql(s"cast($expr as int)")
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"match($expr, '[^A-Za-z0-9]')")
  /** ClickHouse's type system is its own alphabet. */
  override def unboundedTextTypeSql: String = "String"
  override def sqlTypeSql(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "Int64"
    case FloatType | DoubleType => "Float64"
    case d: DecimalType => s"Decimal(${d.precision.min(38)}, ${d.scale.min(37)})"
    case BooleanType => "Bool"
    case DateType => "Date32"
    case TimestampType | TimestampNTZType => "DateTime64(6)"
    case _ => unboundedTextTypeSql
  }
}

/** MSSQL (reference: data_diff/databases/mssql.py:99-161). The only
  * profile that declares overflow-prone concat: VARCHAR concatenation can
  * overflow the type, so each normalized item is md5-hashed before joining
  * (reference: databases/base.py:218-230).
  *
  * Deliberate deviations from the reference's (experimental) MSSQL
  * renderings, which break its own canonical-form contract:
  *  - md5AsHexSql hex-encodes lowercase (style-2 CONVERT) — the reference
  *    emits raw VARBINARY, which can never equal the md5() hex strings the
  *    other side concatenates;
  *  - timestamps zero-pad to the 26-char canonical form (the reference
  *    stops at the requested precision);
  *  - numbers render via a DECIMAL(38,p) cast — the reference's
  *    FORMAT(...,'N2') inserts thousands separators ('1,234.50') and its
  *    precision-0 FLOOR truncates where every other profile rounds. */
object MsSqlProfile extends SourceProfile {
  val name = "mssql"
  override def preventOverflowWhenConcat: Boolean = true
  /** T-SQL has no LIMIT; the reference renders OFFSET/FETCH
    * (reference: databases/mssql.py:117-130). */
  override def sampleSql(table: String, exprs: Seq[String], n: Int,
      where: Option[String] = None, orderBy: Option[String] = None): String =
    s"SELECT ${exprs.mkString(", ")} FROM $table${where.fold("")(w => s" WHERE $w")} " +
      s"ORDER BY ${orderBy.getOrElse("(SELECT NULL)")} OFFSET 0 ROWS FETCH NEXT $n ROWS ONLY"
  /** BIT is T-SQL's boolean (on Postgres the same name is a bitstring,
    * which is why this lives here and not in the shared table). */
  override protected def extraTypeKinds: Map[String, SourceProfile.TypeKind] =
    Map("bit" -> SourceProfile.BooleanKind)
  def toStringSql(expr: String): String = s"CONVERT(VARCHAR(MAX), $expr)"
  /** HashBytes hashes the STORAGE bytes of its input: an NVARCHAR operand
    * (T-SQL FORMAT returns nvarchar — every normalized timestamp) hashes
    * UTF-16LE and can never equal the other side's md5 over UTF-8, so
    * every segment containing a datetime would fail its checksum and
    * bisection would prune nothing (a silent full-table download). The
    * operand is therefore converted to VARCHAR(MAX) — but collated
    * `Latin1_General_100_BIN2_UTF8` BEFORE the cast, so the conversion
    * targets UTF-8 storage (SQL Server 2019+), not the database's
    * default single-byte code page. The code-page route would map every
    * character outside the page to '?', so two DIFFERENT non-ASCII
    * strings of equal length both render '?…?' and checksum EQUAL — on a
    * same-profile MSSQL↔MSSQL diff a genuinely dirty segment would prune
    * as clean and the diff be silently missed. With UTF-8 bytes the hash
    * is lossless AND equals the other side's md5 over UTF-8, so
    * non-ASCII text segments prune cross-engine too. (Pre-2019 servers
    * lack UTF-8 collations; there the operator must force leaf-compare
    * for non-ASCII text — the COLLATE clause fails loudly at parse time
    * rather than silently corrupting.) MAX, never VARCHAR(n): a
    * truncated concat input would make DIFFERENT rows hash equal and
    * mask real diffs. */
  /** Route through NVARCHAR first: a COLLATE cast on a VARCHAR of a
    * DIFFERENT code page reinterprets the stored bytes rather than
    * converting them, which would garble non-ASCII cp1252 text; the
    * NVARCHAR convert decodes via the source column's own code page
    * (lossless), and only then does the UTF-8-collated cast encode. */
  private def utf8Bytes(expr: String): String =
    s"CAST(CONVERT(NVARCHAR(MAX), $expr) COLLATE Latin1_General_100_BIN2_UTF8 AS VARCHAR(MAX))"
  def md5AsIntSql(expr: String): String =
    s"convert(bigint, convert(varbinary, '0x' + RIGHT(CONVERT(NVARCHAR(32), HashBytes('MD5', ${utf8Bytes(expr)}), 2), ${Checksum.ChecksumHexDigits}), 1)) - ${Checksum.Offset}"
  override def md5AsHexSql(expr: String): String =
    s"LOWER(CONVERT(VARCHAR(32), HashBytes('MD5', ${utf8Bytes(expr)}), 2))"
  def normalizeTimestampSql(expr: String, precision: Int): String = {
    val base = s"FORMAT($expr, 'yyyy-MM-dd HH:mm:ss')"
    if (precision > 0)
      s"$base + '.' + SUBSTRING(FORMAT($expr, 'ffffff'), 1, $precision) + REPLICATE('0', ${6 - precision})"
    else s"$base + '.000000'"
  }
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"CONVERT(VARCHAR(50), CAST($expr AS DECIMAL(38, $precision)))"
  def normalizeBooleanSql(expr: String): String = s"CONVERT(VARCHAR(MAX), CAST($expr AS INT))"
  // T-SQL has no regex, but LIKE supports character classes. The [A-Za-z0-9]
  // ranges follow the COLUMN's collation by default — under a CI locale
  // collation 'é' sorts inside a–z, so the probe would miss exactly the
  // characters the case fold must refuse. Pin both sides to a binary
  // collation so the ranges are code-point ranges.
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"$expr COLLATE Latin1_General_BIN LIKE '%[^A-Za-z0-9]%' COLLATE Latin1_General_BIN")
  override def unboundedTextTypeSql: String = "NVARCHAR(MAX)"
  /** T-SQL has FLOAT and BIT, not DOUBLE PRECISION and BOOLEAN. */
  override def sqlTypeSql(dt: DataType): String = dt match {
    case FloatType | DoubleType => "FLOAT"
    case BooleanType => "BIT"
    case TimestampType | TimestampNTZType => "DATETIME2(6)"
    case other => super.sqlTypeSql(other)
  }
}

/** Oracle (reference: data_diff/databases/oracle.py:65-156). */
object OracleProfile extends SourceProfile {
  val name = "oracle"
  /** Oracle has no information_schema; the catalog is ALL_TAB_COLUMNS and
    * timestamps report a fixed precision 6 (reference:
    * databases/oracle.py:189-195). */
  override def tableSchemaSql(table: String): String = {
    val parts = table.split('.')
    val owner = if (parts.length >= 2) s" AND owner = ${stringLit(parts(parts.length - 2))}" else ""
    "SELECT column_name, data_type, 6 as datetime_precision, " +
      "data_precision as numeric_precision, data_scale as numeric_scale " +
      s"FROM ALL_TAB_COLUMNS WHERE table_name = ${stringLit(parts.last)}$owner"
  }
  /** Oracle DATE stores time-of-day to the second — it must normalize
    * through the timestamp path, not date-at-midnight (reference:
    * databases/oracle.py:57 maps 'DATE' -> Timestamp). */
  override protected def extraTypeKinds: Map[String, SourceProfile.TypeKind] =
    Map("date" -> SourceProfile.TemporalKind)
  /** Oracle has no LIMIT (reference: databases/oracle.py:68-78). */
  override def sampleSql(table: String, exprs: Seq[String], n: Int,
      where: Option[String] = None, orderBy: Option[String] = None): String =
    s"SELECT ${exprs.mkString(", ")} FROM $table${where.fold("")(w => s" WHERE $w")} " +
      s"${orderBy.fold("")(o => s"ORDER BY $o ")}FETCH NEXT $n ROWS ONLY"
  /** Oracle renders TIMESTAMP(6) etc.; canonical stripping already handles
    * the parameter, and NUMBER/VARCHAR2 live in the shared table. */
  def toStringSql(expr: String): String = s"cast($expr as varchar(1024))"
  def md5AsIntSql(expr: String): String =
    s"to_number(substr(standard_hash($expr, 'MD5'), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits}), 'xxxxxxxxxxxxxxx') - ${Checksum.Offset}"
  override def md5AsHexSql(expr: String): String = s"standard_hash($expr, 'MD5')"
  def normalizeTimestampSql(expr: String, precision: Int): String = {
    val truncated =
      if (precision > 0) s"to_char($expr, 'YYYY-MM-DD HH24:MI:SS.FF$precision')"
      else s"to_char($expr, 'YYYY-MM-DD HH24:MI:SS.')"
    s"RPAD($truncated, 26, '0')"
  }
  def normalizeNumberSql(expr: String, precision: Int): String = {
    val formatStr = "FM" + "9" * (38 - precision) +
      (if (precision > 0) "0." + "9" * (precision - 1) + "0" else "")
    s"to_char($expr, '$formatStr')"
  }
  def normalizeBooleanSql(expr: String): String = toStringSql(s"CAST($expr AS NUMBER(1))")
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"REGEXP_LIKE($expr, '[^A-Za-z0-9]')")
  override def unboundedTextTypeSql: String = "CLOB"
  /** Oracle numbers are NUMBER(p,s); booleans (pre-23c) are NUMBER(1). */
  override def sqlTypeSql(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "NUMBER(19)"
    case FloatType | DoubleType => "BINARY_DOUBLE"
    case d: DecimalType => s"NUMBER(${d.precision.min(38)}, ${d.scale.min(37)})"
    case BooleanType => "NUMBER(1)"
    case other => super.sqlTypeSql(other)
  }
}

/** Redshift: Postgres dialect with strtol for the checksum and a native
  * decimal(38) sum domain (reference: data_diff/databases/redshift.py:40-63). */
object RedshiftProfile extends SourceProfile {
  val name = "redshift"
  def toStringSql(expr: String): String = s"($expr)::varchar"
  def md5AsIntSql(expr: String): String =
    s"strtol(substring(md5($expr), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits}), 16)::decimal(38) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    PostgresProfile.normalizeTimestampSql(expr, precision)
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"(($expr)::decimal(38,$precision))::varchar"
  def normalizeBooleanSql(expr: String): String = s"(($expr)::int)::varchar"
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"$expr ~ '[^A-Za-z0-9]'")
  /** Redshift VARCHAR tops out at 65535 bytes; there is no TEXT. */
  override def unboundedTextTypeSql: String = "VARCHAR(65535)"
}

/** Vertica (reference: data_diff/databases/vertica.py:69-131). */
object VerticaProfile extends SourceProfile {
  val name = "vertica"
  def toStringSql(expr: String): String = s"CAST($expr AS VARCHAR)"
  def md5AsIntSql(expr: String): String =
    s"CAST(HEX_TO_INTEGER(SUBSTRING(MD5($expr), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits})) AS NUMERIC(38, 0)) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String = {
    val ts6 = s"TO_CHAR(($expr)::TIMESTAMP(6), 'YYYY-MM-DD HH24:MI:SS.US')"
    s"RPAD(LEFT($ts6, ${20 + precision}), 26, '0')"
  }
  def normalizeNumberSql(expr: String, precision: Int): String =
    toStringSql(s"CAST($expr AS NUMERIC(38, $precision))")
  def normalizeBooleanSql(expr: String): String = toStringSql(s"cast ($expr as int)")
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"REGEXP_LIKE($expr, '[^A-Za-z0-9]')")
  override def unboundedTextTypeSql: String = "LONG VARCHAR"
}

/** Databricks SQL (reference: data_diff/databases/databricks.py:73-116). */
object DatabricksProfile extends SourceProfile {
  val name = "databricks"
  override def quote(ident: String): String = "`" + ident + "`"
  override def tableSchemaSql(table: String): String = s"DESCRIBE TABLE $table"
  override def parseSchemaRow(row: Seq[Option[String]]): Option[RawColumnInfo] =
    SparkProfile.parseSchemaRow(row)
  def toStringSql(expr: String): String = s"cast($expr as string)"
  def md5AsIntSql(expr: String): String =
    s"cast(conv(substr(md5($expr), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits}), 16, 10) as decimal(38, 0)) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String = {
    val fmt = "S" * precision + "0" * (6 - precision)
    s"date_format($expr, 'yyyy-MM-dd HH:mm:ss.$fmt')"
  }
  def normalizeNumberSql(expr: String, precision: Int): String = {
    val dec = s"cast($expr as decimal(38, $precision))"
    if (precision > 0) s"replace(${toStringSql(s"format_number($dec, $precision)")}, ',', '')"
    else toStringSql(dec)
  }
  def normalizeBooleanSql(expr: String): String = toStringSql(s"cast ($expr as int)")
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"$expr RLIKE '[^A-Za-z0-9]'")
  /** encode(..., 'UTF-8') pins the byte source; hex() renders uppercase. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substring(upper(hex(encode($expr, 'UTF-8'))), 1, 32), 32, '0')")
  override def unboundedTextTypeSql: String = "STRING"
  override def sqlTypeSql(dt: DataType): String = dt match {
    case FloatType | DoubleType => "DOUBLE"
    case other => super.sqlTypeSql(other)
  }
}

/** Spark SQL rendered as text — this engine's own dialect, used when the
  * "remote" side is another Spark/Databricks warehouse and by the in-process
  * pushdown tests. Every formula is the SQL spelling of the corresponding
  * `graft.diff.Normalize`/`Checksum` Column expression, so remote checksums
  * are bit-identical to local ones by construction. */
object SparkProfile extends SourceProfile {
  val name = "spark"
  override def quote(ident: String): String = "`" + ident + "`"
  /** Spark's catalog speaks DESCRIBE, not information_schema (and DESCRIBE
    * also resolves temp views, which is what in-process pushdown targets).
    * Rows come back (col_name, data_type, comment); section markers start
    * with '#'. Precision rides inside the type name ("decimal(38,2)") and
    * timestamps are always microseconds. */
  override def tableSchemaSql(table: String): String = s"DESCRIBE TABLE $table"
  override def parseSchemaRow(row: Seq[Option[String]]): Option[RawColumnInfo] =
    row.headOption.flatten.map(_.trim)
      .filter(n => n.nonEmpty && !n.startsWith("#"))
      .map(n => RawColumnInfo(n, row.lift(1).flatten.getOrElse("")))
  def toStringSql(expr: String): String = s"cast($expr as string)"
  /** decimal(38,0), not bigint: Spark's SUM(bigint) stays bigint and
    * overflows past ~65k rows × 2^47 per segment — first-level segments
    * at scale hold millions. Engines whose SUM auto-promotes (DuckDB →
    * HUGEINT, Postgres → numeric, MySQL → decimal) keep native ints. */
  def md5AsIntSql(expr: String): String =
    s"cast(conv(substring(md5($expr), ${1 + Checksum.Md5HexDigits - Checksum.ChecksumHexDigits}, ${Checksum.ChecksumHexDigits}), 16, 10) as decimal(38, 0)) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"rpad(substring(date_format($expr, 'yyyy-MM-dd HH:mm:ss.SSSSSS'), 1, ${20 + precision}), 26, '0')"
  override def normalizeDateSql(expr: String): String =
    s"concat(date_format($expr, 'yyyy-MM-dd'), ' 00:00:00.000000')"
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"cast(cast($expr as decimal(38, $precision)) as string)"
  def normalizeBooleanSql(expr: String): String = s"cast(cast($expr as int) as string)"
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"$expr RLIKE '[^A-Za-z0-9]'")
  /** encode(..., 'UTF-8') pins the byte source; hex() renders uppercase. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substring(upper(hex(encode($expr, 'UTF-8'))), 1, 32), 32, '0')")
  override def unboundedTextTypeSql: String = "STRING"
  override def sqlTypeSql(dt: DataType): String = dt match {
    case FloatType | DoubleType => "DOUBLE"
    case other => super.sqlTypeSql(other)
  }
}
