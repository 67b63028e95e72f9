package graft.sources

import org.apache.spark.sql.types._

import graft.diff.{Checksum, Normalize}

/** One raw row of a remote table's schema catalog (reference:
  * data_diff/databases/base.py RawColumnInfo — column_name, data_type,
  * datetime_precision, numeric_precision, numeric_scale). */
final case class RawColumnInfo(
    name: String,
    dataType: String,
    datetimePrecision: Option[Int] = None,
    numericPrecision: Option[Int] = None,
    numericScale: Option[Int] = None)

/** Per-source SQL profiles for pushdown mode.
  *
  * When one side of a diff lives in an external engine reachable over JDBC,
  * the per-segment `count + sum(md5_int48(normalized_row))` query is pushed
  * to that engine as SQL; only bucket summaries and leaf rows ever cross the
  * wire (SURVEY.md §7.1 "pushdown mode"). Unlike the reference's full
  * dialect/compiler stack (~2300 LoC), only the checksum-relevant surface is
  * profiled — everything else the external engine does is its own business,
  * and Spark-side reads go through normal JDBC pushdown.
  *
  * The formulas must produce byte-identical strings and bit-identical 48-bit
  * checksums to `graft.diff.Normalize`/`Checksum`; the DuckDB profile is the
  * same SQL the correctness gate's `q_checksum` oracle runs, so its parity
  * with the Spark expressions is continuously verified.
  */
trait SourceProfile {
  def name: String
  def quote(ident: String): String = "\"" + ident + "\""

  /** Render an expression to text. */
  def toStringSql(expr: String): String

  /** 48-bit md5-suffix integer minus the centering offset
    * (reference contract: data_diff/databases/base.py:411-421). */
  def md5AsIntSql(expr: String): String

  /** Full md5 as hex text — used by the overflow-safe concat mode
    * (reference: data_diff/databases/base.py:804-806). */
  def md5AsHexSql(expr: String): String = s"md5($expr)"

  /** Some engines (MSSQL) overflow on long string concatenation; in that
    * mode each normalized item is md5-hex-hashed before concatenation so
    * every item is a fixed 32 chars (reference: databases/base.py:218-230,
    * render_concat at base.py:423-436 — note the reference drops the
    * per-item COALESCE on this path; mirrored for parity). */
  def preventOverflowWhenConcat: Boolean = false

  /** Canonical "YYYY-MM-DD HH:MM:SS.ffffff" truncated to precision. */
  def normalizeTimestampSql(expr: String, precision: Int = 6): String

  /** DATE → the same 26-char canonical form at midnight, mirroring
    * `graft.diff.Normalize` (Date is a TemporalType in the reference).
    * Note: the reference's own dialects disagree on dates (bigquery/
    * databricks render '%F' date-only, duckdb/postgres go through the
    * timestamp path); this engine pins the 26-char form on every profile so
    * a DATE checksums equal to the Spark side's normalization. */
  def normalizeDateSql(expr: String): String =
    normalizeTimestampSql(s"CAST($expr AS TIMESTAMP)", 6)

  /** Decimal string with exactly `precision` fractional digits. */
  def normalizeNumberSql(expr: String, precision: Int = 2): String

  def normalizeBooleanSql(expr: String): String

  /** SQL literal rendering for segment bounds (keys are ints or strings). */
  def literal(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => other.toString
  }

  /** ANSI timestamp literal — update-range bounds in remote WHEREs and
    * repair INSERT values. Dialects without ANSI datetime literals
    * (Derby) override with their function forms. */
  def timestampLiteral(ts: java.sql.Timestamp): String =
    s"TIMESTAMP '${timestampText(ts)}'"

  protected def timestampText(ts: java.sql.Timestamp): String =
    ts.toInstant.atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))

  /** ANSI date literal (see [[timestampLiteral]] for the dialect seam). */
  def dateLiteral(d: java.sql.Date): String = s"DATE '$d'"

  /** Casing-canonical UUID text — must render the same string as
    * `graft.diff.Normalize.normalizeUuid` (lowercase, trimmed); LOWER/TRIM
    * are ANSI and available on all 13 profiled dialects (reference:
    * databases/base.py:884-887 normalize_uuid). */
  def normalizeUuidSql(expr: String): String = s"LOWER(TRIM($expr))"

  /** Normalization SQL for a column of the given SPARK-side logical type —
    * the pushdown analogue of `graft.diff.Normalize.normalize`, negotiated
    * from the mutual schema like the reference's
    * `_validate_and_adjust_columns` (hashdiff_tables.py:119-168).
    * `stringClass` is the refined text class ("uuid-lower"/"uuid-upper"
    * upgrade text to the casing-canonical UUID rendering). */
  def normalizedColumnSql(colName: String, dt: DataType,
      fracPrecision: Int = 2, tsPrecision: Int = 6,
      stringClass: Option[String] = None): String = {
    val q = quote(colName)
    dt match {
      case TimestampType | TimestampNTZType => normalizeTimestampSql(q, tsPrecision)
      case DateType => normalizeDateSql(q)
      case DoubleType | FloatType | (_: DecimalType) => normalizeNumberSql(q, fracPrecision)
      case ByteType | ShortType | IntegerType | LongType => toStringSql(q)
      case BooleanType => normalizeBooleanSql(q)
      case StringType if stringClass.exists(_.startsWith("uuid")) => normalizeUuidSql(q)
      case StringType => q
      case _ => toStringSql(q)
    }
  }

  /** '|'-joined, '<null>'-defaulted concatenation of already-normalized
    * (string-typed) expressions; overflow-safe engines hash each item first
    * (reference: databases/base.py:423-436). */
  def concatSql(normalized: Seq[String]): String =
    if (preventOverflowWhenConcat)
      // concat() with explicit separators (not concat_ws): CONCAT renders a
      // NULL item as '' but keeps the separator, matching the reference's
      // render_concat/concat pair and Checksum.rowChecksumOverflowSafe.
      // Single column: no concat call (MSSQL CONCAT requires >= 2 args) —
      // matching concat_ws('|', one-item) = the item on the Spark side,
      // with NULL rendered as '' like CONCAT would.
      normalized.map(md5AsHexSql) match {
        case Seq(one) => s"COALESCE($one, '')"
        case items => "concat(" + items.mkString(", '|', ") + ")"
      }
    else
      "concat_ws('|', " + normalized.map(e => s"COALESCE($e, '${Normalize.NullSentinel}')").mkString(", ") + ")"

  /** The one query pushdown mode ships per segment. */
  def checksumQuerySql(table: String, normalizedCols: Seq[String],
      where: Option[String] = None): String = {
    val w = where.fold("")(p => s" WHERE $p")
    s"SELECT COUNT(*) AS cnt, SUM(${md5AsIntSql(concatSql(normalizedCols))}) AS checksum FROM $table$w"
  }

  /** All segments of one bisection level in a single round-trip: a CASE
    * bucket over the segment predicates, GROUP BY bucket. The reference
    * ships one checksum query per segment (hashdiff_tables.py:193 via
    * table_segment.py:239-258, one thread each); grouping cuts a level's
    * network round-trips to one, which is what dominates remote bisection
    * latency at scale. The GROUP BY repeats the CASE expression rather than
    * using positional `GROUP BY 1` — T-SQL rejects positional grouping
    * outright and Oracle reads the 1 as a constant (ORA-00979), while the
    * repeated-expression form is valid on all 13 profiled dialects. */
  def segmentedChecksumSql(table: String, normalizedCols: Seq[String],
      segmentPreds: Seq[String], extraWhere: Option[String] = None): String = {
    require(segmentPreds.nonEmpty, "no segments")
    val bucket = segmentPreds.zipWithIndex
      .map { case (p, i) => s"WHEN $p THEN $i" }.mkString("CASE ", " ", " END")
    val cover = segmentPreds.map(p => s"($p)").mkString(" OR ")
    val w = extraWhere.fold(s"($cover)")(e => s"($cover) AND ($e)")
    s"SELECT $bucket AS seg, COUNT(*) AS cnt, " +
      s"SUM(${md5AsIntSql(concatSql(normalizedCols))}) AS checksum " +
      s"FROM $table WHERE $w GROUP BY $bucket"
  }

  /** Leaf-segment row fetch in normalized string form — what crosses the
    * wire for the final compare (reference: table_segment.py:214-237
    * `get_values` selects NormalizeAsString projections). */
  def selectNormalizedSql(table: String, exprWithAlias: Seq[(String, String)],
      where: Option[String] = None): String = {
    val sel = exprWithAlias.map { case (e, a) => s"$e AS ${quote(a)}" }.mkString(", ")
    val w = where.fold("")(p => s" WHERE $p")
    s"SELECT $sel FROM $table$w"
  }

  /** Min/max of the key columns (reference: table_segment.py:260-275). */
  def keyRangeSql(table: String, keyCols: Seq[String],
      where: Option[String] = None): String =
    keyRangeExprsSql(table, keyCols.map(quote), where)

  /** [[keyRangeSql]] over pre-rendered key EXPRESSIONS — the hex-projection
    * path probes MIN/MAX of the projected key, not the raw column (a raw
    * min under a locale collation is not the projected space's min). */
  def keyRangeExprsSql(table: String, keyExprs: Seq[String],
      where: Option[String] = None): String = {
    val sel = keyExprs.map(e => s"MIN($e), MAX($e)").mkString(", ")
    s"SELECT $sel FROM $table${where.fold("")(p => s" WHERE $p")}"
  }

  // ---- schema introspection ----------------------------------------------

  /** SQL selecting `(column_name, data_type, datetime_precision,
    * numeric_precision, numeric_scale)` for the table from the engine's
    * catalog (reference: databases/base.py:1031-1041 select_table_schema).
    * `table` is `name` or `schema.name`; without a schema the filter is by
    * name only (the engine's search path decides), like the reference's
    * default_schema fallback. */
  def tableSchemaSql(table: String): String = {
    val parts = table.split('.')
    val name = parts.last
    val schemaFilter =
      if (parts.length >= 2) s" AND table_schema = ${stringLit(parts(parts.length - 2))}" else ""
    "SELECT column_name, data_type, datetime_precision, numeric_precision, numeric_scale " +
      s"FROM information_schema.columns WHERE table_name = ${stringLit(name)}$schemaFilter"
  }

  /** Single-quoted SQL string literal with embedded quotes doubled — catalog
    * filters interpolate user-supplied table/schema names, which must not be
    * able to break out of the literal. */
  protected def stringLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Parse one row of `tableSchemaSql` output; None skips the row (used by
    * DESCRIBE-style catalogs that emit section markers). */
  def parseSchemaRow(row: Seq[Option[String]]): Option[RawColumnInfo] =
    row.headOption.flatten.filter(_.nonEmpty).map { name =>
      def intAt(i: Int) = row.lift(i).flatten.flatMap(_.trim.toIntOption)
      RawColumnInfo(name, row.lift(1).flatten.getOrElse(""),
        datetimePrecision = intAt(2), numericPrecision = intAt(3), numericScale = intAt(4))
    }

  /** Canonical form a catalog type name is matched under: lowercase with
    * parameter lists stripped ("DECIMAL(15,2)" → "decimal",
    * "timestamp(6) with time zone" → "timestamp with time zone"). */
  protected def canonicalTypeName(dataType: String): String =
    dataType.replaceAll("\\([^)]*\\)", "").trim.toLowerCase

  /** Engine-specific additions to the shared type-name table
    * (the reference's per-dialect TYPE_CLASSES deltas). */
  protected def extraTypeKinds: Map[String, SourceProfile.TypeKind] = Map.empty

  /** Catalog type → the Spark logical type PushdownDiffer normalizes under
    * (the reference's parse_type, databases/base.py:732-770: temporal kinds
    * carry datetime_precision, decimals carry numeric_scale — a NULL scale
    * is precision 0, the Oracle NUMBER case). None = unknown type. */
  def sparkType(info: RawColumnInfo): Option[DataType] = {
    import SourceProfile._
    // precision AND scale can ride in the type name instead of the catalog
    // columns ("DECIMAL(15,2)" from DESCRIBE-style catalogs, Trino/ClickHouse
    // parametrized names); an explicit parameter list is authoritative over
    // catalog-wide defaults (the BigQuery profile reports the fixed 38/9 for
    // bare NUMERIC, but NUMERIC(p,s) carries its own parameters).
    val params = "\\(\\s*(\\d+)\\s*(?:,\\s*(\\d+)\\s*)?\\)".r
      .findFirstMatchIn(info.dataType)
    val precFromName = params.map(_.group(1).toInt)
    val scaleFromName = params.flatMap(m => Option(m.group(2)).map(_.toInt))
    // engine-specific kinds OVERRIDE the shared table — Map ++ is
    // right-biased, so the shared table must be the LEFT operand (the
    // reversed order silently killed e.g. Oracle's date→TemporalKind
    // override, refusing DATE-vs-timestamp pairings its time-of-day
    // semantics support)
    (AnsiTypeKinds ++ extraTypeKinds).get(canonicalTypeName(info.dataType)).map {
      case TemporalKind => TimestampType
      case DateKind => DateType
      case IntegerKind => LongType
      case DecimalKind =>
        val scale = scaleFromName.orElse(info.numericScale).getOrElse(0)
        val prec = precFromName.orElse(info.numericPrecision).filter(_ >= scale).getOrElse(38)
        // clamp BOTH to Spark's decimal limit, scale never above
        // precision — numeric(45,40) must introspect, not throw
        // DecimalType's scale>precision exception mid-diff
        val p = math.min(prec, 38)
        DecimalType(p, math.min(scale, p))
      case FloatKind => DoubleType
      case TextKind => StringType
      case BooleanKind => BooleanType
      case UuidKind => StringType
    }
  }

  /** Bounded row sample — the 64-row text-refinement query (reference:
    * base.py:1126-1131; LIMIT is the ANSI-ish default, TOP / FETCH NEXT
    * engines override). `orderBy` (an expression, e.g. a key's md5 hex)
    * turns the storage-order prefix into a DETERMINISTIC pseudo-random
    * sample — what the remote↔remote quantile seeding orders by; None
    * keeps engine order (the refinement query doesn't care). */
  def sampleSql(table: String, exprs: Seq[String], n: Int,
      where: Option[String] = None, orderBy: Option[String] = None): String =
    s"SELECT ${exprs.mkString(", ")} FROM $table${where.fold("")(w => s" WHERE $w")}" +
      s"${orderBy.fold("")(o => s" ORDER BY $o")} LIMIT $n"

  /** Predicate matching values that contain ANY character outside the
    * strict [A-Za-z0-9] alphabet — the full-table probe that licenses
    * case-insensitive collation FOLDING (PushdownDiffer): UPPER()-folded
    * range predicates order consistently between the binary coordinator
    * and a CI remote ONLY on strictly alphanumeric keys. The segmentable
    * base-66 alphabet also admits ' ', '-' and '_', which sort after 'Z'
    * in binary order but before letters under UCA-style locale collations,
    * so a key containing them breaks the fold's soundness. None = the
    * dialect cannot express the check; callers must refuse the fold, never
    * assume. */
  def nonAlnumPredicateSql(expr: String): Option[String] = None

  /** Collation-proof key projection: UPPERCASE hex of the first 16 UTF-8
    * bytes of `expr`, right-padded with '0' to exactly 32 characters.
    *
    * This is the segmentation remedy for INCOMPARABLE key collations
    * (locale/territory orderings no case fold repairs): the projected
    * alphabet is fixed-width single-case [0-9A-F], on which binary order
    * and every locale ordering agree (digits before letters, letters
    * alphabetical, positional compare at equal length) — so range bounds
    * generated by the coordinator select the same rows under ANY remote
    * collation, BY CONSTRUCTION rather than by probing the key content.
    * Keys sharing a 16-byte prefix project to the same value and land in
    * the same segment (ties can't be split below the prefix class; the
    * leaf threshold absorbs them). The rendering MUST hex UTF-8 bytes —
    * a dialect that can only reach its native code-page bytes (MSSQL
    * varbinary = UTF-16) must return None, because the coordinator and
    * the other side project UTF-8 and a different byte source would put
    * the same logical key in different segments per engine.
    *
    * None = the dialect cannot express the projection; callers keep the
    * loud refusal. */
  def hexKeyProjectionSql(expr: String): Option[String] = None

  /** DDL to run once per connection before any pushed query — for profiles
    * whose SQL surface needs per-database helper objects (Derby's
    * Java-backed CREATE FUNCTIONs). Statements must be idempotent-safe for
    * the runner: JdbcEngine executes each and swallows the dialect's
    * "object already exists" (Derby SQLState X0Y68). Empty for engines
    * whose profile renders in pure built-ins. */
  def connectBootstrapSql: Seq[String] = Nil

  /** The dialect's widest portable character type, for materialized text
    * columns whose length is unknowable up front. The ANSI fallback is
    * VARCHAR(4000); engines with genuinely unbounded text types override
    * so long values survive (reference writes typed temp tables,
    * data_diff/joindiff_tables.py:57-67). */
  def unboundedTextTypeSql: String = "VARCHAR(4000)"

  /** DDL column type for materializing a Spark-typed column on this
    * engine. Scalar types map to their ANSI forms; everything else
    * (arrays, structs, maps — and strings) lands in the unbounded text
    * type, with the caller rendering those values as strings. */
  def sqlTypeSql(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "BIGINT"
    case FloatType | DoubleType => "DOUBLE PRECISION"
    case d: DecimalType => s"DECIMAL(${d.precision.min(38)}, ${d.scale.min(37)})"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case _ => unboundedTextTypeSql
  }
}

/** DuckDB: hex-literal cast (reference behavior: data_diff/databases/
  * duckdb.py:99-116; validated against Spark by the q_checksum oracle). */
object DuckDbProfile extends SourceProfile {
  val name = "duckdb"
  def toStringSql(expr: String): String = s"($expr)::VARCHAR"
  def md5AsIntSql(expr: String): String =
    s"('0x' || SUBSTRING(md5($expr), ${Checksum.Md5HexDigits - Checksum.ChecksumHexDigits + 1}, ${Checksum.ChecksumHexDigits}))::BIGINT - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"rpad(substring(strftime(($expr)::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f'), 1, ${20 + precision}), 26, '0')"
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"(($expr)::DECIMAL(38, $precision))::VARCHAR"
  def normalizeBooleanSql(expr: String): String = s"(($expr)::INTEGER)::VARCHAR"
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"regexp_matches($expr, '[^A-Za-z0-9]')")
  /** encode() = UTF-8 bytes; DuckDB hex(BLOB) renders uppercase. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substring(upper(hex(encode($expr))), 1, 32), 32, '0')")
  /** DuckDB VARCHAR is unbounded. */
  override def unboundedTextTypeSql: String = "VARCHAR"
}

/** PostgreSQL: bit-cast of the hex suffix (reference behavior:
  * data_diff/databases/postgresql.py:107-175). */
object PostgresProfile extends SourceProfile {
  val name = "postgresql"
  def toStringSql(expr: String): String = s"($expr)::varchar"
  def md5AsIntSql(expr: String): String =
    s"('x' || substring(md5($expr), ${Checksum.Md5HexDigits - Checksum.ChecksumHexDigits + 1}))::bit(${Checksum.ChecksumHexDigits * 4})::bigint - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"RPAD(LEFT(to_char(($expr)::timestamp(6), 'YYYY-mm-dd HH24:MI:SS.US'), ${20 + precision}), 26, '0')"
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"(($expr)::decimal(38, $precision))::varchar"
  def normalizeBooleanSql(expr: String): String = s"(($expr)::int)::varchar"
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"$expr ~ '[^A-Za-z0-9]'")
  /** convert_to(..., 'UTF8') pins the byte source regardless of the
    * database's server_encoding. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(upper(substring(encode(convert_to($expr, 'UTF8'), 'hex') from 1 for 32)), 32, '0')")
  override def unboundedTextTypeSql: String = "TEXT"
}

/** MySQL: conv() hex→int, DATE_FORMAT microseconds (reference behavior:
  * data_diff/databases/mysql.py:102-119). */
object MySqlProfile extends SourceProfile {
  val name = "mysql"
  override def quote(ident: String): String = "`" + ident + "`"
  def toStringSql(expr: String): String = s"cast($expr as char)"
  def md5AsIntSql(expr: String): String =
    s"cast(conv(substring(md5($expr), ${Checksum.Md5HexDigits - Checksum.ChecksumHexDigits + 1}, ${Checksum.ChecksumHexDigits}), 16, 10) as signed) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"rpad(left(date_format($expr, '%Y-%m-%d %H:%i:%S.%f'), ${20 + precision}), 26, '0')"
  /** MySQL has no CAST(... AS TIMESTAMP) — DATETIME is the cast target. */
  override def normalizeDateSql(expr: String): String =
    normalizeTimestampSql(s"CAST($expr AS DATETIME)", 6)
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"cast(cast($expr as decimal(38, $precision)) as char)"
  def normalizeBooleanSql(expr: String): String = s"cast(cast($expr as signed) as char)"
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"$expr REGEXP '[^A-Za-z0-9]'")
  /** CONVERT ... USING utf8mb4 pins UTF-8 bytes whatever the column's
    * declared charset; HEX of a string value hexes its bytes. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substring(upper(hex(convert($expr using utf8mb4))), 1, 32), 32, '0')")
  override def unboundedTextTypeSql: String = "LONGTEXT"
}

/** Trino/Presto: md5 over varbinary, from_base for the hex suffix
  * (reference behavior: data_diff/databases/presto.py:121-122; timestamps
  * render 'YYYY-MM-DD HH:MM:SS.ffffff' when cast to varchar at p=6). */
object TrinoProfile extends SourceProfile {
  val name = "trino"
  def toStringSql(expr: String): String = s"cast($expr as varchar)"
  def md5AsIntSql(expr: String): String =
    s"from_base(substr(to_hex(md5(to_utf8($expr))), ${Checksum.Md5HexDigits - Checksum.ChecksumHexDigits + 1}, ${Checksum.ChecksumHexDigits}), 16) - ${Checksum.Offset}"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"rpad(substr(cast(cast($expr as timestamp(6)) as varchar), 1, ${20 + precision}), 26, '0')"
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"cast(cast($expr as decimal(38, $precision)) as varchar)"
  def normalizeBooleanSql(expr: String): String = s"cast(cast($expr as integer) as varchar)"
  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"regexp_like($expr, '[^A-Za-z0-9]')")
  /** to_utf8 = UTF-8 varbinary; to_hex renders uppercase. */
  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"rpad(substr(upper(to_hex(to_utf8($expr))), 1, 32), 32, '0')")
  override def unboundedTextTypeSql: String = "VARCHAR"
  /** Trino spells double as DOUBLE, not the ANSI DOUBLE PRECISION. */
  override def sqlTypeSql(dt: DataType): String = dt match {
    case FloatType | DoubleType => "DOUBLE"
    case other => super.sqlTypeSql(other)
  }
}

object SourceProfile {
  /** Registry keyed by engine name (the reference's _connect.py scheme map). */
  val registry: Map[String, SourceProfile] =
    (Seq(DuckDbProfile, PostgresProfile, MySqlProfile, TrinoProfile,
      SnowflakeProfile, BigQueryProfile, ClickHouseProfile, MsSqlProfile,
      OracleProfile, RedshiftProfile, VerticaProfile, DatabricksProfile,
      SparkProfile, DerbyProfile).map(p => p.name -> p)
      :+ ("presto" -> TrinoProfile)
      // the jdbc subprotocol of Spark Thrift / HiveServer2 endpoints —
      // the dialect spoken over that socket is Spark SQL (HiveThriftSpec
      // wire-tests the full loop over it)
      :+ ("hive2" -> SparkProfile)).toMap

  /** The type families a remote column can land in for diffing — the
    * reference's ColType hierarchy collapsed to what normalization needs
    * (abcs/database_types.py: TemporalType / Integer / Decimal / Float /
    * Text / Boolean / Native_UUID). */
  sealed trait TypeKind
  case object TemporalKind extends TypeKind
  case object DateKind extends TypeKind
  case object IntegerKind extends TypeKind
  case object DecimalKind extends TypeKind
  case object FloatKind extends TypeKind
  case object TextKind extends TypeKind
  case object BooleanKind extends TypeKind
  case object UuidKind extends TypeKind

  /** Union of the reference's per-dialect TYPE_CLASSES tables, keyed on the
    * canonical (lowercased, parameter-stripped) catalog name. Names unique
    * to one engine are harmless for the others; the only genuine conflict —
    * "bit" (boolean on MSSQL, bitstring on Postgres) — lives in MsSqlProfile
    * as an engine-local addition. */
  val AnsiTypeKinds: Map[String, TypeKind] = Map(
    // integers (postgres/duckdb/mysql/trino/bigquery/clickhouse spellings)
    "tinyint" -> IntegerKind, "smallint" -> IntegerKind, "mediumint" -> IntegerKind,
    "int" -> IntegerKind, "integer" -> IntegerKind, "bigint" -> IntegerKind,
    "int2" -> IntegerKind, "int4" -> IntegerKind, "int8" -> IntegerKind,
    "int64" -> IntegerKind, "hugeint" -> IntegerKind,
    // exact numerics
    "decimal" -> DecimalKind, "numeric" -> DecimalKind, "number" -> DecimalKind,
    "bignumeric" -> DecimalKind,
    // approximate numerics
    "float" -> FloatKind, "real" -> FloatKind, "double" -> FloatKind,
    "double precision" -> FloatKind, "float4" -> FloatKind, "float8" -> FloatKind,
    "float64" -> FloatKind, "binary_float" -> FloatKind, "binary_double" -> FloatKind,
    // text
    "varchar" -> TextKind, "character varying" -> TextKind, "char" -> TextKind,
    "character" -> TextKind, "text" -> TextKind, "string" -> TextKind,
    "nvarchar" -> TextKind, "nchar" -> TextKind, "varchar2" -> TextKind,
    "nvarchar2" -> TextKind, "bpchar" -> TextKind,
    // temporal
    "timestamp" -> TemporalKind, "timestamp without time zone" -> TemporalKind,
    "timestamp with time zone" -> TemporalKind, "timestamptz" -> TemporalKind,
    "datetime" -> TemporalKind, "datetime2" -> TemporalKind,
    "datetimeoffset" -> TemporalKind, "timestamp_ntz" -> TemporalKind,
    "timestamp_ltz" -> TemporalKind, "timestamp_tz" -> TemporalKind,
    "date" -> DateKind,
    // boolean
    "boolean" -> BooleanKind, "bool" -> BooleanKind,
    // native uuid columns diff as text (reference Native_UUID)
    "uuid" -> UuidKind)
}
