package graft.sources

import org.apache.spark.sql.types._

import graft.diff.{Checksum, Normalize}

/** JVM statics backing [[DerbyProfile]]'s checksum SQL. Derby ships no
  * md5/strftime/rpad, but it runs embedded in a JVM and supports Java-backed
  * `CREATE FUNCTION` — so the three renderings its SQL cannot express are
  * installed as functions whose Java bodies MIRROR the Spark-side
  * normalization exactly (`graft.diff.Normalize` / `Checksum`):
  *
  *  - `md5Int48`: low 48 bits of the md5 of the UTF-8 string, minus the
  *    centering offset — the same contract every other profile renders
  *    natively (reference: data_diff/databases/base.py:411-421).
  *  - `normTimestamp`: "YYYY-MM-DD HH:MM:SS.ffffff" truncated to precision
  *    then zero-padded to 26 chars (Derby's own VARCHAR cast drops trailing
  *    zeros: '…05.0').
  *  - `normNumber`/`normDouble`: exact decimal string at the mutual
  *    precision with HALF_UP — Derby's native double→decimal cast
  *    TRUNCATES (0.005 → 0.00 at scale 2), which would silently break
  *    checksum parity with Spark/DuckDB, so the rounding happens in Java
  *    on `BigDecimal` like Spark's `Cast` does.
  *
  * Methods are plain object members; Scala emits static forwarders, which
  * is what Derby's `EXTERNAL NAME` resolution needs.
  */
object DerbyFunctions {
  def md5Int48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // low 48 bits = last 6 bytes of the 16-byte digest, big-endian
    var v = 0L
    var i = 10
    while (i < 16) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v - Checksum.Offset
  }

  def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  def normTimestamp(ts: java.sql.Timestamp, precision: Int): String = {
    val s = ts.toLocalDateTime.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    s.substring(0, 20 + precision).padTo(26, '0')
  }

  def normNumber(s: String, precision: Int): String =
    new java.math.BigDecimal(s.trim)
      .setScale(precision, java.math.RoundingMode.HALF_UP).toPlainString

  def normDouble(v: Double, precision: Int): String =
    // BigDecimal.valueOf = shortest-repr Double.toString parse — the same
    // double→decimal route Spark's Cast takes before HALF_UP rescaling
    java.math.BigDecimal.valueOf(v)
      .setScale(precision, java.math.RoundingMode.HALF_UP).toPlainString

  /** Uppercase hex of the first 16 UTF-8 bytes, '0'-right-padded to 32 —
    * the collation-proof key projection (`SourceProfile
    * .hexKeyProjectionSql`); Derby has no hex builtin, so it is Java-backed
    * like the rest, byte-identical to the other dialects' renderings. */
  def hex16(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(32)
    var i = 0
    while (i < bytes.length && i < 16) {
      val b = bytes(i) & 0xff
      sb.append("0123456789ABCDEF".charAt(b >> 4))
      sb.append("0123456789ABCDEF".charAt(b & 0xf))
      i += 1
    }
    while (sb.length < 32) sb.append('0')
    sb.toString
  }

  /** 1 when the value contains any character outside strict [A-Za-z0-9] —
    * Derby has no regex, so the collation-fold probe
    * (`SourceProfile.nonAlnumPredicateSql`) is Java-backed like the rest. */
  def nonAlnum(s: String): Int = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
        return 1
      i += 1
    }
    0
  }
}

/** Apache Derby (embedded or client JDBC). The only profiled engine with no
  * native md5: `bootstrapSql` must run once per database to install the
  * Java-backed helpers above (the library jar is on the classpath by
  * construction for embedded Derby; a network server needs it in
  * `derby.system.home/lib`). Everything else renders in Derby's own SQL:
  * CHAR-cast+TRIM for exact integer/decimal text (Derby refuses
  * numeric→VARCHAR casts), `||` concatenation (no concat_ws), CASE for
  * booleans. Checksums SUM in DECIMAL(31,0) — Derby's widest exact type —
  * so segment sums cannot wrap int64.
  */
object DerbyProfile extends SourceProfile {
  val name = "derby"
  def toStringSql(expr: String): String =
    s"TRIM(CAST(CAST($expr AS CHAR(40)) AS VARCHAR(40)))"
  def md5AsIntSql(expr: String): String =
    s"CAST(GRAFT_MD5INT48($expr) AS DECIMAL(31,0))"
  override def md5AsHexSql(expr: String): String = s"GRAFT_MD5HEX($expr)"
  def normalizeTimestampSql(expr: String, precision: Int): String =
    s"GRAFT_NORM_TS($expr, $precision)"
  /** Exact numerics: render Derby's own exact decimal text, rescale in
    * Java (HALF_UP, like Spark's Cast — Derby's own cast truncates). */
  def normalizeNumberSql(expr: String, precision: Int): String =
    s"GRAFT_NORM_NUM(TRIM(CAST(CAST($expr AS CHAR(60)) AS VARCHAR(60))), $precision)"
  def normalizeBooleanSql(expr: String): String =
    // CAST to VARCHAR matters: a bare CASE types as CHAR(1), and Derby's
    // COALESCE with the CHAR(6) '<null>' literal would unify to CHAR(6)
    // and PAD the '0'/'1' with five spaces inside the checksum concat
    s"CAST(CASE WHEN $expr THEN '1' WHEN NOT $expr THEN '0' END AS VARCHAR(1))"

  /** Approximate numerics cannot CHAR-cast in Derby at all — they go to the
    * double-typed Java helper directly (also the rounding-parity path). */
  override def normalizedColumnSql(colName: String, dt: DataType,
      fracPrecision: Int = 2, tsPrecision: Int = 6,
      stringClass: Option[String] = None): String = dt match {
    case DoubleType | FloatType =>
      s"GRAFT_NORM_DBL(CAST(${quote(colName)} AS DOUBLE), $fracPrecision)"
    case _ =>
      super.normalizedColumnSql(colName, dt, fracPrecision, tsPrecision, stringClass)
  }

  /** Derby has no ANSI datetime literals (`TIMESTAMP '...'` is a syntax
    * error); its literal forms are the TIMESTAMP()/DATE() functions. */
  override def timestampLiteral(ts: java.sql.Timestamp): String =
    s"TIMESTAMP('${timestampText(ts)}')"
  override def dateLiteral(d: java.sql.Date): String = s"DATE('$d')"

  /** Derby has no concat_ws; `||` with per-item COALESCE is the same
    * '|'-joined '<null>'-defaulted string byte for byte. */
  override def concatSql(normalized: Seq[String]): String =
    if (preventOverflowWhenConcat) super.concatSql(normalized)
    else normalized
      .map(e => s"COALESCE($e, '${Normalize.NullSentinel}')")
      .mkString(" || '|' || ")

  /** Derby's catalog is the SYS schema, not information_schema;
    * COLUMNDATATYPE text-renders as 'DECIMAL(12,2) NOT NULL'-style names
    * that `sparkType` already parses (the NOT NULL suffix is stripped in
    * `parseSchemaRow`). Unquoted identifiers fold to uppercase, so the
    * lookup name is uppercased — quoted-lowercase TABLE names would need
    * their exact case (column identifiers are unaffected; the profile
    * quotes them everywhere). */
  override def tableSchemaSql(table: String): String = {
    val parts = table.split('.')
    val name = parts.last.toUpperCase(java.util.Locale.ROOT)
    // catalog columns are always UCS_BASIC, but in a TERRITORY_BASED
    // database string literals collate with the current schema and Derby
    // refuses the mixed comparison outright — casting the CATALOG column
    // re-collates it to the current schema (Derby's documented remedy:
    // "CAST(tablename AS VARCHAR(128)) = 'T1'"), making the filter valid
    // under every database collation
    val schemaFilter =
      if (parts.length >= 2)
        s" AND CAST(s.SCHEMANAME AS VARCHAR(128)) = ${stringLit(parts(parts.length - 2).toUpperCase(java.util.Locale.ROOT))}"
      else ""
    "SELECT c.COLUMNNAME, CAST(c.COLUMNDATATYPE AS VARCHAR(255)), " +
      "CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER) " +
      "FROM SYS.SYSCOLUMNS c JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID " +
      "JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID " +
      s"WHERE CAST(t.TABLENAME AS VARCHAR(128)) = ${stringLit(name)}" +
      s"$schemaFilter ORDER BY c.COLUMNNUMBER"
  }

  override def parseSchemaRow(row: Seq[Option[String]]): Option[RawColumnInfo] =
    super.parseSchemaRow(row).map(i => i.copy(dataType = i.dataType.replace(" NOT NULL", "")))

  /** Derby has no LIMIT — FETCH FIRST is its ANSI spelling. */
  override def sampleSql(table: String, exprs: Seq[String], n: Int,
      where: Option[String] = None, orderBy: Option[String] = None): String =
    s"SELECT ${exprs.mkString(", ")} FROM $table" +
      s"${where.fold("")(w => s" WHERE $w")}" +
      s"${orderBy.fold("")(o => s" ORDER BY $o")} FETCH FIRST $n ROWS ONLY"

  /** Derby refuses GROUP BY <expression> (columns only), so the bucket CASE
    * moves into a derived table and the outer query groups by its column —
    * same statement count, same result shape. */
  override def segmentedChecksumSql(table: String, normalizedCols: Seq[String],
      segmentPreds: Seq[String], extraWhere: Option[String] = None): String = {
    require(segmentPreds.nonEmpty, "no segments")
    val bucket = segmentPreds.zipWithIndex
      .map { case (p, i) => s"WHEN $p THEN $i" }.mkString("CASE ", " ", " END")
    val cover = segmentPreds.map(p => s"($p)").mkString(" OR ")
    val w = extraWhere.fold(s"($cover)")(e => s"($cover) AND ($e)")
    s"SELECT seg, COUNT(*) AS cnt, SUM(ck) AS checksum FROM (" +
      s"SELECT $bucket AS seg, ${md5AsIntSql(concatSql(normalizedCols))} AS ck " +
      s"FROM $table WHERE $w) x GROUP BY seg"
  }

  /** One-time per-database install of the Java-backed helpers (idempotent
    * callers: ignore SQLState X0Y68 "already exists"). */
  val bootstrapSql: Seq[String] = {
    val base = "PARAMETER STYLE JAVA NO SQL LANGUAGE JAVA RETURNS NULL ON NULL INPUT"
    Seq(
      "CREATE FUNCTION GRAFT_MD5INT48(S VARCHAR(32672)) RETURNS BIGINT " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.md5Int48'",
      "CREATE FUNCTION GRAFT_MD5HEX(S VARCHAR(32672)) RETURNS VARCHAR(32) " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.md5Hex'",
      "CREATE FUNCTION GRAFT_NORM_TS(TS TIMESTAMP, P INTEGER) RETURNS VARCHAR(26) " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.normTimestamp'",
      "CREATE FUNCTION GRAFT_NORM_NUM(S VARCHAR(64), P INTEGER) RETURNS VARCHAR(80) " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.normNumber'",
      "CREATE FUNCTION GRAFT_NORM_DBL(V DOUBLE, P INTEGER) RETURNS VARCHAR(80) " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.normDouble'",
      "CREATE FUNCTION GRAFT_NONALNUM(S VARCHAR(32672)) RETURNS INTEGER " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.nonAlnum'",
      "CREATE FUNCTION GRAFT_HEX16(S VARCHAR(32672)) RETURNS VARCHAR(32) " +
        s"$base EXTERNAL NAME 'graft.sources.DerbyFunctions.hex16'")
  }

  override def nonAlnumPredicateSql(expr: String): Option[String] =
    Some(s"GRAFT_NONALNUM($expr) = 1")

  override def hexKeyProjectionSql(expr: String): Option[String] =
    Some(s"GRAFT_HEX16($expr)")

  /** Derby's unbounded character type (32700-char limit, vs VARCHAR's
    * 32672 cap with a mandatory length). */
  override def unboundedTextTypeSql: String = "LONG VARCHAR"

  /** Installed automatically by JdbcEngine on connect (X0Y68 swallowed),
    * so the CLI's `remote:jdbc:derby:<db>` route needs no out-of-band
    * setup. */
  override def connectBootstrapSql: Seq[String] = bootstrapSql
}
