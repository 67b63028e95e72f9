package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DerbyProfile, DuckDbProfile, MsSqlProfile, MySqlProfile, PostgresProfile, SourceProfile, SparkProfile, TrinoProfile}

class SourceProfileSpec extends AnyFunSuite {

  test("duckdb checksum query matches the gate-validated formula") {
    val sql = DuckDbProfile.checksumQuerySql("lineitem",
      Seq(DuckDbProfile.normalizeNumberSql("l_quantity", 2), "l_returnflag"))
    assert(sql.contains("('0x' || SUBSTRING(md5("))
    assert(sql.contains(", 21, 12))::BIGINT - 140737488355327"))
    assert(sql.contains("concat_ws('|', "))
    assert(sql.contains("COALESCE(((l_quantity)::DECIMAL(38, 2))::VARCHAR, '<null>')"))
    assert(sql.startsWith("SELECT COUNT(*) AS cnt, SUM("))
  }

  test("postgres profile renders the bit-cast checksum and canonical timestamp") {
    assert(PostgresProfile.md5AsIntSql("x") ==
      "('x' || substring(md5(x), 21))::bit(48)::bigint - 140737488355327")
    assert(PostgresProfile.normalizeTimestampSql("t", 6) ==
      "RPAD(LEFT(to_char((t)::timestamp(6), 'YYYY-mm-dd HH24:MI:SS.US'), 26), 26, '0')")
  }

  test("where clause lands in the pushed query") {
    val sql = DuckDbProfile.checksumQuerySql("t", Seq("c"), Some("id >= 10 AND id < 20"))
    assert(sql.endsWith("FROM t WHERE id >= 10 AND id < 20"))
  }

  test("mysql profile: conv() hex suffix, %f microsecond timestamp, backtick quoting") {
    assert(MySqlProfile.md5AsIntSql("x") ==
      "cast(conv(substring(md5(x), 21, 12), 16, 10) as signed) - 140737488355327")
    assert(MySqlProfile.normalizeTimestampSql("t", 6) ==
      "rpad(left(date_format(t, '%Y-%m-%d %H:%i:%S.%f'), 26), 26, '0')")
    assert(MySqlProfile.normalizeTimestampSql("t", 3) ==
      "rpad(left(date_format(t, '%Y-%m-%d %H:%i:%S.%f'), 23), 26, '0')")
    assert(MySqlProfile.quote("a") == "`a`")
  }

  test("trino profile: from_base hex suffix, timestamp(6) varchar rendering") {
    assert(TrinoProfile.md5AsIntSql("x") ==
      "from_base(substr(to_hex(md5(to_utf8(x))), 21, 12), 16) - 140737488355327")
    assert(TrinoProfile.normalizeTimestampSql("t", 6) ==
      "rpad(substr(cast(cast(t as timestamp(6)) as varchar), 1, 26), 26, '0')")
    assert(TrinoProfile.normalizeNumberSql("n", 2) ==
      "cast(cast(n as decimal(38, 2)) as varchar)")
  }

  test("registry resolves every profile by engine name") {
    assert(SourceProfile.registry.keySet ==
      Set("duckdb", "postgresql", "mysql", "trino", "presto", "snowflake",
        "bigquery", "clickhouse", "mssql", "oracle", "redshift", "vertica",
        "databricks", "spark", "derby", "hive2"))
    assert(SourceProfile.registry("mysql") eq MySqlProfile)
    assert(SourceProfile.registry("presto") eq TrinoProfile)
    assert(SourceProfile.registry("hive2") eq SparkProfile)
  }

  test("derby: java-backed functions, ||-concat, VARCHAR-typed boolean, decimal sum headroom") {
    assert(DerbyProfile.md5AsIntSql("x") == "CAST(GRAFT_MD5INT48(x) AS DECIMAL(31,0))")
    assert(DerbyProfile.concatSql(Seq("a", "b")) ==
      "COALESCE(a, '<null>') || '|' || COALESCE(b, '<null>')")
    // CHAR(1) CASE would pad to CHAR(6) against the '<null>' literal in
    // COALESCE — the VARCHAR cast is load-bearing (caught by the live fuzz)
    assert(DerbyProfile.normalizeBooleanSql("b") ==
      "CAST(CASE WHEN b THEN '1' WHEN NOT b THEN '0' END AS VARCHAR(1))")
    assert(DerbyProfile.normalizedColumnSql("x", org.apache.spark.sql.types.DoubleType) ==
      "GRAFT_NORM_DBL(CAST(\"x\" AS DOUBLE), 2)")
    assert(DerbyProfile.bootstrapSql.size == 7)
    assert(DerbyProfile.nonAlnumPredicateSql("\"k\"").contains("GRAFT_NONALNUM(\"k\") = 1"))
    assert(DerbyProfile.hexKeyProjectionSql("\"k\"").contains("GRAFT_HEX16(\"k\")"))
  }

  test("mssql: non-alnum probe pins a binary collation on both LIKE sides") {
    // Without COLLATE, [A-Za-z0-9] ranges follow the column's collation:
    // under a CI locale collation 'é' sorts inside a–z and the probe would
    // pass — licensing the case fold on exactly the keys it must refuse.
    assert(MsSqlProfile.nonAlnumPredicateSql("\"k\"").contains(
      "\"k\" COLLATE Latin1_General_BIN LIKE '%[^A-Za-z0-9]%' COLLATE Latin1_General_BIN"))
  }

  test("materialize DDL types follow each dialect's own alphabet") {
    import org.apache.spark.sql.types._
    import graft.sources.{ClickHouseProfile, MsSqlProfile, OracleProfile}
    // ANSI defaults
    assert(DuckDbProfile.sqlTypeSql(LongType) == "BIGINT")
    assert(DuckDbProfile.sqlTypeSql(TimestampType) == "TIMESTAMP")
    assert(DuckDbProfile.sqlTypeSql(DecimalType(12, 2)) == "DECIMAL(12, 2)")
    assert(DuckDbProfile.sqlTypeSql(StringType) == "VARCHAR") // unbounded
    assert(PostgresProfile.sqlTypeSql(StringType) == "TEXT")
    assert(MySqlProfile.sqlTypeSql(StringType) == "LONGTEXT")
    // dialects with their own spellings
    assert(MsSqlProfile.sqlTypeSql(DoubleType) == "FLOAT")
    assert(MsSqlProfile.sqlTypeSql(BooleanType) == "BIT")
    assert(MsSqlProfile.sqlTypeSql(StringType) == "NVARCHAR(MAX)")
    assert(OracleProfile.sqlTypeSql(LongType) == "NUMBER(19)")
    assert(OracleProfile.sqlTypeSql(BooleanType) == "NUMBER(1)")
    assert(OracleProfile.sqlTypeSql(StringType) == "CLOB")
    assert(ClickHouseProfile.sqlTypeSql(LongType) == "Int64")
    assert(ClickHouseProfile.sqlTypeSql(DoubleType) == "Float64")
    assert(ClickHouseProfile.sqlTypeSql(StringType) == "String")
    assert(SparkProfile.sqlTypeSql(DoubleType) == "DOUBLE")
    assert(SparkProfile.sqlTypeSql(StringType) == "STRING")
    assert(DerbyProfile.sqlTypeSql(StringType) == "LONG VARCHAR")
    // arrays/structs fall back to the text type (values stringified)
    assert(DuckDbProfile.sqlTypeSql(ArrayType(LongType)) == "VARCHAR")
  }

  test("segmented checksum groups by the repeated CASE expression, not position") {
    // Oracle treats GROUP BY 1 as a constant (ORA-00979) and T-SQL rejects
    // positional grouping — the repeated expression is valid on all dialects
    val sql = DuckDbProfile.segmentedChecksumSql("t", Seq("c"),
      Seq("id >= 0 AND id < 10", "id >= 10 AND id < 20"))
    val bucket = "CASE WHEN id >= 0 AND id < 10 THEN 0 WHEN id >= 10 AND id < 20 THEN 1 END"
    assert(sql.contains(s"SELECT $bucket AS seg"))
    assert(sql.endsWith(s"GROUP BY $bucket"))
    assert(!sql.contains("GROUP BY 1"))
  }

  test("date normalization routes through the timestamp canonical form") {
    assert(DuckDbProfile.normalizeDateSql("d") ==
      DuckDbProfile.normalizeTimestampSql("CAST(d AS TIMESTAMP)", 6))
  }
}
