package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DuckDbProfile, PostgresProfile}

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
}
