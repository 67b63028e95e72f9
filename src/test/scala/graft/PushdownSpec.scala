package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.diff.{JoinDiffer, KeySpace, Normalize, TableSegment}
import graft.operators.PushdownQueries
import graft.sources._

/** Golden renderings for the dialect profiles added in round 3 — each
  * md5→int48 formula is byte-identical to the reference's rendered SQL
  * (file:line cited on each profile object). */
class ProfilesSpec extends AnyFunSuite {
  private val Off = "140737488355327" // 2^47 - 1

  test("snowflake: md5_number_lower64 masked to 48 bits") {
    assert(SnowflakeProfile.md5AsIntSql("x") ==
      s"BITAND(md5_number_lower64(x), 281474976710655) - $Off")
  }

  test("bigquery: TO_HEX suffix through int64 to numeric") {
    assert(BigQueryProfile.md5AsIntSql("x") ==
      s"cast(cast( ('0x' || substr(TO_HEX(md5(x)), 21)) as int64) as numeric) - $Off")
    assert(BigQueryProfile.normalizeTimestampSql("t", 6) ==
      "FORMAT_TIMESTAMP('%F %H:%M:%E6S', t)")
    assert(BigQueryProfile.quote("a") == "`a`")
  }

  test("clickhouse: reinterpret of reversed unhexed suffix") {
    assert(ClickHouseProfile.md5AsIntSql("x") ==
      s"reinterpretAsUInt128(reverse(unhex(lowerUTF8(substr(hex(MD5(x)), 21))))) - $Off")
  }

  test("mssql: HashBytes over UTF-8 bytes, overflow-safe concat declared") {
    // the UTF-8-collated VARCHAR(MAX) cast inside HashBytes is deliberate:
    // NVARCHAR operands (T-SQL FORMAT output) would hash UTF-16LE bytes and
    // never match the other side's md5 over UTF-8, and a plain (code-page)
    // VARCHAR convert maps non-codepage chars to '?' so two DIFFERENT CJK
    // strings checksum EQUAL — a silently-missed MSSQL↔MSSQL diff. The
    // NVARCHAR hop before the UTF-8 cast keeps cp1252 varchar lossless.
    val u = "CAST(CONVERT(NVARCHAR(MAX), %s) COLLATE Latin1_General_100_BIN2_UTF8 AS VARCHAR(MAX))"
    assert(MsSqlProfile.md5AsIntSql("x") ==
      s"convert(bigint, convert(varbinary, '0x' + RIGHT(CONVERT(NVARCHAR(32), HashBytes('MD5', ${u.format("x")}), 2), 12), 1)) - $Off")
    assert(MsSqlProfile.preventOverflowWhenConcat)
    // each item md5-HEX-hashed (style-2 lowercase — raw VARBINARY could
    // never equal the other side's md5() hex); separators survive NULLs
    assert(MsSqlProfile.concatSql(Seq("a", "b")) ==
      s"concat(LOWER(CONVERT(VARCHAR(32), HashBytes('MD5', ${u.format("a")}), 2)), '|', LOWER(CONVERT(VARCHAR(32), HashBytes('MD5', ${u.format("b")}), 2)))")
    // single compare column: CONCAT needs >= 2 args — rendered bare
    assert(MsSqlProfile.concatSql(Seq("a")) ==
      s"COALESCE(LOWER(CONVERT(VARCHAR(32), HashBytes('MD5', ${u.format("a")}), 2)), '')")
    // canonical 26-char timestamp and separator-free decimal rendering
    assert(MsSqlProfile.normalizeTimestampSql("t", 3) ==
      "FORMAT(t, 'yyyy-MM-dd HH:mm:ss') + '.' + SUBSTRING(FORMAT(t, 'ffffff'), 1, 3) + REPLICATE('0', 3)")
    assert(MsSqlProfile.normalizeNumberSql("n", 2) ==
      "CONVERT(VARCHAR(50), CAST(n AS DECIMAL(38, 2)))")
  }

  test("oracle: standard_hash with to_number hex mask") {
    assert(OracleProfile.md5AsIntSql("x") ==
      s"to_number(substr(standard_hash(x, 'MD5'), 21), 'xxxxxxxxxxxxxxx') - $Off")
  }

  test("redshift: strtol into a decimal(38) sum domain") {
    assert(RedshiftProfile.md5AsIntSql("x") ==
      s"strtol(substring(md5(x), 21), 16)::decimal(38) - $Off")
  }

  test("vertica: HEX_TO_INTEGER as NUMERIC(38, 0)") {
    assert(VerticaProfile.md5AsIntSql("x") ==
      s"CAST(HEX_TO_INTEGER(SUBSTRING(MD5(x), 21)) AS NUMERIC(38, 0)) - $Off")
  }

  test("databricks: conv hex suffix as decimal(38, 0)") {
    assert(DatabricksProfile.md5AsIntSql("x") ==
      s"cast(conv(substr(md5(x), 21), 16, 10) as decimal(38, 0)) - $Off")
  }

  test("spark: conv hex suffix sums in decimal, not overflow-prone bigint") {
    assert(SparkProfile.md5AsIntSql("x") ==
      s"cast(conv(substring(md5(x), 21, 12), 16, 10) as decimal(38, 0)) - $Off")
  }

  test("alignPrecision negotiates timestamps to the min, fractions to the max") {
    import org.apache.spark.sql.types._
    val df = SparkTest.spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    val local = graft.diff.TableSegment(df, Seq("id"), Seq("v"),
      fracPrecision = 2, tsPrecision = 6)
    val remote = RemoteTable(new SparkViewEngine(SparkTest.spark), "t", Seq("id"),
      Seq("v"), df.schema, fracPrecision = 4, tsPrecision = 3)
    val (l2, r2) = graft.api.Graft.alignPrecision(local, remote)
    assert(l2.fracPrecision == 4 && r2.fracPrecision == 4) // max: pad, don't round
    assert(l2.tsPrecision == 3 && r2.tsPrecision == 3) // min: don't invent digits
  }

  test("uuid-classed text renders casing-canonical across profiles") {
    import org.apache.spark.sql.types.StringType
    assert(DuckDbProfile.normalizedColumnSql("u", StringType,
      stringClass = Some("uuid-upper")) == "LOWER(TRIM(\"u\"))")
    assert(MySqlProfile.normalizedColumnSql("u", StringType,
      stringClass = Some("uuid-lower")) == "LOWER(TRIM(`u`))")
    // plain text is untouched
    assert(SnowflakeProfile.normalizedColumnSql("u", StringType,
      stringClass = Some("text")) == "\"u\"")
    assert(OracleProfile.normalizedColumnSql("u", StringType) == "\"u\"")
  }

  test("uuid vs alphanumeric string-key detection") {
    assert(KeySpace.looksLikeUuid("123e4567-e89b-12d3-a456-426614174000"))
    assert(KeySpace.looksLikeUuid("123e4567e89b12d3a456426614174000"))
    assert(!KeySpace.looksLikeUuid("K1500"))
    assert(!KeySpace.looksLikeUuid("g23e4567e89b12d3a456426614174000")) // 'g' not hex
    // 36 chars, required dashes present but an EXTRA dash elsewhere
    assert(!KeySpace.looksLikeUuid("12345678-1234-1234-1234-12-345678901"))
    assert(KeySpace.parseStringKey("K15").isInstanceOf[KeySpace.AlphanumKey])
    assert(KeySpace.parseStringKey("123e4567-e89b-12d3-a456-426614174000")
      .isInstanceOf[KeySpace.UuidKey])
  }

  test("collation negotiation mirrors the reference's ordering rules") {
    val ordinal = Collation(ordinal = Some(true))
    val snowflakeLike = Collation(absorbsDamage = true,
      language = Some("en"), caseSensitive = Some(true))
    val localeCI = Collation(language = Some("en"), caseSensitive = Some(false))
    // two ordinal collations are equivalent regardless of other fields
    assert(Collation.negotiate(ordinal, Collation(ordinal = Some(true),
      language = Some("de"))) == Right(None))
    // a damage-absorbing engine converts: the NON-absorbing side is target
    assert(Collation.negotiate(localeCI, snowflakeLike) == Right(Some(localeCI)))
    // ordinal beats locale when neither absorbs damage
    assert(Collation.negotiate(ordinal, localeCI) == Right(Some(ordinal)))
    // incomparable locale pair → explicit error
    assert(Collation.negotiate(
      Collation(language = Some("en"), caseSensitive = Some(true)),
      Collation(language = Some("tr"), caseSensitive = Some(false))).isLeft)
  }

  test("bare-hex uuid keys render bounds bare; mixed columns fall back to base-66") {
    // bare 32-hex parses to UuidKey and renders back WITHOUT dashes, so
    // scan predicates compare against the stored textual form
    val bare = KeySpace.parseStringKey("00ab45cdef0123456789abcdef012345")
    assert(bare.isInstanceOf[KeySpace.UuidKey])
    assert(bare.next.toString == "00ab45cdef0123456789abcdef012346")
    // one value uuid-shaped, the other not → BOTH parse as base-66 (a
    // per-value choice would put a 128-bit min above a base-66 max)
    val mixed = KeySpace.parseStringKeysUniform(
      Seq("00ab45cdef0123456789abcdef012345", "K999"))
    assert(mixed.forall(_.isInstanceOf[KeySpace.AlphanumKey]))
    // dashed + bare uuid forms also mix → base-66 (forms sort differently)
    val forms = KeySpace.parseStringKeysUniform(
      Seq("123e4567-e89b-12d3-a456-426614174000", "123e4567e89b12d3a456426614174000"))
    assert(forms.forall(_.isInstanceOf[KeySpace.AlphanumKey]))
  }
}

/** End-to-end pushdown diffs: the full control loop (segment → push grouped
  * checksum SQL → prune → bisect → leaf-fetch → local compare) against a
  * Spark-SQL "remote" and against a live DuckDB process — the cross-engine
  * parity the reference's hashdiff exists for. */
class PushdownDifferSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  private val dir = "/root/testdata/sf0.001"

  private val keys = Seq("o_orderkey")
  private val compareCols =
    Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
  private val relevant = keys ++ compareCols

  private def orders: DataFrame =
    Tables.load(spark, dir, "orders").select(relevant.map(col): _*)

  /** Spark-side normalized string projection — what PushdownDiffer emits. */
  private def norm(df: DataFrame): DataFrame = {
    val cols = Normalize.normalizedCols(df.schema, relevant)
    df.select(relevant.zip(cols).map { case (n, c) => c.as(n) }: _*)
  }

  private def expectedDiff: Set[String] =
    JoinDiffer.diff(norm(orders), norm(PushdownQueries.clusterMutatedOrders(orders)),
      keys, compareCols)
      .collect().map(_.mkString("|")).toSet

  test("spark-view pushdown reproduces the joindiff rows and prunes clean segments") {
    val a = orders
    PushdownQueries.clusterMutatedOrders(a).createOrReplaceTempView("pd_spec_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_b", keys, compareCols, a.schema)
    // factor 4 / threshold 128 forces at least two bisection levels at 1500 rows
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, keys, compareCols), remote,
      bisectionFactor = 4, bisectionThreshold = 128)
    assert(out.collect().map(_.mkString("|")).toSet == expectedDiff)
    assert(stats.levels >= 2, s"expected recursion, got $stats")
    assert(stats.segmentsPruned > 0, s"expected clean segments pruned, got $stats")
    assert(stats.rowsFetched < a.count(), s"leaf fetch must not ship the whole table: $stats")
  }

  test("dense diff cuts over to bulk fetch + joindiff when early levels stop pruning") {
    // ~50% of rows differ, spread uniformly: every segment at every level
    // is dirty, so bisection can never prune — the remote would run
    // O(N/threshold) checksum statements for nothing. The cutover must
    // fire after denseCutoverAfterLevels (2) levels, issue FEWER remote
    // statements than pure bisection, and produce identical rows.
    import spark.implicits._
    val n = 32768
    val aRows = (1 to n).map(i => (i.toLong, s"v$i"))
    val a = aRows.toDF("k", "v")
    aRows.map { case (k, v) => if (k % 2 == 0) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("pd_dense_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_dense_b",
      Seq("k"), Seq("v"), a.schema)
    def run(ctrl: PushdownControl) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 64, control = ctrl)
    val (outCut, statsCut) = run(new PushdownControl())
    val (outBis, statsBis) = run(new PushdownControl(denseCutoverAfterLevels = Int.MaxValue))
    assert(statsCut.denseCutoverAtLevel.exists(_ <= 1), s"$statsCut")
    assert(statsBis.denseCutoverAtLevel.isEmpty && statsBis.levels > 2, s"$statsBis")
    assert(statsCut.remoteQueries < statsBis.remoteQueries,
      s"cutover must save remote statements: ${statsCut.remoteQueries} vs ${statsBis.remoteQueries}")
    val want = outBis.collect().map(_.mkString("|")).toSet
    assert(want.size == n && outCut.collect().map(_.mkString("|")).toSet == want)
  }

  test("remote-remote uuid keys with mismatched casing: segments align and prune, diff exact") {
    // Side A stores uppercase UUID PKs, side B lowercase — the exact
    // scenario uuid alignment exists for. Checksums and the leaf join
    // lower-case the key, so segmentation must too: cutting on RAW values
    // puts the same logical row in different boxes per side, nothing ever
    // prunes, and in progressive mode the two boxes can leaf at different
    // levels and emit a spurious -/+ pair for an identical row.
    import spark.implicits._
    def uuid(i: Int, up: Boolean) = {
      val u = new java.util.UUID(0x1000L + i.toLong, 0x1234L).toString
      if (up) u.toUpperCase(java.util.Locale.ROOT) else u
    }
    val n = 4000
    (1 to n).map(i => (uuid(i, true), s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("rr_uuid_a")
    (1 to n).map(i => (uuid(i, false), if (i % 500 == 0) s"v${i}X" else s"v$i"))
      .toDF("k", "v").createOrReplaceTempView("rr_uuid_b")
    val eng = new SparkViewEngine(spark)
    def side(t: String) = RemoteTable.introspect(eng, t, Seq("k"), Seq("v"))
    val (out, stats) = RemoteRemoteDiffer.diff(spark, side("rr_uuid_a"), side("rr_uuid_b"),
      bisectionFactor = 4, bisectionThreshold = 256,
      control = new PushdownControl(progressive = true))
    val rows = out.collect().map(_.mkString("|")).toSet
    // 8 mutated keys → 16 signed rows; identical rows must NOT surface as
    // cross-level phantom pairs
    assert(rows.size == 16, s"$stats\n${rows.take(8)}")
    assert(stats.segmentsPruned > 0, s"uuid-aligned segmentation must prune: $stats")
  }

  test("remote-remote dense cutover fetches a JDBC side as a partitioned scan") {
    // side A lives in a real JDBC engine: the cutover's bulk fetch must
    // ride spark.read.jdbc partition predicates (rows to executors), not
    // the text drain — and produce identical rows either way
    import spark.implicits._
    import graft.sources.{DerbyProfile, JdbcEngine, RemoteRepair}
    val n = 8192
    val url = "jdbc:derby:memory:rr_jdbc_" + java.util.UUID.randomUUID().toString.take(8)
    java.sql.DriverManager.getConnection(s"$url;create=true").close()
    val eng = new JdbcEngine(url, new java.util.Properties(), DerbyProfile)
    eng.update("CREATE TABLE t (\"k\" BIGINT, \"v\" VARCHAR(32))")
    val aRows = (1 to n).map(i => (i.toLong, s"v$i"))
    RemoteRepair.insertStatements(DerbyProfile, "t", Seq("k", "v"),
      aRows.map(r => org.apache.spark.sql.Row(r._1, r._2)).iterator, 512)
      .foreach(eng.update)
    aRows.map { case (k, v) => if (k % 2 == 0) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("rr_jdbc_b")
    val sideA = RemoteTable.introspect(eng, "t", Seq("k"), Seq("v"))
    val sideB = RemoteTable.introspect(new SparkViewEngine(spark), "rr_jdbc_b",
      Seq("k"), Seq("v"))
    val (out, stats) = RemoteRemoteDiffer.diff(spark, sideA, sideB,
      bisectionFactor = 4, bisectionThreshold = 64, control = new PushdownControl())
    assert(stats.denseCutoverAtLevel.isDefined, s"dense fixture must cut over: $stats")
    val rows = out.collect().map(_.mkString("|")).toSet
    assert(rows.size == n, s"n/2 mutated keys → n signed rows, got ${rows.size}")
    assert(rows.exists(_.startsWith("-|2|v2")) && rows.exists(_.startsWith("+|2|v2X")))
  }

  test("remote-remote dense diff cuts over the same way") {
    import spark.implicits._
    val n = 16384
    val aRows = (1 to n).map(i => (i.toLong, s"v$i"))
    aRows.toDF("k", "v").createOrReplaceTempView("rr_dense_a")
    aRows.map { case (k, v) => if (k % 2 == 0) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("rr_dense_b")
    val eng = new SparkViewEngine(spark)
    def side(t: String) = RemoteTable.introspect(eng, t, Seq("k"), Seq("v"))
    def run(ctrl: PushdownControl) = RemoteRemoteDiffer.diff(spark,
      side("rr_dense_a"), side("rr_dense_b"),
      bisectionFactor = 4, bisectionThreshold = 64, control = ctrl)
    val (outCut, statsCut) = run(new PushdownControl())
    val (outBis, statsBis) = run(new PushdownControl(denseCutoverAfterLevels = Int.MaxValue))
    assert(statsCut.denseCutoverAtLevel.exists(_ <= 1), s"$statsCut")
    assert(statsBis.denseCutoverAtLevel.isEmpty, s"$statsBis")
    assert(statsCut.remoteQueries < statsBis.remoteQueries, s"$statsCut vs $statsBis")
    val want = outBis.collect().map(_.mkString("|")).toSet
    assert(want.size == n && outCut.collect().map(_.mkString("|")).toSet == want)
  }

  test("scattered diffs bisect to leaves — dense cutover must NOT bulk-fetch the table") {
    // 32 single-row diffs spread one per 2048-key stripe: every segment at
    // the first two levels is dirty (prune rate 0 — exactly the profile the
    // dense-cutover candidacy sees), yet the table is 99.95% identical.
    // Cutting over here would bulk-fetch ~65k rows for a 32-diff job — the
    // O(N)-transfer-for-O(diff)-work failure mode that becomes a driver
    // outage at warehouse scale. The density probe must veto: sampled
    // children prune mostly clean, the loop keeps bisecting, and the leaf
    // fetch stays O(diff × threshold).
    import spark.implicits._
    val n = 65536
    val aRows = (1 to n).map(i => (i.toLong, s"v$i"))
    val a = aRows.toDF("k", "v")
    aRows.map { case (k, v) => if (k % 2048 == 1) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("pd_scatter_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_scatter_b",
      Seq("k"), Seq("v"), a.schema)
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 100,
      control = new PushdownControl())
    assert(stats.denseCutoverAtLevel.isEmpty,
      s"scattered diffs must never trigger the dense cutover: $stats")
    assert(stats.rowsFetched <= 4096,
      s"leaf fetch must be O(diff), not the whole table: $stats")
    assert(stats.segmentsPruned > stats.leafSegments, s"expected pruning: $stats")
    val rows = out.collect().map(_.mkString("|")).toSet
    assert(rows.size == 64, s"32 mutated keys → 64 signed rows, got ${rows.size}")
    assert(rows.exists(_.startsWith("-|1|v1")) && rows.exists(_.startsWith("+|1|v1X")))
  }

  test("quantile seeding: skewed key space converges in fewer levels, identical rows") {
    // Snowflake shape: 20k dense keys in [1, 20000] + 50 stragglers near
    // 10^12. The arithmetic level-0 split cuts [1, ~10^12] into equal-WIDTH
    // children, so every dense row lands in child 0 and the loop burns a
    // level (a remote round-trip each) per ~8x of key-space narrowing
    // before segments reach the threshold. Quantile seeds cut where the
    // rows are: level 0 starts row-balanced and the whole diff finishes
    // in 2-3 levels. Rows must be bit-identical either way — seeding only
    // re-partitions the root range.
    import spark.implicits._
    val aRows = (1 to 20000).map(i => (i.toLong, s"v$i")) ++
      (1 to 50).map(i => (1000000000000L + i * 9999L, s"t$i"))
    val a = aRows.toDF("k", "v")
    aRows.map { case (k, v) => if (k % 1024 == 1) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("pd_skew_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_skew_b",
      Seq("k"), Seq("v"), a.schema)
    def run(ctrl: PushdownControl) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 8, bisectionThreshold = 512, control = ctrl)
    val (outA, arith) = run(new PushdownControl(quantileSeed = false))
    val (outQ, quant) = run(new PushdownControl()) // seeding is the default
    val want = outA.collect().map(_.mkString("|")).toSet
    assert(want.nonEmpty && outQ.collect().map(_.mkString("|")).toSet == want)
    assert(quant.levels < arith.levels,
      s"quantile seeding must save levels: $quant vs $arith")
    assert(quant.remoteQueries < arith.remoteQueries,
      s"quantile seeding must save remote round-trips: $quant vs $arith")
    assert(quant.denseCutoverAtLevel.isEmpty,
      s"balanced segments with scattered diffs must not cut over: $quant")
  }

  test("quantile seeding on a uniform key space stays correct and comparable") {
    // No skew: seeding must not hurt — same rows, level count within one
    // of the arithmetic run (checkpoints land near the mid-points anyway).
    import spark.implicits._
    val aRows = (1 to 8192).map(i => (i.toLong, s"v$i"))
    val a = aRows.toDF("k", "v")
    aRows.map { case (k, v) => if (k % 997 == 1) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("pd_uni_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_uni_b",
      Seq("k"), Seq("v"), a.schema)
    def run(ctrl: PushdownControl) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 256, control = ctrl)
    val (outA, arith) = run(new PushdownControl(quantileSeed = false))
    val (outQ, quant) = run(new PushdownControl()) // seeding is the default
    assert(outQ.collect().map(_.mkString("|")).toSet ==
      outA.collect().map(_.mkString("|")).toSet)
    assert(quant.levels <= arith.levels + 1, s"$quant vs $arith")
  }

  test("alphanum max key all-'z': the exclusive upper bound must not sort below the keys") {
    // 'z' is the highest base-66 symbol, so max+1 carries into a LONGER
    // string starting at the low symbols ("zz"+1 = "-  ") that SQL-sorts
    // BELOW every key — the root box [lo, "-  ") would match nothing and
    // the diff silently report clean. AlphanumKey.next appends '-'
    // ("zz-") — above every key in binary, right-pad, AND PAD SPACE
    // orders (a trailing ' ' would compare EQUAL to the max key on
    // PAD SPACE engines and silently drop it).
    import spark.implicits._
    val chars = ('a' to 'z').map(_.toString)
    val keys = for (x <- chars; y <- chars) yield x + y // 676 keys incl "zz"
    val aRows = keys.zipWithIndex.map { case (k, i) => (k, s"v$i") }
    val a = aRows.toDF("k", "v")
    aRows.map { case (k, v) => if (k.last == 'q' || k == "zz") (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("pd_ztop_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_ztop_b",
      Seq("k"), Seq("v"), a.schema)
    val (out, _) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 64)
    val want = JoinDiffer.diff(a, spark.table("pd_ztop_b"), Seq("k"), Seq("v"))
      .collect().map(_.mkString("|")).toSet
    assert(want.size == 54, s"27 mutated keys → 54 signed rows, got ${want.size}")
    assert(out.collect().map(_.mkString("|")).toSet == want)
    // splitByKeyRange coverage on the same top-of-alphabet shape,
    // including a single-distinct-key table (0-width range after the
    // SQL-order successor)
    val parts = TableSegment(a, Seq("k")).splitByKeyRange(5)
    assert(parts.map(_.scoped.count()).sum == 676)
    val single = Seq(("zz", 1L)).toDF("k", "v")
    val sp = TableSegment(single, Seq("k")).splitByKeyRange(4)
    assert(sp.map(_.scoped.count()).sum == 1)
  }

  test("quantileSeed falls back to arithmetic when sampled checkpoints leave base-66") {
    // interior keys carry '.', which the base-66 arithmetic cannot
    // represent; the min/max happen to parse, so the root box builds —
    // a sampled checkpoint with a dot must NOT kill the diff, just send
    // that parent to the arithmetic split
    import spark.implicits._
    val keys = Seq("a0", "zz") ++ (1 to 800).map(i => f"m.$i%05d")
    val aRows = keys.zipWithIndex.map { case (k, i) => (k, s"v$i") }
    val a = aRows.toDF("k", "v")
    aRows.map { case (k, v) => if (v.stripPrefix("v").toInt % 7 == 0) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("pd_dot_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_dot_b",
      Seq("k"), Seq("v"), a.schema)
    def run(ctrl: PushdownControl) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 64, control = ctrl)
    val (outA, _) = run(new PushdownControl(quantileSeed = false))
    val (outQ, _) = run(new PushdownControl()) // seeding is the default
    val want = outA.collect().map(_.mkString("|")).toSet
    assert(want.nonEmpty && outQ.collect().map(_.mkString("|")).toSet == want)
  }

  test("remote-remote scattered diffs bisect to leaves the same way") {
    import spark.implicits._
    val n = 16384
    val aRows = (1 to n).map(i => (i.toLong, s"v$i"))
    aRows.toDF("k", "v").createOrReplaceTempView("rr_scatter_a")
    aRows.map { case (k, v) => if (k % 512 == 1) (k, v + "X") else (k, v) }
      .toDF("k", "v").createOrReplaceTempView("rr_scatter_b")
    val eng = new SparkViewEngine(spark)
    def side(t: String) = RemoteTable.introspect(eng, t, Seq("k"), Seq("v"))
    val (out, stats) = RemoteRemoteDiffer.diff(spark,
      side("rr_scatter_a"), side("rr_scatter_b"),
      bisectionFactor = 4, bisectionThreshold = 100,
      control = new PushdownControl())
    assert(stats.denseCutoverAtLevel.isEmpty,
      s"scattered diffs must never trigger the dense cutover: $stats")
    assert(stats.rowsFetched <= 8192,
      s"leaf fetch must be O(diff), not the whole table: $stats")
    assert(out.collect().map(_.mkString("|")).toSet.size == 64)
  }

  test("identical sides prune every segment with zero rows fetched") {
    val a = orders
    a.createOrReplaceTempView("pd_spec_same")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_same", keys, compareCols, a.schema)
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, keys, compareCols), remote,
      bisectionFactor = 8, bisectionThreshold = 256)
    assert(out.isEmpty)
    assert(stats.leafSegments == 0 && stats.rowsFetched == 0)
    assert(stats.remoteQueries == 2, s"one key-range + one level-0 round-trip: $stats")
  }

  // ---- live DuckDB over the process bridge -------------------------------

  private val bridgeScript = DuckDbProcess.BridgeScript

  /** The mutated b-side as DuckDB SQL — same transform as
    * PushdownQueries.clusterMutatedOrders. */
  private val duckMutatedView =
    s"""CREATE OR REPLACE VIEW pd_duck_b AS
       |SELECT o_orderkey, o_custkey,
       |  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 3000 AND o_orderkey % 11 = 0
       |       THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       |  CASE WHEN o_orderkey >= 1000 AND o_orderkey < 3000 AND o_orderkey % 7 = 0
       |       THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
       |  o_orderdate, o_orderpriority
       |FROM read_parquet('$dir/orders.parquet')
       |WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 3000 AND o_orderkey % 13 = 0)""".stripMargin

  private def withDuck[T](profile: SourceProfile)(f: RemoteEngine => T): T = {
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), profile)
    try { eng.query(duckMutatedView); f(eng) } finally eng.close()
  }

  test("live DuckDB pushdown: cross-engine checksums drive the same diff") {
    withDuck(DuckDbProfile) { eng =>
      val a = orders
      val remote = RemoteTable(eng, "pd_duck_b", keys, compareCols, a.schema)
      val (out, stats) = PushdownDiffer.diffWithStats(
        TableSegment(a, keys, compareCols), remote,
        bisectionFactor = 4, bisectionThreshold = 128)
      assert(out.collect().map(_.mkString("|")).toSet == expectedDiff)
      assert(stats.segmentsPruned > 0, s"cross-engine checksums failed to prune: $stats")
    }
  }

  test("remote-remote: two SQL engines in different dialects, Spark only coordinating") {
    // side A: a Spark-SQL engine (SparkProfile dialect) holding the
    // original; side B: a live DuckDB process holding the mutated copy —
    // neither side is read by Spark directly, checksums and leaf rows all
    // arrive via each engine's own SQL rendering
    orders.createOrReplaceTempView("pd_rr_a")
    withDuck(DuckDbProfile) { eng =>
      val a = RemoteTable.introspect(new SparkViewEngine(spark), "pd_rr_a", keys, compareCols)
      val b = RemoteTable.introspect(eng, "pd_duck_b", keys, compareCols)
      val tp = math.min(a.tsPrecision, b.tsPrecision)
      val fp = math.max(a.fracPrecision, b.fracPrecision)
      val (out, stats) = RemoteRemoteDiffer.diff(spark,
        a.copy(fracPrecision = fp, tsPrecision = tp),
        b.copy(fracPrecision = fp, tsPrecision = tp),
        bisectionFactor = 4, bisectionThreshold = 128)
      assert(out.collect().map(_.mkString("|")).toSet == expectedDiff)
      assert(stats.segmentsPruned > 0, s"cross-engine checksums failed to prune: $stats")
      assert(stats.rowsFetched < 2 * orders.count(),
        s"leaf fetch must not download both tables: $stats")
      // the public API path wires introspection + alignment the same way
      val api = graft.api.Graft.diffRemotes(spark, new SparkViewEngine(spark), "pd_rr_a",
        eng, "pd_duck_b", keys, compareCols, bisectionFactor = 4, bisectionThreshold = 128)
      assert(api.collect().map(_.mkString("|")).toSet == expectedDiff)
    }
  }

  test("remote-remote: an empty side emits every row one-signed; two empty sides emit nothing") {
    orders.limit(50).createOrReplaceTempView("rr_small")
    orders.where(lit(false)).createOrReplaceTempView("rr_empty")
    val eng = new SparkViewEngine(spark)
    val out = graft.api.Graft.diffRemotes(spark, eng, "rr_small", eng, "rr_empty",
      keys, compareCols, bisectionFactor = 4, bisectionThreshold = 32).collect()
    assert(out.length == 50 && out.forall(_.getString(0) == "-"))
    val none = graft.api.Graft.diffRemotes(spark, eng, "rr_empty", eng, "rr_empty",
      keys, compareCols, bisectionFactor = 4, bisectionThreshold = 32).collect()
    assert(none.isEmpty)
  }

  test("progressive mode emits leaf diff rows per level, earliest level first, union = batch result") {
    import spark.implicits._
    // non-uniform key density: a sparse far cluster leafs at level 0 while
    // the dense region keeps bisecting — so first diff rows MUST surface
    // several levels before the loop finishes
    val aRows = (1 to 512).map(i => (i.toLong, s"v$i")) ++
      Seq((4000L, "s1"), (4200L, "s2"), (4400L, "s3"), (4600L, "s4"), (4800L, "s5"))
    val bRows = aRows.map { case (k, v) =>
      if (k == 4200L) (k, "s2X") else if (k <= 512 && k % 50 == 0) (k, v + "X") else (k, v)
    }
    val a = aRows.toDF("k", "v")
    bRows.toDF("k", "v").createOrReplaceTempView("pd_prog_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_prog_b",
      Seq("k"), Seq("v"), a.schema)
    var seen = Vector.empty[(Int, Set[String])]
    // arithmetic splits: this test pins multi-level emission ORDER, and
    // quantile seeding (the default) converges this shape in too few
    // levels to observe it
    val ctrl = new PushdownControl(progressive = true, quantileSeed = false) {
      override def onLeafDiff(level: Int, d: DataFrame): Unit =
        seen :+= ((level, d.collect().map(_.mkString("|")).toSet))
    }
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 64, control = ctrl)
    def normKV(df: DataFrame): DataFrame = {
      val cols = Normalize.normalizedCols(df.schema, Seq("k", "v"))
      df.select(Seq("k", "v").zip(cols).map { case (nm, c) => c.as(nm) }: _*)
    }
    val want = JoinDiffer.diff(normKV(a), normKV(bRows.toDF("k", "v")), Seq("k"), Seq("v"))
      .collect().map(_.mkString("|")).toSet
    // emission order: strictly ascending levels, first emission well before
    // the loop's final level, and nothing emitted twice
    val levels = seen.map(_._1)
    assert(seen.size >= 2, s"expected multi-level emission, got levels $levels")
    assert(levels == levels.sorted && levels.distinct == levels, s"levels out of order: $levels")
    assert(levels.head < stats.levels - 1,
      s"first emission (level ${levels.head}) should precede the last level (${stats.levels - 1})")
    assert(seen.map(_._2.size).sum == want.size, "a row emitted in two levels (or lost)")
    assert(seen.flatMap(_._2).toSet == want)
    // the returned frame is the same union
    assert(out.collect().map(_.mkString("|")).toSet == want)
    assert(stats.segmentsPruned > 0 && stats.leafSegments > 0, s"$stats")
  }

  test("case-insensitive remote collation: segmentation folds, diff still exact, clean segments prune") {
    // The common warehouse hazard: the remote's text PK is under a
    // case-insensitive collation (here a real DuckDB NOCASE column), so raw
    // string bounds select DIFFERENT row sets on each engine. The differ
    // must case-fold segmentation on both sides and still produce the exact
    // raw-value diff — including a case-only key difference reported as a
    // genuine -/+ pair, never masked.
    import spark.implicits._
    val n = 600
    def keyOf(i: Int): String = f"${if (i % 3 == 0) "k" else "K"}${i}%03d"
    val aRows = (1 to n).map(i => (keyOf(i), s"v$i"))
    val bRows = (1 to n).flatMap { i =>
      if (i == 77) None                                  // deleted remotely
      else if (i == 99) Some((keyOf(i).toUpperCase, s"v$i")) // case-flipped key (k099 → K099)
      else if (i % 7 == 0 && i >= 200 && i <= 300) Some((keyOf(i), s"v${i}X"))
      else Some((keyOf(i), s"v$i"))
    }
    val a = aRows.toDF("k", "v")
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      eng.query("CREATE TABLE ci_b (k VARCHAR COLLATE NOCASE, v VARCHAR)")
      eng.query("INSERT INTO ci_b VALUES " +
        bRows.map { case (k, v) => s"('$k', '$v')" }.mkString(", "))
      val ciCollation = Collation(ordinal = Some(false),
        caseSensitive = Some(false), accentSensitive = Some(true))
      val remote = RemoteTable(eng, "ci_b", Seq("k"), Seq("v"), a.schema,
        keyCollation = ciCollation)
      val (out, stats) = PushdownDiffer.diffWithStats(
        TableSegment(a, Seq("k"), Seq("v")), remote,
        bisectionFactor = 4, bisectionThreshold = 32)
      def normKV(df: DataFrame): DataFrame = {
        val cols = Normalize.normalizedCols(df.schema, Seq("k", "v"))
        df.select(Seq("k", "v").zip(cols).map { case (nm, c) => c.as(nm) }: _*)
      }
      val want = JoinDiffer.diff(normKV(a), normKV(bRows.toDF("k", "v")), Seq("k"), Seq("v"))
        .collect().map(_.mkString("|")).toSet
      val got = out.collect().map(_.mkString("|")).toSet
      assert(got == want)
      // the case-flipped key surfaces as both raw sides, not silently equal
      assert(got.exists(_.startsWith("-|k099")) && got.exists(_.startsWith("+|K099")),
        s"case flip must be reported raw, got $got")
      assert(stats.segmentsPruned > 0,
        s"folded cross-engine checksums failed to prune clean segments: $stats")
    } finally eng.close()
  }

  test("remote-remote progressive mode emits per level and unions to the batch result") {
    import spark.implicits._
    // same non-uniform shape as the pushdown progressive spec: the sparse
    // far cluster leafs at level 0, the dense region keeps bisecting
    val aRows = (1 to 512).map(i => (i.toLong, s"v$i")) ++
      Seq((4000L, "s1"), (4200L, "s2"), (4400L, "s3"), (4600L, "s4"), (4800L, "s5"))
    val bRows = aRows.map { case (k, v) =>
      if (k == 4200L) (k, "s2X") else if (k <= 512 && k % 50 == 0) (k, v + "X") else (k, v)
    }
    aRows.toDF("k", "v").createOrReplaceTempView("rr_prog_a")
    bRows.toDF("k", "v").createOrReplaceTempView("rr_prog_b")
    var seen = Vector.empty[(Int, Set[String])]
    // arithmetic splits: the multi-level emission this spec pins is an
    // artifact of UNEVEN segment sizes — quantile seeding balances the
    // splits so well that everything leafs at one level (the seeded
    // progressive contract is asserted separately below)
    val ctrl = new PushdownControl(progressive = true, quantileSeed = false) {
      override def onLeafDiff(level: Int, d: DataFrame): Unit =
        seen :+= ((level, d.collect().map(_.mkString("|")).toSet))
    }
    val eng = new SparkViewEngine(spark)
    val out = graft.api.Graft.diffRemotes(spark, eng, "rr_prog_a", eng, "rr_prog_b",
      Seq("k"), Seq("v"), bisectionFactor = 4, bisectionThreshold = 64, control = ctrl)
    def normKV(df: DataFrame): DataFrame = {
      val cols = Normalize.normalizedCols(df.schema, Seq("k", "v"))
      df.select(Seq("k", "v").zip(cols).map { case (nm, c) => c.as(nm) }: _*)
    }
    val want = JoinDiffer.diff(normKV(aRows.toDF("k", "v")), normKV(bRows.toDF("k", "v")),
      Seq("k"), Seq("v")).collect().map(_.mkString("|")).toSet
    val levels = seen.map(_._1)
    assert(seen.size >= 2 && levels == levels.sorted && levels.distinct == levels,
      s"emission levels out of order: $levels")
    assert(seen.flatMap(_._2).toSet == want)
    assert(seen.map(_._2.size).sum == want.size, "a row emitted twice (or lost)")
    assert(out.collect().map(_.mkString("|")).toSet == want)
    // seeded progressive run (the default): per-level emissions must still
    // union to exactly the batch result with no duplicates
    var seenSeeded = Vector.empty[Set[String]]
    val ctrlSeeded = new PushdownControl(progressive = true) {
      override def onLeafDiff(level: Int, d: DataFrame): Unit =
        seenSeeded :+= d.collect().map(_.mkString("|")).toSet
    }
    val outSeeded = graft.api.Graft.diffRemotes(spark, eng, "rr_prog_a", eng, "rr_prog_b",
      Seq("k"), Seq("v"), bisectionFactor = 4, bisectionThreshold = 64, control = ctrlSeeded)
    assert(seenSeeded.flatMap(_.toSeq).toSet == want)
    assert(seenSeeded.map(_.size).sum == want.size, "a row emitted twice (or lost)")
    assert(outSeeded.collect().map(_.mkString("|")).toSet == want)
  }

  test("remote-remote with one case-insensitive side folds BOTH engines' segmentation") {
    // side A: ordinal Spark SQL; side B: live DuckDB NOCASE. Bounds are
    // generated in folded space, so the ordinal side must fold too or its
    // raw mixed-case keys fall outside the folded bounds.
    import spark.implicits._
    val n = 400
    def keyOf(i: Int): String = f"${if (i % 3 == 0) "r" else "R"}$i%03d"
    val aRows = (1 to n).map(i => (keyOf(i), s"v$i"))
    // mutations CLUSTERED in one slice of the key space: under the default
    // quantile seeding segments are balanced by construction, so uniformly
    // scattered diffs (old i % 11) would dirty every leaf and nothing
    // could ever prune — clean segments must exist under ANY split shape
    // for the prune assertion to test folding rather than the splitter
    val bRows = (1 to n).map { i =>
      if (i >= 100 && i < 140 && i % 3 == 0) (keyOf(i), s"v${i}X") else (keyOf(i), s"v$i")
    }
    aRows.toDF("k", "v").createOrReplaceTempView("rr_ci_a")
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      eng.query("CREATE TABLE rr_ci_b (k VARCHAR COLLATE NOCASE, v VARCHAR)")
      eng.query("INSERT INTO rr_ci_b VALUES " +
        bRows.map { case (k, v) => s"('$k', '$v')" }.mkString(", "))
      val ci = Collation(ordinal = Some(false),
        caseSensitive = Some(false), accentSensitive = Some(true))
      val ta = RemoteTable.introspect(new SparkViewEngine(spark), "rr_ci_a", Seq("k"), Seq("v"))
      val tb = RemoteTable.introspect(eng, "rr_ci_b", Seq("k"), Seq("v"))
        .copy(keyCollation = ci)
      val tp = math.min(ta.tsPrecision, tb.tsPrecision)
      val fp = math.max(ta.fracPrecision, tb.fracPrecision)
      val (out, stats) = RemoteRemoteDiffer.diff(spark,
        ta.copy(fracPrecision = fp, tsPrecision = tp),
        tb.copy(fracPrecision = fp, tsPrecision = tp),
        bisectionFactor = 4, bisectionThreshold = 32)
      def normKV(df: DataFrame): DataFrame = {
        val cols = Normalize.normalizedCols(df.schema, Seq("k", "v"))
        df.select(Seq("k", "v").zip(cols).map { case (nm, c) => c.as(nm) }: _*)
      }
      val want = JoinDiffer.diff(normKV(aRows.toDF("k", "v")), normKV(bRows.toDF("k", "v")),
        Seq("k"), Seq("v")).collect().map(_.mkString("|")).toSet
      assert(out.collect().map(_.mkString("|")).toSet == want)
      assert(stats.segmentsPruned > 0,
        s"folded cross-engine checksums failed to prune: $stats")
    } finally eng.close()
  }

  test("remote-remote snowflake-ID keys: quantile seeding saves levels AND round-trips " +
      "(live Derby × DuckDB)") {
    // Both engines live, neither Spark-readable: side A in embedded Derby,
    // side B in a DuckDB process. Keys are snowflake-style — one key at 1,
    // the rest packed into a ~20k-wide sliver near 1e12 — so arithmetic
    // mid-width splits burn a level per factor× of key-WIDTH narrowing
    // toward the sliver, each level one checksum round-trip on BOTH
    // engines. The seeded run (quantileSeed default) samples the larger
    // engine ORDER BY md5-of-key, cuts where the rows actually are, and
    // must produce bit-identical rows in strictly fewer levels and fewer
    // total remote statements.
    assume(scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess,
      "no Derby driver on the classpath")
    import graft.sources.{DerbyProfile, JdbcEngine, RemoteRepair}
    val n = 20000
    def keyOf(i: Int): Long = if (i == 1) 1L else 1000000000000L + i
    val url = "jdbc:derby:memory:rr_sf_" + java.util.UUID.randomUUID().toString.take(8)
    java.sql.DriverManager.getConnection(s"$url;create=true").close()
    val derby = new JdbcEngine(url, new java.util.Properties(), DerbyProfile)
    val duck = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      derby.update("CREATE TABLE rr_sf_a (\"k\" BIGINT, \"v\" VARCHAR(32))")
      RemoteRepair.insertStatements(DerbyProfile, "rr_sf_a", Seq("k", "v"),
        (1 to n).iterator.map(i => org.apache.spark.sql.Row(keyOf(i), s"v$i")), 1024)
        .foreach(derby.update)
      duck.query(
        s"""CREATE TABLE rr_sf_b AS
           |SELECT CASE WHEN i = 1 THEN 1 ELSE 1000000000000 + i END AS k,
           |       CASE WHEN i % 1000 = 0 THEN 'v' || i || 'X' ELSE 'v' || i END AS v
           |FROM range(1, ${n + 1}) t(i)""".stripMargin)
      val ta = RemoteTable.introspect(derby, "rr_sf_a", Seq("k"), Seq("v"))
      val tb = RemoteTable.introspect(duck, "rr_sf_b", Seq("k"), Seq("v"))
      val tp = math.min(ta.tsPrecision, tb.tsPrecision)
      val fp = math.max(ta.fracPrecision, tb.fracPrecision)
      def run(ctrl: PushdownControl) = RemoteRemoteDiffer.diff(spark,
        ta.copy(fracPrecision = fp, tsPrecision = tp),
        tb.copy(fracPrecision = fp, tsPrecision = tp),
        bisectionFactor = 4, bisectionThreshold = 256, control = ctrl)
      val (outSeed, statsSeed) = run(new PushdownControl()) // seeding is the default
      val (outArith, statsArith) = run(new PushdownControl(quantileSeed = false))
      val want = (1 to n).filter(_ % 1000 == 0).flatMap(i =>
        Seq(s"-|${keyOf(i)}|v$i", s"+|${keyOf(i)}|v${i}X")).toSet
      assert(outArith.collect().map(_.mkString("|")).toSet == want, s"$statsArith")
      assert(outSeed.collect().map(_.mkString("|")).toSet == want,
        s"seeded rows must be bit-identical: $statsSeed")
      assert(statsSeed.denseCutoverAtLevel.isEmpty && statsArith.denseCutoverAtLevel.isEmpty,
        s"scattered fixture must bisect, not cut over: $statsSeed / $statsArith")
      assert(statsSeed.levels < statsArith.levels,
        s"seeding must save whole levels: ${statsSeed.levels} vs ${statsArith.levels}")
      assert(statsSeed.remoteQueries < statsArith.remoteQueries,
        s"seeding must save total round-trips: " +
          s"${statsSeed.remoteQueries} vs ${statsArith.remoteQueries}")
    } finally { derby.close(); duck.close() }
  }

  test("remote-remote with an incomparable-collation side segments via the hex projection") {
    // side B declares a full locale collation (incomparable with binary; no
    // case fold repairs it) and its keys carry '-'/'_' — both engines must
    // segment over the hex projection and the diff must stay exact
    import spark.implicits._
    val n = 300
    def keyOf(i: Int): String = f"${if (i % 3 == 0) "r-" else "R_"}$i%03d"
    val aRows = (1 to n).map(i => (keyOf(i), s"v$i"))
    val bRows = (1 to n).map(i =>
      if (i % 11 == 0) (keyOf(i), s"v${i}X") else (keyOf(i), s"v$i"))
    aRows.toDF("k", "v").createOrReplaceTempView("rr_hex_a")
    bRows.toDF("k", "v").createOrReplaceTempView("rr_hex_b")
    val territory = Collation(ordinal = Some(false), language = Some("en"),
      country = Some("US"), caseSensitive = Some(true), accentSensitive = Some(true))
    val eng = new SparkViewEngine(spark)
    val ta = RemoteTable.introspect(eng, "rr_hex_a", Seq("k"), Seq("v"))
    val tb = RemoteTable.introspect(eng, "rr_hex_b", Seq("k"), Seq("v"))
      .copy(keyCollation = territory)
    val (out, stats) = RemoteRemoteDiffer.diff(spark, ta, tb,
      bisectionFactor = 4, bisectionThreshold = 32)
    def normKV(df: DataFrame): DataFrame = {
      val cols = Normalize.normalizedCols(df.schema, Seq("k", "v"))
      df.select(Seq("k", "v").zip(cols).map { case (nm, c) => c.as(nm) }: _*)
    }
    val want = JoinDiffer.diff(normKV(aRows.toDF("k", "v")), normKV(bRows.toDF("k", "v")),
      Seq("k"), Seq("v")).collect().map(_.mkString("|")).toSet
    assert(want.nonEmpty && out.collect().map(_.mkString("|")).toSet == want)
    assert(stats.segmentsPruned > 0,
      s"projected cross-engine checksums failed to prune: $stats")
  }

  test("collation beyond case damage segments via the hex projection") {
    // accent-insensitive orderings can merge keys no case fold separates —
    // previously a loud refusal; now the hex projection absorbs the whole
    // incomparable class (identical sides must still diff empty through
    // projected segmentation)
    val a = orders.limit(10).withColumn("o_orderpriority", col("o_orderpriority"))
    val txt = a.select(col("o_orderkey").cast("string").as("k"), col("o_orderpriority").as("v"))
    txt.createOrReplaceTempView("pd_ai_b")
    val accentInsensitive = Collation(ordinal = Some(false),
      caseSensitive = Some(false), accentSensitive = Some(false))
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_ai_b",
      Seq("k"), Seq("v"), txt.schema, keyCollation = accentInsensitive)
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(txt, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 64)
    assert(out.isEmpty && stats.rowsFetched == 0, s"$stats")
  }

  test("overflow-safe concat mode stays bit-compatible cross-engine") {
    // DuckDB with the MSSQL-style overflow-safe concat: every segment of an
    // unchanged table must still checksum-equal the Spark side, proving
    // Checksum.rowChecksumOverflowSafe mirrors the remote rendering.
    val overflowDuck = new SourceProfile {
      val name = "duckdb-overflow"
      override def preventOverflowWhenConcat: Boolean = true
      def toStringSql(e: String) = DuckDbProfile.toStringSql(e)
      def md5AsIntSql(e: String) = DuckDbProfile.md5AsIntSql(e)
      def normalizeTimestampSql(e: String, p: Int) = DuckDbProfile.normalizeTimestampSql(e, p)
      def normalizeNumberSql(e: String, p: Int) = DuckDbProfile.normalizeNumberSql(e, p)
      def normalizeBooleanSql(e: String) = DuckDbProfile.normalizeBooleanSql(e)
    }
    withDuck(overflowDuck) { eng =>
      val a = orders
      val remote = RemoteTable(eng, "pd_duck_b", keys, compareCols, a.schema)
      val (out, _) = PushdownDiffer.diffWithStats(
        TableSegment(a, keys, compareCols), remote,
        bisectionFactor = 8, bisectionThreshold = 256)
      val expected = JoinDiffer.diff(norm(orders),
        norm(PushdownQueries.clusterMutatedOrders(orders)), keys, compareCols)
        .collect().map(_.mkString("|")).toSet
      assert(out.collect().map(_.mkString("|")).toSet == expected)
    }
  }

  test("compound keys (with a negative component) bisect as a 2-D mesh") {
    // (k1, k2) with k1 ∈ [-3, 3]: the reference's compound-key scenarios
    // include negative ints (tests/test_diff_tables.py). k1 is derived from
    // the unique key, so the pair is unique.
    val base = orders.select(
      (col("o_orderkey") % 7 - 3).cast("long").as("k1"),
      col("o_orderkey").cast("long").as("k2"),
      col("o_totalprice"))
    // clustered in k2 < 300 (sf0.001 keys are DENSE 0..1499) so the boxes
    // covering higher k2 ranges verify clean and prune
    val mutated = base.withColumn("o_totalprice",
      when(col("k2") % 5 === 0 && col("k2") < 300, col("o_totalprice") + 2.0)
        .otherwise(col("o_totalprice")))
    mutated.createOrReplaceTempView("pd_spec_compound")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_compound",
      Seq("k1", "k2"), Seq("o_totalprice"), base.schema)
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(base, Seq("k1", "k2"), Seq("o_totalprice")), remote,
      bisectionFactor = 3, bisectionThreshold = 128)
    val cols = Seq("k1", "k2", "o_totalprice")
    def norm2(df: DataFrame) = {
      val nc = Normalize.normalizedCols(df.schema, cols)
      df.select(cols.zip(nc).map { case (n, c) => c.as(n) }: _*)
    }
    val expected = JoinDiffer.diff(norm2(base), norm2(mutated), Seq("k1", "k2"), Seq("o_totalprice"))
      .collect().map(_.mkString("|")).toSet
    assert(out.collect().map(_.mkString("|")).toSet == expected)
    assert(stats.segmentsPruned > 0)
  }

  test("alphanumeric string keys drive a live-DuckDB pushdown end to end") {
    // 'K' || o_orderkey: varying-length base-66 keys whose SQL order differs
    // from numeric order — segment bounds must still be valid predicates on
    // BOTH engines (the reference's varying-alphanum scenarios).
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      eng.query(
        s"""CREATE OR REPLACE VIEW pd_duck_alpha AS
           |SELECT 'K' || o_orderkey::VARCHAR AS k,
           |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 2.0 ELSE o_totalprice END AS o_totalprice
           |FROM read_parquet('$dir/orders.parquet')""".stripMargin)
      val base = orders.select(
        concat(lit("K"), col("o_orderkey").cast("string")).as("k"), col("o_totalprice"))
      val remote = RemoteTable(eng, "pd_duck_alpha", Seq("k"), Seq("o_totalprice"), base.schema)
      // uniform %5 mutations would fire the dense cutover at level 0; this
      // test probes string-key ARITHMETIC bisection mechanics (base-66
      // checkpoint predicates on both engines), so disable the cutover
      // and the quantile seeding default (whose balanced segments leave
      // no empty arithmetic slivers to prune on this everywhere-dirty
      // shape — the pruned>0 assertion is about predicate validity)
      val (out, stats) = PushdownDiffer.diffWithStats(
        TableSegment(base, Seq("k"), Seq("o_totalprice")), remote,
        bisectionFactor = 4, bisectionThreshold = 256,
        control = new PushdownControl(denseCutoverAfterLevels = Int.MaxValue,
          quantileSeed = false))
      val mutated = base.withColumn("o_totalprice",
        when(substring(col("k"), 2, 100).cast("long") % 5 === 0, col("o_totalprice") + 2.0)
          .otherwise(col("o_totalprice")))
      val cols = Seq("k", "o_totalprice")
      def norm2(df: DataFrame) = {
        val nc = Normalize.normalizedCols(df.schema, cols)
        df.select(cols.zip(nc).map { case (n, c) => c.as(n) }: _*)
      }
      val expected = JoinDiffer.diff(norm2(base), norm2(mutated), Seq("k"), Seq("o_totalprice"))
        .collect().map(_.mkString("|")).toSet
      assert(out.collect().map(_.mkString("|")).toSet == expected)
      assert(stats.segmentsPruned > 0, s"string-key checksums failed to prune: $stats")
    } finally eng.close()
  }

  test("everything-differs at factor 32: every statement stays under the batch cap") {
    // The adversarial frontier case: every segment is dirty, so the frontier
    // grows factor× per level (32 → 1024 here). Uncapped, that renders a
    // 1024-branch CASE locally and a 1024-predicate statement remotely; the
    // batched loop must keep every artifact at O(maxSegmentsPerQuery).
    import spark.implicits._
    val n = 10240
    val a = (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    (1 to n).map(i => (i.toLong, s"w$i")).toDF("k", "v")
      .createOrReplaceTempView("pd_spec_alldiff")
    class RecordingEngine(inner: RemoteEngine) extends RemoteEngine {
      val sqls = scala.collection.mutable.ArrayBuffer.empty[String]
      def profile = inner.profile
      def query(sql: String) = { sqls += sql; inner.query(sql) }
    }
    val rec = new RecordingEngine(new SparkViewEngine(spark))
    val remote = RemoteTable(rec, "pd_spec_alldiff", Seq("k"), Seq("v"), a.schema)
    // everything-differs is exactly the dense-cutover regime — disabled
    // here because THIS test probes the batch-cap machinery on a frontier
    // that must actually grow factor× per level
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 32, bisectionThreshold = 128,
      control = new PushdownControl(denseCutoverAfterLevels = Int.MaxValue))
    assert(out.count() == 2L * n) // every key differs: one '-' and one '+' each
    val cap = PushdownDiffer.DefaultMaxSegmentsPerQuery
    assert(stats.leafSegments > cap, s"chunking not exercised: $stats")
    rec.sqls.foreach { sql =>
      // the CASE bucket appears twice (SELECT + dialect-portable GROUP BY)
      assert("WHEN ".r.findAllIn(sql).size <= 2 * cap, s"CASE branches exceed cap: ${sql.take(200)}")
      assert(" OR ".r.findAllIn(sql).size <= cap, s"OR chain exceeds cap: ${sql.take(200)}")
    }
    assert(stats.remoteQueries == rec.sqls.size)
    // 1 key-range + 1 level-0 batch + ceil(leaves/cap) level-1 batches
    // + ceil(leaves/cap) leaf fetches (every level-1 child goes leaf here)
    val batches = (stats.leafSegments + cap - 1) / cap
    assert(stats.remoteQueries == 2 + 2 * batches, s"unexpected round-trip count: $stats")
  }

  test("empty remote side yields every local row as removed") {
    val a = orders.where(col("o_orderkey") <= 200)
    a.where(lit(false)).createOrReplaceTempView("pd_spec_empty")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_empty", keys, compareCols, a.schema)
    val (out, _) = PushdownDiffer.diffWithStats(
      TableSegment(a, keys, compareCols), remote,
      bisectionFactor = 4, bisectionThreshold = 64)
    val got = out.collect()
    assert(got.length == a.count() && got.forall(_.getString(0) == "-"))
  }

  test("update-range scope restricts BOTH sides: out-of-window remote rows are not adds") {
    import java.sql.Timestamp
    val full = orders.withColumn("updated_at", col("o_orderdate"))
    full.createOrReplaceTempView("pd_spec_upd")
    val bound = Timestamp.valueOf("1995-01-01 00:00:00")
    val localSeg = TableSegment(full, keys, compareCols,
      updateCol = Some("updated_at"), minUpdate = Some(bound))
    val remoteWhere = s"${SparkProfile.quote("updated_at")} >= ${SparkProfile.timestampLiteral(bound)}"
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_upd",
      keys, compareCols, full.select(relevant.map(col): _*).schema,
      extraWhereSql = Some(remoteWhere))
    val (out, _) = PushdownDiffer.diffWithStats(localSeg, remote,
      bisectionFactor = 4, bisectionThreshold = 256)
    // identical data, identical window on both sides → empty diff; without
    // the remote WHERE every out-of-window remote row would read as '+'
    assert(out.isEmpty)
  }

  test("declared case-insensitive collation runs folded instead of refusing; identical sides prune clean") {
    // Used to refuse; now the fold handles the case-only damage class. A
    // remote whose ordering is actually ordinal but DECLARED case-insensitive
    // is the safe direction (folding both sides is consistent either way):
    // identical data must still prune to an empty diff through the folded
    // predicates. Accent sensitivity must be DECLARED (Some(true)) — an
    // unknown accent behavior could reorder keys in ways no case fold
    // repairs, so it refuses (second half).
    val base = orders.select(
      concat(lit("K"), col("o_orderkey").cast("string")).as("k"), col("o_totalprice"))
    base.createOrReplaceTempView("pd_spec_coll")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_coll",
      Seq("k"), Seq("o_totalprice"), base.schema,
      keyCollation = Collation(language = Some("en"), caseSensitive = Some(false),
        accentSensitive = Some(true)))
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(base, Seq("k"), Seq("o_totalprice")), remote,
      bisectionFactor = 4, bisectionThreshold = 128)
    assert(out.isEmpty)
    assert(stats.leafSegments == 0 && stats.rowsFetched == 0, s"$stats")
    // accentSensitive unknown (None) is NOT fold-eligible (ADVICE r7) — it
    // routes through the hex projection instead, which is accent-agnostic
    // by construction: identical sides still prune to an empty diff
    val accentUnknown = remote.copy(keyCollation =
      Collation(language = Some("en"), caseSensitive = Some(false)))
    val (out2, stats2) = PushdownDiffer.diffWithStats(
      TableSegment(base, Seq("k"), Seq("o_totalprice")), accentUnknown,
      bisectionFactor = 4, bisectionThreshold = 128)
    assert(out2.isEmpty && stats2.rowsFetched == 0, s"$stats2")
  }

  /** SparkProfile minus the hex projection — exercises the refusal path
    * that remains when a dialect cannot render the projection. */
  private object NoProjProfile extends graft.sources.SourceProfile {
    val name = "spark-noproj"
    override def quote(i: String): String = SparkProfile.quote(i)
    def toStringSql(e: String): String = SparkProfile.toStringSql(e)
    def md5AsIntSql(e: String): String = SparkProfile.md5AsIntSql(e)
    def normalizeTimestampSql(e: String, p: Int): String =
      SparkProfile.normalizeTimestampSql(e, p)
    def normalizeNumberSql(e: String, p: Int): String =
      SparkProfile.normalizeNumberSql(e, p)
    def normalizeBooleanSql(e: String): String = SparkProfile.normalizeBooleanSql(e)
    override def nonAlnumPredicateSql(e: String): Option[String] =
      SparkProfile.nonAlnumPredicateSql(e)
    // hexKeyProjectionSql stays None — the point of this profile
  }

  test("non-alnum keys under a CI collation segment via the hex projection") {
    // '_' (0x5F) sorts after 'Z' in binary order but before letters under
    // UCA-style locale collations — the UPPER() fold cannot repair that.
    // The fold's alnum proof fails on these keys, and the differ now falls
    // back to hex-projection segmentation instead of refusing: the diff
    // runs and its rows are EXACT (checksums and leaves stay raw).
    import spark.implicits._
    val ci = Collation(ordinal = Some(false),
      caseSensitive = Some(false), accentSensitive = Some(true))
    val n = 500
    def keyOf(i: Int) = f"k_${i}%03d-${if (i % 3 == 0) "A" else "z"}"
    val aRows = (1 to n).map(i => (keyOf(i), s"v$i"))
    val a = aRows.toDF("k", "v")
    // diffs clustered in the low key range so bisection genuinely prunes
    val bRows = (1 to n).map(i =>
      if (i <= 50) (keyOf(i), s"v$i!") else (keyOf(i), s"v$i"))
    bRows.toDF("k", "v").createOrReplaceTempView("pd_hexproj_b")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_hexproj_b",
      Seq("k"), Seq("v"), a.schema, keyCollation = ci)
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, Seq("k"), Seq("v")), remote,
      bisectionFactor = 4, bisectionThreshold = 32)
    assert(stats.levels >= 2 && stats.segmentsPruned > 0,
      s"projection path must still bisect and prune: $stats")
    val want = graft.diff.JoinDiffer.diff(
      a.selectExpr("k", "cast(v as string) v"),
      bRows.toDF("k", "v").selectExpr("k", "cast(v as string) v"),
      Seq("k"), Seq("v")).collect().map(_.mkString("|")).toSet
    assert(want.size == 100 && out.collect().map(_.mkString("|")).toSet == want)
    assert(stats.rowsFetched < n, s"projection must not ship the whole table: $stats")
  }

  test("a profile without the hex projection still refuses unabsorbable collations") {
    import spark.implicits._
    val good = Seq(("k1", "v1"), ("K2", "v2")).toDF("k", "v")
    val bad = Seq(("k_1", "v1"), ("K2", "v2")).toDF("k", "v")
    bad.createOrReplaceTempView("pd_noproj_bad")
    // CI collation + non-alnum keys: fold proof fails, no projection → the
    // fold's own refusal (with the alphabet named) surfaces
    val ci = Collation(ordinal = Some(false),
      caseSensitive = Some(false), accentSensitive = Some(true))
    val remoteBad = RemoteTable(new SparkViewEngine(spark, NoProjProfile),
      "pd_noproj_bad", Seq("k"), Seq("v"), bad.schema, keyCollation = ci)
    val e1 = intercept[IllegalArgumentException] {
      PushdownDiffer.diff(TableSegment(good, Seq("k"), Seq("v")), remoteBad)
    }
    assert(e1.getMessage.contains("[A-Za-z0-9]"), e1.getMessage)
    // incomparable locale collation, no projection → the projection refusal
    val territory = Collation(ordinal = Some(false), language = Some("en"),
      country = Some("US"), caseSensitive = Some(true), accentSensitive = Some(true))
    val remoteTerr = RemoteTable(new SparkViewEngine(spark, NoProjProfile),
      "pd_noproj_bad", Seq("k"), Seq("v"), bad.schema, keyCollation = territory)
    val e2 = intercept[IllegalArgumentException] {
      PushdownDiffer.diff(TableSegment(good, Seq("k"), Seq("v")), remoteTerr)
    }
    assert(e2.getMessage.contains("hex projection"), e2.getMessage)
    // clean alphanumerics on both sides still fold and run, projection-less
    good.createOrReplaceTempView("pd_noproj_good")
    val remoteGood = RemoteTable(new SparkViewEngine(spark, NoProjProfile),
      "pd_noproj_good", Seq("k"), Seq("v"), good.schema, keyCollation = ci)
    assert(PushdownDiffer.diff(TableSegment(good, Seq("k"), Seq("v")), remoteGood,
      bisectionFactor = 2, bisectionThreshold = 16).isEmpty)
  }

  test("hex projection preserves binary string order up to 16-byte-prefix ties") {
    // the soundness core: for any two strings, binary comparison of the
    // projections equals binary comparison of the raw UTF-8 bytes whenever
    // the first 16 bytes differ; strings sharing a 16-byte prefix tie
    def proj(s: String): String = {
      val b = s.getBytes("UTF-8").take(16)
      b.map(x => f"${x & 0xff}%02X").mkString.padTo(32, '0')
    }
    assert(proj("") == "0" * 32)
    val rnd = new scala.util.Random(42)
    val alphabet = "AZaz09 _-~éÿĀ"
    val samples = Seq("", "a", "A", "a ", "a-", "a_", "zz", "é", "Z z") ++
      (1 to 300).map(_ => (0 until rnd.nextInt(24))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (x <- samples; y <- samples) {
      def byteCmp(p: Array[Byte], q: Array[Byte]): Int = {
        val n = math.min(p.length, q.length)
        var i = 0
        while (i < n) {
          val d = (p(i) & 0xff) - (q(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        p.length - q.length
      }
      val raw = byteCmp(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      val pj = proj(x).compareTo(proj(y))
      if (x.getBytes("UTF-8").take(16).toSeq != y.getBytes("UTF-8").take(16).toSeq)
        assert(math.signum(pj) == math.signum(raw), s"'$x' vs '$y': $pj vs $raw")
      else
        assert(pj == 0 || math.signum(pj) == math.signum(raw), s"'$x' vs '$y'")
    }
    // and the Spark-side expression spells the same function
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, encode, hex, rpad, substring, upper}
    val df = samples.distinct.toDF("s")
      .withColumn("p", rpad(substring(upper(hex(encode(col("s"), "UTF-8"))), 1, 32), 32, "0"))
    df.collect().foreach(r => assert(r.getString(1) == proj(r.getString(0)),
      s"spark projection mismatch for '${r.getString(0)}'"))
  }

  test("interactive gate explains each query and can decline it") {
    orders.limit(5).createOrReplaceTempView("pd_spec_inter")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    val yes = new InteractiveEngine(new SparkViewEngine(spark),
      (sql, plan) => { seen += ((sql, plan)); true })
    val rows = yes.query("SELECT COUNT(*) FROM pd_spec_inter")
    assert(rows.head.head.contains("5"))
    assert(seen.size == 1 && seen.head._2.nonEmpty, "EXPLAIN output must reach the gate")
    val no = new InteractiveEngine(new SparkViewEngine(spark), (_, _) => false)
    assertThrows[IllegalStateException](no.query("SELECT COUNT(*) FROM pd_spec_inter"))
  }

  test("CLI diffs a parquet table against a live JDBC warehouse via remote:jdbc") {
    // the production JDBC route end to end FROM THE CLI: Derby engine,
    // profile picked from the jdbc subprotocol, progressive printing
    assume(scala.util.Try(Class.forName("org.apache.derby.jdbc.EmbeddedDriver")).isSuccess,
      "no Derby driver on the classpath")
    import spark.implicits._
    val db = s"memory:clipd${System.nanoTime()}"
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true")
    try {
      def exec(sql: String): Unit = {
        val st = setup.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      // deliberately NO bootstrapSql here: a fresh database nobody set up
      // out-of-band is the CLI's real-world case — JdbcEngine must install
      // the profile's helper functions itself on connect
      exec("""CREATE TABLE cb ("k" BIGINT, "v" VARCHAR(20))""")
      val bRows = (1L to 300L).map(i => (i, if (i % 50 == 0) s"V$i" else s"v$i"))
      exec("INSERT INTO cb VALUES " +
        bRows.map { case (k, v) => s"($k, '$v')" }.mkString(", "))
      val tmp = java.nio.file.Files.createTempDirectory("clijdbc").toString
      (1L to 300L).map(i => (i, s"v$i")).toDF("k", "v").write.parquet(s"$tmp/a")
      val out = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        graft.cli.Cli.run(graft.cli.Cli.parseArgs(Array(
          s"$tmp/a", s"remote:jdbc:derby:$db#cb",
          "-k", "k", "-c", "v", "--json")), spark)
      }
      val lines = out.toString("UTF-8").linesIterator.filter(_.startsWith("{")).toSeq
      // keys 50, 100, ..., 300 differ → 6 keys × 2 signs
      assert(lines.size == 12, s"got ${lines.size} lines:\n${lines.mkString("\n")}")
      assert(lines.count(_.contains("\"-\"")) == 6 && lines.count(_.contains("\"+\"")) == 6)
    } finally {
      setup.close()
      scala.util.Try(java.sql.DriverManager.getConnection(s"jdbc:derby:$db;drop=true"))
    }
  }

  test("CLI diffs a parquet table against a DuckDB database via pushdown") {
    import scala.sys.process._
    val tmp = java.nio.file.Files.createTempDirectory("clipd").toString
    val db = s"$tmp/orders.duckdb"
    // b-side table inside a real DuckDB database file: price bumped on %50
    val mkDb =
      s"""import duckdb
         |con = duckdb.connect('$db')
         |con.execute(\"\"\"CREATE TABLE orders_b AS
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 50 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice
         |  FROM read_parquet('$dir/orders.parquet')\"\"\")
         |con.close()
         |""".stripMargin
    assert(Seq("python3", "-c", mkDb).! == 0, "failed to create duckdb database")
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      graft.cli.Cli.run(graft.cli.Cli.parseArgs(Array(
        s"$dir/orders.parquet", s"duckdb:$db:orders_b",
        "-k", "o_orderkey", "-c", "o_totalprice", "--json", "--stats")), spark)
    }
    val text = out.toString("UTF-8")
    val lines = text.linesIterator.filter(_.startsWith("{")).toSeq
    // keys 0, 50, 100, ..., 1450 differ → 30 keys x 2 signs
    assert(lines.size == 60)
    assert(lines.count(_.contains("\"-\"")) == 30 && lines.count(_.contains("\"+\"")) == 30)
    assert(text.contains("30 rows updated") && text.contains("1470 rows unchanged"))
  }

  // ---- remote schema introspection ---------------------------------------

  test("introspects a live DuckDB table: types, precisions, text refinement") {
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      eng.query(
        """CREATE TABLE intro_t AS SELECT
          |  i::BIGINT AS id,
          |  'K' || i::VARCHAR AS name,
          |  lower(concat(lpad(to_hex(i), 8, '0'), '-0000-0000-0000-000000000000')) AS u,
          |  (i * 1.5)::DECIMAL(15,3) AS amt,
          |  i % 2 = 0 AS ok,
          |  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) SECOND AS ts
          |FROM range(200) t(i)""".stripMargin)
      val rt = RemoteTable.introspect(eng, "intro_t",
        Seq("id"), Seq("name", "u", "amt", "ok", "ts"))
      import org.apache.spark.sql.types._
      assert(rt.schema.map(f => f.name -> f.dataType) == Seq(
        "id" -> LongType, "name" -> StringType, "u" -> StringType,
        "amt" -> DecimalType(15, 3), "ok" -> BooleanType, "ts" -> TimestampType))
      // decimal scale drives the fraction precision; timestamps default 6
      assert(rt.fracPrecision == 3 && rt.tsPrecision == 6)
      // 64-row refinement classifies the text columns remotely
      assert(rt.schema("name").metadata.getString(RemoteSchema.StringClassKey) == "alphanum")
      assert(rt.schema("u").metadata.getString(RemoteSchema.StringClassKey) == "uuid-lower")
    } finally eng.close()
  }

  test("introspection fails loudly on missing tables, columns, and text keys") {
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      eng.query("CREATE TABLE intro_bad (id BIGINT, note VARCHAR)")
      eng.query("INSERT INTO intro_bad VALUES (1, 'has spaces, punctuation!')")
      assertThrows[IllegalArgumentException](
        RemoteTable.introspect(eng, "no_such_table", Seq("id"), Seq("note")))
      assertThrows[IllegalArgumentException](
        RemoteTable.introspect(eng, "intro_bad", Seq("id"), Seq("nope")))
      // ',' / '!' are outside the base-66 alphabet → unusable as a key
      val e = intercept[IllegalArgumentException](
        RemoteTable.introspect(eng, "intro_bad", Seq("note"), Seq("id")))
      assert(e.getMessage.contains("key"))
      // ...but fine as a compared column
      val ok = RemoteTable.introspect(eng, "intro_bad", Seq("id"), Seq("note"))
      assert(ok.schema("note").metadata.getString(RemoteSchema.StringClassKey) == "text")
    } finally eng.close()
  }

  test("introspected live-DuckDB pushdown reproduces the hand-passed-schema diff") {
    withDuck(DuckDbProfile) { eng =>
      val a = orders
      val remote = RemoteTable.introspect(eng, "pd_duck_b", keys, compareCols)
      val (out, stats) = PushdownDiffer.diffWithStats(
        TableSegment(a, keys, compareCols), remote,
        bisectionFactor = 4, bisectionThreshold = 128)
      assert(out.collect().map(_.mkString("|")).toSet == expectedDiff)
      assert(stats.segmentsPruned > 0)
    }
  }

  test("type parsing: dialect catalog names land on the right Spark types") {
    import org.apache.spark.sql.types._
    // Oracle NUMBER with NULL scale is a precision-0 decimal (reference:
    // base.py:755-757 "Needed for Oracle")
    assert(OracleProfile.sparkType(RawColumnInfo("k", "NUMBER",
      numericPrecision = Some(38))).contains(DecimalType(38, 0)))
    // scale recovered from the parametrized name when the catalog omits it
    assert(DuckDbProfile.sparkType(RawColumnInfo("a", "DECIMAL(15,2)"))
      .contains(DecimalType(15, 2)))
    assert(MsSqlProfile.sparkType(RawColumnInfo("f", "bit")).contains(BooleanType))
    assert(ClickHouseProfile.sparkType(RawColumnInfo("n", "Nullable(Int64)"))
      .contains(LongType))
    assert(ClickHouseProfile.sparkType(RawColumnInfo("t", "DateTime64(3)"))
      .contains(TimestampType))
    assert(TrinoProfile.sparkType(RawColumnInfo("t", "timestamp(6) with time zone"))
      .contains(TimestampType))
    assert(PostgresProfile.sparkType(RawColumnInfo("v", "character varying"))
      .contains(StringType))
    // unknown types surface as None, not a silent Text fallback
    assert(SnowflakeProfile.sparkType(RawColumnInfo("g", "GEOGRAPHY")).isEmpty)
    // Spark DESCRIBE rows: '#' section markers skipped, precision in the name
    assert(SparkProfile.parseSchemaRow(Seq(Some("# Partitioning"), Some(""), None)).isEmpty)
    assert(SparkProfile.parseSchemaRow(Seq(Some("amt"), Some("decimal(38,4)"), None))
      .flatMap(SparkProfile.sparkType).contains(DecimalType(38, 4)))
  }

  test("alphanumeric keys segment the table with every row in exactly one segment") {
    val o = Tables.load(spark, dir, "orders")
      .select(concat(lit("K"), col("o_orderkey").cast("string")).as("k"))
    val parts = TableSegment(o, Seq("k")).splitByKeyRange(7)
    assert(parts.size > 1)
    val union = parts.zipWithIndex
      .map { case (p, i) => p.scoped.withColumn("seg", lit(i)) }
      .reduce(_ unionAll _)
    val total = o.count()
    // sum == total and distinct keys == total ⇒ no row lost, none double-counted
    assert(union.count() == total)
    assert(union.select("k").distinct().count() == total)
  }

  test("decimal surrogate keys segment, bisect, and diff exactly (live DuckDB)") {
    import org.apache.spark.sql.types.DecimalType
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      // id = i * 10^10 + 7 exceeds Int but fits DECIMAL(18,0) — the shape of
      // an Oracle/Teradata-migrated NUMBER surrogate key
      eng.query("CREATE TABLE pd_dec (id DECIMAL(18,0), v BIGINT)")
      val values = (1 to 300).map { i =>
        val v = if (i % 50 == 0) 999L else i * 3L
        s"(${i.toLong * 10000000000L + 7}, $v)" // 6 mutated rows
      }.mkString(", ")
      eng.query(s"INSERT INTO pd_dec VALUES $values")

      import spark.implicits._
      val local = (1 to 300).map(i => (BigDecimal(i.toLong * 10000000000L + 7), i * 3L))
        .toDF("id", "v")
        .select(col("id").cast(DecimalType(18, 0)).as("id"), col("v"))

      val remote = RemoteTable.introspect(eng, "pd_dec", Seq("id"), Seq("v"))
      assert(remote.schema("id").dataType == DecimalType(18, 0))
      // scale-0-only remote negotiates fracPrecision 0 — alignPrecision
      // transfers the mutual knobs instead of the caller remembering to
      val (localA, remoteA) = graft.api.Graft.alignPrecision(
        TableSegment(local, Seq("id"), Seq("v")), remote)
      // uniform %50 mutations dirty all 4 top segments → the dense cutover
      // would fire at level 0; disabled because this test probes decimal
      // BISECTION depth (levels >= 2)
      val (out, stats) = PushdownDiffer.diffWithStats(localA, remoteA,
        bisectionFactor = 4, bisectionThreshold = 32,
        control = new PushdownControl(denseCutoverAfterLevels = Int.MaxValue))
      val rows = out.collect()
      assert(rows.length == 12, rows.mkString("\n")) // 6 mutations × -/+ pair
      assert(rows.filter(_.getString(0) == "-").map(_.getString(2)).sorted.toSeq ==
        (1 to 6).map(i => (i * 50 * 3).toString).sorted)
      assert(stats.levels >= 2 && stats.segmentsPruned > 0, s"$stats")

      // the same decimal key space must carry the remote↔remote loop: a
      // second engine holds the unmutated side, the DuckDB holds pd_dec
      val eng2 = new SparkViewEngine(spark)
      local.createOrReplaceTempView("pd_dec_clean")
      val rrOut = graft.api.Graft.diffRemotes(spark, eng2, "pd_dec_clean",
        eng, "pd_dec", Seq("id"), Seq("v"),
        bisectionFactor = 4, bisectionThreshold = 32).collect()
      assert(rrOut.length == 12, rrOut.mkString("\n"))
    } finally eng.close()
  }

  test("decimal-keyed local segmentation covers every row exactly once") {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.load(spark, dir, "orders")
      .select((col("o_orderkey").cast(DecimalType(28, 0)) * lit(10000000000L) + lit(3))
        .cast(DecimalType(28, 0)).as("k"), col("o_custkey"))
    val parts = TableSegment(o, Seq("k")).splitByKeyRange(7)
    assert(parts.size > 1)
    val union = parts.map(_.scoped).reduce(_ unionAll _)
    assert(union.count() == o.count())
    assert(union.select("k").distinct().count() == o.count())
  }

  test("ignoreColumn mid-flight drops a hot column from checksums and the leaf compare") {
    val a = orders
    PushdownQueries.clusterMutatedOrders(a).createOrReplaceTempView("pd_spec_ign")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_ign", keys, compareCols, a.schema)
    val control = new PushdownControl() {
      override def onLevel(info: PushdownLevel): Unit = {
        super.onLevel(info)
        if (info.level == 0) ignoreColumn("o_totalprice")
      }
    }
    val (out, stats) = PushdownDiffer.diffWithStats(
      TableSegment(a, keys, compareCols), remote,
      bisectionFactor = 4, bisectionThreshold = 128, control = control)
    assert(stats.levels >= 2, s"need recursion for a mid-flight drop to matter: $stats")
    assert(stats.ignoredColumns == Seq("o_totalprice"))
    assert(stats.levelMillis.length == stats.levels)
    // the dropped column is gone from the output schema...
    assert(!out.columns.contains("o_totalprice"))
    // ...and the diff equals a joindiff that never compared it
    val keep = relevant.filterNot(_ == "o_totalprice")
    def normNoPrice(df: DataFrame) = {
      val d = df.select(keep.map(col): _*)
      val nc = Normalize.normalizedCols(d.schema, keep)
      d.select(keep.zip(nc).map { case (n, c) => c.as(n) }: _*)
    }
    val expected = JoinDiffer.diff(normNoPrice(orders),
      normNoPrice(PushdownQueries.clusterMutatedOrders(orders)),
      keys, keep.filterNot(keys.contains))
      .collect().map(_.mkString("|")).toSet
    assert(out.collect().map(_.mkString("|")).toSet == expected)
  }

  test("checksum-latency guardrail warns when a level blows past the limit") {
    val a = orders
    a.createOrReplaceTempView("pd_spec_guard")
    val remote = RemoteTable(new SparkViewEngine(spark), "pd_spec_guard", keys, compareCols, a.schema)
    val err = new java.io.ByteArrayOutputStream()
    Console.withErr(new java.io.PrintStream(err, true, "UTF-8")) {
      PushdownDiffer.diffWithStats(TableSegment(a, keys, compareCols), remote,
        bisectionFactor = 8, bisectionThreshold = 256,
        control = new PushdownControl(checksumWarnSeconds = 0))
    }
    assert(err.toString("UTF-8").contains("checksum guardrail"), err.toString("UTF-8"))
  }

  test("uuid casing: uppercase local vs lowercase remote diffs clean, mutations caught") {
    import graft.diff.SchemaTools
    def uuid(i: Int): String = {
      val hex = BigInt(i * 2654435761L).toString(16).reverse.padTo(32, '0').reverse
      Seq(hex.substring(0, 8), hex.substring(8, 12), hex.substring(12, 16),
        hex.substring(16, 20), hex.substring(20, 32)).mkString("-")
    }
    val eng = new ProcessEngine(Seq("python3", "-c", bridgeScript), DuckDbProfile)
    try {
      eng.query("CREATE TABLE pd_uuid (id BIGINT, u VARCHAR, v BIGINT)")
      // remote stores LOWERCASE uuids; id 7 has a mutated payload and id 13
      // a genuinely different uuid VALUE (not just casing)
      val values = (1 to 60).map { i =>
        val u = if (i == 13) uuid(1013) else uuid(i)
        val v = if (i == 7) 999L else i * 10L
        s"($i, '${u.toLowerCase}', $v)"
      }.mkString(", ")
      eng.query(s"INSERT INTO pd_uuid VALUES $values")

      // local stores the unmutated rows with UPPERCASE uuids
      import spark.implicits._
      val local = (1 to 60).map(i => (i.toLong, uuid(i).toUpperCase, i * 10L))
        .toDF("id", "u", "v")

      val remote = RemoteTable.introspect(eng, "pd_uuid", Seq("id"), Seq("u", "v"))
      assert(remote.schema("u").metadata.getString(SchemaTools.StringClassKey) == "uuid-lower")
      val (out, stats) = PushdownDiffer.diffWithStats(
        TableSegment(local, Seq("id"), Seq("u", "v")), remote,
        bisectionFactor = 4, bisectionThreshold = 16)
      val rows = out.collect()
      // only the two real mutations survive; 58 casing-only rows are clean
      assert(rows.map(_.getString(1)).toSet == Set("7", "13"), rows.mkString("\n"))
      assert(rows.length == 4) // a -/+ pair each
      // casing-only segments checksum equal cross-engine and prune
      assert(stats.segmentsPruned > 0, s"uuid alignment failed to prune: $stats")
      // output renders the casing-canonical (lowercase) form on both sides
      assert(rows.forall(r => r.getString(2) == r.getString(2).toLowerCase))

      // remote↔remote: the UPPERCASE side now lives behind its own SQL
      // engine too; both introspections classify uuid (upper vs lower) and
      // the loop must align them the same way
      local.createOrReplaceTempView("pd_uuid_upper")
      val rr = graft.api.Graft.diffRemotes(spark,
        new SparkViewEngine(spark), "pd_uuid_upper", eng, "pd_uuid",
        Seq("id"), Seq("u", "v"), bisectionFactor = 4, bisectionThreshold = 16)
        .collect()
      assert(rr.map(_.getString(1)).toSet == Set("7", "13"), rr.mkString("\n"))
      assert(rr.length == 4)
      assert(rr.forall(r => r.getString(2) == r.getString(2).toLowerCase))
    } finally eng.close()
  }
}
