package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.diff.{Checksum, DiffEstimate, HashDiffer, JoinDiffer, Normalize, SchemaTools, TableSegment}

/** The flagship diff operators (SURVEY.md §2.8) wired into the correctness
  * gate. The second table of each diff is a deterministic in-plan mutation of
  * `orders` (≈1% deletes, updates on two columns, ≈1% inserts), so the DuckDB
  * oracle can rebuild the exact same pair of tables and diff them with plain
  * SQL.
  */
object DiffQueries {
  type Q = (SparkSession, String) => DataFrame

  private def orders(s: SparkSession, d: String) = Tables.load(s, d, "orders")

  /** b-side: delete keys %97==0, bump price %31==0, flip status %53==0,
    * insert copies of %101==0 under shifted keys. */
  def mutatedOrders(o: DataFrame): DataFrame = {
    val kept = o.where(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 31 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 53 === 0, lit("X")).otherwise(col("o_orderstatus")))
    val inserted = o.where(col("o_orderkey") % 101 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
    kept.unionByName(inserted)
  }

  private val orderCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
  private val orderCompareCols = orderCols.tail

  val queries: Map[String, Q] = Map(
    "q_joindiff" -> ((s, d) => {
      val a = orders(s, d)
      JoinDiffer.diff(a, mutatedOrders(a), Seq("o_orderkey"), orderCompareCols)
        .orderBy("o_orderkey", "sign")
    }),

    // Epsilon-tolerant joindiff: the b side perturbs o_totalprice by
    // ±0.005 (float-drift noise: ETL re-computation, lossy casts) on
    // %13 keys and by +5.0 (a real change) on %31 keys; with tolerance
    // 0.01 on that column only the real changes — and nothing else —
    // surface. Exactness stays the default for every unmapped column.
    "q_joindiff_tolerance" -> ((s, d) => {
      val a = orders(s, d).select(orderCols.map(col): _*)
      val b = a.withColumn("o_totalprice",
        when(col("o_orderkey") % 31 === 0, col("o_totalprice") + 5.0)
          .when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 0.005)
          .otherwise(col("o_totalprice")))
      JoinDiffer.diff(a, b, Seq("o_orderkey"), orderCompareCols,
        tolerances = Map("o_totalprice" -> 0.01))
        .orderBy("o_orderkey", "sign")
    }),

    // RELATIVE tolerance: the b side scales o_totalprice by ×(1+1e-4)
    // (proportional drift — a currency re-conversion, a float32 round
    // trip) on %13 keys and by ×1.1 on %31 keys; with rtol 1e-3 only the
    // 10% changes surface. The envelope is |a−b| ≤ rtol·max(|a|,|b|) —
    // the isclose shape, symmetric in the two sides.
    "q_joindiff_rel_tolerance" -> ((s, d) => {
      val a = orders(s, d).select(orderCols.map(col): _*)
      val b = a.withColumn("o_totalprice",
        when(col("o_orderkey") % 31 === 0, col("o_totalprice") * 1.1)
          .when(col("o_orderkey") % 13 === 0, col("o_totalprice") * 1.0001)
          .otherwise(col("o_totalprice")))
      JoinDiffer.diff(a, b, Seq("o_orderkey"), orderCompareCols,
        relTolerances = Map("o_totalprice" -> 0.001))
        .orderBy("o_orderkey", "sign")
    }),

    // The repair loop closed end to end: diff a against its mutated copy,
    // apply the diff to the mutated side as a patch, and emit the patched
    // table — the oracle is simply `orders` itself, so a hash match proves
    // the patch reconstructs the source exactly (deletes b-only keys,
    // inserts missing rows, replaces updated ones).
    "q_diff_apply" -> ((s, d) => {
      val a = orders(s, d).select(orderCols.map(col): _*)
      val b = mutatedOrders(a)
      val diff = JoinDiffer.diff(a, b, Seq("o_orderkey"), orderCompareCols)
      JoinDiffer.applyDiff(b, diff, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    "q_hashdiff" -> ((s, d) => {
      val a = orders(s, d)
      val segA = TableSegment(a, Seq("o_orderkey"), orderCompareCols)
      val segB = TableSegment(mutatedOrders(a), Seq("o_orderkey"), orderCompareCols)
      HashDiffer.diff(segA, segB, buckets = 256).orderBy("o_orderkey", "sign")
    }),

    "q_diff_stats" -> ((s, d) => {
      val a = orders(s, d)
      JoinDiffer.stats(a, mutatedOrders(a), Seq("o_orderkey"), orderCompareCols)
    }),

    "q_diff_col_counts" -> ((s, d) => {
      val a = orders(s, d)
      JoinDiffer.diffCountsPerColumn(a, mutatedOrders(a), Seq("o_orderkey"), orderCompareCols)
    }),

    // Strategy pre-flight: deterministic 1/16 key sample diffed and
    // extrapolated (DiffEstimate). The decision surface is integer
    // milli-units end to end, so the DuckDB oracle reproduces the
    // sample, the rate, AND the recommendation exactly. The uniform
    // fixture (~7% of keys differ) lands on the dense side of the 5%
    // cutoff — the regime where bisection would stop pruning.
    "q_diff_estimate" -> ((s, d) => {
      val a = orders(s, d)
      val e = DiffEstimate.estimate(a, mutatedOrders(a),
        Seq("o_orderkey"), orderCompareCols, mod = 16L)
      import s.implicits._
      Seq((e.sampledKeys, e.differingKeys, e.milliRate, e.recommendation))
        .toDF("sampled_keys", "differing_keys", "milli_rate", "recommendation")
    }),

    // The checksum is emitted as its decimal STRING (not DECIMAL(38,0)): the
    // gate hashes result values after a float64 round-trip, which corrupts
    // 48-bit-plus sums; the string renders identically in Spark and DuckDB
    // and survives the gate exactly.
    "q_checksum" -> ((s, d) => {
      val seg = TableSegment(Tables.load(s, d, "lineitem"), Seq("l_orderkey", "l_linenumber"))
      seg.scoped.agg(
        count(lit(1)).as("cnt"),
        Checksum.checksumAgg(seg.normCols).cast("string").as("checksum"))
    }),

    "q_segment_checksums" -> ((s, d) => {
      val seg = TableSegment(Tables.load(s, d, "lineitem"), Seq("l_orderkey", "l_linenumber"))
      seg.bucketChecksums(pmod(col("l_orderkey"), lit(32)))
        .withColumn("checksum", col("checksum").cast("string"))
        .orderBy("bucket")
    }),

    // Z-order COMPOUND-KEY segmentation: the 2-D answer to "bisect this
    // table on (customer, price)". A modulo or single-column range segment
    // smears a two-dimensional neighborhood across every segment; the
    // Morton bucket (z-key's top bits) makes each segment an axis-aligned
    // region in BOTH dimensions at once, so when a checksum mismatch
    // localizes to a segment, the follow-up predicate is a tight 2-D
    // rectangle — and on a z-ordered layout (DataLayout.writeZOrdered with
    // the same dims) that rectangle is a handful of FILES. Same
    // cross-engine checksum formula as every segment gate, so the remote
    // side can compute its half as pushed-down SQL: the z-key is plain
    // shift/and/add arithmetic every engine renders (the DuckDB oracle
    // recomputes it bit for bit).
    "q_zorder_segments" -> ((s, d) => {
      val a = orders(s, d)
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val z = graft.layout.DataLayout.zOrderKey(Seq(col("o_custkey"), cents), 24)
      val seg = TableSegment(a, Seq("o_orderkey"), orderCompareCols)
      // 64 segments over the 48-bit z space: bucket = z div 2^42
      seg.bucketChecksums(call_function("div", z, lit(1L << 42)))
        .withColumn("checksum", col("checksum").cast("string"))
        .orderBy("bucket")
    }),

    // The InfoTree surface: which segments differ and by how much, without
    // the row join. Cross-engine md5 checksums + a modulo bucket so the
    // DuckDB oracle reproduces every value including the dirty flag.
    "q_hashdiff_segments" -> ((s, d) => {
      val a = orders(s, d)
      val segA = TableSegment(a, Seq("o_orderkey"), orderCompareCols)
      val segB = TableSegment(mutatedOrders(a), Seq("o_orderkey"), orderCompareCols)
      HashDiffer.bucketSummaries(segA, segB, 32, parity = true,
          bucketColFor = _ => pmod(col("o_orderkey"), lit(32)))
        .select(col("bucket"), col("a_cnt"), col("a_checksum").cast("string").as("a_checksum"),
          col("b_cnt"), col("b_checksum").cast("string").as("b_checksum"), col("is_dirty"))
        .orderBy("bucket")
    }),

    "q_keyrange" -> ((s, d) =>
      TableSegment(Tables.load(s, d, "lineitem"), Seq("l_orderkey", "l_linenumber")).keyRange()),

    "q_validate_keys" -> ((s, d) =>
      orders(s, d).agg(
        count(lit(1)).as("total"),
        countDistinct(col("o_orderkey")).as("distinct_keys"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("null_keys"))),

    // FK referential integrity (see SchemaTools.refIntegrity) — the parent
    // side drops every o_orderkey % 97 == 0 (the same delete the diff
    // fixtures use), so the orphan counts are non-vacuous and the oracle
    // rebuilds the identical broken pair.
    "q_ref_integrity" -> ((s, d) =>
      SchemaTools.refIntegrity(
        Tables.load(s, d, "lineitem"), "l_orderkey",
        orders(s, d).where(col("o_orderkey") % 97 =!= 0), "o_orderkey")),
  )

  // ---- oracle SQL ------------------------------------------------------

  private val mutatedCte =
    """WITH b AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 53 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 = 0
      |)""".stripMargin

  private val anyColDiff = orderCompareCols
    .map(c => s"a.$c IS DISTINCT FROM b.$c").mkString(" OR ")

  private val diffRowsSql =
    s"""$mutatedCte
       |SELECT sign, o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM (
       |  SELECT '-' AS sign, ${orderCols.map(c => s"a.$c").mkString(", ")}
       |  FROM orders a LEFT JOIN b ON a.o_orderkey = b.o_orderkey
       |  WHERE b.o_orderkey IS NULL OR $anyColDiff
       |  UNION ALL
       |  SELECT '+' AS sign, ${orderCols.map(c => s"b.$c").mkString(", ")}
       |  FROM b LEFT JOIN orders a ON a.o_orderkey = b.o_orderkey
       |  WHERE a.o_orderkey IS NULL OR $anyColDiff
       |) ORDER BY o_orderkey, sign""".stripMargin

  /** DuckDB rendering of the reference checksum formula
    * (reference: data_diff/databases/duckdb.py:99-116). */
  private def duckNorm(c: String, kind: String): String = kind match {
    case "int" => s"COALESCE($c::VARCHAR, '<null>')"
    case "frac" => s"COALESCE(CAST($c AS DECIMAL(38,2))::VARCHAR, '<null>')"
    case "ts" => s"COALESCE(rpad(substring(strftime($c, '%Y-%m-%d %H:%M:%S.%f'), 1, 26), 26, '0'), '<null>')"
    case "str" => s"COALESCE($c, '<null>')"
  }

  private val lineitemNorm = Seq(
    "l_orderkey" -> "int", "l_linenumber" -> "int", "l_partkey" -> "int",
    "l_suppkey" -> "int", "l_quantity" -> "frac", "l_extendedprice" -> "frac",
    "l_discount" -> "frac", "l_tax" -> "frac", "l_returnflag" -> "str",
    "l_linestatus" -> "str", "l_shipdate" -> "ts")
    .map { case (c, k) => duckNorm(c, k) }.mkString(",\n    ")

  private val duckChecksum =
    s"""CAST(CAST(SUM(('0x' || SUBSTRING(md5(concat_ws('|',
       |    $lineitemNorm)), 21, 12))::BIGINT - ${Checksum.Offset}) AS DECIMAL(38,0)) AS VARCHAR)""".stripMargin

  private val ordersNorm = Seq(
    "o_orderkey" -> "int", "o_custkey" -> "int", "o_orderstatus" -> "str",
    "o_totalprice" -> "frac", "o_orderdate" -> "ts", "o_orderpriority" -> "str")
    .map { case (c, k) => duckNorm(c, k) }.mkString(",\n    ")

  private val duckOrdersChecksum =
    s"""CAST(CAST(SUM(('0x' || SUBSTRING(md5(concat_ws('|',
       |    $ordersNorm)), 21, 12))::BIGINT - ${Checksum.Offset}) AS DECIMAL(38,0)) AS VARCHAR)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_joindiff" -> diffRowsSql,

    "q_zorder_segments" ->
      s"""WITH b AS (
         |  SELECT *, CAST(list_sum([
         |      (((o_custkey >> j) & 1) << (2*j + 1))
         |      + (((CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >> j) & 1) << (2*j))
         |      for j in range(0, 24) ]) AS BIGINT) // ${1L << 42} AS bucket
         |  FROM orders)
         |SELECT bucket, COUNT(*) AS cnt, $duckOrdersChecksum AS checksum
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_joindiff_tolerance" ->
      s"""WITH a AS (SELECT ${orderCols.mkString(", ")} FROM orders),
         |b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |  CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 5.0
         |       WHEN o_orderkey % 13 = 0 THEN o_totalprice + 0.005
         |       ELSE o_totalprice END AS o_totalprice,
         |  o_orderdate, o_orderpriority FROM a),
         |d AS (SELECT a.o_orderkey FROM a JOIN b USING (o_orderkey)
         |      WHERE abs(a.o_totalprice - b.o_totalprice) > 0.01)
         |SELECT '-' AS sign, a.* FROM a JOIN d USING (o_orderkey)
         |UNION ALL
         |SELECT '+' AS sign, b.* FROM b JOIN d USING (o_orderkey)
         |ORDER BY o_orderkey, sign""".stripMargin,

    "q_joindiff_rel_tolerance" ->
      s"""WITH a AS (SELECT ${orderCols.mkString(", ")} FROM orders),
         |b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |  CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice * 1.1
         |       WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.0001
         |       ELSE o_totalprice END AS o_totalprice,
         |  o_orderdate, o_orderpriority FROM a),
         |d AS (SELECT a.o_orderkey FROM a JOIN b USING (o_orderkey)
         |      WHERE abs(a.o_totalprice - b.o_totalprice) >
         |            0.001 * greatest(abs(a.o_totalprice), abs(b.o_totalprice)))
         |SELECT '-' AS sign, a.* FROM a JOIN d USING (o_orderkey)
         |UNION ALL
         |SELECT '+' AS sign, b.* FROM b JOIN d USING (o_orderkey)
         |ORDER BY o_orderkey, sign""".stripMargin,

    // Patching the mutated copy with the diff must reproduce the source.
    "q_diff_apply" ->
      s"""SELECT ${orderCols.mkString(", ")} FROM orders ORDER BY o_orderkey""",
    "q_hashdiff" -> diffRowsSql,

    "q_hashdiff_segments" ->
      s"""$mutatedCte,
         |sa AS (SELECT (o_orderkey % 32) AS bucket, COUNT(*) AS a_cnt,
         |  $duckOrdersChecksum AS a_checksum FROM orders GROUP BY 1),
         |sb AS (SELECT (o_orderkey % 32) AS bucket, COUNT(*) AS b_cnt,
         |  $duckOrdersChecksum AS b_checksum FROM b GROUP BY 1)
         |SELECT COALESCE(sa.bucket, sb.bucket) AS bucket, a_cnt, a_checksum, b_cnt, b_checksum,
         |  (a_cnt IS DISTINCT FROM b_cnt OR a_checksum IS DISTINCT FROM b_checksum) AS is_dirty
         |FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket ORDER BY 1""".stripMargin,

    "q_diff_stats" ->
      s"""$mutatedCte,
         |j AS (
         |  SELECT a.o_orderkey AS ak, b.o_orderkey AS bk,
         |    CASE WHEN $anyColDiff THEN 1 ELSE 0 END AS d
         |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
         |SELECT
         |  CAST(SUM(CASE WHEN bk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
         |  CAST(SUM(CASE WHEN ak IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
         |  CAST(SUM(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL AND d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS updated,
         |  CAST(SUM(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL AND d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
         |FROM j""".stripMargin,

    "q_diff_col_counts" ->
      s"""$mutatedCte
         |SELECT
         |  ${orderCompareCols.map(c =>
             s"CAST(SUM(CASE WHEN a.$c IS DISTINCT FROM b.$c THEN 1 ELSE 0 END) AS BIGINT) AS n_diff_$c")
             .mkString(",\n  ")}
         |FROM orders a JOIN b ON a.o_orderkey = b.o_orderkey""".stripMargin,

    "q_diff_estimate" ->
      s"""$mutatedCte,
         |sa AS (SELECT * FROM orders
         |  WHERE ('0x' || substring(md5(o_orderkey::VARCHAR), 1, 12))::BIGINT % 16 = 0),
         |sb AS (SELECT * FROM b
         |  WHERE ('0x' || substring(md5(o_orderkey::VARCHAR), 1, 12))::BIGINT % 16 = 0),
         |j AS (SELECT CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL
         |    OR $anyColDiff THEN 1 ELSE 0 END AS dif
         |  FROM sa a FULL OUTER JOIN sb b ON a.o_orderkey = b.o_orderkey)
         |SELECT CAST(COUNT(*) AS BIGINT) AS sampled_keys,
         |  CAST(SUM(dif) AS BIGINT) AS differing_keys,
         |  CAST(1000 * SUM(dif) // COUNT(*) AS BIGINT) AS milli_rate,
         |  CASE WHEN 1000 * SUM(dif) // COUNT(*) >= 50 THEN 'dense-join'
         |    ELSE 'bisect' END AS recommendation
         |FROM j""".stripMargin,

    "q_checksum" ->
      s"""SELECT COUNT(*) AS cnt,
         |  $duckChecksum AS checksum
         |FROM lineitem""".stripMargin,

    "q_segment_checksums" ->
      s"""SELECT (l_orderkey % 32) AS bucket, COUNT(*) AS cnt,
         |  $duckChecksum AS checksum
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_keyrange" ->
      """SELECT min(l_orderkey) AS min_l_orderkey, max(l_orderkey) AS max_l_orderkey,
        |  min(l_linenumber) AS min_l_linenumber, max(l_linenumber) AS max_l_linenumber
        |FROM lineitem""".stripMargin,

    "q_validate_keys" ->
      """SELECT COUNT(*) AS total, COUNT(DISTINCT o_orderkey) AS distinct_keys,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys
        |FROM orders""".stripMargin,

    "q_ref_integrity" ->
      """WITH p AS (
        |  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0),
        |pk AS (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |orph AS (
        |  SELECT pk.k, pk.n FROM pk LEFT JOIN p ON pk.k = p.o_orderkey
        |  WHERE pk.k IS NOT NULL AND p.o_orderkey IS NULL)
        |SELECT (SELECT COUNT(*) FROM lineitem) AS n_child_rows,
        |  (SELECT CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        |   FROM lineitem) AS n_null_keys,
        |  CAST(COALESCE((SELECT SUM(n) FROM orph), 0) AS BIGINT) AS n_orphan_rows,
        |  (SELECT COUNT(*) FROM orph) AS n_orphan_keys""".stripMargin,
  )
}
