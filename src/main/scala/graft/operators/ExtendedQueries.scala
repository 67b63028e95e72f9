package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.joins.TemporalJoins

/** Extensions past the reference's operator set (SURVEY.md §2.3 "optional
  * extensions", §2.4): as-of / range joins over the event stream, grouping
  * sets, pivot, deterministic hash sampling, and column profiling.
  *
  * Event timestamps are compared as epoch SECONDS on both engines — events
  * parquet is TIMESTAMP(NANOS), which Spark truncates to micros and DuckDB
  * keeps, so any sub-second comparison would diverge (see RelationalQueries
  * determinism notes).
  */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** events projected to epoch seconds. */
  private def ev(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(col("event_id"), col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"), col("value"))

  val queries: Map[String, Q] = Map(
    // Attribution-style as-of join: each purchase picks up the user's
    // latest view at or before it. One shuffle+sort of both event sets —
    // no per-user cross product (see TemporalJoins.asofJoin).
    "q_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      val p = e.where(col("event_type") === "purchase").select("event_id", "user_id", "es")
      val v = e.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("es"))
        .agg(max(col("event_id")).as("view_event_id"))
        .withColumnRenamed("es", "v_es")
      TemporalJoins.asofJoin(p, v, "user_id", "es", "v_es", Seq("v_es", "view_event_id"))
        .orderBy("event_id")
    }),

    // Interval join: views in the hour before each purchase, binned to an
    // equi-join (TemporalJoins.rangeJoin) then aggregated; purchases with
    // no views kept via left join with zero defaults.
    "q_range_join" -> ((s, d) => {
      val e = ev(s, d)
      val pr = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
          col("es").as("p_es"))
        .withColumn("lo", col("p_es") - 3600).withColumn("hi", col("p_es"))
      val vw = e.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("es").as("v_es"), col("value"))
      val matched = TemporalJoins
        .rangeJoin(pr, vw, "p_user", "v_user", "lo", "hi", "v_es", 3600L)
        .groupBy(col("p_event_id"))
        .agg(count(lit(1)).as("n_views"), sum(dec2(col("value"))).cast("double").as("sum_value"))
      pr.join(matched, Seq("p_event_id"), "left")
        .select(col("p_event_id").as("event_id"), col("p_user").as("user_id"),
          coalesce(col("n_views"), lit(0L)).as("n_views"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("event_id")
    }),

    "q_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin)
    }),

    "q_pivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec2(col("l_quantity"))))
        .select(col("l_returnflag"),
          col("F").cast("double").as("f_qty"), col("O").cast("double").as("o_qty"))
        .orderBy("l_returnflag")),

    // Deterministic 5% sample: hash-mod on the primary key instead of
    // rand() — reproducible across runs AND engines, stable under
    // repartitioning, and exactly what a pipeline wants for holdout splits.
    "q_sample_hash" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(conv(substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))),
          1, 6), 16, 10).cast("long") % 20 === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // The reference's update-column recency scoping (table_segment.py:
    // 115,166-170 + --min-age/--max-age): bounds land in the parquet scan as
    // pushed-down predicates via TableSegment. Whole-second bounds are safe
    // against the nanos-vs-micros precision gap (truncation cannot cross an
    // exact-second boundary).
    "q_update_range" -> ((s, d) => {
      val seg = graft.diff.TableSegment(
        t(s, d, "events"), Seq("event_id"),
        extraCols = Seq("event_type", "value"),
        updateCol = Some("ts"),
        minUpdate = Some(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
        maxUpdate = Some(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
      seg.scoped.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // Salted skew join: result is exactly the plain join (the oracle IS the
    // plain join), but hot keys spread over `salt` reducers — see SkewJoin.
    "q_join_salted" -> ((s, d) => {
      val l = t(s, d, "lineitem").select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val su = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      graft.joins.SkewJoin.saltedJoin(l, su, "l_suppkey", "s_suppkey", 16)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
            .cast("double").as("revenue"))
        .orderBy("s_nationkey")
    }),

    // Nested types serialize to canonical JSON (the reference compares
    // arrays/structs as JSON strings: databases/base.py:858-864). Spark's
    // to_json and DuckDB's render identically for null-free int/string
    // members (Spark OMITS null fields; keep them coalesced).
    "q_nested_json" -> ((s, d) =>
      t(s, d, "orders")
        .where(col("o_orderkey") % 1000 === 0)
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            array(col("o_custkey"), floor(col("o_totalprice")).cast("long")).as("a")))
            .as("payload"))
        .orderBy("o_orderkey")),

    // Column profiling in ONE scan (the reference collects per-column stats
    // as background queries during joindiff: joindiff_tables.py:268-305).
    "q_profile" -> ((s, d) =>
      t(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        countDistinct(col("o_orderstatus")).as("d_status"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderstatus")).as("min_status"),
        max(col("o_orderstatus")).as("max_status"))),

    // Top-3 customers per market segment via the bounded TopKStructs
    // aggregate — same semantics as q_window_rank's rank window, but the
    // k-bounded buffer partial-aggregates map-side, so a hot group never
    // funnels through one buffered window partition (the window form is
    // ≤|groups|-way parallel and unsplittable by AQE; this form shuffles
    // groups×k rows regardless of skew). DESC dimensions are encoded by
    // negation in the sort struct, rank recovered from the array position.
    "q_topk_groups" -> ((s, d) =>
      t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.TopKStructs.topK(
          struct((-col("c_acctbal")).as("negbal"), col("c_custkey").as("ck")), 3).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("c_mktsegment"), col("r.ck").as("c_custkey"),
          (-col("r.negbal")).as("c_acctbal"), (col("pos") + 1).cast("long").as("rnk"))
        .orderBy("c_mktsegment", "rnk")),

    // Robust anomaly detection over a metric series — the observability
    // loop a diff engine feeds (Datafold's product monitors table metrics
    // between diffs): daily order counts per priority, flagged where the
    // deviation from the per-priority MEDIAN exceeds 3× the median absolute
    // deviation. Median/MAD, not mean/stddev: one bad backfill day would
    // drag a mean-based threshold toward itself and mask the next one.
    // Everything stays integer-exact across engines by carrying DOUBLED
    // values: 2·median of integers is exactly integral (both engines
    // interpolate the even-count midpoint), dev2 = |2x − med2|, mad4 =
    // 2·median(dev2), and the flag d > 3·MAD becomes 2·dev2 > 3·mad4 in
    // integers — no float threshold to drift. Scale shape: the (priority,
    // day) rollup partial-aggregates map-side; the exact per-priority
    // medians buffer series POINTS (days — calendar-bounded, independent
    // of row count), never rows.
    "q_anomaly_mad" -> ((s, d) => {
      // the series rollup is O(priorities × days) — checkpoint it so the
      // median, deviation, and MAD passes below reuse 12k rows instead of
      // re-scanning the orders table three times
      val x = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
        .localCheckpoint(true)
      val m = x.groupBy("priority")
        .agg((expr("percentile(n_orders, 0.5)") * 2).cast("long").as("med2"))
      val dev = x.join(m, Seq("priority"))
        .withColumn("dev2", abs(col("n_orders") * 2 - col("med2")))
      val md = dev.groupBy("priority")
        .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
      dev.join(md, Seq("priority"))
        .select(col("priority"), col("day"), col("n_orders"), col("med2"),
          col("dev2"), col("mad4"),
          (col("dev2") * 2 > col("mad4") * 3).as("is_anomaly"))
        .orderBy("priority", "day")
    }),
  )

  private val evCte =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) // 1000000000 AS es, value
      |  FROM events)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_anomaly_mad" ->
      """WITH x AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT priority, CAST(2 * median(n_orders) AS BIGINT) AS med2
        |  FROM x GROUP BY 1),
        |dv AS (
        |  SELECT x.priority, x.day, x.n_orders, m.med2,
        |    abs(2 * x.n_orders - m.med2) AS dev2
        |  FROM x JOIN m USING (priority)),
        |md AS (
        |  SELECT priority, CAST(2 * median(dev2) AS BIGINT) AS mad4
        |  FROM dv GROUP BY 1)
        |SELECT dv.priority, dv.day, dv.n_orders, dv.med2, dv.dev2, md.mad4,
        |  (2 * dv.dev2 > 3 * md.mad4) AS is_anomaly
        |FROM dv JOIN md USING (priority)
        |ORDER BY priority, day""".stripMargin,

    "q_topk_groups" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rnk
        |  FROM customer) sub
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "q_asof_join" ->
      s"""$evCte,
         |p AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, es AS v_es, max(event_id) AS view_event_id
         |      FROM e WHERE event_type = 'view' GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, p.es, v.v_es, v.view_event_id
         |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.v_es <= p.es
         |ORDER BY p.event_id""".stripMargin,

    "q_range_join" ->
      s"""$evCte,
         |p AS (SELECT event_id, user_id, es FROM e WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, es, value FROM e WHERE event_type = 'view'),
         |m AS (
         |  SELECT p.event_id, COUNT(*) AS n_views,
         |    CAST(SUM(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |  FROM p JOIN v ON p.user_id = v.user_id
         |    AND v.es >= p.es - 3600 AND v.es < p.es
         |  GROUP BY 1)
         |SELECT p.event_id, p.user_id,
         |  COALESCE(m.n_views, 0) AS n_views,
         |  COALESCE(m.sum_value, 0.0) AS sum_value
         |FROM p LEFT JOIN m ON p.event_id = m.event_id
         |ORDER BY p.event_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS f_qty,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS o_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE ('0x' || substring(md5(l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR), 1, 6))::BIGINT % 20 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_update_range" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_join_salted" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q_nested_json" ->
      """SELECT o_orderkey,
        |  to_json(struct_pack(k := o_orderkey, st := o_orderstatus,
        |    a := [o_custkey, CAST(floor(o_totalprice) AS BIGINT)]))::VARCHAR AS payload
        |FROM orders WHERE o_orderkey % 1000 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT o_custkey) AS d_custkey,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  COUNT(DISTINCT o_orderstatus) AS d_status,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  min(o_orderstatus) AS min_status, max(o_orderstatus) AS max_status
        |FROM orders""".stripMargin,
  )
}
