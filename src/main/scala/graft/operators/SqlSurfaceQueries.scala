package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ANSI-surface widening: lateral flattening (explode/unnest), array
  * higher-order functions, and correlated subqueries (EXISTS / NOT EXISTS
  * and scalar-aggregate), each against a literal DuckDB replay.
  *
  * Why these matter for a diff/curation engine: users port queries from
  * warehouse SQL, and the reference exposes a raw-SQL hatch
  * (data_diff/queries/api.py) whose practical surface is exactly this —
  * UNNEST, list lambdas, and correlated predicates. Spark covers all of
  * it declaratively: `explode` is a Generate node feeding whole-stage
  * codegen; `filter`/`aggregate` array lambdas run inside codegen with no
  * UDF; and Catalyst's RewriteCorrelatedScalarSubquery / RewritePredicateSubquery
  * de-correlate EXISTS and scalar subqueries into semi/anti/aggregate
  * JOINS — at 100 TB the correlated probe is one shuffled join per
  * subquery, never a per-row re-scan.
  *
  * Determinism notes (cross-engine float rules, cf. RelationalQueries):
  * array contents are sorted (`sort_array` vs `list_sort`) because
  * collect order is partition-dependent; quantities and prices go through
  * BIGINT cents / long casts so no float sum crosses an engine boundary;
  * empty-list aggregates are pinned to 0 on both sides (Spark `aggregate`
  * starts at the literal zero, DuckDB `list_sum` yields NULL and is
  * coalesced).
  */
object SqlSurfaceQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Lateral flattening: p_type ("STANDARD ANODIZED TIN") splits into
    // words, one output row per word — Generate(explode) + hash agg, the
    // flatten-then-aggregate shape every log/token pipeline starts with.
    "q_explode_words" -> ((s, d) =>
      Tables.load(s, d, "part")
        .select(explode(split(col("p_type"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word")),

    // Array higher-order functions over per-order quantity lists:
    // filter + aggregate lambdas (codegen'd, no UDF), size, array_max,
    // and a join of the sorted list into a string (the array itself can't
    // ship to the driver's compare, which sorts rows by every column —
    // the joined form pins the list contents exactly anyway).
    "q_array_hof" -> ((s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qtys"))
        .select(col("l_orderkey"),
          concat_ws(",", col("qtys")).as("qty_list"),
          size(col("qtys")).as("n_items"),
          aggregate(filter(col("qtys"), q => q > 25), lit(0L),
            (acc, q) => acc + q).as("heavy_qty"),
          array_max(col("qtys")).as("max_qty"))
        .orderBy("l_orderkey")),

    // Correlated EXISTS + NOT EXISTS through the SQL front end: customers
    // with at least one big order and no cheap finished one. Catalyst
    // de-correlates both into one left-semi and one left-anti join —
    // `.explain` shows two joins, zero subquery re-executions.
    "q_exists_subquery" -> ((s, d) => {
      Tables.load(s, d, "customer").createOrReplaceTempView("graft_sq_customer")
      Tables.load(s, d, "orders").createOrReplaceTempView("graft_sq_orders")
      s.sql("""SELECT c.c_custkey, c.c_name
              |FROM graft_sq_customer c
              |WHERE EXISTS (SELECT 1 FROM graft_sq_orders o
              |              WHERE o.o_custkey = c.c_custkey
              |                AND o.o_totalprice > 200000)
              |  AND NOT EXISTS (SELECT 1 FROM graft_sq_orders o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderstatus = 'F'
              |                    AND o.o_totalprice < 50000)
              |ORDER BY c.c_custkey""".stripMargin)
    }),

    // Correlated scalar-aggregate subqueries: orders worth more than
    // double their customer's average order value, kept integer-exact by
    // comparing price*count > 2*sum in BIGINT cents (a float avg would
    // disagree across engines at the boundary). Catalyst rewrites each
    // subquery into one aggregate + join over orders — two shuffles
    // total, not O(rows) probes.
    "q_scalar_subquery" -> ((s, d) => {
      Tables.load(s, d, "orders").createOrReplaceTempView("graft_sq_orders2")
      s.sql("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
              |FROM graft_sq_orders2 o
              |WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
              |      (SELECT count(*) FROM graft_sq_orders2 o2
              |       WHERE o2.o_custkey = o.o_custkey)
              |    > 2 * (SELECT sum(CAST(CAST(o3.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              |           FROM graft_sq_orders2 o3
              |           WHERE o3.o_custkey = o.o_custkey)
              |ORDER BY o.o_orderkey""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_explode_words" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin,

    "q_array_hof" ->
      """WITH g AS (
        |  SELECT l_orderkey,
        |         list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  array_to_string(qtys, ',') AS qty_list,
        |  CAST(len(qtys) AS INTEGER) AS n_items,
        |  COALESCE(CAST(list_sum(list_filter(qtys, q -> q > 25)) AS BIGINT), 0) AS heavy_qty,
        |  list_max(qtys) AS max_qty
        |FROM g ORDER BY l_orderkey""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c.c_custkey, c.c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice < 50000)
        |ORDER BY c.c_custkey""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM orders o
        |WHERE CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |    > 2 * (SELECT sum(CAST(CAST(o3.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
  )
}
