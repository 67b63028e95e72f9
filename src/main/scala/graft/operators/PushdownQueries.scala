package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.diff.TableSegment
import graft.sources.{PushdownDiffer, RemoteTable, SparkViewEngine}

/** Gate queries for pushdown mode (SURVEY.md §7.1) and alphanumeric-key
  * segmentation. The pushdown gate drives the full control loop — segment,
  * push grouped checksum SQL through a real SQL round-trip, prune, bisect,
  * leaf-fetch — against a SparkViewEngine "remote"; the DuckDB
  * cross-process path is exercised by PushdownDifferSpec.
  */
object PushdownQueries {
  type Q = (SparkSession, String) => DataFrame

  private val orderCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
  private val compareCols = orderCols.tail

  /** b-side with mutations CLUSTERED in key range [1000, 3000): deletes
    * (%13), price bumps (%7), status flips (%11). Clustered — unlike
    * DiffQueries.mutatedOrders' uniform spread — so checksum pruning has
    * something to prune: segments outside the range verify equal remotely
    * and never ship rows, which is the hashdiff value proposition. */
  def clusterMutatedOrders(o: DataFrame): DataFrame = {
    val hot = col("o_orderkey") >= 1000 && col("o_orderkey") < 3000
    o.where(!(hot && col("o_orderkey") % 13 === 0))
      .withColumn("o_totalprice",
        when(hot && col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(hot && col("o_orderkey") % 11 === 0, lit("X")).otherwise(col("o_orderstatus")))
  }

  /** One live in-memory Derby per (JVM, sf dir) for the repair gate,
    * seeded with the rows OUTSIDE the hot damage range (identical on both
    * sides there). JVM-lifetime by design: Verify/Bench are one-shot
    * mains, and Derby in-memory databases vanish with the process. */
  private val repairDbs =
    scala.collection.concurrent.TrieMap.empty[String, (String, graft.sources.JdbcEngine)]

  private def repairFixture(dir: String,
      cleanRows: DataFrame): (String, graft.sources.JdbcEngine) =
    repairDbs.getOrElseUpdate(dir, {
      import graft.sources.{DerbyProfile, JdbcEngine, RemoteRepair}
      val url = "jdbc:derby:memory:graft_repair_" +
        java.util.UUID.randomUUID().toString.take(8)
      java.sql.DriverManager.getConnection(s"$url;create=true").close()
      val eng = new JdbcEngine(url, new java.util.Properties(), DerbyProfile)
      eng.update(
        s"""CREATE TABLE orders_r (${orderCols.map(c => "\"" + c + "\"").zip(
          Seq("BIGINT", "BIGINT", "VARCHAR(8)", "DOUBLE", "TIMESTAMP", "VARCHAR(32)"))
          .map { case (c, t) => s"$c $t" }.mkString(", ")})""")
      RemoteRepair.insertStatements(DerbyProfile, "orders_r", orderCols,
          cleanRows.toLocalIterator().asScala, 256)
        .foreach(eng.update)
      (url, eng)
    })

  val queries: Map[String, Q] = Map(
    "q_pushdown_diff" -> ((s, d) => {
      val a = Tables.load(s, d, "orders").select(orderCols.map(col): _*)
      clusterMutatedOrders(a).createOrReplaceTempView("graft_pushdown_b")
      // schema comes from the remote catalog (DESCRIBE through the SQL
      // round-trip), not a hand-passed StructType — the real-user path
      val remote = RemoteTable.introspect(new SparkViewEngine(s), "graft_pushdown_b",
        Seq("o_orderkey"), compareCols)
      // threshold 4096: at gate scale (sf0.01, 15k rows) level 0 decides
      // everything in one round-trip; at bench scale (sf0.1) one recursion
      // level runs. The deep-recursion path is exercised by
      // PushdownDifferSpec at threshold 128 — the gate checks parity, not
      // depth, and each extra level is a full remote round-trip.
      PushdownDiffer.diff(TableSegment(a, Seq("o_orderkey"), compareCols), remote,
        bisectionFactor = 8, bisectionThreshold = 4096)
        .orderBy("o_orderkey", "sign")
    }),

    // The remote↔remote control loop (neither side Spark-readable — the
    // reference's cross-database core scenario) over the same mutated
    // orders: both "engines" are SQL round-trip views, schemas come from
    // their catalogs, Spark only coordinates and compares leaf rows. Same
    // oracle as q_pushdown_diff — the two control loops must agree exactly.
    "q_remote_remote" -> ((s, d) => {
      val a = Tables.load(s, d, "orders").select(orderCols.map(col): _*)
      a.createOrReplaceTempView("graft_rr_a")
      clusterMutatedOrders(a).createOrReplaceTempView("graft_rr_b")
      graft.api.Graft.diffRemotes(s,
        new SparkViewEngine(s), "graft_rr_a", new SparkViewEngine(s), "graft_rr_b",
        Seq("o_orderkey"), compareCols,
        bisectionFactor = 8, bisectionThreshold = 4096)
        .orderBy("o_orderkey", "sign")
    }),

    // The repair loop against a LIVE remote: a real embedded-Derby database
    // is seeded with the mutated orders (through the same batched multi-row
    // INSERT machinery repair uses), the local parquet side is diffed
    // against it, RemoteRepair turns the diff into DELETE + INSERT
    // statements executed over JDBC, and the gate emits the remote table
    // READ BACK over JDBC afterwards — the oracle is plain `orders`, so a
    // hash match proves the remote was reconciled to the source exactly,
    // typed values surviving two JDBC round-trips.
    //
    // The Derby database is seeded ONCE per (JVM, sf dir) and reused:
    // seeding the whole b-side over the statement path is test scaffolding
    // (a production remote already has its rows), and it used to dominate
    // the bench row ~90/10 over the operator. Repeat calls only re-damage
    // the hot key range [1000,3000) — mutations are confined there by
    // construction — so Bench's min-of-repeats times damage + diff +
    // repair + readback, and the row moves when repair batching does.
    "q_remote_repair" -> ((s, d) => {
      import graft.sources.{DerbyProfile, RemoteRepair}
      // key cap: the whole table at gate scale (sf0.01 tops out at 15k),
      // a bounded seed volume at bench scale — the repair cost is
      // proportional to the DAMAGE either way (the clustered mutations
      // live in [1000,3000), inside the cap)
      val a = Tables.load(s, d, "orders").select(orderCols.map(col): _*)
        .where(col("o_orderkey") < 20000)
      val b = clusterMutatedOrders(a)
      val hot = col("o_orderkey") >= 1000 && col("o_orderkey") < 3000
      val (url, eng) = repairFixture(d, b.where(!hot))
      // (re-)damage: restore the b-side image of the hot range, so every
      // call — first or repeat — repairs the same drift
      eng.update("""DELETE FROM orders_r WHERE "o_orderkey" >= 1000 AND "o_orderkey" < 3000""")
      RemoteRepair.insertStatements(DerbyProfile, "orders_r", orderCols,
          b.where(hot).toLocalIterator().asScala, 256)
        .foreach(eng.update)
      val diff = graft.diff.JoinDiffer.diff(a, b, Seq("o_orderkey"), compareCols)
      RemoteRepair.repair(eng, "orders_r", Seq("o_orderkey"), a, diff)
      s.read.jdbc(url, "orders_r", new java.util.Properties())
        .orderBy("o_orderkey")
    }),

    // Coverage invariant for base-66 alphanumeric keys (the reference's
    // tests/test_diff_tables.py alphanum cases): splitting a varying-length
    // string-keyed table into N key-range segments must account for every
    // row exactly once. 'K' || o_orderkey gives keys like K1/K15/K1500 whose
    // SQL order differs from their numeric order — the length-tie case the
    // justified mapping has to survive.
    "q_alphanum_segments" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(concat(lit("K"), col("o_orderkey").cast("string")).as("k"),
          col("o_custkey").as("v"))
      val parts = TableSegment(o, Seq("k")).splitByKeyRange(7)
      // ONE scan for all segment counts (a per-segment count + union would
      // run one job per segment): assign each row its segment via the
      // bounds, aggregate, sum. Rows outside every segment (the invariant
      // violation this gate exists to catch) land in seg NULL and are
      // counted too — the total only matches COUNT(*) if coverage is exact.
      val segCol = parts.zipWithIndex
        .foldRight(lit(null).cast("int")) { case ((p, i), acc) =>
          when(col("k") >= lit(p.minKey.get.head) && col("k") < lit(p.maxKey.get.head),
            lit(i)).otherwise(acc)
        }
      o.groupBy(segCol.as("seg")).agg(count(lit(1)).as("cnt"))
        .where(col("seg").isNotNull)
        .agg(sum("cnt").as("total_rows"))
    }),

    // Row-balanced segmentation: the exact quantile checkpoints must
    // reproduce the ntile row split (keys unique), so per-segment counts
    // AND key bounds are oracle-checkable — balance and coverage in one
    // result. (The skew story — arithmetic split collapsing on sparse
    // keys while this one stays flat — is SegmentSpec territory; the
    // gate pins the checkpoint math itself cross-engine.)
    "q_quantile_segments" -> ((s, d) => {
      val o = Tables.load(s, d, "orders").select(col("o_orderkey").as("k"))
      val parts = TableSegment(o, Seq("k")).splitByRowQuantiles(8, exact = true)
      val segCol = parts.zipWithIndex
        .foldRight(lit(null).cast("long")) { case ((p, i), acc) =>
          val lo = p.minKey.map(v => col("k") >= lit(v.head)).getOrElse(lit(true))
          val hi = p.maxKey.map(v => col("k") < lit(v.head)).getOrElse(lit(true))
          when(lo && hi, lit(i.toLong)).otherwise(acc)
        }
      o.groupBy(segCol.as("seg"))
        .agg(count(lit(1)).as("cnt"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("seg")
    }),

    // Same coverage invariant for Decimal(p,0) surrogate keys (the Oracle/
    // Teradata NUMBER-PK shape; reference accepts Decimal(precision=0) as a
    // segmentation key, abcs/database_types.py:196-201). The ×10^10 spread
    // pushes values past Int range so the BigInt key math, not Long
    // convenience paths, carries the bounds.
    "q_decimal_segments" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val o = Tables.load(s, d, "orders")
        .select((col("o_orderkey").cast(DecimalType(28, 0)) * lit(10000000000L) + lit(3))
          .cast(DecimalType(28, 0)).as("k"), col("o_custkey").as("v"))
      val parts = TableSegment(o, Seq("k")).splitByKeyRange(7)
      val segCol = parts.zipWithIndex
        .foldRight(lit(null).cast("int")) { case ((p, i), acc) =>
          when(col("k") >= lit(p.minKey.get.head) && col("k") < lit(p.maxKey.get.head),
            lit(i)).otherwise(acc)
        }
      o.groupBy(segCol.as("seg")).agg(count(lit(1)).as("cnt"))
        .where(col("seg").isNotNull)
        .agg(sum("cnt").as("total_rows"))
    }),
  )

  // ---- oracle SQL --------------------------------------------------------

  /** DuckDB rendering of the normalized string forms — same formulas the
    * q_checksum oracle already validates byte-for-byte against
    * graft.diff.Normalize. */
  private def norm(c: String, kind: String): String = kind match {
    case "int" => s"($c)::VARCHAR"
    case "frac" => s"(($c)::DECIMAL(38,2))::VARCHAR"
    case "ts" => s"rpad(substring(strftime(($c)::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f'), 1, 26), 26, '0')"
    case "str" => c
  }

  private val orderKinds = Seq("o_orderkey" -> "int", "o_custkey" -> "int",
    "o_orderstatus" -> "str", "o_totalprice" -> "frac",
    "o_orderdate" -> "ts", "o_orderpriority" -> "str")

  private val normSelect =
    orderKinds.map { case (c, k) => s"${norm(c, k)} AS $c" }.mkString(", ")

  private val anyNormDiff = compareCols
    .map(c => s"an.$c IS DISTINCT FROM bn.$c").mkString(" OR ")

  private val pushdownOracle =
    s"""WITH bsrc AS (
         |  SELECT o_orderkey, o_custkey,
         |    CASE WHEN o_orderkey >= 1000 AND o_orderkey < 3000 AND o_orderkey % 11 = 0
         |         THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         |    CASE WHEN o_orderkey >= 1000 AND o_orderkey < 3000 AND o_orderkey % 7 = 0
         |         THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
         |    o_orderdate, o_orderpriority
         |  FROM orders
         |  WHERE NOT (o_orderkey >= 1000 AND o_orderkey < 3000 AND o_orderkey % 13 = 0)
         |),
         |an AS (SELECT $normSelect FROM orders),
         |bn AS (SELECT $normSelect FROM bsrc)
         |SELECT sign, o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM (
         |  SELECT '-' AS sign, ${orderCols.map(c => s"an.$c").mkString(", ")}
         |  FROM an LEFT JOIN bn ON an.o_orderkey = bn.o_orderkey
         |  WHERE bn.o_orderkey IS NULL OR $anyNormDiff
         |  UNION ALL
         |  SELECT '+' AS sign, ${orderCols.map(c => s"bn.$c").mkString(", ")}
         |  FROM bn LEFT JOIN an ON an.o_orderkey = bn.o_orderkey
         |  WHERE an.o_orderkey IS NULL OR $anyNormDiff
         |) ORDER BY o_orderkey, sign""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_pushdown_diff" -> pushdownOracle,

    // identical expected output: the local↔remote and remote↔remote loops
    // implement the same diff
    "q_remote_remote" -> pushdownOracle,

    // Repairing the remote from the diff must reproduce the source table.
    "q_remote_repair" ->
      s"""SELECT ${orderCols.mkString(", ")} FROM orders
         |WHERE o_orderkey < 20000 ORDER BY o_orderkey""".stripMargin,

    "q_alphanum_segments" ->
      "SELECT COUNT(*) AS total_rows FROM orders",

    "q_decimal_segments" ->
      "SELECT COUNT(*) AS total_rows FROM orders",

    "q_quantile_segments" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |  ntile(8) OVER (ORDER BY o_orderkey) AS bucket FROM orders)
        |SELECT bucket - 1 AS seg, count(*) AS cnt,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
