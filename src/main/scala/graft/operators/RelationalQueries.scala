package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operator surface (SURVEY.md §2.1–2.6): scans, projections,
  * filters, joins (inner/outer/semi/anti/broadcast), aggregations, rollup,
  * window functions, set ops, top-k.
  *
  * Cross-engine determinism rules (Spark result must hash-match the DuckDB
  * oracle):
  *  - SUM/AVG over doubles is order-dependent → cast to DECIMAL(18,2) before
  *    aggregating in BOTH engines, cast the final value back to double (the
  *    decimal→double conversion is exact IEEE nearest in both).
  *  - Spark sorts NULLS FIRST by default for ASC, DuckDB NULLS LAST → always
  *    spell out null ordering when sort keys are nullable.
  *  - DuckDB casts double→BIGINT by rounding, Spark by truncation → always
  *    floor() first.
  *  - events.ts is parquet timestamp[ns]: DuckDB keeps ns, Spark truncates to
  *    micros → never emit raw ts; emit epoch seconds of a truncated value.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Deterministic-HLL estimates of COUNT(DISTINCT c) for several columns
    * in ONE scan: the columns unpivot to (col_name, v) pairs, and the
    * DISTINCT pair set serves both the exact count and the HLL registers
    * (a MAX over registers is duplicate-insensitive, so distinct-first
    * changes nothing). See q_approx_distinct for the determinism argument;
    * every intermediate is an exact integer, the estimate is a single
    * exactly-rounded double division, so any engine reproduces it bitwise. */
  private def hllEstimates(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select("p.*").where(col("v").isNotNull).distinct()
    val h = graft.functions.Md5Bits48.head(col("v"))
    // ONE aggregation tree serves both estimates: `pairs` is already
    // distinct, so the exact count per column is the sum of per-bucket
    // row counts — a second consumption of `pairs` (separate `exact`
    // subtree) would recompute the explode+distinct over the whole input
    val regs = pairs
      .select(col("col_name"), pmod(h, lit(256)).as("bucket"), shiftright(h, 8).as("h2"))
      .withColumn("rho", when(col("h2") === 0, lit(41)).otherwise(lit(41) - length(bin(col("h2")))))
      .groupBy("col_name", "bucket").agg(max(col("rho")).as("r"), count(lit(1)).as("n"))
    regs.groupBy("col_name").agg(
        count(lit(1)).as("m_used"),
        sum(expr("shiftleft(cast(1 as bigint), 41 - r)")).as("z_used"),
        sum(col("n")).as("n_exact"))
      .select(col("col_name"),
        (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
          * lit(2199023255552.0) /
          (((lit(256L) - col("m_used")) * lit(2199023255552L) + col("z_used")).cast("double")))
          .as("n_hll"),
        col("n_exact"))
  }

  /** Bounded-state quantile sketch — the scale path next to `q_quantiles`'
    * exact `percentile` (whose ObjectHashAggregate buffers a value→count
    * map per group: O(distinct values) of heap-merged state, a memory
    * hazard on a 500B-row high-cardinality double column). Here the state
    * is O(bins) per group, period: values land in fixed integer-cent bins
    * (`bin = clamp((floor(v·100) − loCents) div widthCents, 0, bins−1)`,
    * clamping out-of-range values to the edge bins), one partial-aggregated
    * groupBy counts them, and each requested quantile is the lower edge of
    * the first bin whose cumulative count reaches ceil(p·n/1000) — found by
    * integer cross-multiplication (`1000·cum ≥ p·n`), so no float exists
    * anywhere and any engine reproduces the result bitwise. The per-group
    * cumulative window ranges over ≤ `bins` rows by construction, so the
    * plan has exactly one data-sized exchange (the bin groupBy) and
    * no skew surface. Error is bounded by the bin width, stated, and
    * chosen by the caller — the deterministic counterpart of
    * approx_percentile's opaque sketch. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      probsMilli: Seq[Int], loCents: Long, widthCents: Long,
      bins: Int): DataFrame = {
    require(bins > 0 && widthCents > 0 && probsMilli.nonEmpty &&
      probsMilli.forall(p => p >= 0 && p <= 1000),
      s"histogramQuantiles needs bins>0, widthCents>0 and probsMilli in [0,1000]; " +
        s"got bins=$bins widthCents=$widthCents probsMilli=$probsMilli")
    // clamp ACCOUNTING rides the same single scan: a mis-guessed range
    // silently degrades every quantile into the edge bins, so the output
    // always carries the per-group count of values that clamped — 0 means
    // the range was right; anything else is the caller's loud signal to
    // widen the range (or use the auto-range mode below)
    // low-side check is on CENTS, not the raw bin: Spark's `div` truncates
    // toward zero, so cents in (lo−width, lo) divide to 0 and would hide in
    // bin 0 undetected (DuckDB's // floors, where raw<0 is equivalent)
    val cents = expr(s"cast(floor(($valueCol) * 100) as bigint)")
    val rawBin = expr(s"(cast(floor(($valueCol) * 100) as bigint) - ${loCents}L) div ${widthCents}L")
    // NULL values are excluded like the exact `percentile` path excludes
    // them — binned NULLs would otherwise survive as a bin=NULL row that
    // inflates n AND sorts before real bins in Spark but after them in
    // DuckDB (the header's nullable-sort-key rule), shifting every
    // quantile differently per engine
    val binned = df.where(expr(s"($valueCol) is not null"))
      .select(col(groupCol).as("grp"),
        histogramBin(valueCol, loCents, widthCents, bins).as("bin"),
        (cents < loCents || rawBin > (bins - 1).toLong).cast("long").as("oob"))
    // pinned: `counts` feeds BOTH the clamp accounting and the quantile
    // selection — unpinned, the input would scan twice (the same audited
    // double-consumption psiOverCounts pins against); O(groups×bins) rows
    val counts = binned.groupBy("grp", "bin")
      .agg(count(lit(1)).as("cnt"), sum(col("oob")).as("oob"))
      .localCheckpoint(true)
    val clampedPerGroup = counts.groupBy("grp")
      .agg(sum(col("oob")).as("clamped"))
      .withColumnRenamed("grp", groupCol)
    quantilesFromBinCounts(counts.select("grp", "bin", "cnt"), groupCol,
        probsMilli, loCents, widthCents)
      // O(groups) rows on the right — broadcast keeps this exchange-free
      .join(broadcast(clampedPerGroup), Seq(groupCol))
  }

  /** [[histogramQuantiles]] with the range DERIVED from the data: one
    * min/max aggregation (the engine's cheapest query shape — two longs to
    * the driver) picks `loCents` and the smallest `widthCents` covering
    * [min, max] in `bins` bins, so nothing clamps by construction
    * (`clamped` is still emitted, provably 0). Costs one extra scan; the
    * explicit-range overload remains the single-scan path for callers who
    * know their domain. Deterministic: the derivation is pure integer
    * arithmetic on floor-cents, so any engine derives the same bins. */
  def histogramQuantilesAuto(df: DataFrame, groupCol: String, valueCol: String,
      probsMilli: Seq[Int], bins: Int): DataFrame = {
    require(bins > 0, s"histogramQuantilesAuto needs bins>0, got $bins")
    val centsSql = s"cast(floor(($valueCol) * 100) as bigint)"
    val mm = df.agg(min(expr(centsSql)).as("lo"), max(expr(centsSql)).as("hi")).head()
    require(!mm.isNullAt(0),
      s"histogramQuantilesAuto: no non-null values in '$valueCol' to derive a range from")
    val loCents = mm.getLong(0)
    val span = mm.getLong(1) - loCents + 1
    val widthCents = (span + bins - 1) / bins
    histogramQuantiles(df, groupCol, valueCol, probsMilli, loCents, widthCents, bins)
  }

  /** The integer-cent bin assignment shared by the batch sketch and the
    * streaming windowed histogram (StreamingDiff.streamingHistogramCounts):
    * out-of-range values clamp to the edge bins. `valueSql` is a SQL
    * expression (integer division has no Column operator). */
  def histogramBin(valueSql: String, loCents: Long, widthCents: Long, bins: Int): Column =
    least(lit((bins - 1).toLong), greatest(lit(0L),
      expr(s"(cast(floor(($valueSql) * 100) as bigint) - ${loCents}L) div ${widthCents}L")))

  /** Distribution drift between two tables over the same fixed bins — the
    * monitoring counterpart of per-column diff stats: has yesterday's corpus
    * shifted against today's? Each side aggregates to O(bins) counts (one
    * partial-aggregated scan each), a full-outer join aligns the bins, and
    * a bin flags when the SHARES differ by more than 5%:
    * |cntA/totA − cntB/totB| > 1/20, cross-multiplied into exact DECIMAL(38)
    * products so no float exists to drift between engines and the int64
    * ceiling (cntA·totB at ~10¹² rows/side) can't wrap. */
  def histogramDrift(a: DataFrame, b: DataFrame, valueSql: String,
      loCents: Long, widthCents: Long, bins: Int): DataFrame = {
    // NULLs excluded (see histogramQuantiles); `j` pinned because it
    // feeds both the totals and the main select — unpinned, BOTH inputs
    // scan twice (the same audited shape psiOverCounts pins against)
    val j = binCounts(a, valueSql, loCents, widthCents, bins, "cnt_a")
      .join(binCounts(b, valueSql, loCents, widthCents, bins, "cnt_b"),
        Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .localCheckpoint(true)
    val tot = j.agg(sum(col("cnt_a")).as("tot_a"), sum(col("cnt_b")).as("tot_b"))
    j.crossJoin(broadcast(tot))
      .withColumn("flag_drift",
        expr("abs(cast(cnt_a as decimal(38,0)) * tot_b - cast(cnt_b as decimal(38,0)) * tot_a) * 20" +
          " > cast(tot_a as decimal(38,0)) * tot_b"))
      .select("bin", "cnt_a", "cnt_b", "flag_drift")
  }

  /** Population-stability drift score over the shared fixed bins — the
    * monitoring statistic layered on [[histogramDrift]]'s per-bin flags:
    * one number that trends as two distributions diverge (the classic PSI
    * Σ(pa−pb)·ln(pa/pb), re-expressed integer-exact).
    *
    * Engine-reproducibility forces the formulation (same reason TF-IDF
    * here uses bit-length idf): libm `ln` differs in the last ulp across
    * engines, so the classic float PSI cannot hash-match an oracle.
    * Instead probabilities quantize to milli-units (·1000 integer div)
    * and log2 is the bit-length difference of the smoothed milli-probs:
    *
    *   psi_millibits = Σ_bins (pa_milli − pb_milli)
    *                          · (bitlen(pa_milli+1) − bitlen(pb_milli+1))
    *
    * Every factor is a small integer (≤1000 regardless of row count — the
    * milli quantization happens AFTER the per-side totals, so nothing here
    * can overflow at any scale), bitlen is monotone so each term is ≥ 0
    * like true PSI terms, and the +1 smoothing absorbs empty bins (which
    * are also reported separately — a bin newly appearing on one side is
    * its own drift signal). Resolution is 0.1% per bin: exactly the
    * granularity drift MONITORING needs, traded for bit-exact determinism
    * on any engine. Plan shape = histogramDrift's: two map-side bin
    * aggregations, a ≤bins-row join, one broadcast of two totals. */
  def psiDrift(a: DataFrame, b: DataFrame, valueSql: String,
      loCents: Long, widthCents: Long, bins: Int): DataFrame =
    psiOverCounts(binCounts(a, valueSql, loCents, widthCents, bins, "cnt_a"),
      binCounts(b, valueSql, loCents, widthCents, bins, "cnt_b"))

  /** One side's per-bin counts (NULL values excluded — a bin=NULL row
    * would inflate totals and sort differently per engine), shared by the
    * drift monitors. */
  private def binCounts(df: DataFrame, valueSql: String,
      loCents: Long, widthCents: Long, bins: Int, out: String): DataFrame =
    df.where(expr(s"($valueSql) is not null"))
      .select(histogramBin(valueSql, loCents, widthCents, bins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))

  /** The PSI tail shared by the numeric-histogram drift (`psiDrift`) and
    * CATEGORICAL drift monitors (e.g. embedding cluster shares): takes two
    * pre-aggregated count relations `(bin, cnt_a)` / `(bin, cnt_b)` —
    * categories are just bins — and emits the one-row integer milli-bits
    * PSI summary. Everything after the counts is O(bins). */
  def psiOverCounts(countsA: DataFrame, countsB: DataFrame): DataFrame = {
    // `j` feeds BOTH the totals and the main aggregate; without pinning,
    // each execution recomputes it — i.e. re-SCANS both inputs (audited:
    // the drift gates planned 2× the scans). The joined counts are
    // O(bins) rows, so an eager localCheckpoint pins them for pennies and
    // each input is scanned exactly once.
    val j = countsA.join(countsB, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .localCheckpoint(true)
    val tot = j.agg(sum(col("cnt_a")).as("tot_a"), sum(col("cnt_b")).as("tot_b"))
    j.crossJoin(broadcast(tot))
      .withColumn("pa_milli", expr("(cnt_a * 1000) div tot_a"))
      .withColumn("pb_milli", expr("(cnt_b * 1000) div tot_b"))
      .agg(
        sum(expr("(pa_milli - pb_milli) * " +
          "(length(bin(pa_milli + 1)) - length(bin(pb_milli + 1)))"))
          .cast("long").as("psi_millibits"),
        sum(when(col("cnt_a") > 0 && col("cnt_b") === 0, 1L).otherwise(0L))
          .as("n_bins_a_only"),
        sum(when(col("cnt_b") > 0 && col("cnt_a") === 0, 1L).otherwise(0L))
          .as("n_bins_b_only"),
        sum(when(col("cnt_a") > 0 && col("cnt_b") > 0, 1L).otherwise(0L))
          .as("n_bins_shared"))
  }

  /** Quantile selection over pre-aggregated `(grp, bin, cnt)` rows — bin
    * counts are ADDITIVE, so any merged/unioned count relation feeds this
    * unchanged: the batch sketch above, a streaming windowed histogram's
    * sink table, or counts summed across days. Same integer
    * cross-multiplied rank rule, same per-group ≤bins window bound. */
  def quantilesFromBinCounts(counts: DataFrame, groupOutCol: String,
      probsMilli: Seq[Int], loCents: Long, widthCents: Long): DataFrame = {
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(Window.partitionBy("grp").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("grp")))
    cum
      .select(col("grp"), col("cum"), col("n"), col("bin"),
        explode(array(probsMilli.map(p => lit(p.toLong)): _*)).as("p_milli"))
      .groupBy("grp", "p_milli")
      .agg(max(col("n")).as("n"),
        min(when(col("cum") * 1000 >= col("p_milli") * col("n"), col("bin"))).as("qbin"))
      .select(col("grp").as(groupOutCol), col("p_milli"), col("n"), col("qbin"),
        ((lit(loCents) + col("qbin") * lit(widthCents)).cast("double") / lit(100.0)).as("est"))
  }

  val queries: Map[String, Q] = Map(
    // -- scans / projections / filters ------------------------------------
    "q_scan_project" -> ((s, d) =>
      t(s, d, "region").select(col("r_regionkey"), col("r_name")).orderBy("r_regionkey")),

    "q_filter_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") < lit("1995-09-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q_scalar_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 10)).as("up_name"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        floor(col("p_retailprice")).as("floor_price"),
        abs(col("p_size") - lit(25)).cast("long").as("size_dist"))
        .orderBy("p_partkey")),

    "q_case_when" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        floor(col("o_totalprice")).as("floor_price"))
        .orderBy("o_orderkey")),

    "q_date_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"))
        .orderBy("o_orderkey")),

    // -- aggregations -----------------------------------------------------
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))).cast("double").as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_count_distinct" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"))),

    // Deterministic HyperLogLog (m=256 registers): built-in HLL sketches are
    // engine-specific, so this builds the sketch from first principles with
    // cross-engine-reproducible pieces — md5-derived 48-bit hashes, low 8
    // bits pick the register, rank = leading-zero count of the top 40 bits,
    // Z accumulated as an EXACT integer (Σ 2^(41-ρ) over registers), and one
    // final exactly-rounded IEEE division for the estimate. Same single
    // shuffle shape as a real HLL: map-side partial MAX per register.
    "q_approx_distinct" -> ((s, d) =>
      hllEstimates(t(s, d, "lineitem"), Seq("l_orderkey", "l_partkey"))
        .orderBy("col_name")),

    // KMV (k-minimum-values) sketch — the other classic distinct-count
    // sketch: keep the k smallest distinct 48-bit hashes; the k-th smallest
    // estimates density, est = (k−1)·2^48 / h_k. Hash order makes the
    // bottom-k fully deterministic; the global top-k runs as
    // TakeOrderedAndProject (map-side partial top-k, no full sort). The
    // same bottom-k set doubles as a deterministic uniform sample.
    "q_kmv_distinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val h = graft.functions.Md5Bits48.head(col("l_orderkey").cast("string"))
      val bottomK = li.where(col("l_orderkey").isNotNull)
        .select(h.as("h")).distinct()
        .orderBy(col("h").asc).limit(256)
      bottomK.agg(count(lit(1)).as("k_used"), max(col("h")).as("hk"))
        .select(col("k_used"), col("hk"),
          ((col("k_used") - 1).cast("double") * lit(281474976710656.0)
            / col("hk").cast("double")).as("n_kmv"))
        .crossJoin(li.agg(countDistinct(col("l_orderkey")).as("n_exact")))
    }),

    // KMV SET OPERATIONS (Beyer et al. 2007): distinct-count estimates for
    // union / intersection / A-not-B of two key sets from their bottom-256
    // hash sketches — the cross-engine diff pre-flight that never joins
    // the tables. Each side's sketch is a local scan + map-side top-k;
    // the sketches meet on ≤256 rows and everything downstream is
    // constant-size arithmetic (see graft.diff.KmvSketch).
    "q_kmv_setops" -> ((s, d) => {
      val o = t(s, d, "orders")
      val sa = graft.diff.KmvSketch.sketch(
        o.where(col("o_orderstatus") === "O"), col("o_custkey"))
      val sb = graft.diff.KmvSketch.sketch(
        o.where(col("o_orderstatus") === "F"), col("o_custkey"))
      graft.diff.KmvSketch.setOps(sa, sb)
    }),

    "q_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_having" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"), sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .where(col("n_items") > 50)
        .orderBy("l_suppkey")),

    // -- joins ------------------------------------------------------------
    "q_join_broadcast" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy("c_mktsegment")
    }),

    "q_join_multi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      // Pre-aggregate the fact table on its join key BEFORE the join —
      // Catalyst does not push aggregates below joins, and o_orderkey is
      // unique in orders, so grouping lineitem first shrinks the join input
      // 4× here (unboundedly at scale) and makes the post-join groupBy
      // unnecessary. The aggregate's output partitioning (l_orderkey) is
      // reused by the join: only `orders` shuffles.
      val lr = l.groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount"))).as("revenue_dec"))
      lr.join(o, col("l_orderkey") === o("o_orderkey"), "inner")
        .join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .orderBy(col("revenue_dec").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("c_mktsegment"), col("revenue_dec").cast("double").as("revenue"))
    }),

    "q_join_left" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec2(col("o_totalprice"))).cast("double"), lit(0.0)).as("total"))
        .orderBy("c_custkey")
    }),

    "q_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // -- set ops ----------------------------------------------------------
    "q_set_ops" -> ((s, d) => {
      val a = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      val b = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      a.intersect(b).withColumn("op", lit("intersect"))
        .union(a.except(b).withColumn("op", lit("except")))
        .union(a.union(b).distinct().withColumn("op", lit("union")))
        .orderBy("op", "nationkey")
    }),

    // Multiset (ALL) variants — bag semantics with duplicate counts.
    "q_set_ops_all" -> ((s, d) => {
      val a = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      val b = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      a.intersectAll(b).withColumn("op", lit("intersect_all"))
        .union(a.exceptAll(b).withColumn("op", lit("except_all")))
        .groupBy(col("op"), col("nationkey")).agg(count(lit(1)).as("n"))
        .orderBy("op", "nationkey")
    }),

    // -- sort / top-k -----------------------------------------------------
    "q_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    // -- window functions -------------------------------------------------
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rnk").cast("long").as("rnk"))
        .orderBy("c_mktsegment", "rnk")
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("running_value", sum(dec2(col("value"))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("running_value"))
        .orderBy("user_id", "event_id")
    }),

    // Navigation functions over each user's event timeline.
    "q_window_nav" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"),
          first(col("event_id")).over(w).as("first_id"))
        .orderBy("user_id", "event_id")
    }),

    // ntile — the window-based segmenter (SURVEY §2.5: the idiomatic
    // single-source alternative to key-range arithmetic). Total order via
    // the unique key tiebreak makes tile assignment deterministic.
    //
    // NOT `ntile(8).over(Window.orderBy(...))`: a global unpartitioned
    // window funnels every row through ONE task — as the designated
    // segmenter it would die exactly when segmentation matters. Two-level
    // instead: (1) range-exchange on the sort key, so partitions are
    // globally ordered but each sorts in parallel; (2) the ≤32
    // per-partition counts prefix-sum on the driver into global-rank
    // offsets; (3) ONE fused streaming pass assigns ranks AND pre-aggregates
    // per tile-run — tiles are contiguous rank runs inside a sorted
    // partition, so each partition emits ≤ tiles+1 partial rows and the
    // final aggregate reduces ~39 rows, not the full table. Only the sort
    // key's tiebreak column is cached (the sort value dies with the
    // exchange). persist() pins ONE materialization, so the counts job and
    // the fused pass see the same range bounds (the partitioner object is
    // fixed in the cached RDD's lineage — re-running the exchange would
    // re-sample different bounds). Bit-identical to the window form at any
    // partition count.
    "q_window_ntile" -> ((s, d) => {
      import s.implicits._
      val tiles = 8L
      val local = t(s, d, "orders")
        .select(col("o_totalprice").cast("double").as("p"), col("o_orderkey").cast("long").as("k"))
        .repartitionByRange(32, col("p"), col("k"))
        .sortWithinPartitions("p", "k")
        .select(col("k"))
        // localCheckpoint, not persist(): persist registers in the session
        // CacheManager and is never dropped here (each invocation would
        // leak a cached copy for the JVM's life), while a localCheckpoint
        // is released by the ContextCleaner once unreferenced — and its
        // eager materialization pins the sampled range bounds just the same
        .localCheckpoint(true)
      // one job over the pinned blocks returns the per-partition counts
      val cnts = local.groupBy(spark_partition_id().as("pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = cnts.map(_._2).sum
      val offsets: Map[Int, Long] =
        cnts.map(_._1).zip(cnts.scanLeft(0L)(_ + _._2)).toMap
      val q = n / tiles
      val rem = n % tiles
      val cut = rem * (q + 1) // ranks <= cut land in the (q+1)-sized tiles
      val partials = local.as[Long].mapPartitions { it =>
        def tileOf(r: Long): Long =
          if (q == 0) r // fewer rows than tiles: each row its own tile
          else if (r <= cut) (r + q) / (q + 1)
          else rem + (r - cut + q - 1) / q
        var r = offsets.getOrElse(org.apache.spark.TaskContext.getPartitionId(), 0L)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var tile = -1L; var cnt = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        it.foreach { k =>
          r += 1
          val tr = tileOf(r)
          if (tr != tile) {
            if (tile >= 0) out += ((tile, cnt, mn, mx))
            tile = tr; cnt = 0L; mn = Long.MaxValue; mx = Long.MinValue
          }
          cnt += 1
          if (k < mn) mn = k
          if (k > mx) mx = k
        }
        if (tile >= 0) out += ((tile, cnt, mn, mx))
        out.iterator
      }.toDF("tile", "cnt", "mn", "mx")
      partials.groupBy("tile")
        .agg(sum("cnt").as("n"), min("mn").as("min_key"), max("mx").as("max_key"))
        .orderBy("tile")
    }),

    // RANGE frame: value-based window over epoch seconds — each event sums
    // the user's values in the preceding hour (inclusive), exact decimals.
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("es").asc)
        .rangeBetween(-3600L, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"),
          dec2(col("value")).as("v"))
        .withColumn("hour_sum", sum(col("v")).over(w).cast("double"))
        .select("user_id", "event_id", "es", "hour_sum")
        .orderBy("user_id", "event_id")
    }),

    "q_join_right" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    "q_in_list" -> ((s, d) =>
      t(s, d, "part")
        .where(col("p_size").isin(1, 5, 9, 15, 25) && !col("p_brand").isin("Brand#1", "Brand#2"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), countDistinct(col("p_type")).as("n_types"))
        .orderBy("p_brand")),

    "q5_region_revenue" -> ((s, d) => {
      // TPC-H Q5 shape: 6-table join tree; dims broadcast, facts shuffle once.
      val r = broadcast(t(s, d, "region"))
      val n = broadcast(t(s, d, "nation"))
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") && su("s_nationkey") === c("c_nationkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * dec2(lit(1) - col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // -- sessionization over the event stream -----------------------------
    "q_sessionize" -> ((s, d) => {
      // Gap-based sessions (30 min): epoch-micros arithmetic is exact in
      // both engines; the windowed flag sum is integer → segment-tree safe.
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_session",
          when(lag(col("us"), 1).over(byUser).isNull
            || col("us") - lag(col("us"), 1).over(byUser) > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_session")).over(running))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
          max(col("us")).as("end_us"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy("user_id", "session_idx")
    }),

    // -- exact quantiles --------------------------------------------------
    "q_quantiles" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_price"))
        .orderBy("l_returnflag")),

    // Same quantiles through the bounded-state sketch: 128 bins of 1000.00
    // over l_extendedprice (range ~[900, 105k]) — the answer is exact to
    // the bin width, the state is O(bins) per group at ANY corpus size.
    "q_quantiles_sketch" -> ((s, d) =>
      histogramQuantiles(t(s, d, "lineitem"), "l_returnflag", "l_extendedprice",
        probsMilli = Seq(500, 900, 990), loCents = 0L, widthCents = 100000L,
        bins = 128)
        .orderBy("l_returnflag", "p_milli")),

    // Auto-ranged sketch: lo/width DERIVED from one min/max pre-pass, so
    // nothing clamps by construction (the clamped column proves it: 0).
    "q_quantiles_auto" -> ((s, d) =>
      histogramQuantilesAuto(t(s, d, "orders"), "o_orderpriority", "o_totalprice",
        probsMilli = Seq(250, 500, 750, 990), bins = 64)
        .orderBy("o_orderpriority", "p_milli")),

    // Distribution drift: line-item prices vs order totals — genuinely
    // different distributions (totals run ~5× higher), so low bins flag
    // B-light and the clamp bin flags B-heavy; non-vacuous by construction.
    "q_histogram_drift" -> ((s, d) =>
      histogramDrift(
        t(s, d, "lineitem").select(col("l_extendedprice").as("v")),
        t(s, d, "orders").select(col("o_totalprice").as("v")),
        "v", loCents = 0L, widthCents = 1000000L, bins = 16)
        .orderBy("bin")),

    // One-number drift score over the same two distributions: integer
    // milli-bits PSI (see psiDrift scaladoc for why not float ln).
    "q_psi_drift" -> ((s, d) =>
      psiDrift(
        t(s, d, "lineitem").select(col("l_extendedprice").as("v")),
        t(s, d, "orders").select(col("o_totalprice").as("v")),
        "v", loCents = 0L, widthCents = 1000000L, bins = 16)),

    // -- JSON column handling ---------------------------------------------
    "q_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(when(get_json_object(col("props"), "$.k").isNotNull, 1)).as("n_with_k"))
        .orderBy("event_type")),

    // -- time bucketing over the event stream -----------------------------
    "q_events_hourly" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
        .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type", "hour_epoch")),

    "q_funnel" -> ((s, d) =>
      funnel(t(s, d, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")).orderBy("stage")),

    // The conversion-window form: each stage must land within 48 h of the
    // previous stage's first occurrence (same single-scan window cascade;
    // the bound is one extra predicate in each stage's conditional min).
    "q_funnel_windowed" -> ((s, d) =>
      funnel(t(s, d, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"),
        maxGapUs = Some(48L * 3600L * 1000000L)).orderBy("stage")),

    "q_retention_cohorts" -> ((s, d) =>
      retentionCohorts(t(s, d, "events"), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),
  )

  /** Strict-order funnel over an event stream: a user advances a stage
    * only with an event STRICTLY AFTER their first occurrence of the
    * previous stage — the standard product-analytics funnel, generic over
    * the stage list.
    *
    * Plan shape (audited): the naive spelling — one filtered aggregate per
    * stage, each joined to the previous stage's times — scans the event
    * table O(stages²) times because every union branch recomputes its
    * whole prefix chain. This spelling is ONE scan and ONE data-sized
    * exchange instead: filter to the stage event types (pushed to the
    * scan), hash-partition by user once, then layer per-stage conditional
    * window minimums over that single partitioning — `t_i = min(us WHERE
    * et = stage_i AND us > t_{i-1}) OVER (PARTITION BY user)` references
    * the previous stage's column, so Catalyst runs the Window operators
    * back to back in-partition with NO further exchange (each is
    * partition-bounded, same key). The per-user reduction afterwards
    * reuses the same partitioning (zero-exchange groupBy), and only
    * `stages` partial-count rows cross the final single-partition
    * exchange. Epoch-micros integer arithmetic end to end.
    * Output: (stage, funnel_step, n_users), one row per stage prefix. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapUs.forall(_ > 0), s"conversion window must be positive: $maxGapUs")
    val w = Window.partitionBy("user_id")
    var cur = events
      .select(col(userCol).as("user_id"), col(typeCol).as("et"),
        unix_micros(col(tsCol)).as("us"))
      .where(col("et").isin(stages: _*))
    stages.zipWithIndex.foreach { case (stage, i) =>
      val cond =
        if (i == 0) col("et") === stage
        else {
          val after = col("et") === stage && col(s"_t${i - 1}").isNotNull &&
            col("us") > col(s"_t${i - 1}")
          // conversion window: the stage must land within maxGap of the
          // previous stage's first occurrence (the "converted within 7
          // days" spelling of the funnel)
          maxGapUs.fold(after)(g => after && col("us") <= col(s"_t${i - 1}") + g)
        }
      cur = cur.withColumn(s"_t$i", min(when(cond, col("us"))).over(w))
    }
    val perUser = cur.groupBy("user_id")
      .agg(stages.indices.map(i => max(col(s"_t$i")).as(s"_t$i")).head,
        stages.indices.map(i => max(col(s"_t$i")).as(s"_t$i")).tail: _*)
    val counts = perUser.agg(
      stages.indices.map(i =>
        sum(when(col(s"_t$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i")).head,
      stages.indices.map(i =>
        sum(when(col(s"_t$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i")).tail: _*)
    counts
      .select(explode(array(stages.indices.map(i => struct(
        lit(i + 1L).as("stage"),
        lit(stages.take(i + 1).mkString(">")).as("funnel_step"),
        coalesce(col(s"_n$i"), lit(0L)).as("n_users"))): _*)).as("r"))
      .select("r.stage", "r.funnel_step", "r.n_users")
  }

  /** Weekly retention cohorts: users grouped by the week of their FIRST
    * event, counted once per (cohort, weeks-since-first) they were active
    * in. Week arithmetic is integer days-since-epoch div 7 — no calendar
    * truncation semantics to disagree on between engines. Plan: first-day
    * per user (partial-agg on the user key), join back (same key, layout
    * reused), project to (cohort, offset, user), distinct + count — every
    * exchange keyed and linear; the cohort matrix itself is O(weeks²)
    * rows regardless of event volume. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // first_day as a window min over the same user partitioning, not a
    // self-join: one scan, and the per-user distinct that follows runs
    // IN PLACE because HashPartitioning(user_id) already clusters every
    // (user, cohort, offset) group — the only other exchange is the final
    // cohort-matrix aggregation of one-row-per-user-week partials
    // (plan pinned in the spec: 1 scan, 2 exchanges)
    val w = Window.partitionBy("user_id")
    events.select(col(userCol).as("user_id"),
      expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .withColumn("first_day", min("day").over(w))
      .select(col("user_id"), expr("first_day div 7").as("cohort_week"),
        expr("(day - first_day) div 7").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB rendering of the deterministic HLL in `hllEstimate` — identical
    * hash, register, and estimate arithmetic (format('{:b}', x) ≡ bin(x)). */
  private def hllOracleSql(c: String): String =
    s"""SELECT '$c' AS col_name,
       |  0.7213 / (1.0 + 1.079/256.0) * 65536.0 * 2199023255552.0 /
       |    CAST((256 - m_used) * 2199023255552 + z_used AS DOUBLE) AS n_hll,
       |  (SELECT COUNT(DISTINCT $c) FROM lineitem) AS n_exact
       |FROM (
       |  SELECT COUNT(*) AS m_used,
       |    CAST(SUM(CAST(1 AS BIGINT) << (41 - r)) AS BIGINT) AS z_used
       |  FROM (
       |    SELECT h % 256 AS bucket,
       |      MAX(CASE WHEN h // 256 = 0 THEN 41 ELSE 41 - length(format('{:b}', h // 256)) END) AS r
       |    FROM (SELECT ('0x' || substring(md5($c::VARCHAR), 1, 12))::BIGINT AS h
       |          FROM lineitem WHERE $c IS NOT NULL) GROUP BY 1))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "q_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(substring(p_name, 1, 10)) AS up_name,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '#' || p_type AS brand_type,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |  CAST(abs(p_size - 25) AS BIGINT) AS size_dist
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'big'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floor_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  CAST(day(o_orderdate) AS BIGINT) AS o_day
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_count_distinct" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
        |FROM lineitem""".stripMargin,

    "q_approx_distinct" ->
      s"${hllOracleSql("l_orderkey")}\nUNION ALL\n${hllOracleSql("l_partkey")}\nORDER BY col_name",

    "q_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT ('0x' || substring(md5(l_orderkey::VARCHAR), 1, 12))::BIGINT AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL),
        |k AS (SELECT h FROM h ORDER BY h ASC LIMIT 256),
        |s AS (SELECT COUNT(*) AS k_used, max(h) AS hk FROM k)
        |SELECT k_used, hk,
        |  (k_used - 1)::DOUBLE * 281474976710656.0 / CAST(hk AS DOUBLE) AS n_kmv,
        |  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_exact
        |FROM s""".stripMargin,

    "q_kmv_setops" ->
      """WITH sa AS (
        |  SELECT DISTINCT ('0x' || substring(md5(o_custkey::VARCHAR), 1, 12))::BIGINT AS h
        |  FROM orders WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL
        |  ORDER BY h ASC LIMIT 256),
        |sb AS (
        |  SELECT DISTINCT ('0x' || substring(md5(o_custkey::VARCHAR), 1, 12))::BIGINT AS h
        |  FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
        |  ORDER BY h ASC LIMIT 256),
        |m AS (
        |  SELECT h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        |    SELECT h, 1 AS in_a, 0 AS in_b FROM sa
        |    UNION ALL SELECT h, 0 AS in_a, 1 AS in_b FROM sb) u
        |  GROUP BY h ORDER BY h ASC LIMIT 256),
        |g AS (
        |  SELECT COUNT(*) AS k_union, MAX(h) AS hk_union,
        |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
        |    CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS n_a_only,
        |    CAST(SUM(in_b * (1 - in_a)) AS BIGINT) AS n_b_only
        |  FROM m),
        |e AS (
        |  SELECT *, CASE WHEN k_union < 256 THEN CAST(k_union AS DOUBLE)
        |    ELSE CAST(k_union - 1 AS DOUBLE) * 281474976710656.0 / CAST(hk_union AS DOUBLE)
        |  END AS est_union FROM g)
        |SELECT k_union, hk_union, n_both, n_a_only, n_b_only, est_union,
        |  CAST(n_both AS DOUBLE) * est_union / CAST(k_union AS DOUBLE) AS est_inter,
        |  CAST(n_a_only AS DOUBLE) * est_union / CAST(k_union AS DOUBLE) AS est_a_not_b
        |FROM e""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_having" ->
      """SELECT l_suppkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 50
        |ORDER BY l_suppkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_multi" ->
      """SELECT o_orderkey, c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY o_orderkey, c_mktsegment
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_set_ops" ->
      """SELECT nationkey, 'intersect' AS op FROM
        |  (SELECT s_nationkey AS nationkey FROM supplier INTERSECT SELECT c_nationkey FROM customer)
        |UNION ALL
        |SELECT nationkey, 'except' AS op FROM
        |  (SELECT s_nationkey AS nationkey FROM supplier EXCEPT SELECT c_nationkey FROM customer)
        |UNION ALL
        |SELECT nationkey, 'union' AS op FROM
        |  (SELECT s_nationkey AS nationkey FROM supplier UNION SELECT c_nationkey FROM customer)
        |ORDER BY op, nationkey""".stripMargin,

    "q_set_ops_all" ->
      """SELECT op, nationkey, COUNT(*) AS n FROM (
        |  SELECT nationkey, 'intersect_all' AS op FROM
        |    (SELECT s_nationkey AS nationkey FROM supplier INTERSECT ALL SELECT c_nationkey FROM customer)
        |  UNION ALL
        |  SELECT nationkey, 'except_all' AS op FROM
        |    (SELECT s_nationkey AS nationkey FROM supplier EXCEPT ALL SELECT c_nationkey FROM customer)
        |) GROUP BY op, nationkey ORDER BY op, nationkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rnk
        |  FROM customer) sub
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "q_window_running" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ASC
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_window_nav" ->
      """SELECT user_id, event_id,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  first_value(event_id) OVER w AS first_id
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_window_ntile" ->
      """SELECT tile, COUNT(*) AS n,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM (
        |  SELECT o_orderkey,
        |    CAST(ntile(8) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS tile
        |  FROM orders)
        |GROUP BY tile ORDER BY tile""".stripMargin,

    "q_window_range" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS es,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events)
        |SELECT user_id, event_id, es,
        |  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY es ASC
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM e ORDER BY user_id, event_id""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_in_list" ->
      """SELECT p_brand, COUNT(*) AS n, COUNT(DISTINCT p_type) AS n_types
        |FROM part
        |WHERE p_size IN (1, 5, 9, 15, 25) AND p_brand NOT IN ('Brand#1', 'Brand#2')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us, value FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(us, 1) OVER w IS NULL
        |                   OR us - lag(us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
        |sessions AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    "q_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_histogram_drift" ->
      """WITH ca AS (
        |  SELECT least(15, greatest(0, CAST(floor(l_extendedprice * 100) AS BIGINT) // 1000000)) AS bin,
        |    COUNT(*) AS cnt_a
        |  FROM lineitem GROUP BY 1),
        |cb AS (
        |  SELECT least(15, greatest(0, CAST(floor(o_totalprice * 100) AS BIGINT) // 1000000)) AS bin,
        |    COUNT(*) AS cnt_b
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ca.bin, cb.bin) AS bin,
        |    CAST(COALESCE(cnt_a, 0) AS BIGINT) AS cnt_a,
        |    CAST(COALESCE(cnt_b, 0) AS BIGINT) AS cnt_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |tot AS (SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b FROM j)
        |SELECT bin, cnt_a, cnt_b,
        |  abs(cnt_a * tot_b - cnt_b * tot_a) * 20 > tot_a * tot_b AS flag_drift
        |FROM j, tot ORDER BY bin""".stripMargin,

    "q_psi_drift" ->
      """WITH ca AS (
        |  SELECT least(15, greatest(0, CAST(floor(l_extendedprice * 100) AS BIGINT) // 1000000)) AS bin,
        |    COUNT(*) AS cnt_a
        |  FROM lineitem GROUP BY 1),
        |cb AS (
        |  SELECT least(15, greatest(0, CAST(floor(o_totalprice * 100) AS BIGINT) // 1000000)) AS bin,
        |    COUNT(*) AS cnt_b
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ca.bin, cb.bin) AS bin,
        |    CAST(COALESCE(cnt_a, 0) AS BIGINT) AS cnt_a,
        |    CAST(COALESCE(cnt_b, 0) AS BIGINT) AS cnt_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |tot AS (SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b FROM j),
        |p AS (
        |  -- CAST: SUM(BIGINT) is HUGEINT in DuckDB and format('{:b}')
        |  -- refuses hugeints
        |  SELECT CAST((cnt_a * 1000) // tot_a AS BIGINT) AS pa_milli,
        |         CAST((cnt_b * 1000) // tot_b AS BIGINT) AS pb_milli,
        |         cnt_a, cnt_b
        |  FROM j, tot)
        |SELECT
        |  CAST(SUM((pa_milli - pb_milli) *
        |    (length(format('{:b}', pa_milli + 1)) - length(format('{:b}', pb_milli + 1)))) AS BIGINT)
        |    AS psi_millibits,
        |  CAST(SUM(CASE WHEN cnt_a > 0 AND cnt_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_a_only,
        |  CAST(SUM(CASE WHEN cnt_b > 0 AND cnt_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_b_only,
        |  CAST(SUM(CASE WHEN cnt_a > 0 AND cnt_b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_shared
        |FROM p""".stripMargin,

    "q_quantiles_sketch" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    least(127, greatest(0, (CAST(floor(l_extendedprice * 100) AS BIGINT) - 0) // 100000)) AS bin,
        |    CASE WHEN (CAST(floor(l_extendedprice * 100) AS BIGINT) - 0) // 100000 < 0
        |      OR (CAST(floor(l_extendedprice * 100) AS BIGINT) - 0) // 100000 > 127
        |      THEN 1 ELSE 0 END AS oob
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, bin, COUNT(*) AS cnt, SUM(oob) AS oob FROM b GROUP BY 1, 2),
        |cl AS (SELECT l_returnflag, CAST(SUM(oob) AS BIGINT) AS clamped FROM c GROUP BY 1),
        |cc AS (SELECT l_returnflag, bin, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM c),
        |x AS (SELECT cc.*, p.p_milli FROM cc,
        |  (SELECT CAST(unnest([500, 900, 990]) AS BIGINT) AS p_milli) p),
        |q AS (
        |  SELECT l_returnflag, p_milli, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MIN(CASE WHEN cum * 1000 >= p_milli * n THEN bin END) AS BIGINT) AS qbin
        |  FROM x GROUP BY 1, 2)
        |SELECT q.l_returnflag, p_milli, n, qbin,
        |  CAST(0 + qbin * 100000 AS DOUBLE) / 100.0 AS est, clamped
        |FROM q JOIN cl ON q.l_returnflag = cl.l_returnflag
        |ORDER BY q.l_returnflag, p_milli""".stripMargin,

    "q_quantiles_auto" ->
      """WITH mm AS (SELECT MIN(CAST(floor(o_totalprice * 100) AS BIGINT)) AS lo,
        |    MAX(CAST(floor(o_totalprice * 100) AS BIGINT)) AS hi FROM orders),
        |p0 AS (SELECT lo, (hi - lo + 64) // 64 AS w FROM mm),
        |b AS (SELECT o_orderpriority,
        |    least(63, greatest(0, (CAST(floor(o_totalprice * 100) AS BIGINT) - lo) // w)) AS bin,
        |    CASE WHEN (CAST(floor(o_totalprice * 100) AS BIGINT) - lo) // w < 0
        |      OR (CAST(floor(o_totalprice * 100) AS BIGINT) - lo) // w > 63
        |      THEN 1 ELSE 0 END AS oob
        |  FROM orders, p0),
        |c AS (SELECT o_orderpriority, bin, COUNT(*) AS cnt, SUM(oob) AS oob FROM b GROUP BY 1, 2),
        |cl AS (SELECT o_orderpriority, CAST(SUM(oob) AS BIGINT) AS clamped FROM c GROUP BY 1),
        |cc AS (SELECT o_orderpriority, bin, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
        |  FROM c),
        |x AS (SELECT cc.*, p.p_milli FROM cc,
        |  (SELECT CAST(unnest([250, 500, 750, 990]) AS BIGINT) AS p_milli) p),
        |q AS (
        |  SELECT o_orderpriority, p_milli, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MIN(CASE WHEN cum * 1000 >= p_milli * n THEN bin END) AS BIGINT) AS qbin
        |  FROM x GROUP BY 1, 2)
        |SELECT q.o_orderpriority, p_milli, n, qbin,
        |  CAST(lo + qbin * w AS DOUBLE) / 100.0 AS est, clamped
        |FROM q JOIN cl ON q.o_orderpriority = cl.o_orderpriority CROSS JOIN p0
        |ORDER BY q.o_orderpriority, p_milli""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 END) AS n_with_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_events_hourly" ->
      """SELECT event_type,
        |  CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_epoch,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |t1 AS (SELECT user_id, MIN(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS funnel_step,
        |         (SELECT COUNT(*) FROM t1) AS n_users
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'view>click', (SELECT COUNT(*) FROM t2)
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'view>click>purchase', (SELECT COUNT(*) FROM t3))
        |ORDER BY stage""".stripMargin,

    "q_funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |t1 AS (SELECT user_id, MIN(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN t1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1
        |         AND us <= t1 + 172800000000 GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN t2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2
        |         AND us <= t2 + 172800000000 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS funnel_step,
        |         (SELECT COUNT(*) FROM t1) AS n_users
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'view>click', (SELECT COUNT(*) FROM t2)
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'view>click>purchase', (SELECT COUNT(*) FROM t3))
        |ORDER BY stage""".stripMargin,

    "q_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY user_id),
        |m AS (SELECT DISTINCT e.user_id, first_day // 7 AS cohort_week,
        |        (day - first_day) // 7 AS week_offset
        |      FROM e JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, COUNT(*) AS n_users
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
