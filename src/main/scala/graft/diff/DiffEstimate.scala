package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight diff-rate estimation by deterministic key sampling — the
  * evidence a 100 TB diff needs BEFORE committing to a strategy.
  *
  * Bisection (HashDiffer / PushdownDiffer) wins when diffs are sparse:
  * checksum pruning discards clean segments and only leaf rows ever
  * move. The dense join (JoinDiffer) wins when the table differs
  * ~everywhere: every bisection level re-checksums data one shuffle
  * join would have compared once. Choosing wrong is the scale hazard
  * the round-9 review pinned on the dense-cutover trigger — so measure
  * instead of guessing: keep keys whose md5-48 hash ≡ 0 (mod `mod`) on
  * BOTH sides (the same deterministic predicate, so a key is sampled
  * on side A iff it is sampled on side B — independent random row
  * samples would manufacture phantom exclusives), diff only that
  * sliver, and extrapolate with a Wilson interval.
  *
  * Cost: one scan of each side restricted by a codegen'd hash filter,
  * ~N/mod rows through one join — versus the O(N·levels) checksum work
  * a mis-chosen bisection spends on a dense table, or the full-table
  * shuffle a mis-chosen dense join spends on a clean one.
  *
  * Reference analogue: none — data-diff picks its algorithm by flag
  * (`--algorithm`), not by evidence; the regime split itself mirrors
  * its joindiff (joindiff_tables.py) vs hashdiff bisection
  * (diff_tables.py:289-352).
  */
object DiffEstimate {

  /** `milliRate`/`upperMilliRate` are integer thousandths of the diff
    * rate — floor(1000·d/n) and the Wilson 95% upper bound — so the
    * decision surface is engine-exact (the gate reproduces them in
    * DuckDB down to the integer; doubles never cross the contract). */
  final case class DiffRateEstimate(
      sampledKeys: Long,
      differingKeys: Long,
      milliRate: Long,
      upperMilliRate: Long,
      recommendation: String) {
    def isDense: Boolean = recommendation == "dense-join"
  }

  /** Wilson score upper bound (95%, z=1.96) on a binomial proportion —
    * the small-sample-honest interval: at d=0, n=100 it still reports
    * ~3.6%, refusing to call a table clean on 100 clean samples. */
  def wilsonUpper(d: Long, n: Long, z: Double = 1.96): Double = {
    if (n <= 0) return 1.0
    val p = d.toDouble / n
    val z2 = z * z
    (p + z2 / (2 * n) + z * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) /
      (1 + z2 / n)
  }

  /** The deterministic sampling predicate: md5-48 of the '|'-joined key
    * rendering, mod `mod`. Hash-based (not `rand()`), so both sides,
    * both engines, and every retry draw the identical key subset. */
  def sampleFilter(keyCols: Seq[String], mod: Long): Column =
    pmod(graft.functions.Md5Bits48.head(
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)),
      lit(mod)) === 0

  /** Sample 1/mod of the key space on both sides, diff the sample, and
    * extrapolate. `differingKeys` counts sampled keys that are
    * one-sided (added/removed) or have any compare column unequal
    * under null-safe compare — the same predicate JoinDiffer emits
    * rows for, so the estimate converges on the true joindiff row
    * rate. Recommendation: "dense-join" when the POINT estimate
    * reaches `denseMilliCutoff` (5% default — the density where
    * bisection levels stop pruning anything), else "bisect"; callers
    * wanting the conservative test can compare `upperMilliRate`
    * themselves. */
  def estimate(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], mod: Long = 1024L,
      denseMilliCutoff: Long = 50L,
      jsonCols: Set[String] = Set.empty): DiffRateEstimate = {
    require(mod >= 1, s"mod must be >= 1, got $mod")
    val f = sampleFilter(keyCols, mod)
    val sa = a.where(f).select((keyCols ++ compareCols).map(col): _*)
    val sb = b.where(f).select((keyCols ++ compareCols).map(col): _*)
    val joined = sa.as("a").join(sb.as("b"),
      keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _),
      "full_outer")
    val oneSided = col(s"a.${keyCols.head}").isNull || col(s"b.${keyCols.head}").isNull
    // same per-column predicate JoinDiffer flags rows with — including
    // JSON equivalence, or a cosmetically-reordered JSON column would
    // read as a 100% diff rate and flip the recommendation to exactly
    // the wrong strategy
    val unequal = compareCols.map { c =>
      if (jsonCols.contains(c))
        !JsonCompare.jsonEquivalent(col(s"a.$c"), col(s"b.$c"))
      else !(col(s"a.$c") <=> col(s"b.$c"))
    }.reduceOption(_ || _).getOrElse(lit(false))
    val row = joined.agg(
      count(lit(1)).as("n"),
      sum(when(oneSided || unequal, 1L).otherwise(0L)).as("d")).head()
    val n = row.getLong(0)
    val d = if (row.isNullAt(1)) 0L else row.getLong(1)
    val milli = if (n == 0) 0L else 1000L * d / n
    val upper = if (n == 0) 1000L else math.floor(1000.0 * wilsonUpper(d, n)).toLong
    DiffRateEstimate(n, d, milli, upper,
      if (n > 0 && milli >= denseMilliCutoff) "dense-join" else "bisect")
  }
}
