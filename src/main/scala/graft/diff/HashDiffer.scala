package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Checksum-first diff: cheap hash aggregation finds the key-space regions
  * that differ; only those regions pay for the expensive row exchange
  * (reference: data_diff/hashdiff_tables.py:88-264).
  *
  * The reference bisects recursively because every probe is a round-trip to a
  * remote database. Spark computes *all* segment checksums of one level in a
  * single scan+shuffle per side (map-side partial aggregation → a few KB per
  * executor), so one level of 2^k buckets replaces the whole recursion tree:
  *  - pass 1: per-bucket (count, checksum) on both sides, joined; buckets
  *    whose (count, checksum) match are pruned — the Spark analogue of the
  *    reference pruning checksum-equal segments.
  *  - pass 2: rows of dirty buckets only are shuffled and full-outer-joined
  *    (JoinDiffer on the filtered sides).
  * When diffs are rare (the hashdiff use case) pass 2 touches a tiny
  * fraction of rows; the job never materializes either table in memory.
  */
object HashDiffer {

  /** Sentinel for `diff`'s `buckets` (size the level from a cheap count)
    * and `refineFactor` (add a second level only when the dirty rows
    * warrant one). */
  val Auto = 0

  /** Dirty-row count above which an Auto second checksum level engages:
    * below ~1M rows the final exchange is already small and a refine pass
    * would cost more than it saves. */
  val RefineLeaf: Long = 1L << 20

  /** Target rows per fine cell for the Auto refine — the reference's
    * ~250k-row leaf (tests/test_database_types.py:744-745), so the final
    * exchange stays segment-sized regardless of how coarse level 1 was. */
  val RefineTargetRows: Long = 250000L

  /** Reference sizing heuristic: one bucket per ~250k rows, clamped to
    * [2, 128] (reference: tests/test_database_types.py:744-745 sizes its
    * bisection the same way). Small tables stop paying for 1024 mostly-
    * empty buckets; growing tables scale the level with the data. The
    * clamp mirrors the reference so leaf sizes stay comparable to its
    * segments; at the 100 TB end the Auto `refineFactor` (r19) adds a
    * second level on its own when the dirty buckets are still huge, so
    * the clamp no longer needs a knowing caller to compensate — one
    * Spark level costs a single scan+shuffle regardless of the bucket
    * count, so an explicit larger `buckets` remains cheap too. */
  def autoBuckets(n: Long): Int =
    math.max(2L, math.min(128L, n / 250000L)).toInt

  /** The Auto refine decision: 1 (no second level) while the dirty
    * buckets hold at most [[RefineLeaf]] rows — the final exchange is
    * already small; otherwise the factor that sizes fine cells at
    * [[RefineTargetRows]] rows, capped so the fine level stays O(64k)
    * cells. Deterministic driver arithmetic, unit-testable. */
  def autoRefineFactor(dirtyRows: Long, dirtyBucketCount: Int,
      nBuckets: Int): Int =
    if (dirtyRows <= RefineLeaf) 1
    else {
      val want = (dirtyRows / math.max(1, dirtyBucketCount) +
        RefineTargetRows - 1) / RefineTargetRows
      if (want <= 1L) 1 // dirty buckets already leaf-sized
      else math.min(want, math.max(2L, 65536L / nBuckets)).toInt
    }

  /** Deterministic key-space partition: xxhash64 of the key columns modulo
    * `buckets`. Hash, not range — uniform without knowing the distribution. */
  def bucketOf(keyCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets))

  /** Per-segment summary surface — the InfoTree analogue (reference:
    * data_diff/info_tree.py:9-62): both sides' (count, checksum) per bucket
    * plus the dirty flag, BEFORE pruning, so a user can see which key-space
    * regions differ and how much without paying for the row join.
    *
    * `parity = false` (default) uses the fast raw-column xxhash64 checksum —
    * both sides are hashed by this engine in one job, so md5 string parity
    * buys nothing. `parity = true` uses the cross-engine md5 form, whose
    * values any profiled engine (and the DuckDB oracle) reproduces
    * bit-for-bit. `bucketColFor` defaults to the hash partition used by
    * `diff`; pass e.g. `pmod(col(key), lit(n))` for oracle-checkable
    * buckets. */
  def bucketSummaries(a: TableSegment, b: TableSegment, buckets: Int,
      parity: Boolean = false,
      bucketColFor: TableSegment => Column = null): DataFrame = {
    require(a.keyCols == b.keyCols, "key columns must match")
    def bcol(t: TableSegment): Column =
      if (bucketColFor == null) bucketOf(t.keyCols, buckets) else bucketColFor(t)
    def side(t: TableSegment): DataFrame =
      if (parity) t.bucketChecksums(bcol(t)) else t.fastBucketChecksums(bcol(t))
    val ac = side(a).withColumnRenamed("cnt", "a_cnt").withColumnRenamed("checksum", "a_checksum")
    val bc = side(b).withColumnRenamed("cnt", "b_cnt").withColumnRenamed("checksum", "b_checksum")
    ac.join(bc, Seq("bucket"), "full_outer")
      .withColumn("is_dirty",
        !(col("a_cnt") <=> col("b_cnt")) || !(col("a_checksum") <=> col("b_checksum")))
  }

  /** Buckets whose summaries differ between the two sides. */
  def dirtyBuckets(a: TableSegment, b: TableSegment, buckets: Int): Array[Long] =
    bucketSummaries(a, b, buckets)
      .where(col("is_dirty"))
      .select("bucket").collect().map(_.getLong(0))

  /** Diff rows, same output contract as JoinDiffer.diff.
    *
    * `refineFactor > 1` adds a second, finer checksum level over the rows of
    * dirty coarse buckets (buckets × refineFactor cells) before the join —
    * the reference's recursive bisection flattened to two levels. Worth it
    * when diffs are rare AND coarse buckets are huge: the extra pass scans
    * only the dirty fraction and shrinks the final exchange by up to the
    * refine factor. `refineFactor = Auto` (the default, r19) sizes this
    * from the level-1 summaries themselves: when the dirty buckets hold
    * more than [[RefineLeaf]] rows, a second level targeting
    * [[RefineTargetRows]]-row cells engages on its own — at the 100 TB
    * end a caller no longer has to know to ask; `1` disables. The extra
    * pass scans only dirty-bucket rows, so it never triggers where it
    * cannot pay for itself. */
  def diff(a: TableSegment, b: TableSegment, buckets: Int = Auto,
      refineFactor: Int = Auto, jsonCols: Set[String] = Set.empty): DataFrame = {
    val compare = a.relevantCols.filterNot(a.keyCols.contains)
    def emptyDiff =
      JoinDiffer.diff(a.scoped, b.scoped, a.keyCols, compare, jsonCols).where(lit(false))

    // Auto: derive the level size from a cheap column-pruned count of the
    // larger side — rows never leave the executors, and the count's scan
    // is a fraction of the checksum pass that follows it. The two counts
    // are independent Spark jobs; submit side a's from a helper thread so
    // they run CONCURRENTLY (halves the added pre-flight latency on large
    // tables).
    val nBuckets =
      if (buckets > 0) buckets
      else {
        import scala.concurrent.ExecutionContext.Implicits.global
        val fa = scala.concurrent.Future(
          a.scoped.select(a.keyCols.map(col): _*).count())
        val nb = b.scoped.select(b.keyCols.map(col): _*).count()
        val na = scala.concurrent.Await.result(
          fa, scala.concurrent.duration.Duration.Inf)
        autoBuckets(math.max(na, nb))
      }

    // jsonCols note: the bucket checksums hash raw strings, so a JSON-
    // equivalent-but-reordered payload makes its bucket dirty — that only
    // costs the bucket a trip through the final join, where the JSON-
    // equivalence flag correctly suppresses the row. The summaries carry
    // counts, so the Auto refine decision below costs no extra job.
    val dirtySummaries = bucketSummaries(a, b, nBuckets)
      .where(col("is_dirty"))
      .select(col("bucket"),
        greatest(coalesce(col("a_cnt"), lit(0L)),
          coalesce(col("b_cnt"), lit(0L))).as("n"))
      .collect() // O(buckets)
    val dirty = dirtySummaries.map(_.getLong(0))
    if (dirty.isEmpty) return emptyDiff
    // Every bucket differs → diffs are dense and the bucket filters would
    // only add per-row hashing to the full join; go straight to joindiff
    // (the reference likewise stops bisecting segments that all differ).
    if (dirty.length == nBuckets)
      return JoinDiffer.diff(a.scoped, b.scoped, a.keyCols, compare, jsonCols)
    val fA = a.withExtraFilter(bucketOf(a.keyCols, nBuckets).isin(dirty.toSeq: _*))
    val fB = b.withExtraFilter(bucketOf(b.keyCols, nBuckets).isin(dirty.toSeq: _*))

    val rf =
      if (refineFactor > 0) refineFactor
      else autoRefineFactor(dirtySummaries.map(_.getLong(1)).sum,
        dirty.length, nBuckets)
    val (finalA, finalB) =
      if (rf <= 1) (fA, fB)
      else {
        val fine = nBuckets * rf
        val dirtyFine = dirtyBuckets(fA, fB, fine)
        if (dirtyFine.isEmpty) return emptyDiff
        (fA.withExtraFilter(bucketOf(a.keyCols, fine).isin(dirtyFine.toSeq: _*)),
          fB.withExtraFilter(bucketOf(b.keyCols, fine).isin(dirtyFine.toSeq: _*)))
      }
    JoinDiffer.diff(finalA.scoped, finalB.scoped, a.keyCols, compare, jsonCols)
  }
}
