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

  /** Deterministic key-space partition: xxhash64 of the key columns modulo
    * `buckets`. Hash, not range — uniform without knowing the distribution. */
  def bucketOf(keyCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(buckets))

  /** Bucket summaries that differ between the two sides. */
  def dirtyBuckets(a: TableSegment, b: TableSegment, buckets: Int): Array[Long] = {
    require(a.keyCols == b.keyCols, "key columns must match")
    val ac = a.bucketChecksums(bucketOf(a.keyCols, buckets)).withColumnRenamed("cnt", "a_cnt")
      .withColumnRenamed("checksum", "a_checksum")
    val bc = b.bucketChecksums(bucketOf(b.keyCols, buckets)).withColumnRenamed("cnt", "b_cnt")
      .withColumnRenamed("checksum", "b_checksum")
    ac.join(bc, Seq("bucket"), "full_outer")
      .where(!(col("a_cnt") <=> col("b_cnt")) || !(col("a_checksum") <=> col("b_checksum")))
      .select("bucket").collect().map(_.getLong(0))
  }

  /** Diff rows, same output contract as JoinDiffer.diff. */
  def diff(a: TableSegment, b: TableSegment, buckets: Int = 1024): DataFrame = {
    val dirty = dirtyBuckets(a, b, buckets)
    val aScoped = a.scoped
    val bScoped = b.scoped
    val cols = a.relevantCols
    if (dirty.isEmpty) {
      // No differences anywhere: empty frame with the diff schema.
      val empty = JoinDiffer.diff(aScoped, bScoped, a.keyCols, cols.filterNot(a.keyCols.contains))
      empty.where(lit(false))
    } else {
      val keep = (d: DataFrame, keys: Seq[String]) =>
        d.where(bucketOf(keys, buckets).isin(dirty.toSeq: _*))
      JoinDiffer.diff(keep(aScoped, a.keyCols), keep(bScoped, b.keyCols),
        a.keyCols, cols.filterNot(a.keyCols.contains))
    }
  }
}
