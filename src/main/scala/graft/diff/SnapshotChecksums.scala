package graft.diff

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted snapshot checksums: monitor a huge, churning table across runs
  * WITHOUT retaining the previous snapshot.
  *
  * The reference can only diff two LIVE tables (both sides are queried,
  * hashdiff_tables.py:88-264). At 100 TB, keeping yesterday's snapshot
  * around just to ask "what changed?" doubles storage; this extends the
  * checksum-segment idea along the time axis instead: `save` reduces the
  * table to one (bucket, cnt, checksum) row per hash bucket — a 100 TB
  * table summarizes to buckets × ~40 bytes in one scan with map-side
  * partial aggregation — and `compare` answers with one scan of the NEW
  * snapshot only, joined against the stored summary.
  *
  * What compare can and cannot say: it localizes change to hash buckets
  * (which keys changed is recoverable by re-scanning only dirty buckets of
  * the new table against any upstream source of truth) and quantifies
  * count drift per bucket; it cannot reconstruct old row VALUES — those
  * are gone by design.
  *
  * The default checksum is the raw-column xxhash64 sum
  * (`TableSegment.fastBucketChecksums` — stable across Spark versions, the
  * hash is specified by xxHash64); `parity = true` stores the cross-engine
  * md5 form any profiled engine reproduces, so a summary written by this
  * engine can later be checked inside a remote warehouse.
  */
object SnapshotChecksums {

  /** Write the segment's bucket summary to `path` (overwrites). The bucket
    * count and checksum mode ride along as literal columns, so a summary
    * directory is self-describing and `compare` cannot be run with
    * mismatched parameters. */
  def save(seg: TableSegment, path: String, buckets: Int = 4096,
      parity: Boolean = false): Unit =
    summarize(seg, buckets, parity)
      .withColumn("buckets", lit(buckets))
      .withColumn("parity", lit(parity))
      .write.mode("overwrite").parquet(path)

  private def summarize(seg: TableSegment, buckets: Int, parity: Boolean): DataFrame = {
    val bucketCol = HashDiffer.bucketOf(seg.keyCols, buckets)
    if (parity) seg.bucketChecksums(bucketCol) else seg.fastBucketChecksums(bucketCol)
  }

  /** One row per bucket that exists in either the stored summary or the
    * current table: `(bucket, old_cnt, new_cnt, old_checksum, new_checksum,
    * is_dirty)`. Buckets empty on both sides don't appear; a bucket present
    * on one side only is dirty (all its keys appeared or vanished). */
  def compare(seg: TableSegment, spark: SparkSession, path: String): DataFrame = {
    val stored = spark.read.parquet(path)
    val head = stored.select("buckets", "parity").head()
    val (buckets, parity) = (head.getInt(0), head.getBoolean(1))
    val old = stored.select(col("bucket"), col("cnt").as("old_cnt"),
      col("checksum").as("old_checksum"))
    val cur = summarize(seg, buckets, parity)
      .select(col("bucket"), col("cnt").as("new_cnt"), col("checksum").as("new_checksum"))
    old.join(cur, Seq("bucket"), "full_outer")
      .withColumn("is_dirty",
        !(col("old_cnt") <=> col("new_cnt")) ||
          !(col("old_checksum") <=> col("new_checksum")))
  }

  /** Scope a segment to the buckets `compare` marked dirty — the filter to
    * re-read only changed key-space regions of the new snapshot. Collects
    * only bucket ids (bounded by the bucket count, never by table size). */
  def dirtyScope(seg: TableSegment, spark: SparkSession, path: String): TableSegment = {
    val stored = spark.read.parquet(path)
    val buckets = stored.select("buckets").head().getInt(0)
    val dirty = compare(seg, spark, path)
      .where(col("is_dirty")).select("bucket").collect().map(_.getLong(0))
    seg.withExtraFilter(HashDiffer.bucketOf(seg.keyCols, buckets).isin(dirty.toSeq: _*))
  }
}
