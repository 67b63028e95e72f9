package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustered writes plus a
  * min/max file manifest, and the manifest-pruned scan that pays them off.
  *
  * This is the 100 TB operator the sf-scale gates can only hint at: a table
  * diffed or filtered on two+ dimensions (say `(customer, price)` or
  * `(tenant, day)`) wants its FILES clustered so a 2-D predicate touches a
  * handful of them, not all. One dimension is free (sort by it); two or more
  * need a space-filling curve. Z-order interleaves the dimension bits so
  * file-contiguous key ranges are axis-aligned-ish rectangles in dimension
  * space — the same layout trick Delta Lake's OPTIMIZE ZORDER and Iceberg's
  * sort orders ship, built here from plain Spark primitives:
  *
  *  - the key is a fold of builtin bit ops (`shiftright`/`bitwiseAND`/
  *    `shiftleft`/`+`) — whole-stage-codegen'd, no UDF, no custom
  *    expression, and replicable verbatim in any engine's SQL (the DuckDB
  *    oracle recomputes it with a list comprehension);
  *  - the clustered write is `repartitionByRange(zkey)` +
  *    `sortWithinPartitions(zkey)` — ONE range exchange whose sampling-based
  *    boundaries auto-balance file sizes at any scale, no driver knowledge
  *    of the distribution;
  *  - the manifest is a per-file min/max stats table written UNDER the data
  *    directory as `_graft_manifest` (underscore paths are invisible to
  *    Spark's file index, exactly how `_delta_log` hides) — O(files), not
  *    O(rows);
  *  - the pruned scan intersects the predicate's per-dimension interval with
  *    each file's [min, max] envelope and hands the surviving file list to
  *    the parquet reader. The driver holds file NAMES only — the same
  *    O(files) cost every manifest-backed table format (Delta, Iceberg,
  *    Hudi) pays, and the row-level filter still runs (and still pushes
  *    down) inside the scan.
  *
  * The reference engine has no layout story at all — it reads whatever the
  * warehouse stored (cf. data_diff's per-database table scans,
  * `data_diff/table_segment.py`) — so at 100 TB every bisection segment
  * rescans the full key range. Writing the diff-side snapshot z-ordered by
  * the segmentation keys turns each segment probe into a few-file read.
  */
object DataLayout {

  /** Morton (Z-order) key: interleave the low `bits` bits of each dimension
    * column into one non-negative Long.
    *
    * Bit `j` of dimension `ci` lands at position `j*k + (k-1-ci)` (dimension
    * 0 owns the more-significant bit of each group), so equal-prefix z-keys
    * bound every dimension simultaneously. Dimensions are read as signed
    * longs and only bits `0 until bits` are consulted — values outside
    * `[0, 2^bits)` alias by truncation (identically on every engine, since
    * `>>`/`&` are two's-complement there too); callers wanting true range
    * semantics bucket first with [[linearBucket]].
    */
  def zOrderKey(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 1, "zOrderKey needs at least one dimension")
    require(bits >= 1 && bits * k <= 63,
      s"bits*dims must fit a signed Long: got $bits*$k")
    val terms = for {
      (c, ci) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * k + (k - 1 - ci))
    terms.reduce(_ + _)
  }

  /** Map a long-valued column clamped to `[lo, hi]` onto `[0, 2^bits)`,
    * integer-exactly: `((x - lo) * 2^bits) div (hi - lo + 1)`. */
  def linearBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, s"linearBucket needs hi > lo, got [$lo, $hi]")
    require(bits >= 1 && bits <= 62, s"bits out of range: $bits")
    val span = hi - lo + 1
    require(span.toDouble * (1L << bits).toDouble < Long.MaxValue.toDouble,
      s"span * 2^bits overflows Long: span=$span bits=$bits")
    val x = greatest(lit(lo), least(lit(hi), c.cast("long")))
    call_function("div", (x - lit(lo)) * lit(1L << bits), lit(span))
  }

  /** Name of the hidden manifest directory under a z-ordered table. */
  val ManifestDir = "_graft_manifest"

  /** Write `df` clustered by the Z-order of `dims`, then write the per-file
    * min/max manifest for `statsCols` under `outDir/_graft_manifest`.
    *
    * One range exchange on the z-key (sampled boundaries — no skew knowledge
    * needed from the caller), an in-partition sort, `numFiles` output files,
    * then one O(rows) stats pass over what was written grouped by file —
    * shuffling only `files × statsCols` min/max pairs.
    */
  def writeZOrdered(df: DataFrame, dims: Seq[Column], bits: Int,
      statsCols: Seq[String], outDir: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    statsCols.foreach(c => require(df.columns.contains(c),
      s"stats column '$c' not in ${df.columns.mkString(",")}"))
    val z = "_graft_z"
    df.withColumn(z, zOrderKey(dims, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode("overwrite").parquet(outDir)
    val written = df.sparkSession.read.parquet(outDir)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    written.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(s"$outDir/$ManifestDir")
  }

  /** A manifest-pruned scan: the surviving data plus its pruning stats. */
  final case class PrunedScan(df: DataFrame, filesRead: Int, filesTotal: Int)

  /** Scan `dir` reading only files whose `[min, max]` envelope intersects
    * every `(column, lo, hi)` interval in `ranges`, then apply the same
    * intervals as a row filter (file envelopes admit non-matching rows).
    *
    * The manifest collect is O(files) driver memory — file paths and stats
    * only, the bound every manifest-backed format accepts. Row data never
    * reaches the driver, and the row-level filter still pushes down into
    * the parquet scan of the surviving files.
    */
  def skipScan(spark: SparkSession, dir: String,
      ranges: Seq[(String, Any, Any)]): PrunedScan = {
    require(ranges.nonEmpty, "skipScan needs at least one (col, lo, hi) range")
    val manifest = spark.read.parquet(s"$dir/$ManifestDir")
    ranges.foreach { case (c, _, _) =>
      require(manifest.columns.contains(s"min_$c"),
        s"manifest has no stats for column '$c' — was it in statsCols at write?")
    }
    val keep = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    val total = manifest.count().toInt
    val files = manifest.where(keep).select("file")
      .collect().map(_.getString(0)) // O(files): paths only, never rows
    val rowFilter = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val df =
      if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*).where(rowFilter)
    PrunedScan(df, files.length, total)
  }
}
