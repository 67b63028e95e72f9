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
      statsCols: Seq[String], outDir: String, numFiles: Int): Unit =
    writeClustered(df, dims, bits, statsCols, outDir, numFiles, "overwrite")

  /** Z-order and APPEND a delta to an existing layout, extending the
    * manifest with the new files' stats. The delta alone is clustered (one
    * range exchange over DELTA rows only — base data is neither read nor
    * rewritten), so ingestion cost is ∝ delta; the price is z-range overlap
    * between delta files and base files, which [[compactZOrdered]] repays
    * incrementally. This is the OPTIMIZE-style maintenance loop every
    * manifest-backed table format runs: cheap clustered appends, targeted
    * compaction of only the clusters that overlap. */
  def appendZOrdered(delta: DataFrame, dims: Seq[Column], bits: Int,
      statsCols: Seq[String], outDir: String, numFiles: Int): Unit =
    writeClustered(delta, dims, bits, statsCols, outDir, numFiles, "append")

  private def writeClustered(df: DataFrame, dims: Seq[Column], bits: Int,
      statsCols: Seq[String], outDir: String, numFiles: Int,
      mode: String): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    statsCols.foreach(c => require(df.columns.contains(c),
      s"stats column '$c' not in ${df.columns.mkString(",")}"))
    val before: Set[String] =
      if (mode == "append")
        listDataFiles(df.sparkSession, outDir).map(canon).toSet
      else Set.empty
    val z = "_graft_z"
    df.withColumn(z, zOrderKey(dims, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
      .write.mode(mode).parquet(outDir)
    val all = listDataFiles(df.sparkSession, outDir)
    val fresh = all.filterNot(f => before(canon(f)))
    val stats = fileStats(df.sparkSession.read.parquet(fresh: _*), dims, bits, statsCols)
    stats.write.mode(if (mode == "append") "append" else "overwrite")
      .parquet(s"$outDir/$ManifestDir")
  }

  /** Per-file min/max stats (+ the z-key interval) for `files` — O(files)
    * output rows, partial-aggregated map-side. */
  private def fileStats(df: DataFrame, dims: Seq[Column], bits: Int,
      statsCols: Seq[String]): DataFrame = {
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      Seq(min(col("_graft_z")).as("zmin"), max(col("_graft_z")).as("zmax"),
        count(lit(1)).as("n_rows"))
    df.withColumn("_graft_z", zOrderKey(dims, bits))
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Scheme-insensitive canonical form for comparing file names coming
    * from `input_file_name()` (file:///x) vs Hadoop listings (file:/x). */
  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data files of the layout (manifest and hidden paths excluded) —
    * through the Hadoop FileSystem API, so the same code lists local dirs
    * in tests and object stores on a cluster. */
  private def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
      .sorted
  }

  /** Compact ONLY the z-overlapping file clusters of a layout (connected
    * components of the interval-overlap graph over the manifest's
    * [zmin, zmax] ranges — O(files log files) driver work on stats rows,
    * never row data). Singleton clusters are left byte-identical on disk;
    * each multi-file cluster is re-clustered into ⌈rows/rowsPerFile⌉ files
    * by one range exchange over JUST that cluster's rows. After appends,
    * this rewrites the few clusters a delta touched and nothing else —
    * incremental-OPTIMIZE cost ∝ overlap, not table size. */
  def compactZOrdered(spark: SparkSession, dir: String, dims: Seq[Column],
      bits: Int, statsCols: Seq[String], rowsPerFile: Long): CompactReport = {
    require(rowsPerFile >= 1, s"rowsPerFile must be >= 1: $rowsPerFile")
    val manifest = spark.read.parquet(s"$dir/$ManifestDir")
      .select("file", "zmin", "zmax", "n_rows")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._3, t._1)) // deterministic sweep order
    // interval sweep: files sorted by zmin; a file overlaps the running
    // cluster iff its zmin <= the cluster's max zmax so far
    val clusters = scala.collection.mutable.ArrayBuffer.empty[Vector[(String, Long, Long, Long)]]
    for (f <- manifest) {
      if (clusters.nonEmpty && f._2 <= clusters.last.map(_._3).max)
        clusters(clusters.size - 1) = clusters.last :+ f
      else clusters += Vector(f)
    }
    val (toRewrite, untouched) = clusters.toVector.partition(_.size > 1)
    var rewrittenFiles = 0
    var compactGen = 0
    for (cluster <- toRewrite) {
      val rows = cluster.map(_._4).sum
      val nOut = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
      val data = spark.read.parquet(cluster.map(_._1): _*)
      // stage the rewrite next to the data, then swap atomically-enough:
      // new files in, old files + old manifest rows out
      val stage = s"$dir/_graft_compact_stage"
      val z = "_graft_z"
      data.withColumn(z, zOrderKey(dims, bits))
        .repartitionByRange(nOut, col(z))
        .sortWithinPartitions(z)
        .drop(z)
        .write.mode("overwrite").parquet(stage)
      val fs = fsOf(spark, dir)
      val staged = listDataFiles(spark, stage)
      for ((s, i) <- staged.zipWithIndex) {
        val src = new org.apache.hadoop.fs.Path(s)
        val dst = new org.apache.hadoop.fs.Path(dir,
          s"compact_${compactGen}_${i}_${src.getName}")
        require(fs.rename(src, dst), s"rename failed: $src -> $dst")
      }
      for (old <- cluster)
        require(fs.delete(new org.apache.hadoop.fs.Path(old._1), false),
          s"delete failed: ${old._1}")
      fs.delete(new org.apache.hadoop.fs.Path(stage), true)
      compactGen += 1
      rewrittenFiles += cluster.size
    }
    // rebuild the manifest: untouched rows carry over, rewritten clusters
    // get fresh stats from the files now on disk
    val keepRaw = untouched.flatten.map(_._1)
    val keepCanon = keepRaw.map(canon).toSet
    val allNow = listDataFiles(spark, dir)
    val freshFiles = allNow.filterNot(f => keepCanon(canon(f)))
    val old = spark.read.parquet(s"$dir/$ManifestDir")
      .where(col("file").isin(keepRaw: _*))
      .localCheckpoint(true) // manifest rows only — O(files)
    val rebuilt =
      if (freshFiles.isEmpty) old
      else old.unionByName(
        fileStats(spark.read.parquet(freshFiles: _*), dims, bits, statsCols))
    val pinned = rebuilt.localCheckpoint(true) // sever lineage from the dir being overwritten
    pinned.write.mode("overwrite").parquet(s"$dir/$ManifestDir")
    CompactReport(clustersRewritten = toRewrite.size,
      filesRewritten = rewrittenFiles, filesTotalAfter = allNow.size)
  }

  final case class CompactReport(clustersRewritten: Int, filesRewritten: Int,
      filesTotalAfter: Int)

  /** Targeted delete — the right-to-be-forgotten operator: remove every
    * row matching ALL `(col, lo, hi)` ranges, rewriting ONLY the files
    * whose min/max envelope intersects the predicate. On a layout
    * clustered by the deletion key (user id, tenant, …) that is a handful
    * of files out of a 100 TB table; every other file stays byte-identical
    * on disk and keeps its manifest row. Files left empty by the delete
    * are removed outright. Returns (filesRewritten, rowsDeleted). */
  def deleteWhere(spark: SparkSession, dir: String, dims: Seq[Column],
      bits: Int, statsCols: Seq[String],
      ranges: Seq[(String, Any, Any)]): DeleteReport = {
    require(ranges.nonEmpty, "deleteWhere needs at least one (col, lo, hi) range")
    val manifest = spark.read.parquet(s"$dir/$ManifestDir")
    ranges.foreach { case (c, _, _) =>
      require(manifest.columns.contains(s"min_$c"),
        s"manifest has no stats for column '$c' — was it in statsCols at write?")
    }
    val hitCond = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    val hitRaw = manifest.where(hitCond).select("file")
      .collect().map(_.getString(0)).toSeq // O(files): paths only
    if (hitRaw.isEmpty)
      return DeleteReport(0, 0L, spark.read.parquet(s"$dir/$ManifestDir").count().toInt)
    val rowPred = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val hitData = spark.read.parquet(hitRaw: _*)
    val deleted = hitData.where(rowPred).count()
    // null-safe complement: a NULL predicate (null in a range column) must
    // SURVIVE the delete, not vanish with it
    val survivors = hitData.where(!coalesce(rowPred, lit(false)))
    val fs = fsOf(spark, dir)
    val stage = s"$dir/_graft_delete_stage"
    // keep survivors clustered: one range exchange over ONLY the hit files'
    // rows, one output file per original hit file (sizes stay comparable)
    val keepN = math.max(1, hitRaw.size)
    survivors.withColumn("_graft_z", zOrderKey(dims, bits))
      .repartitionByRange(keepN, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(stage)
    val staged = listDataFiles(spark, stage)
    for ((sf, i) <- staged.zipWithIndex) {
      val src = new org.apache.hadoop.fs.Path(sf)
      val dst = new org.apache.hadoop.fs.Path(dir, s"delete_${i}_${src.getName}")
      require(fs.rename(src, dst), s"rename failed: $src -> $dst")
    }
    for (old <- hitRaw)
      require(fs.delete(new org.apache.hadoop.fs.Path(old), false),
        s"delete failed: $old")
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    // manifest: untouched rows carry over, fresh stats for the rewrites
    val old = spark.read.parquet(s"$dir/$ManifestDir")
      .where(!col("file").isin(hitRaw: _*))
      .localCheckpoint(true) // manifest rows only — O(files)
    val oldCanon = old.select("file")
      .as(org.apache.spark.sql.Encoders.STRING).collect().map(canon).toSet
    val allNow = listDataFiles(spark, dir)
    val freshFiles = allNow.filterNot(f => oldCanon(canon(f)))
    val rebuilt =
      if (freshFiles.isEmpty) old
      else old.unionByName(
        fileStats(spark.read.parquet(freshFiles: _*), dims, bits, statsCols))
    val pinned = rebuilt.localCheckpoint(true)
    pinned.write.mode("overwrite").parquet(s"$dir/$ManifestDir")
    DeleteReport(hitRaw.size, deleted, allNow.size)
  }

  final case class DeleteReport(filesRewritten: Int, rowsDeleted: Long,
      filesTotalAfter: Int)

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
