package graft.layout

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** A Catalyst-integrated [[FileIndex]] over a graft layout's manifest: the
  * min/max envelope (and, for point predicates, the per-file Bloom index)
  * prune files INSIDE query planning, so ANY query shape — SQL, joins,
  * aggregates, whatever Catalyst pushes a data filter out of — skips files
  * automatically. [[DataLayout.skipScan]]/[[DataLayout.bloomScan]] ask the
  * caller to hand intervals/keys in; this class is the production spelling
  * where the QUERY carries the predicate:
  *
  * {{{
  *   DataLayout.readLayoutIndexed(spark, dir)
  *     .where($"tenant" === 7 && $"price" between (10, 20))   // prunes files
  *     .join(dim, "k")                                        // still prunes
  * }}}
  *
  * Mechanics: Spark's `FileSourceStrategy` calls
  * `listFiles(partitionFilters, dataFilters)` with the pushed data filters
  * as Catalyst expressions. Each top-level conjunct is rewritten into a
  * THREE-VALUED "may this file match" predicate over the manifest row
  * (`a = v`   → `min_a <= v && max_a >= v`;
  *  `a < v`   → `min_a < v`;
  *  `a IN …`  → OR of the point tests, plus a Bloom-bitmap probe when
  *              [[DataLayout.buildBloomIndex]] has covered the column;
  *  `a IS NOT NULL` → `nulls_a < n_rows`, so all-NULL files drop;
  *  unknown shapes → no pruning, never a wrong answer) and evaluated on
  * the driver against the O(files) manifest snapshot — the same
  * planning-time metadata cost Delta/Iceberg pay. Files a predicate can
  * not rule out are scanned, and the row-level filter STILL applies inside
  * the scan, so pruning is invisible to results (false positives read
  * extra bytes; false negatives cannot happen because min/max/null-count
  * envelopes and Bloom filters are one-sided by construction).
  *
  * The snapshot pins `version` at construction (snapshot isolation — a
  * concurrent mutation does not shift this frame mid-query); build a new
  * index (or call [[refresh]]) to see later versions.
  *
  * The Bloom probe hashes each literal key on the DRIVER with the very
  * same `XxHash64` expression the build used, and tests the per-file
  * bitmaps loaded once per column (numBits/8 bytes per file — 1 KiB at
  * the default 8192 bits; a deployment with millions of small files
  * should raise file sizes before raising driver heap).
  */
class GraftFileIndex(spark: SparkSession, dir: String,
    version: Long = DataLayout.Latest) extends FileIndex {

  /** The layout dir this index routes — GraftSql's target resolution
    * recovers it from a view's analyzed plan. */
  def layoutDir: String = dir

  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private val fs = new Path(dir).getFileSystem(hadoopConf)

  // O(files) planning-time snapshot: manifest stats rows as InternalRows
  // (internal types, so Catalyst comparisons run on them directly) plus
  // each alive file's FileStatus for the scan.
  private var snapshot: (StructType, Array[InternalRow], Array[FileStatus]) = load()
  private def manifestSchema = snapshot._1
  private def rows = snapshot._2
  private def statuses = snapshot._3

  private def load(): (StructType, Array[InternalRow], Array[FileStatus]) = {
    val df = DataLayout.aliveManifest(spark, dir, version)
    val schema = df.schema
    val collected = df.queryExecution.executedPlan.executeCollect()
      .map(_.copy()) // executeCollect may reuse row buffers
    val fileOrd = schema.fieldIndex("file")
    val stats = collected.map(r =>
      fs.getFileStatus(new Path(r.getUTF8String(fileOrd).toString)))
    (schema, collected, stats)
  }

  /** (files kept, files total) of the most recent `listFiles` — the
    * pruning evidence specs and reports read. */
  @volatile var lastPruning: Option[(Int, Int)] = None

  override def rootPaths: Seq[Path] = Seq(new Path(dir))
  override def partitionSchema: StructType = new StructType()
  override def inputFiles: Array[String] = statuses.map(_.getPath.toString)
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
  override def refresh(): Unit = { snapshot = load(); bloomCache.clear() }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val preds = dataFilters.flatMap(envelope).map(Predicate.create)
    val bloomDrop: Set[Int] = bloomRejected(dataFilters)
    val kept = rows.indices.filter(i =>
      !bloomDrop(i) && preds.forall(_.eval(rows(i))))
    lastPruning = Some((kept.size, rows.length))
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(statuses).toArray[FileStatus]))
  }

  // ---- envelope rewrite ---------------------------------------------------

  private lazy val fieldIdx: Map[String, Int] =
    manifestSchema.fieldNames.zipWithIndex.toMap

  private def bref(name: String): Option[BoundReference] =
    fieldIdx.get(name).map { i =>
      val f = manifestSchema(i); BoundReference(i, f.dataType, f.nullable)
    }

  /** TRUE when this file's stats for `c` were never RECORDED — min and
    * null count both NULL, the state a manifest row mixed into the log
    * before `c` joined statsCols (or before the nulls_/hll_ schema
    * extension) reads under mergeSchema. Distinct from an all-NULL column
    * (min NULL, nulls_ = n_rows): unrecorded stats must KEEP the file —
    * every envelope test below Or-wraps with this, so a NULL-stat file is
    * scanned (extra I/O) instead of silently losing its rows. A manifest
    * with no nulls_ column at all can't tell the two states apart and
    * keeps the file on min-NULL alone. */
  private def unrecorded(c: String): Expression =
    (bref(s"min_$c"), bref(s"nulls_$c")) match {
      case (Some(mn), Some(n)) => And(IsNull(mn), IsNull(n))
      case (Some(mn), None) => IsNull(mn)
      case _ => Literal.TrueLiteral // no stats at all: never prune
    }

  /** `[min_c, max_c]` meets `[lo, hi]` — None when the manifest has no
    * stats for `c` or the literal's type differs from the stored one
    * (Catalyst would only push a same-type comparison on a raw attribute;
    * anything else conservatively reads everything). A RECORDED all-NULL
    * column evaluates the test to NULL → `Predicate.eval` false → file
    * dropped, which is correct: NULL never satisfies a range; unrecorded
    * stats keep the file via the Or-wrap. */
  private def rangeHit(c: String, lo: Literal, hi: Literal): Option[Expression] =
    for {
      mn <- bref(s"min_$c"); mx <- bref(s"max_$c")
      if mn.dataType == lo.dataType && mx.dataType == hi.dataType
    } yield Or(unrecorded(c),
      And(GreaterThanOrEqual(mx, lo), LessThanOrEqual(mn, hi)))

  private def cmp(c: String, l: Literal,
      mk: (Expression, Expression) => Expression, stat: String): Option[Expression] =
    bref(s"${stat}_$c").filter(_.dataType == l.dataType)
      .map(b => Or(unrecorded(c), mk(b, l)))

  /** The smallest string no `p`-prefixed string reaches: increment the
    * last incrementable char, drop the rest (incrementing an EARLIER char
    * and truncating is equally a ceiling, so skipped tail chars cost
    * nothing). A char is incrementable only when its successor is a real
    * comparison point: not ￿ (nothing above) and not anything whose
    * successor lands in the surrogate range — UTF8String encodes an
    * unpaired surrogate as '?' (0x3F), which sorts BELOW valid matches
    * and would turn the upper bound into a false negative. None when no
    * char qualifies (prune on the lower bound only). */
  private def prefixCeiling(p: String): Option[String] = {
    def incrementable(c: Char): Boolean =
      c != Char.MaxValue && !Character.isSurrogate(c) &&
        !Character.isSurrogate((c + 1).toChar)
    val i = p.lastIndexWhere(incrementable)
    if (i < 0) None else Some(p.substring(0, i) :+ (p.charAt(i) + 1).toChar)
  }

  private def envelope(e: Expression): Option[Expression] = e match {
    // a literal boolean filter prunes constantly — JoinPruning injects
    // `false` when an eagerly-evaluated build side turns out empty (the
    // inner/semi join is then provably empty: zero files read)
    case l @ Literal(_, org.apache.spark.sql.types.BooleanType) => Some(l)
    case And(l, r) => (envelope(l), envelope(r)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (a, b) => a.orElse(b)
    }
    // a disjunct prunes only if BOTH branches rewrite
    case Or(l, r) => for { a <- envelope(l); b <- envelope(r) } yield Or(a, b)
    case EqualTo(a: AttributeReference, l: Literal) => rangeHit(a.name, l, l)
    case EqualTo(l: Literal, a: AttributeReference) => rangeHit(a.name, l, l)
    case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
      rangeHit(a.name, l, l)
    case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
      rangeHit(a.name, l, l)
    case LessThan(a: AttributeReference, l: Literal) => cmp(a.name, l, LessThan, "min")
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      cmp(a.name, l, LessThanOrEqual, "min")
    case GreaterThan(a: AttributeReference, l: Literal) => cmp(a.name, l, GreaterThan, "max")
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      cmp(a.name, l, GreaterThanOrEqual, "max")
    // mirrored literal-on-left forms
    case LessThan(l: Literal, a: AttributeReference) => cmp(a.name, l, GreaterThan, "max")
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      cmp(a.name, l, GreaterThanOrEqual, "max")
    case GreaterThan(l: Literal, a: AttributeReference) => cmp(a.name, l, LessThan, "min")
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      cmp(a.name, l, LessThanOrEqual, "min")
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      val hits = vs.map(v => rangeHit(a.name, v.asInstanceOf[Literal],
        v.asInstanceOf[Literal]))
      if (hits.exists(_.isEmpty)) None else Some(hits.flatten.reduce(Or))
    case InSet(a: AttributeReference, vs) =>
      val hits = vs.toSeq.map(v =>
        rangeHit(a.name, Literal(v, a.dataType), Literal(v, a.dataType)))
      if (hits.isEmpty || hits.exists(_.isEmpty)) None
      else Some(hits.flatten.reduce(Or))
    // Or(IsNull(n), …): a NULL null-count (stats row predating the
    // nulls_ extension under mergeSchema) must keep the file — Catalyst
    // pushes IsNotNull alongside nearly every comparison, so dropping on
    // unknown here would silently lose every pre-extension file's rows
    case IsNull(a: AttributeReference) =>
      bref(s"nulls_${a.name}").map(n =>
        Or(IsNull(n), GreaterThan(n, Literal(0L, LongType))))
    case IsNotNull(a: AttributeReference) =>
      for { n <- bref(s"nulls_${a.name}"); t <- bref("n_rows") }
        yield Or(IsNull(n), LessThan(n, t))
    case StartsWith(a: AttributeReference, l @ Literal(_, StringType))
        if l.value != null =>
      val p = l.value.toString
      for { lo <- cmp(a.name, Literal(p), GreaterThanOrEqual, "max") } yield
        prefixCeiling(p).flatMap(c => cmp(a.name, Literal(c), LessThan, "min"))
          .map(And(lo, _)).getOrElse(lo)
    case _ => None // unknown shapes never prune — extra I/O, never a wrong answer
  }

  // ---- bloom probe --------------------------------------------------------

  /** Per-column bitmaps, loaded once: canon(file) → bits, + params. */
  private val bloomCache =
    scala.collection.mutable.Map.empty[String, Option[(Map[String, Array[Long]], Int, Int)]]

  private def bloomFor(column: String): Option[(Map[String, Array[Long]], Int, Int)] =
    bloomCache.getOrElseUpdate(column, {
      val p = new Path(s"$dir/${DataLayout.BloomDir}/$column")
      if (!fs.exists(p)) None
      else {
        val idx = spark.read.parquet(p.toString)
          .select("file", "bloom", "num_bits", "num_hashes").collect()
        if (idx.isEmpty) None
        else Some((
          idx.map(r => DataLayout.canon(r.getString(0)) ->
            r.getSeq[Long](1).toArray).toMap,
          idx.head.getInt(2), idx.head.getInt(3)))
      }
    })

  /** Row indices a Bloom filter REJECTS for some top-level point predicate
    * (`=`, `IN`, `INSET`) on an indexed column. Unindexed files are never
    * rejected. Key hashing replays the build's expression exactly:
    * `xxhash64(value, hashIndex)` = `XxHash64(Seq(v, i), seed = 42)`. */
  private def bloomRejected(dataFilters: Seq[Expression]): Set[Int] = {
    val fileOrd = manifestSchema.fieldIndex("file")
    val points: Seq[(String, Seq[Literal])] = dataFilters.flatMap {
      case EqualTo(a: AttributeReference, l: Literal) => Some(a.name -> Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) => Some(a.name -> Seq(l))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(a.name -> vs.map(_.asInstanceOf[Literal]))
      case InSet(a: AttributeReference, vs) =>
        Some(a.name -> vs.toSeq.map(v => Literal(v, a.dataType)))
      case _ => None
    }
    val rejected = scala.collection.mutable.Set.empty[Int]
    for ((colName, keys) <- points; (bits, numBits, numHashes) <- bloomFor(colName)
         if keys.forall(_.value != null)) {
      // positions per key, hashed exactly as the build hashed rows
      val keyPositions: Seq[Array[Int]] = keys.map { k =>
        Array.tabulate(numHashes) { i =>
          val h = XxHash64(Seq(k, Literal(i)), 42L).eval(InternalRow.empty)
            .asInstanceOf[Long]
          (((h % numBits) + numBits) % numBits).toInt
        }
      }
      for (r <- rows.indices) {
        val f = DataLayout.canon(rows(r).getUTF8String(fileOrd).toString)
        bits.get(f).foreach { bm => // unindexed file: never rejected
          val admits = keyPositions.exists(_.forall(p =>
            (bm(p / 64) & (1L << (p % 64))) != 0))
          if (!admits) rejected += r
        }
      }
    }
    rejected.toSet
  }
}

object GraftFileIndex {
  /** Register [[JoinPruning]] on the session (idempotent): plain
    * inner/semi joins of an indexed layout against a small dimension then
    * prune FILES through the manifest with no helper API. */
  def enableJoinPruning(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(JoinPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JoinPruning

  /** The manifest-backed [[HadoopFsRelation]] + its index — the raw
    * (UNMASKED) Catalyst relation [[readLayoutIndexed]] and the batch
    * `USING graft` source both build on. */
  private[layout] def relationFor(spark: SparkSession, dir: String,
      version: Long): (HadoopFsRelation, GraftFileIndex) = {
    val index = new GraftFileIndex(spark, dir, version)
    val schema = DataLayout.schemaAt(spark, dir, version).getOrElse(
      spark.read.parquet(DataLayout.schemaAnchorFile(spark, dir)).schema)
    (new InsertableGraftRelation(index, schema, spark, dir, version), index)
  }

  /** The layout as a Catalyst-planned DataFrame: queries prune files
    * through the manifest (and Bloom index) automatically — see
    * [[GraftFileIndex]]; joins against small dimensions prune too
    * ([[JoinPruning]], registered here). Returns the frame plus its index
    * so callers can read the pruning evidence. */
  def readLayoutIndexed(spark: SparkSession, dir: String,
      version: Long = DataLayout.Latest): (DataFrame, GraftFileIndex) = {
    enableJoinPruning(spark)
    val (rel, index) = relationFor(spark, dir, version)
    val df = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(rel)
    // deletion vectors ride on top as a coordinate anti join (no-op when
    // the version has none); data predicates still push into the scan
    (DataLayout.maskIndexed(spark, dir, version, df), index)
  }
}

/** The graft [[HadoopFsRelation]] that ALSO accepts `INSERT INTO`: Spark's
  * DataSourceAnalysis matches its InsertableRelation arm BEFORE its
  * HadoopFsRelation arm (verified against the 4.1.2 bytecode), so a SQL
  * insert against a `USING graft` view routes through [[insert]] — an
  * ordinary manifested, OCC-committed, z-clustered append using the
  * layout's PERSISTED write config ([[LayoutConfig]]) — while reads keep
  * the full file-pruning HadoopFsRelation planning. The inherited
  * [[GraftManifestedParquetFormat]] write refusal stays as the backstop
  * for any OTHER route that would drop raw parquet into the dir.
  * Reference insert surface: data_diff/queries/ast_classes.py:433-459. */
private[layout] class InsertableGraftRelation(index: GraftFileIndex,
    schema: StructType, spark: SparkSession, dir: String, version: Long)
  extends HadoopFsRelation(index, new StructType(), schema, None,
    new GraftManifestedParquetFormat, Map.empty[String, String])(spark)
  with org.apache.spark.sql.sources.InsertableRelation {

  override def insert(data: org.apache.spark.sql.DataFrame,
      overwrite: Boolean): Unit = {
    GraftSql.insertInto(spark, dir, version, schema.fieldNames.toSeq,
      data, overwrite)
    index.refresh() // the view's pinned snapshot must see its own insert
  }
}

/** [[ParquetFileFormat]] with the WRITE side disabled: the read stack
  * (vectorized reader, pushdown, codegen — everything `isInstanceOf
  * [ParquetFileFormat]` checks enable) is inherited untouched. `INSERT
  * INTO` normally never reaches this format — [[InsertableGraftRelation]]
  * routes it through the manifested append — so this refusal is the
  * BACKSTOP for any other planner route (e.g. a future Spark rule
  * ordering change) that would plan `InsertIntoHadoopFsRelationCommand`
  * and drop RAW parquet files into the layout dir: unmanifested rows that
  * layout readers ignore while plain parquet readers see them — silent
  * drift between the two documented read paths. */
private[layout] class GraftManifestedParquetFormat
    extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "raw parquet writes into a graft layout bypass the manifest commit " +
        "protocol — write through df.write.format(\"graft\") (batch), " +
        "writeStream.format(\"graft\") (streaming), INSERT INTO a graft " +
        "view (routes through the manifested append), or the DataLayout API")
  override def toString: String = "GraftParquet(read-only)"
}
