package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.diff.{Checksum, JoinDiffer, KeySpace, TableSegment}

/** The table on the far side of a pushdown diff: reachable only through
  * `engine.query(sql)`, described by the mutual (Spark-side) logical schema
  * so both sides normalize identically — the analogue of the reference's
  * `_validate_and_adjust_columns` negotiating mutual precision
  * (reference: data_diff/hashdiff_tables.py:119-168). */
final case class RemoteTable(
    engine: RemoteEngine,
    table: String,
    keyCols: Seq[String],
    compareCols: Seq[String],
    schema: StructType,
    fracPrecision: Int = 2,
    tsPrecision: Int = 6,
    /** Extra SQL predicate ANDed into every remote query — the remote
      * analogue of TableSegment's update-column scope: both sides MUST
      * restrict to the same rows or out-of-scope remote rows read as
      * spurious adds (reference: table_segment.py min_update/max_update
      * land in every remote WHERE). */
    extraWhereSql: Option[String] = None,
    /** How the remote engine orders the text key columns. Defaults to
      * ordinal (byte order) — most engines' binary default; a locale
      * collation here makes string key-range bounds unsafe and the diff
      * refuses to run (reference: abcs/database_types.py:18-100). */
    keyCollation: Collation = Collation.SparkBinary) {
  def relevantCols: Seq[String] = keyCols ++ compareCols
}

object RemoteTable {
  /** Build a RemoteTable by querying the engine's own schema catalog — the
    * real-user path, where the far side is a warehouse Spark cannot read
    * (reference: databases/base.py:1031-1066 + 1113-1160; see
    * RemoteSchema.introspect for the full contract). */
  def introspect(engine: RemoteEngine, table: String,
      keyCols: Seq[String], compareCols: Seq[String],
      extraWhereSql: Option[String] = None,
      keyCollation: Collation = Collation.SparkBinary): RemoteTable =
    RemoteSchema.introspect(engine, table, keyCols, compareCols,
      extraWhereSql, keyCollation)
}

/** Per-run pushdown statistics — the InfoTree analogue
  * (reference: data_diff/info_tree.py:9-62). */
final case class PushdownStats(
    levels: Int,
    segmentsProbed: Int,
    segmentsPruned: Int,
    leafSegments: Int,
    remoteQueries: Int,
    rowsFetched: Long)

/** Cross-engine hashdiff: segment the key space, push per-segment
  * `count + sum(md5_int48(normalized_row))` SQL to the remote engine, prune
  * checksum-equal segments, bisect the rest, and leaf-fetch only differing
  * rows for a local compare (reference control loop:
  * data_diff/hashdiff_tables.py:169-264 + diff_tables.py:289-352).
  *
  * Spark-first deviations from the reference, both round-trip economics:
  *  - the local side computes a whole batch of segment summaries in ONE
  *    scan+shuffle (a broadcast range-join against a segment-bounds table
  *    feeding a grouped checksum aggregate) instead of one query per segment;
  *  - the remote side receives ONE grouped query per batch
  *    (`SourceProfile.segmentedChecksumSql`) instead of per-segment queries
  *    on a thread pool — batch latency is one round-trip regardless of
  *    fan-out, which is what dominates remote bisection at scale.
  *
  * Batches are capped at `maxSegmentsPerQuery` segments (default 256): a
  * level's frontier grows as dirty-segments × factor, so under a high diff
  * rate (e.g. a schema-wide change) an uncapped level would render a
  * nested CASE past Janino's 64 KB method limit locally and a statement
  * past engine length limits remotely. The cap bounds every generated
  * artifact — bucket-bounds broadcast, remote CASE, leaf OR-chain — at
  * O(cap) while keeping the loop O(levels × ceil(frontier/cap)) round-trips.
  * The range-join itself (not a CASE expression) assigns bucket ids, so the
  * local plan never grows with the frontier at all.
  *
  * Leaf rows from every differing segment are fetched in capped batches and
  * compared with one JoinDiffer pass.
  */
object PushdownDiffer {

  /** Default control knobs (reference: hashdiff_tables.py:19-20;
    * maxSegmentsPerQuery is this engine's own batching knob — the reference
    * never batches because it issues per-segment queries). */
  val DefaultBisectionFactor = 32
  val DefaultBisectionThreshold = 16 * 1024
  val DefaultMaxSegmentsPerQuery = 256
  private val MaxLevels = 64

  def diff(local: TableSegment, remote: RemoteTable,
      bisectionFactor: Int = DefaultBisectionFactor,
      bisectionThreshold: Int = DefaultBisectionThreshold): DataFrame =
    diffWithStats(local, remote, bisectionFactor, bisectionThreshold)._1

  def diffWithStats(local: TableSegment, remote: RemoteTable,
      bisectionFactor: Int = DefaultBisectionFactor,
      bisectionThreshold: Int = DefaultBisectionThreshold,
      maxSegmentsPerQuery: Int = DefaultMaxSegmentsPerQuery): (DataFrame, PushdownStats) = {
    require(bisectionFactor >= 2, "bisection factor must be >= 2")
    require(bisectionFactor < bisectionThreshold,
      "bisection factor must be lower than the threshold")
    require(maxSegmentsPerQuery >= bisectionFactor,
      "segment batch cap must fit at least one split fan-out")
    require(local.keyCols == remote.keyCols,
      s"key columns must match: ${local.keyCols} vs ${remote.keyCols}")

    val spark = local.df.sparkSession
    val profile = remote.engine.profile
    val keyCols = local.keyCols
    val relevant = local.relevantCols
    val compare = relevant.filterNot(keyCols.contains)
    require(remote.relevantCols == relevant,
      s"compared columns must match: $relevant vs ${remote.relevantCols}")
    require(local.fracPrecision == remote.fracPrecision && local.tsPrecision == remote.tsPrecision,
      "both sides must normalize at the same mutual precision")
    // text keys: segment bounds are STRING comparisons evaluated by both
    // engines — the orderings must agree or segments select different row
    // sets on each side (silent row loss). Spark compares UTF8-binary;
    // the remote must too (or the caller casts the key in the pushed SQL).
    if (remote.keyCols.exists(k => remote.schema(k).dataType == StringType))
      Collation.negotiate(Collation.SparkBinary, remote.keyCollation) match {
        case Right(None) => // equivalent ordinal orderings — safe
        case Right(Some(_)) | Left(_) => throw new IllegalArgumentException(
          "remote text-key collation is not ordinal: key-range predicates would " +
            "select different rows on each engine. Cast the key to a binary " +
            "collation in the remote table/view, or diff on a derived ordinal key.")
      }

    // Overflow-safe concat is contagious: if either side's dialect needs it,
    // both sides hash items before concatenation (reference:
    // diff_tables.py:228-231).
    val overflowSafe = profile.preventOverflowWhenConcat
    def localChecksum(seg: TableSegment): Column = {
      val rowCk = if (overflowSafe) Checksum.rowChecksumOverflowSafe(seg.normCols)
                  else Checksum.rowChecksum(seg.normCols)
      sum(rowCk.cast(DecimalType(38, 0)))
    }

    val normSqlByCol: Map[String, String] = relevant.map { c =>
      c -> profile.normalizedColumnSql(c, remote.schema(c).dataType,
        remote.fracPrecision, remote.tsPrecision)
    }.toMap

    val outSchema = StructType(relevant.map(StructField(_, StringType, nullable = true)))
    def emptyResult(stats: PushdownStats) = {
      val empty = spark.createDataFrame(Seq.empty[Row].asJava,
        StructType(StructField("sign", StringType, nullable = false) +: outSchema.fields.toSeq))
      (empty, stats)
    }

    // ---- combined key range over both sides ----------------------------
    // (reference: diff_tables.py:289-321 queries both ranges and takes the
    // widest box, so rows present on only one side are always covered)
    val localRange = local.keyRange().head()
    val remoteRange = remote.engine
      .query(profile.keyRangeSql(remote.table, keyCols, remote.extraWhereSql)).head
    var remoteQueries = 1

    val dims = keyCols.indices.map { i =>
      // all four boundary values of a dim parse UNIFORMLY: a string column
      // must pick UUID vs base-66 arithmetic ONCE across local and remote
      // boundaries (a per-value choice could put a 128-bit "min" above a
      // base-66 "max" and degenerate the bisection)
      val raws: Seq[Any] = (Seq(Option(localRange.get(i * 2)), Option(localRange.get(i * 2 + 1))) ++
        Seq(remoteRange(i * 2), remoteRange(i * 2 + 1))
          .map(_.map[Any](s => remote.schema(keyCols(i)).dataType match {
            case ByteType | ShortType | IntegerType | LongType => java.lang.Long.valueOf(s.trim.toLong)
            case StringType => s
            case other => throw new IllegalArgumentException(
              s"unsupported pushdown key type for ${keyCols(i)}: $other")
          }))).flatten
      if (raws.isEmpty) None
      else {
        // raws = whole (min, max) pairs — a side is either fully present or
        // fully absent — so even positions are mins, odd are maxs
        val keys = TableSegment.toKeys(raws)
        val mins = keys.zipWithIndex.collect { case (k, j) if j % 2 == 0 => k }
        val maxs = keys.zipWithIndex.collect { case (k, j) if j % 2 == 1 => k }
        Some((mins.reduce((a, b) => if ((a - b) <= 0) a else b),
          maxs.reduce((a, b) => if ((a - b) >= 0) a else b).next)) // exclusive hi
      }
    }
    if (dims.exists(_.isEmpty))
      return emptyResult(PushdownStats(0, 0, 0, 0, remoteQueries, 0)) // both sides empty

    type Box = (Seq[KeySpace.Key], Seq[KeySpace.Key])
    val rootBox: Box = (dims.map(_.get._1), dims.map(_.get._2))

    def splitBox(box: Box): Seq[Box] = {
      val grids = box._1.zip(box._2).map { case (lo, hi) =>
        if (hi - lo < 2) Seq(lo, hi) else KeySpace.splitKeySpace(lo, hi, bisectionFactor)
      }
      KeySpace.createMeshFromPoints(grids)
        .map { case (lo, hi) => (lo.values, hi.values) }
    }

    def boundVals(ks: Seq[KeySpace.Key]): Seq[Any] = ks.map(TableSegment.fromKey)
    def remotePred(box: Box): String =
      keyCols.zip(boundVals(box._1)).zip(boundVals(box._2)).map {
        case ((k, lo), hi) =>
          s"${profile.quote(k)} >= ${profile.literal(lo)} AND ${profile.quote(k)} < ${profile.literal(hi)}"
      }.mkString(" AND ")

    // ---- segment-bounds table + range-join bucket assignment ------------
    // Bucket ids come from an inner range-join against a broadcast bounds
    // table, not a nested CASE: a CASE grows one codegen branch per segment
    // (past Janino's 64 KB method limit around a few thousand) while the
    // join keeps the local plan constant-size at any batch width. Boxes are
    // disjoint, so each row matches at most one bounds row.
    val segField = "__graft_seg"
    val dimSparkTypes: Seq[DataType] = rootBox._1.map {
      case KeySpace.IntKey(_) => LongType
      case _ => StringType // uuid / alphanum keys render to string bounds
    }
    def boundsDf(chunk: Seq[Box]) = {
      val fields = StructField(segField, IntegerType, nullable = false) +:
        keyCols.indices.flatMap(d => Seq(
          StructField(s"__graft_lo_$d", dimSparkTypes(d), nullable = false),
          StructField(s"__graft_hi_$d", dimSparkTypes(d), nullable = false)))
      val rows = chunk.zipWithIndex.map { case (box, i) =>
        Row.fromSeq(i +: keyCols.indices.flatMap(d =>
          Seq(TableSegment.fromKey(box._1(d)), TableSegment.fromKey(box._2(d)))))
      }
      spark.createDataFrame(rows.asJava, StructType(fields.toArray))
    }
    val rangeJoinCond: Column = keyCols.zipWithIndex.map { case (k, d) =>
      col(k) >= col(s"__graft_lo_$d") && col(k) < col(s"__graft_hi_$d")
    }.reduce(_ && _)
    // coarse per-batch cover: the batch's bounding box is an O(dims)
    // sargable predicate that reaches the scan (parquet min/max pruning);
    // precise membership comes from the range join
    def boundingBoxCond(chunk: Seq[Box]): Column = {
      val lows = keyCols.indices.map(d =>
        chunk.map(_._1(d)).reduce((a, b) => if ((a - b) <= 0) a else b))
      val highs = keyCols.indices.map(d =>
        chunk.map(_._2(d)).reduce((a, b) => if ((a - b) >= 0) a else b))
      keyCols.zip(boundVals(lows)).zip(boundVals(highs)).map {
        case ((k, lo), hi) => col(k) >= lit(lo) && col(k) < lit(hi)
      }.reduce(_ && _)
    }

    // ---- level-at-a-time bisection, batched at maxSegmentsPerQuery -------
    type Summary = (Long, Option[BigDecimal])
    val leaves = ArrayBuffer.empty[Box]
    var frontier: Seq[Box] = splitBox(rootBox)
    var level = 0
    var probed = 0
    var pruned = 0

    while (frontier.nonEmpty) {
      require(level < MaxLevels, s"bisection did not converge after $MaxLevels levels")
      probed += frontier.size

      val next = ArrayBuffer.empty[Box]
      frontier.grouped(maxSegmentsPerQuery).foreach { chunk =>
        // one Spark job for this batch of segment summaries
        val scopedChunk = local.withExtraFilter(boundingBoxCond(chunk))
        val localRows = scopedChunk.scoped
          .join(broadcast(boundsDf(chunk)), rangeJoinCond)
          .groupBy(col(segField).as("seg"))
          .agg(count(lit(1)).as("cnt"), localChecksum(scopedChunk).as("checksum"))
          .collect()
        val localMap: Map[Int, Summary] = localRows.map { r =>
          r.getInt(0) -> (r.getLong(1),
            if (r.isNullAt(2)) None else Some(BigDecimal(r.getDecimal(2))))
        }.toMap

        // one remote round-trip for the same batch
        val sql = profile.segmentedChecksumSql(remote.table,
          relevant.map(normSqlByCol), chunk.map(remotePred), remote.extraWhereSql)
        val remoteMap: Map[Int, Summary] = remote.engine.query(sql).map { r =>
          r(0).get.trim.toInt -> ((r(1).get.trim.toLong: Long),
            r(2).map(s => BigDecimal(s.trim)))
        }.toMap
        remoteQueries += 1

        if (sys.env.contains("GRAFT_PD_DEBUG")) {
          println(s"DBG level $level local=$localMap")
          println(s"DBG level $level remote=$remoteMap")
        }
        chunk.zipWithIndex.foreach { case (box, i) =>
          val l = localMap.getOrElse(i, (0L, None: Option[BigDecimal]))
          val r = remoteMap.getOrElse(i, (0L, None: Option[BigDecimal]))
          if (l == r) pruned += 1
          else if (math.max(l._1, r._1) < bisectionThreshold) leaves += box
          else {
            val children = splitBox(box)
            if (children.size <= 1) leaves += box // key space too small to cut
            else next ++= children
          }
        }
      }
      frontier = next.toSeq
      level += 1
    }

    if (leaves.isEmpty)
      return emptyResult(PushdownStats(level, probed, pruned, 0, remoteQueries, 0))

    // ---- leaf compare ----------------------------------------------------
    // All leaf rows cross the wire once, normalized (reference:
    // table_segment.py:214-237 get_values), and a single join produces the
    // -/+ rows (diff_sets, hashdiff_tables.py:30-88, expressed relationally).
    // Local membership is the same broadcast range-join (constant-size plan
    // at any leaf count); the remote fetch is batched so no statement
    // enumerates more than maxSegmentsPerQuery leaf predicates.
    val leafSeq = leaves.toSeq
    val localLeaf = local.withExtraFilter(boundingBoxCond(leafSeq))
    val localNorm = localLeaf.scoped
      .join(broadcast(boundsDf(leafSeq)), rangeJoinCond)
      .select(relevant.zip(localLeaf.normCols).map { case (n, c) => c.as(n) }: _*)

    val fetched = leafSeq.grouped(maxSegmentsPerQuery).toSeq.flatMap { lchunk =>
      val leafOr = lchunk.map(b => s"(${remotePred(b)})").mkString(" OR ")
      val fetchSql = profile.selectNormalizedSql(remote.table,
        relevant.map(c => (normSqlByCol(c), c)),
        Some(remote.extraWhereSql.fold(s"($leafOr)")(e => s"($leafOr) AND ($e)")))
      remoteQueries += 1
      remote.engine.query(fetchSql)
    }
    val remoteDf = spark.createDataFrame(
      fetched.map(r => Row(r.map(_.orNull): _*)).asJava, outSchema)

    val out = JoinDiffer.diff(localNorm, remoteDf, keyCols, compare)
    (out, PushdownStats(level, probed, pruned, leafSeq.size, remoteQueries, fetched.size))
  }
}
