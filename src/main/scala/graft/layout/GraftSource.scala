package graft.layout

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** The layout as a BATCH SQL data source — the DDL/reader spelling of
  * [[GraftFileIndex.readLayoutIndexed]]:
  *
  * {{{
  *   CREATE TEMPORARY VIEW orders_v1
  *   USING graft OPTIONS (path '/data/orders', versionAsOf '1');
  *   SELECT * FROM orders_v1 WHERE o_custkey BETWEEN 100 AND 200; -- prunes files
  *
  *   spark.read.format("graft").option("versionAsOf", 1).load("/data/orders")
  * }}}
  *
  * Options: `path` (required) and `versionAsOf` (optional — default
  * latest; below the vacuum horizon refuses loudly through
  * [[DataLayout.aliveManifest]]).
  *
  * Two relation shapes, picked by whether the requested version carries
  * DELETION VECTORS:
  *
  *  - clean version → the Catalyst [[HadoopFsRelation]] over
  *    [[GraftFileIndex]] directly: manifest/Bloom file pruning inside
  *    planning, parquet pushdown, whole-stage codegen, and
  *    [[JoinPruning]] — the full-speed path (the common case: a purge
  *    clears DVs);
  *  - DV-carrying version → [[MaskedLayoutRelation]], a
  *    [[PrunedFilteredScan]] that evaluates the masked indexed frame and
  *    hands rows up. Correct first: the mask is a row-coordinate anti
  *    join no plain file scan can express. Filters still reach the inner
  *    scan (so files still prune) and Spark re-applies every filter above
  *    the scan (`unhandledFilters` keeps them all), so the translation
  *    below is purely an optimization.
  *
  * WRITES are first-class too (see [[LayoutWriteOptions]] for the shared
  * option set — `dims` is required):
  *
  *  - batch: `df.write.format("graft").mode("append").option("dims", …)
  *    .save(dir)` → [[DataLayout.appendZOrdered]] (mode `overwrite` →
  *    [[DataLayout.writeZOrdered]] as version 0; `errorifexists`/`ignore`
  *    honor their SaveMode contracts against the layout's existence);
  *  - streaming: `df.writeStream.format("graft").option("dims", …)
  *    .start(dir)` → [[GraftLayoutSink]], exactly-once via transaction
  *    markers in the commit log;
  *  - SQL DML: `INSERT INTO view …` (native — the relation is
  *    [[org.apache.spark.sql.sources.InsertableRelation]]) and
  *    [[GraftSql]] for `DELETE FROM` / `MERGE INTO`, all using the write
  *    config these surfaces persist ([[LayoutConfig]]).
  *
  * All routes land ordinary z-clustered, stats-manifested, OCC-committed
  * versions — nothing a SQL-surface writer produces is second-class.
  */
class GraftSourceProvider extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    def opt(k: String): Option[String] =
      parameters.get(k).orElse(parameters.get(k.toLowerCase))
    val dir = opt("path").getOrElse(throw new IllegalArgumentException(
      "the graft source needs a 'path' option (the layout dir)"))
    val version = opt("versionAsOf").map(_.toLong).getOrElse(DataLayout.Latest)
    val spark = sqlContext.sparkSession
    GraftFileIndex.enableJoinPruning(spark)
    // EFFECTIVE DVs only: after a purge the DV log keeps rows (earlier
    // versions travel through them) but they address tombstoned files —
    // keying on mere log presence would pin the slow masked path forever
    val hasDv = DataLayout.dvEffectiveAt(spark, dir, version)
    if (!hasDv) GraftFileIndex.relationFor(spark, dir, version)._1
    else new MaskedLayoutRelation(sqlContext, dir, version)
  }

  /** Batch `df.write.format("graft")`: SaveMode maps onto the layout's
    * version log — Overwrite = a fresh version 0, Append = one new
    * version, ErrorIfExists/Ignore key on whether a layout (any version)
    * already lives at the path. */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val o = LayoutWriteOptions(parameters)
    val spark = sqlContext.sparkSession
    val exists = DataLayout.currentVersion(spark, o.dir) >= 0
    mode match {
      case SaveMode.Append =>
        DataLayout.appendZOrdered(data, o.dims, o.bits, o.statsCols,
          o.dir, o.numFiles, directCommit = o.directCommit)
      case SaveMode.Overwrite =>
        DataLayout.writeZOrdered(data, o.dims, o.bits, o.statsCols,
          o.dir, o.numFiles)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"a graft layout already exists at ${o.dir} (SaveMode.ErrorIfExists)")
      case SaveMode.Ignore if exists => ()
      case _ => // ErrorIfExists/Ignore on a fresh path bootstrap version 0
        DataLayout.writeZOrdered(data, o.dims, o.bits, o.statsCols,
          o.dir, o.numFiles)
    }
    // this surface KNOWS its dimension names: persist them so SQL DML
    // (INSERT INTO / GraftSql DELETE / MERGE) can recover the clustering
    LayoutConfig.record(spark, o.dir,
      LayoutConfig.Config(o.dimNames, o.bits, o.statsCols, o.numFiles,
        commitMode = if (o.directCommit) "direct" else "rename"))
    createRelation(sqlContext, parameters)
  }

  /** Streaming `df.writeStream.format("graft")` — see [[GraftLayoutSink]].
    * Append-only by contract (an upsert stream is a CDC merge, a different
    * operator: [[graft.streaming.StreamingDiff.cdcMergeSink]]). */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"the graft sink is append-only (got $outputMode) — route update/" +
        "complete streams through StreamingDiff.cdcMergeSink/ivmSink")
    require(partitionColumns.isEmpty,
      "the graft sink clusters by Z-order 'dims', not partitionBy()")
    new GraftLayoutSink(LayoutWriteOptions(parameters))
  }
}

/** DV-masked relation: correctness over raw scan speed (see
  * [[GraftSourceProvider]]). Insertable like the clean-path relation —
  * an INSERT never touches the DV mask (fresh rows have no positions). */
class MaskedLayoutRelation(ctx: SQLContext, val layoutDir: String,
    version: Long) extends BaseRelation with PrunedFilteredScan
    with InsertableRelation {
  private def dir: String = layoutDir

  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    GraftSql.insertInto(ctx.sparkSession, dir, version,
      schema.fieldNames.toSeq, data, overwrite)

  override def sqlContext: SQLContext = ctx

  override val schema: StructType =
    DataLayout.schemaAt(ctx.sparkSession, dir, version).getOrElse(
      ctx.sparkSession.read.parquet(
        DataLayout.schemaAnchorFile(ctx.sparkSession, dir)).schema)

  /** Best-effort v1-Filter → Column translation; None = not translatable
    * (Spark re-applies every filter anyway — see unhandledFilters). */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case _ => None
  }

  // every filter re-applies above the scan; pushing them into the masked
  // frame below is an optimization (file pruning), never the correctness
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val (df, _) = GraftFileIndex.readLayoutIndexed(ctx.sparkSession, dir, version)
    val filtered = filters.flatMap(toColumn).reduceOption(_ && _)
      .fold(df)(df.where)
    filtered.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }
}
