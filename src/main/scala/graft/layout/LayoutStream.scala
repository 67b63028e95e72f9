package graft.layout

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshim.StreamingFrameShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The layout as a STRUCTURED-STREAMING SOURCE: `spark.readStream
  * .format("graft-changefeed").option("path", dir).option("keyCols", …)`
  * tails the layout's version log and emits each new version's row-level
  * change feed (`sign` / key + compare columns / `version`) as a
  * micro-batch — the read-side closure of the layout story (Delta's
  * streaming `table_changes`, spelled over our manifest log). Downstream
  * it composes with everything the streaming layer already has: feed it
  * to [[graft.streaming.StreamingDiff.cdcChecksumMonitor]], a windowed
  * aggregate, or a replica's merge sink on another table.
  *
  * OFFSETS ARE LAYOUT VERSIONS — already durable, totally ordered, and
  * exactly what [[DataLayout.changeFeed]] is keyed by, so checkpoint
  * recovery is trivially exact: a restart resumes from the committed
  * version, and a batch `(v1, v2]` re-requested after a crash re-derives
  * byte-identical rows because every version's file set is immutable.
  * Each micro-batch reads only the files its version steps touched
  * (churn-priced, never a table scan), and a compaction/recluster step
  * correctly contributes an EMPTY batch.
  *
  * Options:
  *  - `path` (required): the layout dir;
  *  - `keyCols` (required): comma-separated row-key columns;
  *  - `compareCols` (optional): comma-separated payload columns to track
  *    (default: every non-key column of the layout's current schema);
  *  - `startingVersion` (optional): first version EXCLUSIVE to stream
  *    from. Default = the layout's version when the stream starts (only
  *    future changes); `0` replays all post-initial history; `-1` replays
  *    the initial version too (a full-snapshot bootstrap, every row '+');
  *  - `maxVersionsPerBatch` (optional): cap one micro-batch at this many
  *    version steps, so a stream that wakes up far behind drains the
  *    backlog in bounded bites (best-effort: the first batch after a
  *    start/restart is uncapped because the cap base isn't known yet).
  *
  * The schema is pinned at stream start (streaming sources are
  * fixed-schema by contract); restart the stream to pick up evolved
  * columns.
  */
class LayoutChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changefeed"

  private def opt(params: Map[String, String], k: String): String =
    params.getOrElse(k, params.getOrElse(k.toLowerCase,
      throw new IllegalArgumentException(
        s"graft-changefeed needs the '$k' option")))

  private def feedSchema(sqlContext: SQLContext,
      params: Map[String, String]): StructType = {
    val dir = opt(params, "path")
    val keys = opt(params, "keyCols").split(",").map(_.trim).filter(_.nonEmpty)
    val spark = sqlContext.sparkSession
    val base = DataLayout.schemaAt(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        dir, DataLayout.Latest)
      .getOrElse(throw new IllegalArgumentException(
        s"no layout schema at $dir — write the layout before streaming it"))
    val compare = params.get("compareCols").orElse(params.get("comparecols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(base.fields.map(_.name).toSeq.filterNot(keys.contains))
    (keys ++ compare).foreach(c => require(base.fieldNames.contains(c),
      s"column '$c' not in layout schema ${base.fieldNames.mkString(",")}"))
    StructType(
      StructField("sign", StringType, nullable = false) +:
      (keys ++ compare).map(c => base(base.fieldIndex(c))) :+
      StructField("version", LongType, nullable = false))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-changefeed derives its schema from the " +
      "layout; a user schema cannot be honored")
    (shortName(), feedSchema(sqlContext, parameters))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = opt(parameters, "path")
    val keys = opt(parameters, "keyCols").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val sch = feedSchema(sqlContext, parameters)
    val compare = sch.fields.map(_.name).toSeq
      .filterNot(c => c == "sign" || c == "version" || keys.contains(c))
    val spark = sqlContext.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val start = parameters.get("startingVersion")
      .orElse(parameters.get("startingversion")).map(_.trim.toLong)
      .getOrElse(DataLayout.currentVersion(spark, dir))
    val maxV = parameters.get("maxVersionsPerBatch")
      .orElse(parameters.get("maxversionsperbatch")).map(_.trim.toLong)
      .getOrElse(Long.MaxValue)
    require(maxV >= 1, s"maxVersionsPerBatch must be >= 1: $maxV")
    new LayoutChangeFeedSource(sqlContext, dir, keys, compare, start, sch, maxV)
  }
}

private[layout] class LayoutChangeFeedSource(sqlContext: SQLContext,
    dir: String, keyCols: Seq[String], compareCols: Seq[String],
    startVersion: Long, override val schema: StructType,
    maxVersionsPerBatch: Long = Long.MaxValue) extends Source {

  private val spark = sqlContext.sparkSession
    .asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Backlog pacing: the end of the last batch this instance PLANNED, so
    * getOffset can cap the next batch at `maxVersionsPerBatch` version
    * steps — a stream that wakes up 500 versions behind then drains in
    * bounded bites instead of one giant batch. Best-effort by design:
    * until the first getBatch (fresh start or checkpoint restart) the cap
    * base is unknown and one uncapped batch may pass. */
  @volatile private var lastPlannedEnd: Option[Long] = None

  /** v1 offsets round-trip through the checkpoint as JSON strings; a
    * restart hands them back as SerializedOffset, so parse the json
    * rather than pattern-match the class. */
  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[OffsetV1] = {
    val cur = DataLayout.currentVersion(spark, dir)
    val capped = lastPlannedEnd match {
      case Some(e) if maxVersionsPerBatch != Long.MaxValue =>
        math.min(cur, e + maxVersionsPerBatch)
      case _ => cur
    }
    if (capped > startVersion) Some(LongOffset(capped)) else None
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    lastPlannedEnd = Some(to)
    val batch: DataFrame =
      if (from >= to)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        DataLayout.changeFeed(spark, dir, from, to, keyCols, compareCols)
          .select(schema.fields.map(f =>
            org.apache.spark.sql.functions.col(f.name)): _*)
    StreamingFrameShim.asStreaming(batch)
  }

  override def stop(): Unit = ()
}
