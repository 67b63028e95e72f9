package graft.cli

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.layout.{Constraints, DataLayout, Replica}

/** CLI for the layout lifecycle — the ops surface a team runs against a
  * clustered table without writing Scala:
  *
  * {{{
  * graft-layout write     <dir> --from t.parquet --dims a,b --stats a,b [--bits 24] [--files 16]
  * graft-layout append    <dir> --from delta.parquet --dims a,b --stats a,b
  * graft-layout merge     <dir> --from cdc.parquet --keys k --dims a,b [--op-col op] [--seq-col seq]
  * graft-layout delete    <dir> --range a:10:20[,b:0:5] --dims a,b --stats a,b [--soft]
  * graft-layout compact   <dir> --dims a,b --stats a,b [--rows-per-file N]
  * graft-layout recluster <dir> --dims c --stats c [--bits N] [--files N]
  * graft-layout purge     <dir> --dims a,b --stats a,b
  * graft-layout vacuum    <dir> [--retain N]
  * graft-layout maintain  <dir> --dims a,b --stats a,b [--rows-per-file N] [--retain N]
  * graft-layout bloom     <dir> [column] [--bits N]   # no column = refresh all
  * graft-layout ingest    <dir> --from <landingDir> --dims a,b [--once]
  *                        [--maintain-every N] [--checkpoint <dir>]
  * graft-layout replica-init <rep> --from <srcDir> --dims a,b --keys k
  * graft-layout replica-sync <rep> --dims a,b  # then: verify <rep>
  * graft-layout history   <dir>
  * graft-layout stats     <dir>
  * graft-layout scan      <dir> --range a:10:20 [--out out.parquet]
  * graft-layout travel    <dir> --version N [--out out.parquet]
  * graft-layout constraint <dir> add <name> <sql-predicate> | drop <name> | list
  * graft-layout diff      <dirA> <dirB> --keys k1[,k2] [--compare c1,c2] [--out out.parquet]
  * graft-layout verify    <replicaDir> [--out out.parquet]
  * }}}
  *
  * `--dims` entries are column names; prefix `str:` for a string column
  * (clustered via [[DataLayout.stringDim]]). Ranges are `col:lo:hi`
  * (numeric when both bounds parse as longs, else string). JSON lines go
  * to stdout; a contract violation (bad args, CHECK refusal, concurrent
  * commit) exits nonzero with the message on stderr.
  */
object LayoutCli {

  final case class LArgs(cmd: String = "", dir: String = "",
      from: Option[String] = None, dims: Seq[String] = Nil,
      stats: Seq[String] = Nil, bits: Int = 24, files: Int = 16,
      rowsPerFile: Long = 1L << 20, ranges: Seq[(String, Any, Any)] = Nil,
      soft: Boolean = false, retain: Int = 1, out: Option[String] = None,
      version: Option[Long] = None, keys: Seq[String] = Nil,
      compare: Seq[String] = Nil,
      opCol: String = "op", seqCol: String = "seq",
      once: Boolean = false, maintainEvery: Int = 0,
      checkpoint: Option[String] = None, commitMode: String = "rename",
      bisectThreshold: Long = 1L << 16, rest: Seq[String] = Nil)

  def parseArgs(argv: Array[String]): LArgs = {
    def ranges(v: String): Seq[(String, Any, Any)] =
      v.split(",").toSeq.map { r =>
        r.split(":") match {
          case Array(c, lo, hi) =>
            (scala.util.Try(lo.toLong).toOption,
              scala.util.Try(hi.toLong).toOption) match {
              case (Some(l), Some(h)) => (c, l: Any, h: Any)
              case _ => (c, lo: Any, hi: Any)
            }
          case _ => throw new IllegalArgumentException(
            s"range must be col:lo:hi, got '$r'")
        }
      }
    def go(rem: List[String], a: LArgs): LArgs = rem match {
      case Nil => a
      case "--from" :: v :: t => go(t, a.copy(from = Some(v)))
      case "--dims" :: v :: t => go(t, a.copy(dims = v.split(",").toSeq))
      case "--stats" :: v :: t => go(t, a.copy(stats = v.split(",").toSeq))
      case "--bits" :: v :: t => go(t, a.copy(bits = v.toInt))
      case "--files" :: v :: t => go(t, a.copy(files = v.toInt))
      case "--rows-per-file" :: v :: t => go(t, a.copy(rowsPerFile = v.toLong))
      case "--range" :: v :: t => go(t, a.copy(ranges = ranges(v)))
      case "--soft" :: t => go(t, a.copy(soft = true))
      case "--retain" :: v :: t => go(t, a.copy(retain = v.toInt))
      case "--out" :: v :: t => go(t, a.copy(out = Some(v)))
      case "--version" :: v :: t => go(t, a.copy(version = Some(v.toLong)))
      case "--keys" :: v :: t => go(t, a.copy(keys = v.split(",").toSeq))
      case "--compare" :: v :: t => go(t, a.copy(compare = v.split(",").toSeq))
      case "--op-col" :: v :: t => go(t, a.copy(opCol = v))
      case "--seq-col" :: v :: t => go(t, a.copy(seqCol = v))
      case "--once" :: t => go(t, a.copy(once = true))
      case "--maintain-every" :: v :: t => go(t, a.copy(maintainEvery = v.toInt))
      case "--checkpoint" :: v :: t => go(t, a.copy(checkpoint = Some(v)))
      // object-store profile: persisted via LayoutConfig, so later SQL
      // DML / maintenance on this layout inherit it
      case "--commit-mode" :: v :: t => go(t, a.copy(commitMode = v.trim.toLowerCase))
      // diff: recurse the checksum bisection until the dirty-row estimate
      // drops under this (see DataLayout.diffLayouts bisectRowThreshold)
      case "--bisect-threshold" :: v :: t => go(t, a.copy(bisectThreshold = v.toLong))
      case p :: t if a.cmd.isEmpty => go(t, a.copy(cmd = p))
      case p :: t if a.dir.isEmpty => go(t, a.copy(dir = p))
      case p :: t => go(t, a.copy(rest = a.rest :+ p))
    }
    val a = go(argv.toList, LArgs())
    require(a.cmd.nonEmpty, "usage: graft-layout <cmd> <dir> [options]")
    require(a.dir.nonEmpty, s"command '${a.cmd}' needs a layout dir")
    a
  }

  /** `str:`-prefixed dims cluster via the byte-order-monotone string
    * packing; everything else is a plain (long-castable) column. */
  private def dimCols(dims: Seq[String], bits: Int): Seq[Column] = {
    require(dims.nonEmpty, "this command needs --dims")
    dims.map {
      case s if s.startsWith("str:") =>
        DataLayout.stringDim(col(s.stripPrefix("str:")), bits)
      case c => col(c)
    }
  }

  /** JSON string escaping for values (keys are fixed literals): quotes,
    * backslashes, and control chars — a constraint predicate containing a
    * quoted literal must not emit a malformed line. */
  private def jstr(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def jsonLine(kv: (String, Any)*): String =
    kv.map {
      case (k, v: String) => s""""$k":"${jstr(v)}""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")

  /** Print every row of a small ops frame as one JSON line each (these
    * frames are O(versions) or O(columns) — never data-sized). */
  private def printFrame(df: DataFrame): Unit = {
    val cols = df.columns
    df.toJSON.collect().foreach(println) // driver-bounded by contract
    Console.err.println(s"[layout] ${cols.mkString(",")}")
  }

  def run(a: LArgs, spark: SparkSession): Unit = a.cmd match {
    case "write" | "append" =>
      val src = a.from.getOrElse(
        throw new IllegalArgumentException(s"${a.cmd} needs --from <parquet>"))
      val df = spark.read.parquet(src)
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      if (a.cmd == "write")
        DataLayout.writeZOrdered(df, dimCols(a.dims, a.bits), a.bits,
          stats, a.dir, a.files)
      else
        DataLayout.appendZOrdered(df, dimCols(a.dims, a.bits), a.bits,
          stats, a.dir, a.files)
      // named dims → record the write config so SQL DML (INSERT/DELETE/
      // MERGE on a `USING graft` view) can recover the clustering
      graft.layout.LayoutConfig.record(spark, a.dir,
        graft.layout.LayoutConfig.Config(a.dims, a.bits, stats, a.files,
          a.commitMode))
      println(jsonLine("op" -> a.cmd, "dir" -> a.dir,
        "version" -> DataLayout.currentVersion(spark, a.dir)))

    case "merge" =>
      // one-shot CDC apply: upserts + 'D' tombstones, resolved
      // last-event-wins per key by --seq-col BEFORE the envelope-targeted
      // mergeInto (the same contract as the streaming cdcMergeSink, minus
      // the replay marker a one-shot doesn't need)
      val src = a.from.getOrElse(
        throw new IllegalArgumentException("merge needs --from <cdc.parquet>"))
      require(a.keys.nonEmpty, "merge needs --keys k1[,k2]")
      val cdc = spark.read.parquet(src)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(a.keys.map(col): _*).orderBy(col(a.seqCol).desc)
      val last = cdc.withColumn("_graft_rn", row_number().over(w))
        .where(col("_graft_rn") === 1).drop("_graft_rn")
        .localCheckpoint(true)
      val ups = last.where(!(col(a.opCol) <=> "D")).drop(a.opCol, a.seqCol)
      val dels = last.where(col(a.opCol) === "D").select(a.keys.map(col): _*)
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val r = DataLayout.mergeInto(spark, a.dir, dimCols(a.dims, a.bits),
        a.bits, stats, ups, a.keys, a.files,
        deleteKeys = if (dels.isEmpty) None else Some(dels))
      println(jsonLine("op" -> "merge", "files_rewritten" -> r.filesRewritten,
        "rows_updated" -> r.rowsUpdated, "rows_inserted" -> r.rowsInserted,
        "rows_deleted" -> r.rowsDeleted))

    case "delete" =>
      require(a.ranges.nonEmpty, "delete needs --range col:lo:hi")
      if (a.soft) {
        val r = DataLayout.deleteVectors(spark, a.dir, a.ranges)
        println(jsonLine("op" -> "delete-soft",
          "files_touched" -> r.filesTouched, "rows_deleted" -> r.rowsDeleted))
      } else {
        val stats = if (a.stats.nonEmpty) a.stats
          else a.dims.map(_.stripPrefix("str:"))
        val r = DataLayout.deleteWhere(spark, a.dir, dimCols(a.dims, a.bits),
          a.bits, stats, a.ranges)
        println(jsonLine("op" -> "delete",
          "files_rewritten" -> r.filesRewritten, "rows_deleted" -> r.rowsDeleted))
      }

    case "compact" =>
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val r = DataLayout.compactZOrdered(spark, a.dir, dimCols(a.dims, a.bits),
        a.bits, stats, a.rowsPerFile)
      println(jsonLine("op" -> "compact",
        "clusters_rewritten" -> r.clustersRewritten,
        "files_rewritten" -> r.filesRewritten,
        "files_total_after" -> r.filesTotalAfter))

    case "recluster" =>
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val r = DataLayout.recluster(spark, a.dir, dimCols(a.dims, a.bits),
        a.bits, stats, a.files)
      println(jsonLine("op" -> "recluster",
        "files_before" -> r.filesBefore, "files_after" -> r.filesAfter))

    case "purge" =>
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val r = DataLayout.purgeDeletes(spark, a.dir, dimCols(a.dims, a.bits),
        a.bits, stats)
      println(jsonLine("op" -> "purge",
        "files_rewritten" -> r.filesRewritten,
        "positions_applied" -> r.positionsApplied))

    case "vacuum" =>
      // --retain 0 is the explicit GDPR spelling (all history gone);
      // the default keeps one version of time travel
      val r = DataLayout.vacuum(spark, a.dir, a.retain)
      println(jsonLine("op" -> "vacuum", "files_deleted" -> r.filesDeleted,
        "retain" -> a.retain,
        "log_rows_before" -> r.logRowsBefore, "log_rows_after" -> r.logRowsAfter))

    case "maintain" =>
      // the whole nightly pass, policy-gated: purge -> overlap compact ->
      // bin-pack -> vacuum, each only when its debt threshold trips
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val r = graft.layout.Maintenance.run(spark, a.dir,
        dimCols(a.dims, a.bits), a.bits, stats,
        graft.layout.Maintenance.Policy(rowsPerFile = a.rowsPerFile,
          retainVersions = a.retain))
      println(jsonLine("op" -> "maintain",
        "purged" -> r.purged.isDefined,
        "overlap_compacted" -> r.overlapCompacted.isDefined,
        "bin_packed" -> r.binPacked.isDefined,
        "vacuumed" -> r.vacuumed.isDefined,
        "files_before" -> r.debtBefore.files,
        "files_after" -> r.debtAfter.files,
        "reasons" -> r.reasons.mkString("; ")))

    case "history" =>
      printFrame(DataLayout.history(spark, a.dir))

    case "stats" =>
      printFrame(DataLayout.tableStatsFromManifest(spark, a.dir))

    case "replica-init" =>
      // seed a replica (its OWN clustering) and pin the source version —
      // the one full copy it will ever pay
      val src = a.from.getOrElse(throw new IllegalArgumentException(
        "replica-init needs --from <sourceLayoutDir>"))
      require(a.keys.nonEmpty, "replica-init needs --keys k1[,k2]")
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val d = Replica.init(spark, src, a.dir, dimCols(a.dims, a.bits),
        a.bits, stats, a.keys, a.files)
      println(jsonLine("op" -> "replica-init", "src" -> d.srcDir,
        "src_version" -> d.srcVersion))

    case "replica-sync" =>
      // ship the source's churn since the pin (change feed -> one
      // envelope-targeted merge); a current replica is a no-op
      val stats = if (a.stats.nonEmpty) a.stats
        else a.dims.map(_.stripPrefix("str:"))
      val r = Replica.sync(spark, a.dir, dimCols(a.dims, a.bits),
        a.bits, stats, a.files)
      println(jsonLine("op" -> "replica-sync",
        "from_version" -> r.fromVersion, "to_version" -> r.toVersion,
        "feed_rows" -> r.feedRows, "upserts" -> r.upserts,
        "deletes" -> r.deletes, "files_rewritten" -> r.filesRewritten))

    case "ingest" =>
      // continuous (or --once drained) EXACTLY-ONCE ingestion from a
      // landing directory of parquet files into the layout: the file
      // streaming source tracks which files are consumed (checkpoint),
      // the graft sink's txn markers make every micro-batch land once —
      // crash anywhere, re-run, nothing duplicates. The auto-loader
      // story in one command.
      val landing = a.from.getOrElse(throw new IllegalArgumentException(
        "ingest needs --from <landingDir> (a directory parquet files land in)"))
      require(a.dims.nonEmpty, "ingest needs --dims")
      val schema = spark.read.parquet(landing).schema // ≥1 file must exist
      val ckpt = a.checkpoint.getOrElse(s"${a.dir}/_graft_ingest_ckpt")
      val reader = spark.readStream.schema(schema).parquet(landing)
      var w = reader.writeStream.format("graft")
        .option("dims", a.dims.mkString(","))
        .option("statsCols",
          (if (a.stats.nonEmpty) a.stats
           else a.dims.map(_.stripPrefix("str:"))).mkString(","))
        .option("filesPerBatch", a.files)
        .option("checkpointLocation", ckpt)
      if (a.maintainEvery > 0)
        w = w.option("maintainEvery", a.maintainEvery)
          .option("rowsPerFile", a.rowsPerFile)
      if (a.once) {
        val q = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(a.dir)
        q.awaitTermination()
        println(jsonLine("op" -> "ingest", "mode" -> "once",
          "rows_total" -> DataLayout.readLayout(spark, a.dir).count(),
          "version" -> DataLayout.currentVersion(spark, a.dir),
          "checkpoint" -> ckpt))
      } else {
        val q = w.start(a.dir)
        Console.err.println(s"[layout] ingesting $landing -> ${a.dir} " +
          s"(ctrl-c to stop; checkpoint at $ckpt survives restarts)")
        q.awaitTermination()
      }

    case "bloom" =>
      // build/extend a point-lookup file index, or refresh every existing
      // one after rewrites: graft-layout bloom <dir> [column] [--bits N]
      a.rest.headOption.orElse(a.dims.headOption) match {
        case Some(c) =>
          val r = DataLayout.buildBloomIndex(spark, a.dir, c,
            numBits = if (a.bits != 24) a.bits else 8192)
          println(jsonLine("op" -> "bloom", "column" -> c,
            "files_indexed" -> r.filesIndexed, "files_total" -> r.filesTotal))
        case None =>
          val rs = DataLayout.refreshBloomIndexes(spark, a.dir)
          rs.foreach(r => println(jsonLine("op" -> "bloom-refresh",
            "column" -> r.column, "files_indexed" -> r.filesIndexed,
            "stale_dropped" -> r.staleDropped)))
          if (rs.isEmpty) println(jsonLine("op" -> "bloom-refresh",
            "column" -> "", "files_indexed" -> 0, "stale_dropped" -> 0L))
      }

    case "scan" =>
      require(a.ranges.nonEmpty, "scan needs --range col:lo:hi")
      val s = DataLayout.skipScan(spark, a.dir, a.ranges,
        a.version.getOrElse(DataLayout.Latest))
      a.out match {
        case Some(p) => s.df.write.mode("overwrite").parquet(p)
        case None => ()
      }
      println(jsonLine("op" -> "scan", "files_read" -> s.filesRead,
        "files_total" -> s.filesTotal, "rows" -> s.df.count(),
        "out" -> a.out.getOrElse("")))

    case "travel" =>
      val v = a.version.getOrElse(
        throw new IllegalArgumentException("travel needs --version N"))
      val df = DataLayout.readLayout(spark, a.dir, v)
      a.out.foreach(p => df.write.mode("overwrite").parquet(p))
      println(jsonLine("op" -> "travel", "version" -> v,
        "rows" -> df.count(), "out" -> a.out.getOrElse("")))

    case "diff" =>
      // file-granular cross-layout diff: dirB rides in the first free arg
      // after the two positionals; equal layouts cost zero data reads
      val dirB = a.rest.headOption.getOrElse(
        throw new IllegalArgumentException(
          "diff needs two layout dirs: graft-layout diff <dirA> <dirB> --keys k"))
      require(a.keys.nonEmpty, "diff needs --keys k1[,k2]")
      val r = DataLayout.diffLayouts(spark, a.dir, dirB, a.keys,
        compareCols = a.compare, bisectRowThreshold = a.bisectThreshold)
      // pin once: writing AND counting the same diff plan would otherwise
      // run the row-level work twice, on exactly the large-drift case
      val ddf = if (a.out.isDefined) r.df.localCheckpoint(true) else r.df
      a.out.foreach(p => ddf.write.mode("overwrite").parquet(p))
      println(jsonLine("op" -> "diff", "rows" -> ddf.count(),
        "files_read_a" -> r.filesReadA, "files_total_a" -> r.filesTotalA,
        "files_read_b" -> r.filesReadB, "files_total_b" -> r.filesTotalB,
        // bisection evidence (−1 row-diffed = the bisected path didn't
        // run): dirty/total segments + how few files fed the row diff
        "segments_dirty" -> r.segmentsDirty,
        "segments_total" -> r.segmentsTotal,
        "files_row_diffed_a" -> r.filesRowDiffedA,
        "files_row_diffed_b" -> r.filesRowDiffedB,
        "out" -> a.out.getOrElse("")))

    case "verify" =>
      // nightly replica drift check: zero row-diff work when clean
      val r = graft.layout.Replica.verify(spark, a.dir, a.compare)
      val vdf = if (a.out.isDefined) r.df.localCheckpoint(true) else r.df
      val drift = vdf.count()
      a.out.foreach(p => vdf.write.mode("overwrite").parquet(p))
      println(jsonLine("op" -> "verify", "clean" -> (drift == 0L),
        "drift_rows" -> drift,
        "files_read_src" -> r.filesReadA, "files_read_replica" -> r.filesReadB,
        "out" -> a.out.getOrElse("")))

    case "constraint" => a.rest match {
      case Seq("list") | Seq() =>
        Constraints.list(spark, a.dir).foreach { case (n, e) =>
          println(jsonLine("name" -> n, "expr" -> e))
        }
      case Seq("add", name, exprSql) =>
        Constraints.add(spark, a.dir, name, exprSql)
        println(jsonLine("op" -> "constraint-add", "name" -> name))
      case Seq("drop", name) =>
        Constraints.drop(spark, a.dir, name)
        println(jsonLine("op" -> "constraint-drop", "name" -> name))
      case other => throw new IllegalArgumentException(
        s"constraint subcommand must be add <name> <expr> | drop <name> | list, got: ${other.mkString(" ")}")
    }

    case other =>
      throw new IllegalArgumentException(s"unknown layout command '$other'")
  }

  def main(argv: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(parseArgs(argv), spark)
    catch {
      case e: Exception =>
        Console.err.println(s"[layout] ${e.getMessage}")
        sys.exit(2)
    }
  }
}
