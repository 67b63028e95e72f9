package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.StreamingFrameShim

/** Shared option parsing for the WRITE side of `format("graft")` — batch
  * (`df.write.format("graft").mode(…).save(dir)`) and streaming
  * (`df.writeStream.format("graft").start(dir)`) spell the same layout
  * write:
  *
  *  - `path` (required): the layout dir;
  *  - `dims` (required): comma-separated Z-order dimensions; `str:name`
  *    clusters a string column via the byte-order-monotone packing
  *    (same convention as the ops CLI);
  *  - `bits` (default 24): z-key bits per dimension;
  *  - `statsCols` (default: the dims, stripped of `str:`): manifest
  *    min/max/nulls/HLL/fingerprint stats columns;
  *  - `filesPerBatch` / `numFiles` (default 16): output files per
  *    write (per micro-batch for the sink — keep it SMALL for streams;
  *    compaction repays the small-file debt incrementally);
  *  - `txnAppId` (sink only; default: the query's `checkpointLocation`):
  *    the stable id the exactly-once transaction markers key on. A
  *    restarted query keeps its checkpoint, hence its id, hence its
  *    dedup history;
  *  - `maintainEvery` (sink only; off by default): run the
  *    [[Maintenance]] policy pass after every Nth committed batch —
  *    the sink pays down the small-file/overlap debt it creates;
  *  - `rowsPerFile` (default 2^20): the maintenance pass's target file
  *    size.
  */
private[layout] final case class LayoutWriteOptions(
    dir: String, dimNames: Seq[String], bits: Int,
    statsCols: Seq[String], numFiles: Int, txnAppId: Option[String],
    maintainEvery: Option[Int] = None, rowsPerFile: Long = 1L << 20,
    maintainRetain: Option[Int] = None, directCommit: Boolean = false) {

  def dims: Seq[Column] = dimNames.map {
    case s if s.startsWith("str:") =>
      DataLayout.stringDim(col(s.stripPrefix("str:")), bits)
    case c => col(c)
  }
}

private[layout] object LayoutWriteOptions {
  def apply(parameters: Map[String, String]): LayoutWriteOptions = {
    def opt(k: String): Option[String] =
      parameters.get(k).orElse(parameters.get(k.toLowerCase))
    def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = opt("path").getOrElse(throw new IllegalArgumentException(
      "the graft writer needs a 'path' option (the layout dir) — " +
        "pass it as .save(dir)/.start(dir) or .option(\"path\", dir)"))
    val dims = opt("dims").map(csv).getOrElse(
      throw new IllegalArgumentException(
        "the graft writer needs a 'dims' option: comma-separated Z-order " +
          "dimension columns (prefix a string column with 'str:')"))
    require(dims.nonEmpty, "the 'dims' option names no columns")
    val bits = opt("bits").map(_.trim.toInt).getOrElse(24)
    val stats = opt("statsCols").map(csv)
      .getOrElse(dims.map(_.stripPrefix("str:")))
    val files = opt("filesPerBatch").orElse(opt("numFiles"))
      .map(_.trim.toInt).getOrElse(16)
    // misconfiguration fails HERE — at writeStream.start()/save() with a
    // clear message — never at runtime inside addBatch (maintainEvery=0
    // would otherwise throw ArithmeticException on batchId % 0 and kill
    // the streaming query on its first committed batch)
    require(bits >= 1, s"'bits' must be >= 1: $bits")
    require(files >= 1, s"'filesPerBatch'/'numFiles' must be >= 1: $files")
    val maintainEvery = opt("maintainEvery").map(_.trim.toInt)
    maintainEvery.foreach(n =>
      require(n >= 1, s"'maintainEvery' must be >= 1 (batches): $n"))
    val rowsPerFile = opt("rowsPerFile").map(_.trim.toLong).getOrElse(1L << 20)
    require(rowsPerFile >= 1, s"'rowsPerFile' must be >= 1: $rowsPerFile")
    val maintainRetain = opt("maintainRetain").map(_.trim.toInt)
    maintainRetain.foreach(r =>
      require(r >= 0, s"'maintainRetain' must be >= 0 (versions): $r"))
    // commitMode=direct: the object-store append profile (no data-byte
    // renames; visibility via the manifest commit alone) — see
    // DataLayout.appendZOrdered's directCommit
    val commitMode = opt("commitMode").map(_.trim.toLowerCase)
      .getOrElse("rename")
    require(commitMode == "rename" || commitMode == "direct",
      s"'commitMode' must be 'rename' or 'direct': $commitMode")
    LayoutWriteOptions(dir, dims, bits, stats, files,
      opt("txnAppId").orElse(opt("checkpointLocation")),
      maintainEvery = maintainEvery,
      rowsPerFile = rowsPerFile,
      maintainRetain = maintainRetain,
      directCommit = commitMode == "direct")
  }
}

/** The layout as a STRUCTURED-STREAMING SINK — the write-side closure of
  * the layout story and the dual of [[LayoutChangeFeedProvider]]:
  *
  * {{{
  *   events.writeStream.format("graft")
  *     .option("dims", "user_id").option("statsCols", "user_id,ts")
  *     .option("checkpointLocation", ckpt)
  *     .start(layoutDir)
  * }}}
  *
  * EXACTLY-ONCE, not at-least-once: Structured Streaming re-offers a
  * micro-batch after any failure between `addBatch` and the checkpoint
  * commit, so an append-blind sink duplicates rows on recovery. Every
  * batch here commits through [[DataLayout.appendZOrderedTxn]], which
  * writes a `(txnAppId, batchId)` marker INSIDE the version's atomic
  * commit file — a replayed batch (restart recovery, or a zombie twin of
  * the query racing the real one) finds its marker and is skipped whole.
  * Same recovery discipline as Delta's `DeltaSink`/`SetTransaction`
  * (delta/sources/DeltaSink.scala), spelled over the graft manifest log.
  *
  * Each micro-batch pays one range exchange over ITS OWN rows only (the
  * base is never read), so ingestion cost is ∝ stream volume; z-overlap
  * debt between batch files is repaid by [[DataLayout.compactZOrdered]],
  * exactly as for batch [[DataLayout.appendZOrdered]] deltas. Readers
  * (time travel, skip-scans, the change-feed source) see each batch as
  * one ordinary committed version — a downstream
  * `readStream.format("graft-changefeed")` on the same dir turns this
  * sink into a layout-to-layout streaming pipeline. */
private[layout] class GraftLayoutSink(opts: LayoutWriteOptions) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val appId = opts.txnAppId.getOrElse(throw new IllegalArgumentException(
      "the graft sink needs a stable query id for exactly-once markers — " +
        "set 'checkpointLocation' (the usual spelling) or 'txnAppId'"))
    // the incoming frame is streaming-tagged; re-wrap its distributed plan
    // as a batch frame (nothing collected) so the layout writer can run it
    val batch = StreamingFrameShim.asBatch(data)
    val committed = DataLayout.appendZOrderedTxn(batch, opts.dims, opts.bits,
      opts.statsCols, opts.dir, opts.numFiles, appId, batchId,
      directCommit = opts.directCommit)
    // persist the write config once (SQL DML reads it back); absent-only,
    // so the per-batch cost is one tiny existence probe
    if (LayoutConfig.read(data.sparkSession, opts.dir).isEmpty)
      LayoutConfig.record(data.sparkSession, opts.dir,
        LayoutConfig.Config(opts.dimNames, opts.bits, opts.statsCols,
          opts.numFiles,
          commitMode = if (opts.directCommit) "direct" else "rename"))
    if (!committed)
      org.slf4j.LoggerFactory.getLogger(classOf[GraftLayoutSink]).info(
        s"graft sink: batch $batchId of app $appId already committed — skipped")
    // opt-in inline maintenance: the sink is exactly what MAKES small-file
    // debt, so pay it down every Nth batch with the same policy pass the
    // nightly job runs. Only on batches that actually committed — a replay
    // must stay a pure no-op. Maintenance versions are file-moving only,
    // so a downstream change-feed reader sees them as EMPTY batches — and
    // for that reader's sake the inline pass NEVER VACUUMS unless the
    // user opts in with 'maintainRetain': a lagging changefeed consumer
    // needs the versions back to its checkpoint, and a vacuum below that
    // point would kill it unrecoverably.
    else for (n <- opts.maintainEvery if batchId % n == n - 1) {
      val policy = opts.maintainRetain match {
        case Some(r) => Maintenance.Policy(opts.rowsPerFile, retainVersions = r)
        case None => Maintenance.Policy(opts.rowsPerFile,
          minReclaimableFiles = Int.MaxValue) // vacuum arm disabled
      }
      val rep = Maintenance.run(data.sparkSession, opts.dir, opts.dims,
        opts.bits, opts.statsCols, policy)
      if (rep.reasons.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(classOf[GraftLayoutSink]).info(
          s"graft sink maintenance at batch $batchId: ${rep.reasons.mkString("; ")}")
    }
  }
}
