package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension: a continuous diff over a keyed CDC feed.
  *
  * The reference is batch-only (SURVEY.md §2.9); this is the greenfield
  * streaming surface: state per key holds the last seen payload (or its
  * 48-bit hash in [[StreamingDiff.continuousDiffHashState]]), TTL-evicted
  * on event time; each incoming record emits '-' old / '+' new when it
  * changes, nothing when it is a no-op replay. Watermarked windowed
  * aggregation gives the stats stream.
  */
object StreamingDiff {

  /** Event-time in MICROSECONDS — every in-state ordering decision uses
    * this, never Timestamp.getTime: millisecond truncation makes sub-ms
    * transitions sort by shuffle arrival order, and for a CDC feed that
    * means possibly emitting the stale image as a key's final state. */
  private def usOf(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Shared pigeonhole block-width validation for the Hamming operators. */
  private def blockWidth(maxHamming: Int, bits: Int): Int = {
    val nBlocks = maxHamming + 1
    require(maxHamming >= 0 && bits % nBlocks == 0 && bits / nBlocks < 64,
      s"bits/maxHamming combination unsupported: $bits/$nBlocks")
    bits / nBlocks
  }

  case class KeyedRow(key: Long, payload: String, ts: Timestamp)
  /** `seq` orders a key's transitions WITHIN one micro-batch (0, 1, …, in
    * event-time order). Downstream sinks need genuine order to reconstruct
    * a key's final image: sign algebra cannot — an A→B→A flap emits
    * −A,+B,−B,+A and every payload's signed count nets to zero, which
    * would read as "key deleted" when the correct final state is A. */
  case class DiffEvent(sign: String, key: Long, payload: String, seq: Long)

  /** Stateful continuous diff: flatMapGroupsWithState keyed by PK.
    *
    * STATE BOUND: one last-seen payload per key, EVICTED by an event-time
    * TTL (`ttlMs` past the later of the watermark and the key's newest
    * event) — so state size is proportional to keys ACTIVE within the TTL
    * horizon, not to the total keyspace or stream length; pointing this at
    * a 100 TB keyspace holds only the hot working set. For state that is
    * O(8 bytes) per key regardless of payload width, use
    * [[continuousDiffHashState]].
    *
    * BEYOND-TTL RE-ARRIVAL: a key whose state was evicted and then
    * re-arrives is indistinguishable from a brand-new key — it emits '+'
    * with no matching '-', even when the payload is an exact replay of the
    * pre-eviction image (suppressed inside the TTL) or a change from it
    * (which would have emitted '-' old first). [[applyDiffEventsBatch]] is
    * immune — it DELETEs each touched key before INSERTing its final
    * image, so the remote converges identically — but consumers doing
    * sign algebra must treat '+'-without-'-' as upsert, not strict insert.
    * Events at or below the watermark are dropped by the engine before
    * the state function (the standard stateful-operator contract) — so a
    * HISTORICAL BACKFILL whose event times are disordered by more than
    * the watermark (weeks of per-partition file replay) would silently
    * lose the stragglers. For that regime pass `watermark = null`:
    * UNBOUNDED legacy mode — no watermark, no TTL, every event processed
    * regardless of lateness, state grows with the keyspace (the caller
    * explicitly accepts the 100 TB hazard the default exists to
    * prevent). */
  def continuousDiff(rows: Dataset[KeyedRow], watermark: String = "24 hours",
      ttlMs: Long = 86400000L): Dataset[DiffEvent] = {
    import rows.sparkSession.implicits._
    if (watermark == null) return continuousDiffUnbounded(rows)
    rows
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[String, DiffEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[KeyedRow], state: GroupState[String]) =>
          // TTL expiry: evict silently — eviction is retention, NOT a CDC
          // delete (emitting '-' here would tell downstream the key was
          // removed from the source when it merely went idle)
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          // Process in event-time order within the micro-batch — MICROS,
          // not getTime millis (sub-ms transitions must not sort by
          // shuffle arrival order, or the stale image becomes "final").
          val sorted = it.toSeq.sortBy(r => usOf(r.ts))
          val out = scala.collection.mutable.ArrayBuffer.empty[DiffEvent]
          var last = state.getOption
          for (r <- sorted) {
            if (r.payload == null) {
              // tombstone: delete the key if present. GroupState.update
              // rejects null, and applyDiffEventsBatch already treats a
              // key with no '+' events as a delete — so a CDC delete is
              // a '-' with no re-insert.
              last.foreach(old => out += DiffEvent("-", key, old, out.size.toLong))
              last = None
            } else if (!last.contains(r.payload)) {
              last.foreach(old => out += DiffEvent("-", key, old, out.size.toLong))
              out += DiffEvent("+", key, r.payload, out.size.toLong)
              last = Some(r.payload)
            }
          }
          last match {
            case Some(p) => state.update(p)
            case None => if (state.exists) state.remove()
          }
          if (state.exists) {
            // TTL base: the LATER of watermark and this batch's newest
            // event — on the first trigger the watermark is still 0
            // (epoch), and an epoch-based timeout would evict every key
            // at the very next trigger (see streamingDedup)
            val base = math.max(state.getCurrentWatermarkMs(),
              sorted.lastOption.map(_.ts.getTime).getOrElse(0L))
            state.setTimeoutTimestamp(base + ttlMs)
          }
          out.iterator
          }
      }
  }

  /** The pre-TTL semantics, kept for historical backfills (see
    * [[continuousDiff]]'s watermark doc): NoTimeout, no watermark, every
    * event processed however late — state grows with the keyspace. */
  private def continuousDiffUnbounded(rows: Dataset[KeyedRow]): Dataset[DiffEvent] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[String, DiffEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[KeyedRow], state: GroupState[String]) =>
          val sorted = it.toSeq.sortBy(r => usOf(r.ts))
          val out = scala.collection.mutable.ArrayBuffer.empty[DiffEvent]
          var last = state.getOption
          for (r <- sorted) {
            if (r.payload == null) {
              last.foreach(old => out += DiffEvent("-", key, old, out.size.toLong))
              last = None
            } else if (!last.contains(r.payload)) {
              last.foreach(old => out += DiffEvent("-", key, old, out.size.toLong))
              out += DiffEvent("+", key, r.payload, out.size.toLong)
              last = Some(r.payload)
            }
          }
          last match {
            case Some(p) => state.update(p)
            case None => if (state.exists) state.remove()
          }
          out.iterator
      }
  }

  /** 48-bit md5 suffix of a payload — the same truncation family as
    * [[graft.diff.Checksum]], JVM-side (state compares only; never leaves
    * the operator). */
  private def hash48(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).takeRight(12), 16)

  /** [[continuousDiff]] with HASH-ONLY state: per key the state is the
    * 48-bit md5 of the last payload (8 bytes however wide the payload),
    * so the state store is bounded by active-keys × 8B + store overhead —
    * the mode to run against wide CDC payloads at a 100 TB keyspace.
    * The trade: the old image is gone, so '-' events carry `payload =
    * null` (change and tombstone alike) — exactly enough for
    * [[applyDiffEventsBatch]], which deletes by key and inserts each
    * key's final '+' image, and for any consumer that treats '-' as
    * "key changed away from something". Same TTL bound and beyond-TTL
    * re-arrival semantics as [[continuousDiff]]; a 48-bit collision
    * (~1 in 2.8e14 per replayed pair) suppresses a genuine change the
    * same way the reference's 48-bit segment checksums can. */
  def continuousDiffHashState(rows: Dataset[KeyedRow], watermark: String = "24 hours",
      ttlMs: Long = 86400000L): Dataset[DiffEvent] = {
    import rows.sparkSession.implicits._
    rows
      .withWatermark("ts", watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, DiffEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[KeyedRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(r => usOf(r.ts))
            val out = scala.collection.mutable.ArrayBuffer.empty[DiffEvent]
            var last: Option[Long] = state.getOption
            for (r <- sorted) {
              if (r.payload == null) {
                last.foreach(_ => out += DiffEvent("-", key, null, out.size.toLong))
                last = None
              } else {
                val h = hash48(r.payload)
                if (!last.contains(h)) {
                  last.foreach(_ => out += DiffEvent("-", key, null, out.size.toLong))
                  out += DiffEvent("+", key, r.payload, out.size.toLong)
                  last = Some(h)
                }
              }
            }
            last match {
              case Some(h) => state.update(h)
              case None => if (state.exists) state.remove()
            }
            if (state.exists) {
              val base = math.max(state.getCurrentWatermarkMs(),
                sorted.lastOption.map(_.ts.getTime).getOrElse(0L))
              state.setTimeoutTimestamp(base + ttlMs)
            }
            out.iterator
          }
      }
  }

  /** Apply one micro-batch of [[DiffEvent]]s to a remote table as repair
    * statements — the streaming half of [[graft.sources.RemoteRepair]]:
    * DELETE every key the batch touches, then INSERT each key's FINAL
    * image — the payload of its highest-`seq` '+' event. Order, not sign
    * algebra: a key flapping A→B→A inside one batch emits −A,+B,−B,+A,
    * where both payloads' signed counts net to zero — only the event order
    * identifies A as the surviving state. A key whose batch has no '+'
    * events at all is simply deleted (a tombstone stream works). The apply
    * is IDEMPOTENT per batch, so a replayed micro-batch (Structured
    * Streaming's at-least-once foreachBatch contract) converges to the
    * same remote state — effectively-once. */
  def applyDiffEventsBatch(engine: graft.sources.RemoteEngine, table: String,
      batch: DataFrame, maxPerStatement: Int = 256): (Long, Long) = {
    import graft.sources.RemoteRepair
    val keys = batch.select(col("key")).distinct()
    val finalRows = batch.where(col("sign") === "+")
      .groupBy(col("key"))
      .agg(max(struct(col("seq"), col("payload"))).as("m"))
      .select(col("key"), col("m.payload").as("payload"))
    var deleted = 0L
    var inserted = 0L
    val keyIt = keys.toLocalIterator()
    val keyCounted = new Iterator[org.apache.spark.sql.Row] {
      def hasNext = keyIt.hasNext
      def next() = { deleted += 1; keyIt.next() }
    }
    RemoteRepair.deleteStatements(engine.profile, table, Seq("key"),
      keyCounted, maxPerStatement).foreach(engine.update)
    val rowIt = finalRows.toLocalIterator()
    val rowCounted = new Iterator[org.apache.spark.sql.Row] {
      def hasNext = rowIt.hasNext
      def next() = { inserted += 1; rowIt.next() }
    }
    RemoteRepair.insertStatements(engine.profile, table, Seq("key", "payload"),
      rowCounted, maxPerStatement).foreach(engine.update)
    (deleted, inserted)
  }

  /** Continuous remote reconciliation: [[continuousDiff]]'s event stream
    * applied to a remote table per micro-batch. The returned query keeps
    * the remote CONVERGED to the feed's latest per-key state — the
    * streaming closure of the reference's batch "find and fix" loop. */
  def repairSink(events: Dataset[DiffEvent], engine: graft.sources.RemoteEngine,
      table: String): org.apache.spark.sql.streaming.DataStreamWriter[DiffEvent] =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[DiffEvent], _: Long) =>
        applyDiffEventsBatch(engine, table, batch.toDF()); ()
      }

  /** Streaming CLUSTERED ingestion: every micro-batch lands z-ordered via
    * [[graft.layout.DataLayout.appendZOrdered]] (append cost ∝ batch, base
    * files untouched) and every `compactEvery`-th batch runs the targeted
    * [[graft.layout.DataLayout.compactZOrdered]] — so a continuously-fed
    * table stays skip-scannable on its 2-D key without ever pausing for a
    * full rewrite. This is the streaming closure of the layout story: at
    * 100 TB, ingestion writes a few clustered files per trigger and
    * compaction only ever rewrites the z-clusters the recent batches
    * overlapped.
    *
    * Restart safety: foreachBatch is at-least-once, and a replayed append
    * would duplicate rows — so the sink records the last committed
    * (batch id, layout version) pair in `dir/_graft_stream_commit`
    * (underscore path: invisible to readers) and [[ingestBatch]] refuses
    * ids at or below the committed id. The commit point that matters is
    * the MANIFEST append (readers are manifest-routed): if a crash lands
    * between the manifest commit and the marker write, the marker's
    * version lags the log's — the retried batch detects that, skips the
    * re-append, and just advances the marker. Data files from a crash
    * before the manifest commit are unreferenced orphans (invisible to
    * readers, reclaimed by vacuum). Replays therefore converge to
    * exactly-once at every crash point. */
  def clusteredIngestSink(rows: DataFrame, dims: Seq[org.apache.spark.sql.Column],
      bits: Int, statsCols: Seq[String], dir: String,
      filesPerBatch: Int = 4, compactEvery: Int = 4, rowsPerFile: Long = 1L << 20)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, id) =>
      ingestBatch(batch.toDF(), id, dims, bits, statsCols, dir,
        filesPerBatch, compactEvery, rowsPerFile)
    rows.writeStream.outputMode("append").foreachBatch(fn)
  }

  /** One idempotent ingest step (the foreachBatch body, callable directly
    * so restarts/replays are testable). Two-phase per batch:
    *
    *  1. INTENT (`_graft_stream_intent` = "id:baseVersion") written before
    *     touching data;
    *  2. the clustered append (the real commit point is its manifest
    *     append — readers are manifest-routed, so data files from a crash
    *     before that are invisible orphans vacuumed later);
    *  3. optional compaction (semantics-preserving, safe to re-run);
    *  4. COMMIT (`_graft_stream_commit` = id).
    *
    * A retry of batch `id` finds the commit marker (done: skip), or an
    * intent for `id` whose baseVersion is still the log's version (append
    * never committed: redo it), or an intent whose baseVersion is below
    * the log's (append committed, crash before commit marker: skip the
    * re-append, re-run only the idempotent tail). Every crash point
    * therefore converges to exactly-once. */
  def ingestBatch(batch: DataFrame, id: Long,
      dims: Seq[org.apache.spark.sql.Column], bits: Int,
      statsCols: Seq[String], dir: String, filesPerBatch: Int,
      compactEvery: Int, rowsPerFile: Long): Unit = {
    import graft.layout.DataLayout
    val spark = batch.sparkSession
    val commitP = new org.apache.hadoop.fs.Path(dir, "_graft_stream_commit")
    val intentP = new org.apache.hadoop.fs.Path(dir, "_graft_stream_intent")
    val fs = commitP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committedId = readMarker(fs, commitP)
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
    if (id <= committedId) return // replayed micro-batch: already on disk
    val intent = readMarker(fs, intentP).flatMap { s =>
      scala.util.Try {
        val parts = s.split(":"); (parts(0).toLong, parts(1).toLong)
      }.toOption
    }
    val logVer = DataLayout.currentVersion(spark, dir)
    val appendAlreadyCommitted = intent.exists { case (iid, base) =>
      iid == id && logVer > base
    }
    if (!appendAlreadyCommitted) {
      if (intent.forall(_._1 != id)) writeMarker(fs, intentP, s"$id:$logVer")
      if (!batch.isEmpty) {
        if (logVer < 0L)
          DataLayout.writeZOrdered(batch, dims, bits, statsCols, dir, filesPerBatch)
        else
          DataLayout.appendZOrdered(batch, dims, bits, statsCols, dir, filesPerBatch)
      }
    }
    if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
      // exempt already-full files: a continuous stream otherwise re-merges
      // the whole table every compactEvery batches (see compactZOrdered's
      // onlyFilesUnder — the ingest probe's measured failure shape)
      DataLayout.compactZOrdered(spark, dir, dims, bits, statsCols,
        rowsPerFile, onlyFilesUnder = rowsPerFile)
    writeMarker(fs, commitP, id.toString)
    fs.delete(intentP, false)
    ()
  }

  /** Drain a marker file fully — a single read() may legally return a
    * prefix on remote filesystems, and a truncated id would replay
    * batches. Callers parse the string TOLERANTLY (`Try(_.toLong)`): a
    * marker that exists but does not parse is the zero-byte/partial
    * residue of a crash DURING the non-atomic marker write, and must read
    * as ABSENT — the worst case is one redundant re-run of an idempotent
    * batch body, never a stream permanently wedged on a parse throw. */
  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream(64)
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        Some(bos.toString("UTF-8").trim)
      } finally in.close()
    }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Streaming CDC apply: each micro-batch of change events (upserts +
    * delete tombstones) lands on the clustered layout as ONE atomic
    * [[graft.layout.DataLayout.mergeInto]] — envelope-targeted rewrite,
    * so a trigger's worth of CDC touches the files its keys live in, not
    * the table. `opCol` holds 'D' for deletes (any other value upserts);
    * `seqCol` must totally order events per key — the batch resolves
    * last-event-wins BEFORE merging, because mergeInto refuses duplicate
    * keys by contract.
    *
    * Restart safety: a `_graft_cdc_commit` marker skips replayed batch
    * ids. A crash between the merge's manifest commit and the marker
    * makes the retry re-merge the SAME resolved batch — semantically
    * idempotent (upserting identical rows and re-deleting absent keys
    * converges to identical content; the table gains one extra version
    * whose version-diff is empty), so every crash point converges. */
  def cdcMergeSink(cdc: DataFrame, dims: Seq[org.apache.spark.sql.Column],
      bits: Int, statsCols: Seq[String], dir: String, keyCols: Seq[String],
      opCol: String, seqCol: String, numFiles: Int = 4)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, id) =>
      cdcMergeBatch(batch.toDF(), id, dims, bits, statsCols, dir, keyCols,
        opCol, seqCol, numFiles)
    cdc.writeStream.outputMode("append").foreachBatch(fn)
  }

  /** One idempotent CDC merge step (the foreachBatch body, callable
    * directly so replays are testable). */
  def cdcMergeBatch(batch: DataFrame, id: Long,
      dims: Seq[org.apache.spark.sql.Column], bits: Int,
      statsCols: Seq[String], dir: String, keyCols: Seq[String],
      opCol: String, seqCol: String, numFiles: Int): Unit = {
    import graft.layout.DataLayout
    val spark = batch.sparkSession
    val commitP = new org.apache.hadoop.fs.Path(dir, "_graft_cdc_commit")
    val fs = commitP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed: Long = readMarker(fs, commitP)
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
    if (id <= committed) return // replayed micro-batch: already applied
    if (!batch.isEmpty) {
      // last-event-wins per key within the batch (seqCol is the total
      // order; mergeInto would refuse the raw multi-event batch)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
      val last = batch.withColumn("_graft_rn", row_number().over(w))
        .where(col("_graft_rn") === 1).drop("_graft_rn")
        .localCheckpoint(true)
      // null-safe: an event whose op is NULL must UPSERT per the
      // "anything other than 'D' upserts" contract, not vanish from both
      // branches the way a plain =!= filter would silently drop it
      val ups = last.where(!(col(opCol) <=> "D")).drop(opCol, seqCol)
      val dels = last.where(col(opCol) === "D")
        .select(keyCols.map(col): _*)
      if (DataLayout.currentVersion(spark, dir) < 0L) {
        // first batch bootstraps the layout; deletes have nothing to hit
        if (!ups.isEmpty)
          DataLayout.writeZOrdered(ups, dims, bits, statsCols, dir, numFiles)
      } else {
        DataLayout.mergeInto(spark, dir, dims, bits, statsCols, ups,
          keyCols, numFiles,
          deleteKeys = if (dels.isEmpty) None else Some(dels))
      }
    }
    writeMarker(fs, commitP, id.toString)
    ()
  }

  /** Streaming INCREMENTAL VIEW MAINTENANCE: each micro-batch of CDC
    * events lands on the layout via [[cdcMergeBatch]] and then rolls the
    * materialized aggregate view forward via
    * [[graft.layout.MatView.refresh]] — so a pre-aggregated metrics table
    * tracks a continuously-mutating fact table at CHURN cost per trigger:
    * the merge touches only the files the batch's keys live in, and the
    * refresh reads only that version step's change feed (O(groups) merge;
    * a base re-scan only for groups whose min/max an eviction clipped,
    * semi-join-pruned). At 100 TB neither side of a trigger ever pays a
    * full pass.
    *
    * The view bootstraps itself on the first trigger that leaves the
    * layout non-empty (one full aggregation over just that batch's rows —
    * the only full pass the view's lifetime needs).
    *
    * Restart safety composes from the two halves' own guarantees: the
    * merge skips replayed batch ids via its `_graft_cdc_commit` marker,
    * and refresh is version-anchored — a crash between merge and refresh
    * just means the next trigger's refresh rolls across both version
    * steps; a replayed trigger finds the view already current and no-ops.
    * Every crash point converges to a view exactly equal to a full
    * GROUP BY recompute of the layout's current version. */
  def ivmSink(cdc: DataFrame, dims: Seq[org.apache.spark.sql.Column],
      bits: Int, statsCols: Seq[String], dir: String, keyCols: Seq[String],
      opCol: String, seqCol: String, viewDir: String,
      groupCols: Seq[String], measures: Seq[String], numFiles: Int = 4)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, id) =>
      ivmBatch(batch.toDF(), id, dims, bits, statsCols, dir, keyCols,
        opCol, seqCol, viewDir, groupCols, measures, numFiles)
    cdc.writeStream.outputMode("append").foreachBatch(fn)
  }

  /** One idempotent IVM step (the foreachBatch body, callable directly so
    * replays and crash points are testable). */
  def ivmBatch(batch: DataFrame, id: Long,
      dims: Seq[org.apache.spark.sql.Column], bits: Int,
      statsCols: Seq[String], dir: String, keyCols: Seq[String],
      opCol: String, seqCol: String, viewDir: String,
      groupCols: Seq[String], measures: Seq[String], numFiles: Int): Unit = {
    import graft.layout.{DataLayout, MatView}
    cdcMergeBatch(batch, id, dims, bits, statsCols, dir, keyCols,
      opCol, seqCol, numFiles)
    val spark = batch.sparkSession
    if (DataLayout.currentVersion(spark, dir) < 0L) return // nothing landed yet
    val metaP = new org.apache.hadoop.fs.Path(viewDir, MatView.MetaDir)
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaP))
      MatView.materialize(spark, dir, viewDir, groupCols, measures, keyCols)
    else
      MatView.refresh(spark, viewDir)
    ()
  }

  /** Watermarked tumbling-window event counts (late data dropped at 10m). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Watermarked tumbling-window histogram-bin counts — the streaming half
    * of the bounded-state quantile sketch (`q_quantiles_sketch`): bin
    * counts are ADDITIVE, so an update-mode streaming aggregation maintains
    * them with O(bins) state per window (the property the exact
    * `percentile`'s O(distinct values) buffer lacks — it cannot stream at
    * all). Quantile selection is one tiny batch query over the sink via
    * `RelationalQueries.quantilesFromBinCounts`, and because both halves
    * share `histogramBin` + the integer rank rule, a streaming window's
    * quantiles are bit-identical to the batch sketch over the same rows
    * (spec'd). */
  def streamingHistogramCounts(events: DataFrame, tsCol: String, valueSql: String,
      loCents: Long, widthCents: Long, bins: Int,
      windowDur: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      // NULL values excluded, matching the batch sketch (a bin=NULL row
      // would inflate n and shift every downstream quantile)
      .where(expr(s"($valueSql) is not null"))
      .withColumn("bin",
        graft.operators.RelationalQueries.histogramBin(valueSql, loCents, widthCents, bins))
      .groupBy(window(col(tsCol), windowDur), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Continuous bucket-checksum maintenance over a signed CDC feed — the
    * streaming counterpart of `SnapshotChecksums`: each input row carries
    * `op` (+1 insert / −1 delete; an update is a delete of the old image
    * plus an insert of the new), and the running per-bucket summary is
    * `(cnt = Σop, checksum = Σ op·xxhash64(row))` — pure streaming
    * aggregation in update mode, state is one row per bucket, no per-key
    * state. Because the hash sum is signed, replaying a CDC log lands on
    * EXACTLY the summary `TableSegment.fastBucketChecksums` computes from a
    * batch scan of the final table state (spec'd) — so a replica fed by the
    * same CDC stream can be verified continuously: compare this summary
    * against the replica's batch summary (or a stored
    * `SnapshotChecksums.save`) and only dirty buckets need a row-level look.
    *
    * `cols` is the full compared row in stable order (keys first, like
    * `TableSegment.relevantCols`); hashing pairs each column with its null
    * flag for the same null-migration safety as the batch form.
    *
    * A bucket whose ops net to zero keeps reporting `(cnt=0, checksum=0)`
    * — deliberately, so the sink learns the bucket EMPTIED rather than
    * keeping its stale last summary. The batch `fastBucketChecksums` has
    * NO row for an empty bucket, so comparers must treat an absent batch
    * row as (0, 0) (COALESCE in the full-outer compare), or an emptied
    * bucket reads permanently dirty. */
  def cdcChecksumMonitor(cdc: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], buckets: Int = 4096): DataFrame = {
    val cols = keyCols ++ compareCols
    val hashed = xxhash64(cols.flatMap(c => Seq(col(c), col(c).isNull)): _*)
    cdc
      .withColumn("_b", graft.diff.HashDiffer.bucketOf(keyCols, buckets))
      .groupBy(col("_b").as("bucket"))
      .agg(sum(col("op").cast("long")).as("cnt"),
        sum(col("op").cast("long") * hashed.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("checksum"))
  }

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  /** Streaming ingest-time decontamination: flag documents leaking
    * benchmark content the moment they arrive, with the SAME membership
    * semantics as the batch operators (`Dedup.contaminatedIds[Bloom]`).
    *
    * Shape: per-row shingling (stateless narrow ops), a codegen'd Bloom
    * probe of the eval-set sketch (kills ~all clean shingles with zero
    * state and zero shuffle), then a stream-static LEFT SEMI join against
    * the exact benchmark index to remove the sketch's false positives —
    * stream-static equi-joins are fully supported by Structured Streaming
    * and the static side is planned per micro-batch. The only stateful op
    * is the final per-doc dedup, bounded by the event-time watermark.
    * Emits one `(doc_id, ts)` row per contaminated document. */
  def streamingContaminated(docs: Dataset[Doc], benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      watermark: String = "1 hour"): DataFrame = {
    import graft.dedup.Dedup
    // materialized once up front: the static side of the confirm join is
    // re-planned every micro-batch — without this the benchmark would be
    // re-shingled and re-shuffled per batch, on top of the bloom build
    val bench = Dedup.benchmarkIndex(benchmark, idCol, textCol, n).localCheckpoint()
    val hits = Dedup.indexBloom(bench) match {
      case None => docs.toDF().select(col("doc_id"), col("ts")).where(lit(false))
      case Some(bytes) =>
        // ts rides along through the shingling — joining back to `docs`
        // for it would make this a stream-stream join
        Dedup.shingleIndexRaw(docs.toDF(), "doc_id", "text", n, carry = Seq("ts"))
          .select(col("doc_id"), col("ts"), Dedup.md5Int48(col("s")).as("h"))
          .where(Dedup.bloomProbe(bytes, col("h")))
          .join(bench, Seq("h"), "left_semi")
          .select("doc_id", "ts")
    }
    hits.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id")
  }

  /** Streaming NEAR-dup candidates: each arriving document is minhash-
    * banded per-row (`Dedup.bandsOfText`, a plain-Scala kernel bit-
    * identical to the batch `lshBands` — the batch form is a per-doc
    * aggregation a stream cannot run statelessly) and band-joined against
    * the STORED corpus index signatures — a stream-static equi-join,
    * re-planned each micro-batch, so index updates between batches are
    * picked up. The only stateful op is the watermark-bounded per-pair
    * dedup. Batch analogue: `Dedup.deltaMinhashCandidatesFromBands`; the
    * pairs this emits are exactly that operator's cross-quadrant pairs.
    * Emits one (doc_id, match_id, ts) row per candidate pair. */
  def streamingNearDup(docs: Dataset[Doc], indexBands: DataFrame,
      numHashes: Int = 64, rowsPerBand: Int = 4,
      watermark: String = "1 hour"): DataFrame = {
    import docs.sparkSession.implicits._
    val bands = docs.flatMap { d =>
      graft.dedup.Dedup.bandsOfText(d.text, numHashes, rowsPerBand)
        .map { case (b, bh) => (d.doc_id, d.ts, b, bh) }
    }.toDF("doc_id", "ts", "band", "bh")
    bands
      .join(indexBands.select(col("doc_id").as("match_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      // a replayed or re-ingested doc already present in the index matches
      // its own signatures — not a near-dup (the Hamming sibling filters
      // the same way); dedupe on the CANONICAL pair so (a,b) and (b,a)
      // arriving across batches emit once, matching the batch operator's
      // least/greatest canonicalization
      .where(col("doc_id") =!= col("match_id"))
      .select(col("doc_id"), col("match_id"), col("ts"),
        least(col("doc_id"), col("match_id")).as("pair_a"),
        greatest(col("doc_id"), col("match_id")).as("pair_b"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("pair_a", "pair_b")
      .select(col("doc_id"), col("match_id"), col("ts"))
  }

  /** Ingest-time curation pipeline — the streaming spelling of the batch
    * corpus build (`q_pipeline_e2e`): exact dedup → quality filter →
    * benchmark decontamination, composed as ONE streaming query. Dedup is
    * the only stateful stage (one boolean per distinct content hash,
    * watermark TTL); the quality gate is a stateless codegen'd filter on
    * the same `qualityScore` column the batch gate uses; decontamination
    * is an EXACT per-row membership test against the broadcast benchmark
    * shingle-hash set — eval sets are KB–MB by nature (the batch
    * `contaminatedIds` broadcasts the same index), so there is no
    * stream-stream join and no second state store. The per-row kernel
    * `Dedup.shingleHashesOf` is spec-pinned bit-identical to the batch
    * shingling, so a doc is dropped here iff the batch operator would
    * flag it; docs shorter than `n` tokens carry no n-gram and pass
    * vacuously, exactly like the batch side. */
  def streamingCurate(docs: Dataset[Doc], benchmark: DataFrame,
      minScore: Long = 2L, n: Int = 5,
      benchIdCol: String = "doc_id", benchTextCol: String = "text"): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    import graft.dedup.Dedup
    val bench: Set[Long] = Dedup.benchmarkIndex(benchmark, benchIdCol, benchTextCol, n)
      .collect().map(_.getLong(0)).toSet
    val bc = docs.sparkSession.sparkContext.broadcast(bench)
    streamingDedup(docs)
      .where(graft.text.TextFunctions.qualityScore(col("text")) >= minScore)
      .as[Doc]
      .filter(d => !Dedup.shingleHashesOf(d.text, n).exists(bc.value.contains))
  }

  case class SigEvent(doc_id: Long, sig: Long, ts: Timestamp)

  /** Streaming perceptual near-dup over ANY Hamming signature (text
    * SimHash, image dHash, audio aHash — the batch kernels produce the
    * `sig` per row): each arrival's signature explodes to its pigeonhole
    * blocks (stateless, narrow) and band-joins the STORED index blocks —
    * a stream-static equi-join re-planned per micro-batch, so index
    * updates between batches are picked up — then the exact `bit_count`
    * confirm keeps true Hamming-≤d matches. Recall 1.0 against the index
    * by the same pigeonhole bound as the batch `Dedup.hammingNearDup`;
    * the only stateful op is the watermark-bounded per-pair dedup.
    * `indexBlocks` comes from [[indexSigBlocks]] (checkpoint it — the
    * static side is re-planned every batch). */
  def streamingHammingNearDup(sigs: Dataset[SigEvent], indexBlocks: DataFrame,
      maxHamming: Int, bits: Int, watermark: String = "1 hour"): DataFrame = {
    val w = blockWidth(maxHamming, bits)
    val nBlocks = maxHamming + 1
    sigs.toDF()
      .select(col("doc_id"), col("sig"), col("ts"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("bval", expr(s"shiftright(sig, blk * $w) & ${(1L << w) - 1}"))
      .join(indexBlocks, Seq("blk", "bval"))
      .where(col("doc_id") =!= col("match_id") &&
        expr("bit_count(sig ^ match_sig)") <= maxHamming)
      .select(col("doc_id"), col("match_id"),
        expr("cast(bit_count(sig ^ match_sig) as bigint)").as("hamming"), col("ts"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id", "match_id")
  }

  /** Block the stored signature index for [[streamingHammingNearDup]]'s
    * static join side: (match_id, match_sig, blk, bval), one row per
    * signature block. */
  def indexSigBlocks(indexSig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, bits: Int): DataFrame = {
    val w = blockWidth(maxHamming, bits)
    val nBlocks = maxHamming + 1
    indexSig
      .select(col(idCol).as("match_id"), col(sigCol).as("match_sig"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("bval", expr(s"shiftright(match_sig, blk * $w) & ${(1L << w) - 1}"))
  }

  case class UserEvent(user_id: Long, ts: Timestamp)
  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long)
  /** (start_us, end_us, n_events) per not-yet-final session; `emitted`
    * preserves the per-user session index across emissions. */
  case class SessionState(emitted: Long, open: Seq[(Long, Long, Long)])

  /** Streaming gap-based sessionization — the continuous spelling of the
    * batch `q_sessionize` (30-minute gap): events merge into per-user
    * interval state, and a session is emitted ONLY once the event-time
    * watermark passes its end + gap — at that point no surviving event
    * (all have ts > watermark) can extend or bridge it, so the emitted
    * session is FINAL and bit-equal to what the batch window pass computes
    * over the same events; out-of-order arrivals within the watermark
    * merge correctly (including an event BRIDGING two open sessions into
    * one). State per user is the open-session list — bounded by the
    * watermark horizon over the gap, not by stream length — plus one
    * emitted counter; the event-time timeout fires exactly at the first
    * open session's close point. */
  def streamingSessionize(events: Dataset[UserEvent],
      gapUs: Long = 1800000000L, watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SessionState]) =>
          val st = state.getOption.getOrElse(SessionState(0L, Nil))
          // merge incoming events into the open intervals: sort by start,
          // coalesce any adjacent pair within the gap (this is what makes
          // a late bridging event join two sessions)
          val pts = it.map(e => (usOf(e.ts), usOf(e.ts), 1L)).toSeq
          val merged = (st.open ++ pts).sortBy(s => (s._1, s._2))
            .foldLeft(List.empty[(Long, Long, Long)]) {
              case (acc @ (ps, pe, pn) :: rest, (s, e, n)) =>
                if (s - pe <= gapUs) (ps, math.max(pe, e), pn + n) :: rest
                else (s, e, n) :: acc
              case (Nil, x) => x :: Nil
            }.reverse
          // watermark in micros; sessions whose close point it passed are final
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition { case (_, e, _) => e + gapUs < wmUs }
          val out = closed.sortBy(_._1).zipWithIndex.map { case ((s, e, n), i) =>
            SessionOut(user, st.emitted + i + 1, n, s, e)
          }
          state.update(SessionState(st.emitted + closed.size, open))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(open.map(_._2).min / 1000L + gapUs / 1000L + 1L)
          out.iterator
      }
  }

  case class StageEvent(user_id: Long, stage: String, ts: Timestamp)
  case class FunnelHit(user_id: Long, stage: Long, funnel_step: String, at_us: Long)
  /** `times` = finalized first-occurrence micros for the achieved stage
    * prefix; `pending` = (us, stageIdx) events not yet past the
    * watermark. */
  case class FunnelProgress(times: Seq[Long], pending: Seq[(Long, Int)])

  /** Streaming strict-order funnel — the continuous spelling of the batch
    * `funnel` operator: one FunnelHit per (user, stage) the moment the
    * stage's first-occurrence time is WATERMARK-FINAL (no surviving event
    * can be earlier), in stage order, with the same
    * min-after-previous-stage chain rule, so emitted hits match the batch
    * operator over the same events including out-of-order arrivals.
    *
    * Why state stays bounded: an event with ts at or below the watermark
    * ("ripe") either extends the finalized chain NOW — its predecessor
    * stage time is final and earlier — or it never will: any predecessor
    * time set in the future comes from an event still above the
    * watermark, which is LATER than the ripe event, making it forever
    * ineligible (stage i must be strictly after stage i−1). So ripe
    * events are consumed or dropped at each trigger, and state is the
    * achieved-prefix times plus only the above-watermark pending buffer —
    * the watermark horizon, not stream length. */
  def streamingFunnel(events: Dataset[StageEvent], stages: Seq[String],
      watermark: String = "30 minutes"): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // name → index must be a bijection here: a repeated name would map to
    // its LAST index only, stage 0 would never match, and the funnel
    // would silently emit nothing forever (the batch funnel is positional
    // and tolerates repeats — model a repeated step as distinct event
    // types before streaming it)
    require(stages.distinct.size == stages.size,
      s"streaming funnel requires distinct stage names, got $stages")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events
      .filter(e => stageIdx.contains(e.stage))
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[StageEvent], state: GroupState[FunnelProgress]) =>
          val st = state.getOption.getOrElse(FunnelProgress(Nil, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val incoming = it.map(e => (usOf(e.ts), stageIdx(e.stage))).toSeq
          val (ripe, pending) = (st.pending ++ incoming).partition(_._1 < wmUs)
          val times = st.times.toBuffer
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
          var advanced = true
          while (advanced && times.length < stages.length) {
            val i = times.length
            val eligible = ripe.collect { case (us, s)
              if s == i && (i == 0 || us > times(i - 1)) => us }
            if (eligible.isEmpty) advanced = false
            else {
              val t = eligible.min
              times += t
              out += FunnelHit(user, i + 1L, stages.take(i + 1).mkString(">"), t)
            }
          }
          state.update(FunnelProgress(times.toSeq, pending))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1L)
          out.iterator
      }
  }

  /** Streaming exact dedup for a document feed: state per content hash
    * remembers whether the content was ever emitted; replays and late
    * copies are dropped. The batch analogue is `Dedup.exactGroups` — this
    * is the ingest-time variant a training pipeline runs in front of its
    * corpus store. State is one boolean per distinct content hash with an
    * event-time timeout, so it grows with DISTINCT content seen within the
    * retention window, not with stream length. */
  def streamingDedup(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", "1 hour")
      .groupByKey(d => org.apache.commons.codec.digest.DigestUtils.md5Hex(d.text))
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, it: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = it.toSeq
            val first = if (state.exists) None
                        else batch.sortBy(d => (usOf(d.ts), d.doc_id)).headOption
            state.update(true)
            // TTL from the LATER of watermark and this batch's event times:
            // on the very first trigger the watermark is still 0 (epoch),
            // and an epoch-based timeout would purge the state at the next
            // trigger — a replay of the same content well inside the
            // intended retention would then be re-emitted as new
            val base = math.max(state.getCurrentWatermarkMs(),
              if (batch.isEmpty) 0L else batch.iterator.map(_.ts.getTime).max)
            state.setTimeoutTimestamp(base + 3600000L)
            first.iterator
          }
      }
  }
}
