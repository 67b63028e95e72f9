package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale measurements on SYNTHESIZED large inputs (the sf fixtures
  * stop at 0.1) — the source of PERFORMANCE.md's "measured at 100×" numbers,
  * kept as a main so the measurements are reproducible, not folklore.
  * Run: `SPARK_DRIVER_MEM=48g sbt "runMain graft.ScaleProbe [n_vectors]
  * [n_rows]"` — the default 8g forked heap OOMs in the packSequences
  * checkpoint at the default 60M rows (the probe sizes are chosen to need
  * a real executor's memory, that is the point of them). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nVec = if (args.nonEmpty) args(0).toInt else 200000
    val nRows = if (args.length > 1) args(1).toLong else 60000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- embeddings at ~100× the sf0.1 fixture (2k → nVec vectors) -------
    val vecs = spark.range(nVec.toLong)
      .select(col("id").as("vec_id"),
        // (id+1) keeps every vector nonzero (id=0 would be all sin(0)=0 and
        // ANSI division would throw in the unit normalization)
        transform(sequence(lit(0), lit(63)),
          j => sin((col("id") + 1) * (j + 1) * 0.7)).as("embedding"),
        pmod(col("id"), lit(64)).cast("int").as("label"))
      .localCheckpoint() // measure the operators, not the generator
    println(s"vectors: $nVec, rows: $nRows")

    time("kmeansCells k=64")(
      noop(graft.sim.Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 64)))
    time("semanticDupFlags (label)")(
      noop(graft.sim.Similarity.semanticDupFlags(vecs, "vec_id", "embedding", "label", 0.95)))
    // band parameters MUST scale with the corpus: the gate-scale default
    // (8×5 bits = 32 buckets/band) is O(n²/32) candidates at any n — at
    // 200k vectors that is a 5e9-pair explosion. 16-bit bands give 65k
    // buckets and keep candidates linear-ish.
    time("lshNearDup t=0.9 16-bit bands")(
      noop(graft.sim.Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.9,
        bands = 8, bitsPerBand = 16)))
    time("ivfTopK k=8 (5 queries)")(
      noop(graft.sim.Similarity.ivfTopK(vecs, "vec_id", "embedding", "label",
        col("vec_id") < 5, k = 8)))
    // the SERVING path: index persisted once, 100 NEW query vectors
    // probe their 4 best cells — measures steady-state query cost with
    // the build amortized away
    val ivfDir = java.nio.file.Files.createTempDirectory("ivfprobe").toString + "/idx"
    time(s"saveIvfIndex ($nVec vectors)")(
      graft.sim.Similarity.saveIvfIndex(vecs, "vec_id", "embedding", "label", ivfDir))
    val newQueries = spark.range(100)
      .select((col("id") + 10000000L).as("query_id"),
        transform(sequence(lit(0), lit(63)),
          j => sin((col("id") + 7) * (j + 1) * 0.9)).as("qv"))
    time("ivfQueryIndex 100 queries nProbe=4")(
      noop(graft.sim.Similarity.ivfQueryIndex(spark, ivfDir, newQueries,
        k = 8, nProbe = 4)))
    // ALL-vectors kNN graph (2-probe): pair volume ~nProbe·n²/64 cells —
    // at the pinned 30k vectors ~28M exact dots through the shuffle-hash
    // cell join (no n-row broadcast anywhere; the exact fan-out guard
    // runs first). CAPPED at 30k regardless of nVec: quadratic-over-64-
    // cells at the 200k default is ~1.25e9 window-sorted pairs, which is
    // a different (and budget-refusable, given the sin-vector centroid
    // skew) experiment than the per-pair cost this section measures —
    // the same reasoning as the lshNearDup band note above. The
    // row-count require pins that every vector came back as a query.
    locally {
      val knnN = math.min(nVec, 30000)
      val knnVecs = if (nVec > knnN) vecs.where(col("vec_id") < knnN) else vecs
      val g = graft.sim.Similarity.knnGraph(knnVecs, "vec_id", "embedding",
        "label", k = 8, nProbe = 2, maxEstCandidates = 4000000000L)
        .groupBy().agg(count(lit(1)).as("rows"),
          countDistinct(col("query_id")).as("queries"))
      val r = time(s"knnGraph k=8 nProbe=2 ($knnN)")(g.head())
      require(r.getLong(1) == knnN.toLong,
        s"knnGraph must return every vector as a query: ${r.getLong(1)} of $knnN")
      require(r.getLong(0) >= knnN.toLong,
        s"knnGraph returned fewer rows than queries: ${r.getLong(0)}")
    }

    // ---- wide fact table at nRows ----------------------------------------
    // no checkpoint: the generator is a narrow codegen'd range (~1 s at 60M
    // rows), and materializing it starves execution memory for the sorts
    val fact = spark.range(nRows)
      .select(col("id"),
        (rand(42) * 100000).as("price"),
        concat(lit("g"), pmod(col("id"), lit(6)).cast("string")).as("flag"),
        (lit(100) + pmod(col("id"), lit(400))).as("n_tokens"))

    time("histogramQuantiles (sketch)")(
      noop(graft.operators.RelationalQueries.histogramQuantiles(
        fact, "flag", "price", Seq(500, 900, 990), 0L, 100000L, 128)))
    time("psiDrift 128 bins")(
      noop(graft.operators.RelationalQueries.psiDrift(
        fact.select(col("price").as("v")),
        fact.select((col("price") + 20000).as("v")), "v", 0L, 100000L, 128)))

    // ---- KMV corpus overlap at ~100× the documents fixture ----------------
    // nRows/100 "documents" of 40 synthetic tokens each → tens of millions
    // of shingles per side; the probe measures the two bottom-k scans
    // (TakeOrderedAndProject) that replace a cross-corpus shingle join.
    // Overlap by construction: side B reuses half of side A's id space.
    val nDocs = (nRows / 100).toInt
    val synthDoc = (idCol: org.apache.spark.sql.Column) =>
      concat_ws(" ", transform(sequence(lit(0), lit(39)),
        j => concat(lit("tok"), pmod(idCol * 41 + j * 7, lit(1000000)))))
    val corpusA = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"), synthDoc(col("id")).as("text"))
    val corpusB = spark.range(nDocs.toLong)
      .select((col("id") + nDocs / 2).as("doc_id"),
        synthDoc(col("id") + nDocs / 2).as("text"))
    time(s"kmvOverlap k=256 ($nDocs docs/side)")(
      noop(graft.dedup.Dedup.kmvOverlap(corpusA, corpusB, "doc_id", "text", k = 256)))
    time("packSequences budget=4096")(
      noop(graft.operators.CurationQueries.packSequences(
        fact.select(col("id").as("doc_id"), lit(0L).as("chunk_idx"), col("n_tokens")),
        Seq("doc_id", "chunk_idx"), "n_tokens", 4096L)))

    // ---- passage-level dedup at ~10× the documents fixture ---------------
    // nDocs docs of ~40 tokens; every 10th doc carries the same verbatim
    // 12-token boilerplate tail, so dup windows exist at realistic density
    // (~10% of docs, one span each). Both ops are the same front half
    // (window index + one freq shuffle + join back); the cut adds the
    // covered-position anti-join and per-doc reassembly.
    val boiler = " the same boilerplate footer block repeated verbatim across many documents here"
    val passDocs = spark.range(nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat(synthDoc(col("id")),
          when(pmod(col("id"), lit(10)) === 0, lit(boiler)).otherwise(lit("")))
          .as("text"))
    time(s"dupPassageSpans ($nDocs docs)")(
      noop(graft.operators.CurationQueries.dupPassageSpans(passDocs, "doc_id", "text")))
    time(s"cutDupPassages ($nDocs docs)")(
      noop(graft.operators.CurationQueries.cutDupPassages(passDocs, "doc_id", "text")))

    // ---- classifier inference + training export at the same 10× corpus ---
    // The classifier is one narrow broadcast-probe pass + one per-doc
    // partial-agg exchange; the export is a broadcast cross join + one
    // window bounded by the chosen shard size (1024 shards here — the
    // file-sized-shard discipline, ~600 rows/shard at this corpus).
    time(s"qualityClassifier ($nDocs docs)")(
      noop(graft.operators.TextQueries.qualityClassifier(passDocs, "doc_id", "text")))
    time(s"trainShuffle 2 epochs x1024 shards")(
      noop(graft.operators.CurationQueries.trainShuffle(passDocs, "doc_id",
        nEpochs = 2, nShards = 1024)))

    // ---- perceptual hashing + Hamming pairing at the same 10× corpus -----
    // SimHash via the SimhashBits aggregate (one 48-long vote buffer per
    // doc crosses the exchange), then the pigeonhole block join. passDocs
    // has ~10% boilerplate-sharing docs but token SETS mostly differ, so
    // candidate volume reflects block-collision density, not an all-dup
    // degenerate corpus.
    val simSigs = time(s"simhash ($nDocs docs, agg form)") {
      val sg = graft.dedup.Dedup.simhash(passDocs, "doc_id", "text").localCheckpoint()
      sg.count(); sg
    }
    time("hammingNearDup d<=3 on 48-bit")(
      noop(graft.dedup.Dedup.hammingNearDup(simSigs, "doc_id", "simhash",
        maxHamming = 3, bits = 48)))
    // image dHash throughput: 100k genuine PNGs encoded + decoded + hashed
    // inside tasks — map-only like the video probe, scales with cores
    time("dhashImages 100k PNGs")(
      noop(graft.multimodal.Multimodal.dhashImages(
        graft.multimodal.Multimodal.attachImagePayload(
          spark.range(100000).select(col("id").as("doc_id")), "doc_id",
          w = 14, h = 8)).toDF()))
    // MP4 container parsing throughput: 100k structurally valid MP4s
    // written + box-walked + sample-table-expanded + every 2nd sample
    // sliced out of mdat inside tasks — pure-JVM integer work, map-only
    time("mp4 probe+frameSample 100k")(
      noop {
        import spark.implicits._
        val media = graft.multimodal.Multimodal.attachMp4Payload(
          spark.range(100000).select(col("id").as("doc_id")), "doc_id")
        graft.multimodal.Multimodal.sampleMp4Frames(media, stride = 2)
          .map(fr => fr.frame.length.toLong).toDF("n")
      })

    // ---- funnel + retention at ~30× the events fixture -------------------
    // nRows/10 events over nRows/600 users (~100 events/user), five event
    // types, a 90-day spread: every exchange in both operators is keyed on
    // user_id (funnel: one filtered partial-agg + join per stage;
    // retention: first-day agg + join back + distinct), so both are
    // shuffle-linear in events and never hold more than one timestamp per
    // user per stage.
    val nEv = nRows / 10
    val nUsers = (nRows / 600).max(1000L)
    val events = spark.range(nEv)
      .select(col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) +
          pmod(col("id") * 7919L, lit(7776000L)) * 1000000L).as("ts"),
        pmod(col("id") * 104729L, lit(nUsers)).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("purchase"),
          lit("error"), lit("signup")),
          (pmod(col("id") * 31L, lit(5L)) + 1).cast("int")).as("event_type"))
    time(s"funnel ($nEv events, $nUsers users)")(
      noop(graft.operators.RelationalQueries.funnel(
        events, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))))
    time(s"retentionCohorts ($nEv events)")(
      noop(graft.operators.RelationalQueries.retentionCohorts(events, "user_id", "ts")))

    // ---- incremental dedup: delta LSH against a STORED band index --------
    // The refresh economics claim, measured: a 1% delta band-joined against
    // the persisted index signatures vs re-running the full LSH. Every
    // 100th delta doc duplicates an index doc (cross-quadrant hits exist).
    val nIdx = nDocs / 3
    val nDelta = nIdx / 100
    val idxDocs = spark.range(nIdx.toLong)
      .select(col("id").as("doc_id"), synthDoc(col("id")).as("text"))
    val deltaDocs = spark.range(nDelta.toLong)
      .select((col("id") + 10000000L).as("doc_id"),
        synthDoc(when(pmod(col("id"), lit(100)) === 0, col("id") * 100)
          .otherwise(col("id") + 20000000L)).as("text"))
    val idxBands = time(s"lshBands index build ($nIdx docs)") {
      val b = graft.dedup.Dedup.lshBands(idxDocs, "doc_id", "text").localCheckpoint()
      b.count(); b
    }
    time(s"FULL minhash re-run ($nIdx+$nDelta)")(
      noop(graft.dedup.Dedup.minhashCandidates(
        idxDocs.unionByName(deltaDocs), "doc_id", "text")))
    time(s"delta LSH ($nDelta vs stored index)")(
      noop(graft.dedup.Dedup.deltaMinhashCandidatesFromBands(
        idxBands, deltaDocs, "doc_id", "text")))

    // ---- video codec throughput at ~10× the (decimated) gate volume ------
    // The q_multimodal_video gate certifies decode PARITY on a 10×-
    // decimated corpus; the volume claim lives here: 50k genuine animated
    // GIFs (200k frames) encoded and decoded through javax.imageio inside
    // tasks — map-only, zero shuffles, so throughput scales with cores.
    val videoDocs = spark.range(50000).select(col("id").as("doc_id"))
    time("decodeVideoFrames 50k GIFs")(
      noop(graft.multimodal.Multimodal.decodeVideoFrames(
        graft.multimodal.Multimodal.attachVideoPayload(
          videoDocs, "doc_id", w = 8, h = 8, nFrames = 4)).toDF()))

    // ---- pushdown control loop at 1M rows, 64 scattered diffs ------------
    // The dense-cutover veto's scale claim, measured: single-row diffs
    // scattered one per ~16k-key stripe keep EVERY level-0 segment dirty
    // (prune rate 0 — the exact profile the old zero-prune fast path
    // misread as density and answered with a full-table bulk fetch). The
    // loop must instead bisect: level 1 prunes ~94% and the leaf fetch is
    // O(diff × threshold), not O(table).
    {
      import graft.diff.TableSegment
      import graft.sources.{PushdownDiffer, RemoteTable, SparkViewEngine}
      val n = 1000000L
      val base = spark.range(1, n + 1)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
        .localCheckpoint()
      base.withColumn("v",
          when(pmod(col("k"), lit(n / 64)) === 1, concat(col("v"), lit("X")))
            .otherwise(col("v")))
        .createOrReplaceTempView("probe_pd_b")
      val remote = RemoteTable.introspect(new SparkViewEngine(spark), "probe_pd_b",
        Seq("k"), Seq("v"))
      val stats = time("pushdown 1M scattered=64") {
        val (df, st) = PushdownDiffer.diffWithStats(
          TableSegment(base, Seq("k"), Seq("v")), remote)
        noop(df)
        st
      }
      println(s"  levels=${stats.levels} probed=${stats.segmentsProbed} " +
        s"pruned=${stats.segmentsPruned} leaves=${stats.leafSegments} " +
        s"queries=${stats.remoteQueries} rowsFetched=${stats.rowsFetched} " +
        s"cutover=${stats.denseCutoverAtLevel}")
      require(stats.denseCutoverAtLevel.isEmpty && stats.rowsFetched < n / 8,
        s"scattered regime must bisect, not bulk-fetch: $stats")
    }

    // ---- skew-seeded pushdown at 1M rows ---------------------------------
    // The quantileSeed scale claim, measured: 1M dense keys plus 100
    // stragglers parked at 10^12 (snowflake shape). Arithmetic level-0
    // children split ~10^12 of key WIDTH, so every dense row lands in one
    // child and each extra level is a remote round-trip; quantile seeds
    // cut where the rows are. Same diffs both runs, fewer levels seeded.
    {
      import graft.diff.TableSegment
      import graft.sources.{PushdownControl, PushdownDiffer, RemoteTable, SparkViewEngine}
      val n = 1000000L
      val base = spark.range(1, n + 1)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
        .union(spark.range(100).select((col("id") * 9973L + 1000000000000L).as("k"),
          concat(lit("t"), col("id")).as("v")))
        .localCheckpoint()
      base.withColumn("v",
          when(pmod(col("k"), lit(n / 64)) === 1, concat(col("v"), lit("X")))
            .otherwise(col("v")))
        .createOrReplaceTempView("probe_pdskew_b")
      val remote = RemoteTable.introspect(new SparkViewEngine(spark), "probe_pdskew_b",
        Seq("k"), Seq("v"))
      def runSkew(label: String, ctrl: PushdownControl) = {
        val stats = time(label) {
          val (df, st) = PushdownDiffer.diffWithStats(
            TableSegment(base, Seq("k"), Seq("v")), remote, control = ctrl)
          noop(df)
          st
        }
        println(s"  levels=${stats.levels} queries=${stats.remoteQueries} " +
          s"probed=${stats.segmentsProbed} rowsFetched=${stats.rowsFetched}")
        stats
      }
      val arith = runSkew("pushdown 1M skewed arith", new PushdownControl(quantileSeed = false))
      val seeded = runSkew("pushdown 1M skewed seeded (the default)",
        new PushdownControl())
      require(seeded.levels < arith.levels && seeded.remoteQueries <= arith.remoteQueries,
        s"seeding must save levels on the skewed shape: $seeded vs $arith")

      // ---- remote↔remote on the same snowflake shape ---------------------
      // NEITHER side Spark-readable: the seeding samples the LARGER ENGINE
      // (sampleSql ordered by md5-of-key) instead of a local Spark pass —
      // each saved level here is a checksum round-trip on BOTH engines.
      import graft.sources.RemoteRemoteDiffer
      base.createOrReplaceTempView("probe_rr_a")
      val eng = new SparkViewEngine(spark)
      val ra = RemoteTable.introspect(eng, "probe_rr_a", Seq("k"), Seq("v"))
      val rb = RemoteTable.introspect(eng, "probe_pdskew_b", Seq("k"), Seq("v"))
      def runRR(label: String, ctrl: PushdownControl) = {
        val stats = time(label) {
          val (df, st) = RemoteRemoteDiffer.diff(spark, ra, rb, control = ctrl)
          noop(df)
          st
        }
        println(s"  levels=${stats.levels} queries=${stats.remoteQueries} " +
          s"probed=${stats.segmentsProbed} rowsFetched=${stats.rowsFetched}")
        stats
      }
      val rrArith = runRR("rr 1M skewed arith", new PushdownControl(quantileSeed = false))
      val rrSeeded = runRR("rr 1M skewed seeded (the default)", new PushdownControl())
      require(rrSeeded.levels < rrArith.levels && rrSeeded.remoteQueries < rrArith.remoteQueries,
        s"remote-remote seeding must save levels AND statements on the skewed " +
          s"shape: $rrSeeded vs $rrArith")
    }

    // ---- BPE encode at vocab scale (50k merges) --------------------------
    // The gate runs a 10-merge fixture; a real tokenizer ships ~50k
    // merges. BFS-consistent vocab (every left side is built by an
    // earlier merge, right side a single letter), broadcast once,
    // JVM-wide rank map + per-thread word memo (BpeTable.Runtime), then
    // one map-only pass over a Zipf-ish corpus. The requires pin the
    // output shape; the printed words/s is the recorded throughput.
    {
      import graft.operators.TextQueries
      val letters = ('a' to 'z').map(_.toString)
      val l2 = for { a <- letters; b <- letters } yield (a, b)
      val l3 = for { t <- l2.map { case (a, b) => a + b }; c <- letters } yield (t, c)
      val l4 = (for { t <- l3.map { case (t0, c0) => t0 + c0 }.iterator; c <- letters.iterator }
        yield (t, c)).take(50000 - l2.size - l3.size).toSeq
      val bigMerges = l2 ++ l3 ++ l4
      val mergesDf = spark.createDataFrame(
        bigMerges.zipWithIndex.map { case ((l, r), i) => (i, l, r) })
        .toDF("rank", "left", "right")
      val nDocs = math.min(nRows, 1000000L)
      val wordsPerDoc = 16
      val corpus = spark.range(nDocs).select(col("id"),
        concat_ws(" ", (0 until wordsPerDoc).map(j =>
          concat(lit("tok"), pmod(hash(col("id") * 31 + lit(j)), lit(5000))
            .cast("string"))): _*).as("text"))
        .localCheckpoint()
      val out = TextQueries.bpeEncode(corpus, "id", "text", mergesDf)
      val t0 = System.nanoTime()
      noop(out)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bpeEncode 50k merges          $secs%8.2f s  " +
        f"(${nDocs * wordsPerDoc / secs}%.0f words/s, ${nDocs / secs}%.0f docs/s)")
      // parity check: the distributed (broadcast + JVM-wide runtime)
      // result for doc 0 must equal a driver-local encode of the same
      // text through the same 50k-merge table
      val text0 = corpus.where(col("id") === 0).collect()(0).getString(1)
      val expected = graft.functions.BpeTable.local(bigMerges.toArray)
        .encode(org.apache.spark.unsafe.types.UTF8String.fromString(text0))
        .toString
      val sample = out.where(col("doc_id") === 0).collect()(0).getString(2)
      require(sample == expected,
        s"distributed 50k-merge encode diverged from local: '$sample' vs '$expected'")
    }

    // ---- VocabIds at vocab scale: lookup cost must be size-independent ---
    // The review finding this probe pins: a `typedlit` map literal's
    // element_at is a LINEAR key scan serialized into every task
    // (measured 17× slower at 100k vocab than 1k); the broadcast-hash-map
    // VocabIds expression must cost the same at 200k vocab as at 11
    // entries. Same corpus, same merges, two vocabs whose extra 200k
    // entries are never matched — identical output, so the require is a
    // pure lookup-cost A/B inside one JVM.
    {
      import graft.operators.TextQueries
      val nDocs = math.min(nRows, 1000000L)
      val wordsPerDoc = 16
      val corpus = spark.range(nDocs).select(col("id"),
        concat_ws(" ", (0 until wordsPerDoc).map(j =>
          concat(lit("tok"), pmod(hash(col("id") * 31 + lit(j)), lit(5000))
            .cast("string"))): _*).as("text"))
        .localCheckpoint()
      val mergesDf = spark.createDataFrame(Seq((0, "t", "o"), (1, "to", "k")))
        .toDF("rank", "left", "right")
      val hot = Seq("tok") ++ ('0' to '9').map(_.toString)
      def vocabDf(pad: Int) = spark.createDataFrame(
        (hot ++ (0 until pad).map(i => s"pad$i")).zipWithIndex
          .map { case (t, i) => (t, i.toLong) }).toDF("token", "id")
      def run(label: String, pad: Int): Double = {
        val out = TextQueries.bpeTokenIds(corpus, "id", "text", mergesDf, vocabDf(pad))
        noop(out) // warm: broadcast ship + JIT
        val t0 = System.nanoTime()
        noop(out)
        val secs = (System.nanoTime() - t0) / 1e9
        val r0 = out.where(col("doc_id") === 0).collect()(0)
        require(r0.getLong(3) == 0L, s"every token is in vocab, n_oov must be 0: $r0")
        require(r0.getString(2).count(_ == ',') + 1 == r0.getLong(1),
          s"ids_csv arity must equal n_bpe_tokens: $r0")
        // "tok" + 4 digit chars per word on average ≈ 5 tokens/word
        val toks = nDocs * wordsPerDoc * 5
        println(f"$label%-28s $secs%8.2f s  (~${toks / secs}%.0f token lookups/s)")
        secs
      }
      val tSmall = run("vocabIds 11-entry vocab", pad = 0)
      val tBig = run("vocabIds 200k-entry vocab", pad = 200000)
      require(tBig < tSmall * 2.5 + 0.5,
        f"vocab lookup must be size-independent (hash map, not a literal " +
          f"scan): 200k vocab $tBig%.2f s vs 11-entry $tSmall%.2f s")
    }

    // ---- streaming: continuousDiffHashState state bound ------------------
    // The 8 B/key claim, measured: 10M keys through a MemoryStream into
    // the hash-state CDC diff. Three requires make this a probe, not a
    // demo: (1) state rows == keys; (2) hash-mode state bytes are
    // INDEPENDENT of payload width (the whole point of hashing the
    // payload — full-mode state grows with the payload, hash-mode must
    // not); (3) full-payload mode on the same wide stream costs a
    // multiple of hash mode. Store overhead (UnsafeRow envelopes, the
    // HDFS-backed store's version maps) rides on top of the 8 B value,
    // so the absolute bound is per-KEY overhead, asserted < 512 B.
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingDiff
      implicit val sqlCtx = spark.sqlContext

      def runStream(label: String, keys: Long, payloadWidth: Int,
          hashMode: Boolean): (Long, Long, Double) = {
        val input = MemoryStream[StreamingDiff.KeyedRow]
        val ds =
          if (hashMode) StreamingDiff.continuousDiffHashState(input.toDS())
          else StreamingDiff.continuousDiff(input.toDS())
        val q = ds.writeStream.format("noop").outputMode("append").start()
        val pad = "x" * payloadWidth
        val t0 = System.nanoTime()
        var k = 0L
        val chunk = 1000000L
        while (k < keys) {
          val hi = math.min(k + chunk, keys)
          input.addData((k until hi).map(i => StreamingDiff.KeyedRow(
            i, pad + (i % 97), new java.sql.Timestamp(1700000000000L))))
          q.processAllAvailable()
          k = hi
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress.flatMap(_.stateOperators)
          .maxBy(_.numRowsTotal)
        q.stop()
        println(f"$label%-28s $secs%8.2f s  stateRows=${prog.numRowsTotal} " +
          f"state=${prog.memoryUsedBytes >> 20} MiB " +
          f"(${prog.memoryUsedBytes.toDouble / keys}%.0f B/key, " +
          f"${keys / secs}%.0f rows/s)")
        (prog.numRowsTotal, prog.memoryUsedBytes, secs)
      }

      val nKeys = math.min(nRows, 10000000L)
      val (hsRows, hsMem, _) = runStream(s"hashState $nKeys keys",
        nKeys, payloadWidth = 16, hashMode = true)
      require(hsRows == nKeys,
        s"hash-state rows $hsRows != $nKeys keys — state is not 1 row/key")
      require(hsMem < nKeys * 512L,
        s"hash-state ${hsMem / nKeys} B/key exceeds the 512 B/key bound " +
          "(8 B hash + store envelope)")
      val (_, memNarrow, _) = runStream("hashState 1M keys w=16",
        1000000L, payloadWidth = 16, hashMode = true)
      val (_, memWide, _) = runStream("hashState 1M keys w=512",
        1000000L, payloadWidth = 512, hashMode = true)
      require(memWide < memNarrow * 1.3,
        s"hash-state memory must not scale with payload width: " +
          s"w=512 $memWide vs w=16 $memNarrow")
      val (_, memFull, _) = runStream("fullState 1M keys w=512",
        1000000L, payloadWidth = 512, hashMode = false)
      // the store's fixed envelope (~240 B/key UnsafeRow + version maps)
      // rides on BOTH modes, so the honest claim is the DELTA: full mode
      // pays ~1 B/key per payload byte on top, hash mode pays none
      // (measured: full 720 B/key vs hash 244 B/key at w=512 — the
      // 476 B/key gap is the payload)
      require(memFull - memWide > 1000000L * 512L * 8L / 10L,
        s"full-payload state should grow by ~payload width per key: " +
          s"full $memFull vs hash $memWide — delta too small")
    }

    // ---- sampled diff-rate pre-flight at nRows ---------------------------
    // The Estimate strategy pick's scale cost: one codegen'd hash-filter
    // pass per side + a join on ~n/mod keys. At mod=1024 and 60M rows the
    // sampled sliver is ~59k keys/side.
    {
      val a = spark.range(nRows).select(col("id").as("k"),
        pmod(col("id") * 31L, lit(97L)).as("v"))
      val b = spark.range(nRows).select(col("id").as("k"),
        when(pmod(col("id"), lit(50L)) === 0, lit(-1L))
          .otherwise(pmod(col("id") * 31L, lit(97L))).as("v"))
      val e = time(s"diffEstimate $nRows rows mod=1024")(
        graft.diff.DiffEstimate.estimate(a, b, Seq("k"), Seq("v"), mod = 1024L))
      println(s"  sampled=${e.sampledKeys} differing=${e.differingKeys} " +
        s"milli=${e.milliRate} upper=${e.upperMilliRate} rec=${e.recommendation}")
      require(e.milliRate > 10 && e.milliRate < 30,
        s"2% mutation should estimate ~20 milli: $e")
    }

    // LAST and opt-in (arg 3 = "hazard"): exact percentile buffers
    // O(distinct values) per group and dies on heap at this scale after
    // minutes of churn (measured: 318 s → OOM at 48g over 60M doubles) —
    // the fact the sketch exists for. Poisons the JVM; nothing runs after.
    if (args.length > 2 && args(2) == "hazard")
      time("exact percentile (hazard)")(
        try noop(fact.groupBy("flag").agg(expr("percentile(price, 0.5)").as("p50")))
        catch { case e: Throwable =>
          println(s"  exact percentile FAILED as predicted: ${e.getClass.getSimpleName}") })

    spark.stop()
  }
}
