package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions

/** Corpus-curation operators beyond dedup/quality/language-ID: PII masking,
  * repetition-based quality filtering (the Gopher-rules shape), and
  * deterministic stratified sampling for language rebalancing. All are
  * single-scan / few-shuffle plans over codegen'd built-ins, with integer
  * arithmetic wherever a float would make cross-engine hashes drift.
  */
object CurationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Context-window chunking: `w`-token windows at `stride` (overlap
    * w−stride), the document→training-sequence step. Chunk count is exact
    * integer math; the plan is one narrow generate per row (sequence →
    * posexplode → slice) — zero shuffles, a pure map over any corpus.
    * Output: (doc_id, chunk_idx, n_tokens, chunk_sig) with content pinned
    * by md5 (emitting text would just re-ship the corpus). */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      w: Int = 32, stride: Int = 24): DataFrame = {
    // stride > w would silently DROP tokens between windows (and can emit a
    // trailing empty chunk: n_tokens=0, chunk_sig=md5("")); stride ≤ 0 makes
    // the chunk-count arithmetic nonsense. Corrupting the training-sequence
    // stream must be loud, not a default-argument typo away.
    require(w > 0 && stride > 0 && stride <= w,
      s"chunkWindows needs 0 < stride <= w, got w=$w stride=$stride — " +
        "stride > w skips tokens between windows; stride <= 0 is meaningless.")
    df.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("t"))
      .withColumn("n_chunks",
        expr(s"case when size(t) <= $w then 1 else 1 + (size(t) - $w + ${stride - 1}) div $stride end"))
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(Seq("pos", "chunk_idx")))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("t"), (col("chunk_idx") * stride + 1).cast("int"), lit(w)).as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_tokens"),
        md5(array_join(col("c"), " ")).as("chunk_sig"))
  }

  /** Sequence packing — the concat-and-cut step that turns chunked
    * documents into fixed-`budget` training sequences: rows are laid out in
    * `orderCols` order, token counts accumulate globally, and each row gets
    * the pack it starts in (`pack_id = cum_before div budget`) and its
    * offset inside that pack. Straddling is the contract (the trainer cuts
    * every `budget` tokens over the concatenated stream), exactly like the
    * GPT-style packing pipelines this feeds.
    *
    * The interesting part at 100 TB is the GLOBAL PREFIX SUM: the naive
    * spelling is a window over the whole corpus with no partition key — a
    * single task holding every row, the canonical scale-killer. Here it is
    * the two-pass partition-offset pattern instead: range-repartition on
    * the order columns (so partition i holds a contiguous, sorted slice),
    * aggregate ONE token total per partition (bounded driver collect:
    * numPartitions longs), prefix-sum those driver-side, broadcast the
    * offsets back, and run the per-partition cumulative window keyed by
    * partition id — every window is bounded by its partition, all
    * partitions run in parallel. The output is invariant to where the
    * (sampled, nondeterministic) range boundaries fall, because offset +
    * within-partition prefix is the same global prefix either way — which
    * is what lets the DuckDB oracle hash-match a plain ORDER BY window.
    *
    * The within-partition prefix is an order-preserving `mapPartitions`
    * scan, NOT a window `partitionBy(_pid)`: Catalyst cannot see that the
    * range repartition already satisfies a pid-keyed distribution and would
    * insert a second full-data exchange + sort just to run the window
    * (verified in the audited plan) — the scan runs in place on the
    * already-sorted partitions, so the operator's only data-sized exchange
    * is the range repartition itself.
    *
    * CORRECTNESS: the totals collect and the final prefix scan are two
    * separate query executions — Spark does not reuse exchanges across
    * actions, so without pinning, each would re-run the range exchange with
    * its own boundary-sampling job. If the input's row order is
    * nondeterministic across recomputations (any upstream shuffle — exactly
    * the pipelines this feeds), the two executions could pick different
    * range boundaries, and the broadcast per-pid offsets would be applied
    * to a partitioning other than the one they were computed from:
    * silently wrong pack_id/pack_offset. So `parts` is pinned with an
    * EAGER localCheckpoint before the totals pass: both executions read
    * the same materialized blocks, and the truncated lineage turns any
    * block loss (executor death on a real cluster) into a loud failure
    * instead of a silent divergent recompute. The blocks are released by
    * the ContextCleaner when the returned plan is garbage-collected. */
  def packSequences(chunks: DataFrame, orderCols: Seq[String], tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val spark = chunks.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val oc = orderCols.map(col)
    val parts = chunks.repartitionByRange(oc: _*).sortWithinPartitions(oc: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pin ONE partitioning for both passes (see scaladoc)
    val totals = parts.groupBy("_pid").agg(sum(col(tokenCol)).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] =
      totals.map { case (pid, t) => val o = acc; acc += t; pid -> o }.toMap
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val inSchema = parts.schema
    val tokenIdx = inSchema.fieldIndex(tokenCol)
    val pidIdx = inSchema.fieldIndex("_pid")
    val outEnc = org.apache.spark.sql.Encoders.row(
      StructType(inSchema.fields :+ StructField("_cum_excl", LongType, nullable = false)))
    parts
      .mapPartitions { it =>
        // single order-preserving scan: rows arrive in orderCols order
        // (sortWithinPartitions), the partition's global offset comes from
        // the broadcast, tokens accumulate locally
        var run = -1L // initialized from the first row's pid
        it.map { r =>
          if (run < 0) run = bcOffsets.value(r.getInt(pidIdx))
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
          run += r.getLong(tokenIdx)
          out
        }
      }(outEnc)
      .withColumn("pack_id", expr(s"_cum_excl div $budget"))
      .withColumn("pack_offset", expr(s"_cum_excl % $budget"))
      .drop("_pid", "_cum_excl")
  }

  /** Duplicated-passage spans — the exact-substring dedup signal (cf. Lee
    * et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better": spans repeated verbatim anywhere in the corpus should be cut,
    * not just whole near-dup documents). A sliding `n`-token window (stride
    * 1) is duplicated when its exact text occurs anywhere else in the
    * corpus (another doc OR another position of the same doc); maximal runs
    * of consecutive duplicated windows are the removable passages.
    *
    * Plan shape at 100 TB: the window index is a narrow generate (≈one row
    * per token, no shuffle), window frequencies are ONE partial-aggregating
    * shuffle on the window text, the dup flag comes back via a sort-merge
    * join against the one-row-per-window frequency side (AQE-splittable
    * when a boilerplate window is hot — deliberately NOT a count-over
    * window, which would buffer the hottest window's whole group in one
    * task), and run detection is a doc-keyed window pass (bounded by doc
    * length). Runs fall out of the classic gaps-and-islands rewrite:
    * `pos − row_number()` is constant exactly on consecutive positions.
    *
    * Output: one row per document that contains at least one duplicated
    * window — total dup windows, number of maximal spans, and the longest
    * span's length in TOKENS (run + n − 1). Integer everywhere. */
  /** (doc_id, pos) of every sliding `n`-token window whose exact text
    * occurs more than once corpus-wide — the shared front half of
    * dupPassageSpans/cutDupPassages. One partial-agg shuffle on the window
    * text + an AQE-splittable join back (see dupPassageSpans scaladoc for
    * why not a count-over window). */
  private def dupWindowPositions(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"window size must be positive, got $n")
    val win = df
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("pos", "tok")))
      .where(col("pos") <= size(col("t")) - n)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        concat_ws(" ", col("tok") +:
          (1 until n).map(k => element_at(col("t"), col("pos") + k + 1)): _*).as("w"))
    val freq = win.groupBy("w").agg(count(lit(1)).as("freq"))
    win.join(freq, Seq("w")).where(col("freq") > 1L).select("doc_id", "pos")
  }

  def dupPassageSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    dupWindowPositions(df, idCol, textCol, n)
      .withColumn("island", col("pos") - row_number().over(byDoc))
      .groupBy("doc_id", "island").agg(count(lit(1)).as("run"))
      .groupBy("doc_id")
      .agg(sum("run").as("n_dup_windows"),
        count(lit(1)).as("n_spans"),
        (max("run") + (n - 1)).as("longest_span_tokens"))
  }

  /** The cut step that dupPassageSpans only reports: every token covered by
    * a duplicated `n`-window is removed, and each document comes back with
    * its before/after token counts and the md5 signature of the cleaned
    * token stream (shipping the rewritten text would just re-emit the
    * corpus; the signature pins the rewrite bit-exactly for the oracle).
    *
    * Plan: dup windows (one agg shuffle + join back) → covered positions
    * via a narrow `sequence` explode + distinct → LEFT ANTI join from the
    * token index (both sides shuffle on (doc_id, pos) — never a broadcast
    * of something corpus-sized) → per-doc reassembly with a doc-bounded
    * collect_list. Documents that lose everything (or are shorter than the
    * window) still appear, with n_kept_tokens = 0 / the full stream. */
  def cutDupPassages(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    val tk = toks.select(col("doc_id"), posexplode(col("t")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("tok"))
    val covered = dupWindowPositions(df, idCol, textCol, n)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val kept = tk.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ")).as("clean_sig"))
    toks.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept_tokens"), lit(0L)).as("n_kept_tokens"),
        // md5 of the empty string: the signature of a fully-cut document
        coalesce(col("clean_sig"), lit("d41d8cd98f00b204e9800998ecf8427e"))
          .as("clean_sig"))
  }

  /** Training-export shuffle: the last mile of a corpus build. Each epoch
    * gets its OWN deterministic global permutation (sort_key = md5-48 of
    * "ep<epoch>|<id>" — reshuffling between epochs is just a salt change,
    * no state carried), rows land in shard = sort_key mod `nShards`, and
    * seq is the within-shard position. Reproducible across runs, engines,
    * and partitioning, unlike rand(). Scale shape: the epoch table is the
    * broadcast side of the cross join (the corpus is never duplicated
    * through a shuffle), and the seq window partitions on (epoch, shard) —
    * shard count is CHOSEN (tens of thousands at 100 TB) so each window
    * partition is exactly one output-file-sized shard, bounded by
    * construction, and shards write in parallel. */
  /** The shuffle-key derivation shared by the manifest (trainShuffle) and
    * the written shards (writeTrainShards) — ONE definition, so the two
    * can never silently disagree on the permutation the trainer streams:
    * epoch cross join, md5-48 sort_key of "ep<e>|<id>", shard = sort_key
    * mod nShards. */
  private def withShuffleKey(df: DataFrame, idCol: String,
      nEpochs: Int, nShards: Int): DataFrame = {
    val epochs = df.sparkSession.range(0, nEpochs.toLong).toDF("epoch")
    df.crossJoin(broadcast(epochs))
      .withColumn("sort_key", Dedup.md5Int48(concat(
        lit("ep"), col("epoch").cast("string"), lit("|"),
        col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("sort_key"), lit(nShards)))
  }

  def trainShuffle(df: DataFrame, idCol: String,
      nEpochs: Int, nShards: Int): DataFrame = {
    require(nEpochs > 0 && nShards > 0,
      s"trainShuffle needs positive epochs/shards, got $nEpochs/$nShards")
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy("sort_key", "doc_id")
    withShuffleKey(df.select(col(idCol).as("doc_id")), "doc_id", nEpochs, nShards)
      .withColumn("seq", row_number().over(byShard).cast("long"))
      .select("epoch", "shard", "seq", "doc_id", "sort_key")
  }

  /** Materialize one epoch of the training-export shuffle as SORTED SHARD
    * FILES — the layout a trainer's data loader streams: exactly one
    * parquet file per shard directory (`epoch=<e>/shard=<s>/`), rows
    * inside each file in the epoch's permutation order. The plan is the
    * write-side of `trainShuffle`: repartition on (epoch, shard) puts each
    * shard wholly in one task (one file per shard by construction — never
    * a per-shard coalesce job), `sortWithinPartitions` orders the task's
    * rows before the writer sees them, and `partitionBy` splits the task's
    * output into its shard directories. Payload columns ride along, so the
    * written files are the training data itself, not an id manifest. */
  def writeTrainShards(df: DataFrame, idCol: String, path: String,
      nEpochs: Int, nShards: Int): Unit = {
    require(nEpochs > 0 && nShards > 0,
      s"writeTrainShards needs positive epochs/shards, got $nEpochs/$nShards")
    withShuffleKey(df, idCol, nEpochs, nShards)
      .repartition(col("epoch"), col("shard"))
      .sortWithinPartitions("epoch", "shard", "sort_key", idCol)
      .write.partitionBy("epoch", "shard").mode("overwrite").parquet(path)
  }

  val queries: Map[String, Q] = Map(
    // PII masking before training. The synthetic corpus carries no real
    // PII, so the text under test is assembled deterministically from
    // customer rows (name + a key-derived phone/email) — the operator under
    // test is the redaction itself: both patterns replaced everywhere,
    // count audited pre-redaction.
    "q_pii_scrub" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
      val raw = concat(
        col("c_name"), lit(" phone 25-989-741-"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
        lit(" email user"), col("c_custkey").cast("string"),
        lit("@example.com segment "), col("c_mktsegment"))
      c.select(col("c_custkey"),
        TextFunctions.piiRedact(raw).as("redacted"),
        TextFunctions.piiCount(raw).as("n_pii"))
        .orderBy("c_custkey")
    }),

    // Repetition stats per document — the dominant within-doc quality
    // signal (boilerplate/spam repeats itself): distinct-token and
    // distinct-bigram fractions, flagged by integer cross-multiplication
    // (dup_fraction > 0.2 ⇔ 5·dups > n) so no float threshold exists to
    // drift between engines. Two narrow explode→agg passes (tokens,
    // bigrams), each a single partial-aggregating shuffle on doc_id.
    "q_repetition_stats" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val tok = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("t")).as("n_distinct_tokens"))
      val big = Dedup.shingleIndexRaw(docs, "doc_id", "text", n = 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), countDistinct(col("s")).as("n_distinct_bigrams"))
      tok.join(big, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_distinct_bigrams"), lit(0L)).as("n_distinct_bigrams"),
          ((col("n_tokens") - col("n_distinct_tokens")) * 5 > col("n_tokens"))
            .as("flag_repetitive"))
        .orderBy("doc_id")
    }),

    // Cross-document duplicated-n-gram fraction — the corpus-level
    // complement of q_repetition_stats (which is within-doc): for each
    // document, how many of its distinct trigrams also appear in at least
    // one OTHER document (the Gopher/RefinedWeb "dup n-gram" filter
    // signal). Plan: distinct (doc, shingle) index → per-shingle doc count
    // (partial-aggregating shuffle) → join back on the shingle → per-doc
    // aggregation. NOT a count-over-partition window, although that would
    // be one exchange fewer: WindowExec buffers each partition group, so a
    // stop-shingle present in a billion documents becomes one unsplittable
    // buffered task, while the sort-merge join streams the index against a
    // one-row-per-shingle build side and AQE can split a skewed join
    // partition. Counts stay integers and the flag is an integer
    // cross-multiplication (dup fraction > 0.2 ⇔ 5·dups > n), so nothing
    // floats. Shingles shuffle as short strings for bit-exactness against
    // the oracle; at corpus scale the same plan runs on xxhash64 shingle
    // hashes to shrink the exchanges.
    "q_dup_ngram_fraction" -> ((s, d) => {
      val idx = Dedup.shingleIndex(Tables.load(s, d, "documents"), "doc_id", "text", n = 3)
      val freq = idx.groupBy("s").agg(count(lit(1)).as("df"))
      idx.join(freq, Seq("s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_ngrams"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_ngrams"))
        .select(col("doc_id"), col("n_ngrams"), col("n_dup_ngrams"),
          (col("n_dup_ngrams") * 5 > col("n_ngrams")).as("flag_dup"))
        .orderBy("doc_id")
    }),

    "q_chunk_windows" -> ((s, d) =>
      chunkWindows(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")),

    // Chunks → fixed-budget training sequences via the scale-safe global
    // prefix sum (see packSequences: two-pass partition offsets, never a
    // partitionless window).
    "q_pack_sequences" -> ((s, d) =>
      packSequences(chunkWindows(Tables.load(s, d, "documents"), "doc_id", "text"),
        Seq("doc_id", "chunk_idx"), "n_tokens", budget = 256L)
        .select("doc_id", "chunk_idx", "n_tokens", "pack_id", "pack_offset")
        .orderBy("doc_id", "chunk_idx")),

    // Corpus mixing to a token budget — the "data mixture" step: given
    // target language shares of an output budget (half the corpus tokens
    // here; en 40% / zh 30% / de 30%, unlisted languages dropped), compute
    // per-language deterministic sampling rates and emit the mix. All
    // integer: rate_pct = min(100, (total·w) div (2·lang_tokens)), and
    // membership is the same md5-48 hash-mod discipline as
    // q_stratified_sample — reproducible across engines, runs, and
    // repartitioning, and adding a language never reshuffles another's
    // picks. Plan: one token-count scan, a 5-row per-language aggregate
    // joined back as a broadcast, one narrow filter — two exchanges total,
    // corpus text never shuffles.
    "q_corpus_mix" -> ((s, d) => {
      val w = s.createDataFrame(Seq(("en", 40L), ("zh", 30L), ("de", 30L)))
        .toDF("lang", "w_pct")
      val dd = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      // pinned O(languages) rows: total derives from the SAME aggregate —
      // a separate dd.agg subtree would tokenize the whole corpus a third
      // time (membership join below is the second scan)
      val langTok = dd.groupBy("lang").agg(sum("n_tokens").as("lang_tokens"))
        .localCheckpoint(true)
      val total = langTok.agg(sum("lang_tokens").as("total_tokens"))
      val rates = langTok.join(w, Seq("lang"))
        .crossJoin(total)
        .withColumn("rate_pct",
          least(lit(100L), expr("(total_tokens * w_pct) div (2 * lang_tokens)")))
      dd.join(broadcast(rates.select("lang", "rate_pct")), Seq("lang"))
        .where(pmod(Dedup.md5Int48(concat(lit("mix|"), col("doc_id").cast("string"))),
          lit(100)) < col("rate_pct"))
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    }),

    // Language-rebalanced stratified sample: high-resource languages are
    // downsampled harder (en 20%, rest 50%) — corpus mixing in one pass.
    // Membership comes from the 48-bit md5 of "<lang>|<doc_id>", so the
    // sample is reproducible across runs, engines, and repartitioning
    // (rand() is none of those), and adding a language never reshuffles
    // another language's picks.
    // Exact-substring dup passages (see dupPassageSpans): which documents
    // carry verbatim-repeated 8-token spans, how many, and how long the
    // worst one is — the per-doc work list for passage-level cutting.
    "q_dup_passages" -> ((s, d) =>
      dupPassageSpans(Tables.load(s, d, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id")),

    // The rewrite the span report feeds: cut every token under a
    // duplicated 8-window, keep before/after counts + a signature of the
    // cleaned stream (see cutDupPassages).
    "q_passage_cut" -> ((s, d) =>
      cutDupPassages(Tables.load(s, d, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id")),

    // Per-source document cap — the RefinedWeb-style per-domain cap: a
    // handful of giant sources must not dominate the mix, so keep only the
    // top-5 docs per source by (n_chars desc, doc_id asc). Same bounded
    // TopKStructs shape as q_topk_groups: k-row buffers partial-aggregate
    // map-side, so a source with a billion documents shuffles 5 rows, not
    // a billion — the rank-window spelling would funnel that source
    // through one unsplittable window partition.
    "q_source_cap" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .groupBy(col("source"))
        .agg(graft.functions.TopKStructs.topK(
          struct((-col("n_chars")).as("negc"), col("doc_id").as("id")), 5).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("source"), col("r.id").as("doc_id"),
          (-col("r.negc")).as("n_chars"),
          (col("pos") + 1).cast("long").as("rnk"))
        .orderBy("source", "rnk")),

    "q_stratified_sample" -> ((s, d) => {
      val h = pmod(Dedup.md5Int48(
        concat(col("lang"), lit("|"), col("doc_id").cast("string"))), lit(100))
      Tables.load(s, d, "documents")
        .where(h < when(col("lang") === "en", 20).otherwise(50))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    "q_train_shuffle" -> ((s, d) =>
      trainShuffle(Tables.load(s, d, "documents"), "doc_id",
        nEpochs = 2, nShards = 16).orderBy("epoch", "shard", "seq")),

    // Dataset-card rollup — the one-row summary a corpus release ships:
    // volume (docs/tokens/chars), diversity (languages/sources), and
    // health (exact-duplicate docs, quality-flagged docs) in exact
    // integers, with milli-precision means via integer division. Plan:
    // two corpus passes — the global rollup (map-side partial sums, no
    // data-sized shuffle) and the duplicate detection (one content-hash
    // partial-aggregating exchange); the dup side genuinely needs the
    // hash shuffle, so fusing to one pass would force the rollup through
    // that exchange too — two independent scans are the cheaper plan.
    "q_corpus_report" -> ((s, d) => {
      val dd = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          TextFunctions.qualityScore(col("text")).as("q"),
          md5(col("text")).as("h"))
      val dupDocs = dd.groupBy("h").agg(count(lit(1)).as("copies"))
        .where(col("copies") > 1L)
        .agg(coalesce(sum("copies"), lit(0L)).as("n_dup_docs"))
      dd.agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(when(col("q") < 60L, 1L).otherwise(0L)).as("n_low_quality"),
        sum("q").as("q_sum"))
        .crossJoin(dupDocs)
        .select(col("n_docs"), col("n_tokens"), col("n_chars"),
          col("n_langs"), col("n_sources"),
          expr("(n_tokens * 1000) div nullif(n_docs, 0)").as("avg_millitokens"),
          expr("(q_sum * 1000) div nullif(n_docs, 0)").as("avg_milliquality"),
          col("n_low_quality"), col("n_dup_docs"))
    }),

    // Packing-efficiency report — the number the sequence-packing step is
    // justified by: padding each document independently to length-32
    // sequences vs packing the concatenated stream (q_pack_sequences).
    // Per-doc sequence counts are pure narrow arithmetic on the token
    // count (no explode, no per-chunk rows), then ONE global aggregate:
    // a single scan and a single exchange of partial sums regardless of
    // corpus size. All quantities are non-negative integers, so the
    // utilization percentage's integer division is engine-exact.
    "q_pack_efficiency" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .select(size(TextFunctions.tokens(col("text"))).cast("long").as("n"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("total_tokens"),
          sum(expr("(n + 31) div 32")).as("n_seq_padded"))
        .select(col("n_docs"), col("total_tokens"), col("n_seq_padded"),
          (col("n_seq_padded") * 32 - col("total_tokens")).as("padded_tokens"),
          expr("(total_tokens * 100) div (n_seq_padded * 32)").as("util_pct"),
          expr("(total_tokens + 31) div 32").as("n_seq_packed"))),

    // DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): score every raw
    // document by how much more likely its hashed n-gram features are
    // under the TARGET distribution (here the src1/src2 sources standing
    // in for a high-quality domain) than under the raw corpus, then keep
    // the documents the target "prefers". Features are unigrams + bigrams
    // hashed to 4096 buckets (the paper's bag-of-hashed-ngrams), bucket
    // probabilities are add-one smoothed, and the log-likelihood ratio is
    // summed in MILLI-BITS via TextFunctions.milliLog2 — integer-exact on
    // every engine, where a float-ln spelling would drift in the last ulp
    // across libms and flip rankings. Plan shape at 100 TB: the feature
    // stream is a narrow explode (never collected); bucket counts partial-
    // aggregate map-side down to <=4096 rows; the weight table broadcasts
    // (4096 rows regardless of corpus size); the per-doc score is one
    // partial-aggregating shuffle on doc_id. The stream is computed twice
    // (count pass + score pass) — both scan-bound, and caching a
    // corpus-sized exploded stream would cost more than the rescan.
    "q_dsir_weights" -> ((s, d) => {
      val B = 4096
      val dd = Tables.load(s, d, "documents")
      val uni = dd.select(col("doc_id"), col("source"),
        explode(TextFunctions.tokens(col("text"))).as("f"))
      val big = Dedup.shingleIndexRaw(dd, "doc_id", "text", n = 2, carry = Seq("source"))
        .select(col("doc_id"), col("source"), col("s").as("f"))
      val feat = uni.unionByName(big)
        .select(col("doc_id"), col("source"),
          pmod(Dedup.md5Int48(concat(lit("dsir|"), col("f"))), lit(B)).as("b"))
      val isTgt = col("source").isin("src1", "src2")
      val rawc = feat.groupBy("b").agg(count(lit(1)).as("nr"),
        sum(when(isTgt, 1L).otherwise(0L)).as("nt"))
      val tots = feat.agg((count(lit(1)) + B).as("trf"),
        (sum(when(isTgt, 1L).otherwise(0L)) + B).as("ttf"))
      import TextFunctions.milliLog2
      val w = rawc.crossJoin(broadcast(tots))
        .select(col("b"),
          (milliLog2(col("nt") + 1) - milliLog2(col("ttf"))
            - milliLog2(col("nr") + 1) + milliLog2(col("trf"))).as("w_milli"))
      feat.join(broadcast(w), Seq("b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("w_milli")).as("weight_millibits"))
        .select(col("doc_id"), col("n_feats"), col("weight_millibits"),
          (col("weight_millibits") > 0).as("selected"))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_pii_scrub" ->
      s"""WITH raw AS (
         |  SELECT c_custkey,
         |    c_name || ' phone 25-989-741-' || lpad((c_custkey % 10000)::VARCHAR, 4, '0')
         |      || ' email user' || c_custkey::VARCHAR || '@example.com segment ' || c_mktsegment AS t
         |  FROM customer)
         |SELECT c_custkey,
         |  regexp_replace(regexp_replace(t, '${TextFunctions.PhoneRe}', '<PHONE>', 'g'),
         |    '${TextFunctions.EmailRe}', '<EMAIL>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(t, '${TextFunctions.PhoneRe}'))
         |    + len(regexp_extract_all(t, '${TextFunctions.EmailRe}')) AS BIGINT) AS n_pii
         |FROM raw ORDER BY c_custkey""".stripMargin,

    "q_repetition_stats" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents),
        |tok AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT t) AS n_distinct_tokens
        |  FROM tk GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, unnest([x.toks[i] || ' ' || x.toks[i+1] for i in range(1, len(x.toks))]) AS s
        |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents) x),
        |big AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT s) AS n_distinct_bigrams
        |  FROM bg GROUP BY doc_id)
        |SELECT tok.doc_id, n_tokens, n_distinct_tokens,
        |  COALESCE(n_bigrams, 0) AS n_bigrams,
        |  COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
        |  ((n_tokens - n_distinct_tokens) * 5 > n_tokens) AS flag_repetitive
        |FROM tok LEFT JOIN big ON tok.doc_id = big.doc_id
        |ORDER BY tok.doc_id""".stripMargin,

    "q_dup_ngram_fraction" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([x.toks[i] || ' ' || x.toks[i+1] || ' ' || x.toks[i+2]
        |            for i in range(1, len(x.toks) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents) x),
        |df AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY s) AS df FROM sh)
        |SELECT doc_id, COUNT(*) AS n_ngrams,
        |  CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_ngrams,
        |  (SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 5 > COUNT(*)) AS flag_dup
        |FROM df GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_chunk_windows" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks,
        |  CASE WHEN len(toks) <= 32 THEN 1
        |       ELSE 1 + (len(toks) - 32 + 23) // 24 END AS n_chunks FROM t),
        |c AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM n)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ')) AS chunk_sig
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |n AS (SELECT doc_id, toks,
        |  CASE WHEN len(toks) <= 32 THEN 1
        |       ELSE 1 + (len(toks) - 32 + 23) // 24 END AS n_chunks FROM t),
        |c AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM n),
        |ch AS (SELECT doc_id, chunk_idx,
        |  CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS BIGINT) AS n_tokens FROM c),
        |p AS (SELECT doc_id, chunk_idx, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS cum_excl
        |  FROM ch)
        |SELECT doc_id, chunk_idx, n_tokens,
        |  CAST(cum_excl // 256 AS BIGINT) AS pack_id,
        |  CAST(cum_excl % 256 AS BIGINT) AS pack_offset
        |FROM p ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_corpus_mix" ->
      """WITH w(lang, w_pct) AS (VALUES ('en', 40), ('zh', 30), ('de', 30)),
        |d AS (SELECT doc_id, lang,
        |        CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |lt AS (SELECT lang, SUM(n_tokens) AS lang_tokens FROM d GROUP BY lang),
        |tot AS (SELECT SUM(n_tokens) AS total_tokens FROM d),
        |r AS (SELECT lt.lang,
        |        least(100, (CAST(tot.total_tokens AS BIGINT) * w.w_pct)
        |                   // (2 * CAST(lt.lang_tokens AS BIGINT))) AS rate_pct
        |      FROM lt JOIN w ON lt.lang = w.lang, tot)
        |SELECT doc_id, d.lang, n_tokens
        |FROM d JOIN r ON d.lang = r.lang
        |WHERE ('0x' || substring(md5('mix|' || doc_id::VARCHAR), 1, 12))::BIGINT % 100
        |      < rate_pct
        |ORDER BY doc_id""".stripMargin,

    "q_dup_passages" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS pos FROM t),
        |wk AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |         array_to_string(toks[pos + 1 : pos + 8], ' ') AS w FROM w),
        |f AS (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY w) AS freq FROM wk),
        |d AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |      FROM f WHERE freq > 1),
        |i AS (SELECT doc_id, island, COUNT(*) AS run FROM d GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_dup_windows,
        |  COUNT(*) AS n_spans,
        |  CAST(MAX(run) + 7 AS BIGINT) AS longest_span_tokens
        |FROM i GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_passage_cut" ->
      """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS pos FROM t),
        |wk AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |         array_to_string(toks[pos + 1 : pos + 8], ' ') AS w FROM w),
        |f AS (SELECT doc_id, pos FROM
        |        (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY w) AS freq FROM wk)
        |      WHERE freq > 1),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS p FROM f),
        |tk AS (SELECT doc_id, CAST(p AS BIGINT) AS p, toks[p + 1] AS tok FROM
        |        (SELECT doc_id, toks, unnest(range(0, len(toks))) AS p FROM t)),
        |kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
        |         LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.p = cov.p
        |         WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
        |          string_agg(tok, ' ' ORDER BY p) AS s FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept_tokens,
        |  md5(COALESCE(agg.s, '')) AS clean_sig
        |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_source_cap" ->
      """SELECT source, doc_id, n_chars, rnk FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rnk
        |  FROM documents) sub
        |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substring(md5(lang || '|' || doc_id::VARCHAR), 1, 12))::BIGINT % 100
        |      < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_report" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST((CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 40 ELSE 10 END)
        |       + (CASE WHEN len(string_split(trim(text), ' ')) >= 20 THEN 30 ELSE 10 END)
        |       + (CASE WHEN len([t for t in string_split(trim(text), ' ')
        |            if t IN ('the','a','of','and','to','in','is')]) > 0 THEN 30 ELSE 0 END)
        |      AS BIGINT) AS q,
        |    md5(text) AS h
        |  FROM documents),
        |dup AS (
        |  SELECT CAST(COALESCE(SUM(copies), 0) AS BIGINT) AS n_dup_docs FROM (
        |    SELECT COUNT(*) AS copies FROM d GROUP BY h HAVING COUNT(*) > 1)),
        |agg AS (
        |  SELECT COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens,
        |    SUM(n_chars) AS n_chars,
        |    COUNT(DISTINCT lang) AS n_langs, COUNT(DISTINCT source) AS n_sources,
        |    CAST(SUM(CASE WHEN q < 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
        |    SUM(q) AS q_sum
        |  FROM d)
        |SELECT n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_chars AS BIGINT) AS n_chars, n_langs, n_sources,
        |  CAST((n_tokens * 1000) // nullif(n_docs, 0) AS BIGINT) AS avg_millitokens,
        |  CAST((q_sum * 1000) // nullif(n_docs, 0) AS BIGINT) AS avg_milliquality,
        |  n_low_quality, n_dup_docs
        |FROM agg, dup""".stripMargin,

    "q_train_shuffle" ->
      """WITH e(epoch) AS (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))),
        |k AS (
        |  SELECT epoch, doc_id,
        |    ('0x' || substring(md5('ep' || epoch::VARCHAR || '|' || doc_id::VARCHAR), 1, 12))::BIGINT
        |      AS sort_key
        |  FROM documents, e)
        |SELECT epoch, sort_key % 16 AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, sort_key % 16
        |    ORDER BY sort_key, doc_id) AS BIGINT) AS seq,
        |  doc_id, sort_key
        |FROM k ORDER BY epoch, shard, seq""".stripMargin,

    "q_pack_efficiency" ->
      """WITH d AS (
        |  SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n FROM documents),
        |a AS (
        |  SELECT COUNT(*) AS n_docs, SUM(n) AS total_tokens,
        |    SUM((n + 31) // 32) AS n_seq_padded
        |  FROM d)
        |SELECT n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
        |  CAST(n_seq_padded AS BIGINT) AS n_seq_padded,
        |  CAST(n_seq_padded * 32 - total_tokens AS BIGINT) AS padded_tokens,
        |  CAST((total_tokens * 100) // (n_seq_padded * 32) AS BIGINT) AS util_pct,
        |  CAST((total_tokens + 31) // 32 AS BIGINT) AS n_seq_packed
        |FROM a""".stripMargin,

    "q_dsir_weights" -> {
      // piecewise-linear log2 in milli-bits — the SQL twin of
      // TextFunctions.milliLog2 (integer-exact, see its scaladoc)
      def l2(x: String): String = {
        val bl = s"length(format('{:b}', $x))"
        s"((($bl) - 1) * 1000 + ((($x) - (1::BIGINT << (($bl) - 1))) * 1000)" +
          s" // (1::BIGINT << (($bl) - 1)))"
      }
      s"""WITH tk AS (
         |  SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS f
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, source,
         |    unnest([x.toks[i] || ' ' || x.toks[i+1] for i in range(1, len(x.toks))]) AS f
         |  FROM (SELECT doc_id, source, string_split(trim(text), ' ') AS toks
         |        FROM documents) x),
         |feat AS (
         |  SELECT doc_id, source,
         |    ('0x' || substring(md5('dsir|' || f), 1, 12))::BIGINT % 4096 AS b
         |  FROM (SELECT * FROM tk UNION ALL SELECT * FROM bg)),
         |rawc AS (
         |  SELECT b, COUNT(*) AS nr,
         |    CAST(SUM(CASE WHEN source IN ('src1','src2') THEN 1 ELSE 0 END) AS BIGINT) AS nt
         |  FROM feat GROUP BY 1),
         |tots AS (
         |  SELECT COUNT(*) + 4096 AS trf,
         |    CAST(SUM(CASE WHEN source IN ('src1','src2') THEN 1 ELSE 0 END) + 4096 AS BIGINT) AS ttf
         |  FROM feat),
         |w AS (
         |  SELECT b, ${l2("nt + 1")} - ${l2("ttf")} - ${l2("nr + 1")} + ${l2("trf")} AS w_milli
         |  FROM rawc, tots)
         |SELECT doc_id, COUNT(*) AS n_feats,
         |  CAST(SUM(w_milli) AS BIGINT) AS weight_millibits,
         |  CAST(SUM(w_milli) AS BIGINT) > 0 AS selected
         |FROM feat JOIN w USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
  )
}
