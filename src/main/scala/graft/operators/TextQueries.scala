package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** Text-analysis + dedup operators over the `documents` table. */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Linear quality classifier over hashed unigram features (fastText
    * shape): token → md5-48 mod `buckets`, bucket weights summed per doc,
    * logit thresholded at 0. `weights` defaults to the deterministic
    * stand-in table (integer centi-logits in [−100,100] from md5 of the
    * bucket id) so results are engine-reproducible; a trained checkpoint
    * drops in as any (bucket, w) table of the same shape. The model is a
    * broadcast dim — inference is one narrow probe + one per-doc
    * partial-agg exchange; the corpus never shuffles against the model. */
  def qualityClassifier(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 1024, weights: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    val wtab = weights.getOrElse(
      spark.range(0, buckets).toDF("bucket")
        .withColumn("w", pmod(Dedup.md5Int48(
          concat(lit("w|"), col("bucket").cast("string"))), lit(201)) - 100))
    df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", pmod(Dedup.md5Int48(col("tok")), lit(buckets)))
      .join(broadcast(wtab), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("logit_centi"))
      .select(col("doc_id"), col("n_tokens"), col("logit_centi"),
        (expr("((logit_centi + 100 * n_tokens) * 10) div n_tokens") - 1000)
          .as("avg_millilogit"),
        (col("logit_centi") > 0).as("flag_keep"))
  }

  /** BPE encode over a corpus with a ranked merge table: collect the
    * (bounded) merge list, ship it as a real `Broadcast` — one copy per
    * executor — and run the codegen'd [[graft.functions.BpeEncode]]
    * expression map-only over the corpus. The corpus never shuffles; the
    * only driver materialization is the vocab itself, bounded by LIMIT
    * before collect so a mis-wired corpus-sized "merge table" fails loudly
    * instead of OOMing the driver. */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame = {
    val cap = 1 << 20
    // (left, right) tiebreak: a duplicate rank must not make the applied
    // vocab depend on shuffle order
    val rows = mergesDf.orderBy("rank", "left", "right").select("left", "right")
      .limit(cap + 1).collect()
    require(rows.length <= cap,
      s"merge table exceeds $cap rows — not a vocab; refusing to broadcast")
    val arr = rows.map(r => (r.getString(0), r.getString(1)))
    val table = graft.functions.BpeTable.broadcast(
      df.sparkSession.sparkContext.broadcast(arr))
    val bpe = graft.functions.BpeEncode.encode(col(textCol), table)
    df.select(col(idCol).as("doc_id"), bpe.as("bpe_text"))
      .withColumn("n_bpe_tokens",
        when(col("bpe_text") === "", lit(0L))
          .otherwise(size(split(col("bpe_text"), " ")).cast("long")))
      .select(col("doc_id"), col("n_bpe_tokens"), col("bpe_text"))
  }

  /** BPE merge TRAINING: the iterative loop a real tokenizer trainer runs
    * (Sennrich et al. 2016 §2.2) — each round re-tokenizes the corpus
    * with the merges learned so far (the codegen'd [[graft.functions
    * .BpeEncode]] expression), counts adjacent token pairs per word, and
    * adopts the most frequent pair (count desc, pair asc tiebreak) as the
    * next merge. Scale shape per round: one explode + one partial-agg
    * exchange; the ONLY driver materialization is the single argmax row,
    * so rounds scale like `q_bpe_pairs` regardless of corpus size. The
    * driver-side loop over rounds is the algorithm, not a shortcut —
    * merge r+1's counts are defined over the corpus as tokenized by
    * merges 1..r. */
  def learnBpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    require(rounds >= 1 && rounds <= 1000, s"rounds must be 1..1000, got $rounds")
    // persisted: every round re-ENCODES the words (inherent to the
    // algorithm), but the word extraction itself is identical across
    // rounds — without the cache that is `rounds` redundant source scans
    val words = df.select(explode(split(trim(col(textCol)), " ")).as("word"))
      .where(col("word") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var merges = Vector.empty[(String, String, Long)]
    try {
      var exhausted = false
      var round = 0
      while (round < rounds && !exhausted) {
        val toks = split(graft.functions.BpeEncode.encode(
          col("word"), merges.map(m => (m._1, m._2))), " ")
        val top = words
          .select(explode(arrays_zip(
            slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
            slice(toks, lit(2), greatest(size(toks) - 1, lit(0))))).as("p"))
          .groupBy(col("p.0").as("left"), col("p.1").as("right"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("left"), col("right"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else merges :+= ((top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
        round += 1
      }
    } finally words.unpersist()
    spark.createDataFrame(merges.zipWithIndex.map { case ((l, r, c), i) =>
      (i + 1L, l, r, c) }).toDF("rank", "left", "right", "cnt")
  }

  /** Token-id mapping over BPE output: encode, then map each subword
    * token to its vocab id (OOV → −1) through the codegen'd
    * [[graft.functions.VocabIds]] expression — the vocab ships as a real
    * `Broadcast` consumed via a JVM-wide hash map (O(1) per lookup, one
    * copy per executor), map-only, no join; the LIMIT-guarded collect
    * refuses corpus-sized "vocabs" the same way bpeEncode's merge collect
    * does. The collect is sorted and duplicate tokens are refused loudly:
    * an unordered last-wins `toMap` would make the applied id depend on
    * shuffle order. */
  def bpeTokenIds(df: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame, vocabDf: DataFrame): DataFrame = {
    val cap = 1 << 20
    val vrows = vocabDf.select("token", "id").orderBy("token", "id")
      .limit(cap + 1).collect()
    require(vrows.length <= cap,
      s"vocab exceeds $cap rows — refusing to broadcast")
    var vi = 0
    while (vi < vrows.length) {
      require(vi == 0 || vrows(vi).getString(0) != vrows(vi - 1).getString(0),
        s"vocab token '${vrows(vi).getString(0)}' appears more than once — " +
          "which id applies would depend on row order; deduplicate the vocab")
      require(vrows(vi).getLong(1) >= 0L,
        s"vocab id ${vrows(vi).getLong(1)} < 0 collides with the OOV sentinel (−1)")
      vi += 1
    }
    val arr = vrows.map(r => (r.getString(0), r.getLong(1)))
    val table = graft.functions.VocabTable.broadcast(
      df.sparkSession.sparkContext.broadcast(arr))
    val enc = bpeEncode(df, idCol, textCol, mergesDf)
    enc.select(col("doc_id"), col("n_bpe_tokens"),
      graft.functions.VocabIds.ids(col("bpe_text"), table).as("ids_csv"))
      .withColumn("n_oov",
        when(col("ids_csv") === "", lit(0L))
          .otherwise(size(filter(split(col("ids_csv"), ","),
            t => t === "-1")).cast("long")))
  }

  /** The q_bpe_encode fixture vocab: ten merges over common English
    * letter pairs, ordered so every compound side is created before it is
    * used (th→the, an→and, in→ing) — i.e. a well-formed BPE table, which
    * is what makes the greedy loop ≡ the oracle's ascending replace chain
    * (see BpeEncode scaladoc). */
  val BpeFixtureMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("e", "s"), ("o", "r"))

  /** The q_bpe_ids fixture vocab: the ten merged tokens plus single
    * letters and digits, ids by position. Anything else (punctuation,
    * uppercase) is OOV → −1, exercised by the gate corpus. */
  val BpeFixtureVocab: Seq[String] =
    BpeFixtureMerges.map { case (l, r) => l + r } ++
      ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)

  val queries: Map[String, Q] = Map(
    "q_token_count" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        regexTokenCount(col("text")).as("n_lex_tokens"))
        .orderBy("doc_id")),

    "q_text_quality" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("text_len"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        stopwordCount(col("text")).as("n_stopwords"),
        qualityScore(col("text")).as("score"))
        .orderBy("doc_id")),

    "q_lang_id" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("lang"), predictLang(col("text")).as("predicted_lang"))
        .orderBy("doc_id")),

    "q_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(docs(s, d), "doc_id", "text").orderBy("text_hash")),

    "q_dedup_normalized" -> ((s, d) =>
      Dedup.normalizedExactGroups(docs(s, d), "doc_id", "text").orderBy("text_hash")),

    "q_ngram_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(docs(s, d), "doc_id", "text", threshold = 0.5, dfCap = 50)
        .orderBy("doc_a", "doc_b")),

    "q_minhash_lsh" -> ((s, d) =>
      Dedup.minhashCandidates(docs(s, d), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // Corpus overlap from KMV sketch set algebra: two overlapping document
    // subsets (doc_id%2 / doc_id%3 — every %6 doc is in both) reduced to
    // 256-value sketches, union/intersection/Jaccard estimated purely on
    // the sketches. Deterministic md5 hashing makes the ESTIMATES
    // themselves oracle-checkable, not just the exact counts.
    "q_kmv_overlap" -> ((s, d) => {
      val ds = docs(s, d)
      Dedup.kmvOverlap(ds.where(col("doc_id") % 2 === 0),
        ds.where(col("doc_id") % 3 === 0), "doc_id", "text", k = 256)
    }),

    "q_simhash" -> ((s, d) =>
      Dedup.simhash(docs(s, d), "doc_id", "text").orderBy("doc_id")),

    // SimHash pairing: the pigeonhole block join (see Dedup.simhashNearDup)
    // — EXACT Hamming-≤3 pairs without the O(n²) all-pairs scan the oracle
    // brute-forces.
    "q_simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDup(docs(s, d), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // TF-IDF term ranking with an INTEGER idf — floor(log2(N/df))+1 via
    // binary-string length — so scores are exact integers and reproducible
    // on any engine (float log() differs in the last ulp across libms).
    // One shuffle for tf, one (tiny) for df, broadcast N; top-3 terms per
    // doc by windowed rank.
    "q_tfidf_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dd = docs(s, d)
      val toks = dd.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = dd.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * length(bin(floor(col("n_docs") / col("df")).cast("long"))).cast("long"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3 && col("doc_id") < 50)
        .select("doc_id", "tok", "tf", "df", "score", "rnk")
        .orderBy("doc_id", "rnk")
    }),

    // CCNet-style LM quality signal approximated by a corpus unigram model,
    // integer-exact on any engine: per-token surprisal = bit-length of
    // (total_tokens div token_count) ≈ -log2 p(token)+1, summed and
    // averaged (in millibits, integer division) per document. High average
    // surprisal = improbable-token text (noise, mojibake); low = generic
    // boilerplate. Plan: one token-count aggregation (vocab-bounded), a
    // broadcast scalar total, one join back, one per-doc aggregation — the
    // same two-exchange shape as the tf-idf ranking, AQE-splittable on hot
    // tokens.
    "q_lm_surprisal" -> ((s, d) => {
      val dd = docs(s, d)
      val tk = dd.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val cnt = tk.groupBy("tok").agg(count(lit(1)).as("c"))
      val tot = tk.agg(count(lit(1)).as("t"))
      tk.join(cnt, Seq("tok"))
        .crossJoin(broadcast(tot))
        .withColumn("bits", length(bin(expr("t div c"))).cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("surprisal_bits"))
        .select(col("doc_id"), col("n_tokens"), col("surprisal_bits"),
          expr("(surprisal_bits * 1000) div n_tokens").as("avg_millibits"))
        .orderBy("doc_id")
    }),

    // LSH candidate pairs → dedup GROUPS: min-reachable-id connected
    // components (the canonical-representative step after near-dup search).
    "q_dedup_components" -> ((s, d) =>
      Dedup.connectedComponents(
        Dedup.minhashCandidates(docs(s, d), "doc_id", "text"), "doc_a", "doc_b")
        .orderBy("id")),

    // Survivor selection: near-dup groups keep their highest-quality member
    // (score, then min id) — curation prefers the best copy, not the
    // smallest id. The argmax is a MIN over a (−score, id) struct (struct
    // comparison is lexicographic), not a rank-1 window: min is a partial
    // aggregate, so a viral duplicate cluster spanning millions of copies
    // combines map-side instead of buffering one window partition.
    "q_dedup_survivors" -> ((s, d) => {
      val dd = docs(s, d)
      val comps = Dedup.connectedComponents(
        Dedup.minhashCandidates(dd, "doc_id", "text"), "doc_a", "doc_b")
      val scored = comps.join(
        dd.select(col("doc_id").as("id"), qualityScore(col("text")).as("score")), Seq("id"))
      scored.groupBy("comp")
        .agg(min(struct((-col("score")).as("neg"), col("id").as("id"))).as("m"))
        .select(col("comp"), col("m.id").as("survivor_id"), (-col("m.neg")).as("score"))
        .orderBy("comp")
    }),

    // Benchmark decontamination: docs 0-9 play the eval set; any other doc
    // sharing a 5-gram with them is flagged for exclusion.
    "q_decontaminate" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.contaminatedIds(
        dd.where(col("doc_id") >= 10), dd.where(col("doc_id") < 10),
        "doc_id", "text", n = 5)
        .orderBy("doc_id")
    }),

    // The contamination REPORT (decontamination's diff-stats): per flagged
    // doc, distinct-n-gram overlap counts + integer severity flag.
    "q_contamination_score" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.contaminationScores(
        dd.where(col("doc_id") >= 10), dd.where(col("doc_id") < 10),
        "doc_id", "text", n = 5)
        .orderBy("doc_id")
    }),

    // Bloom-prefiltered decontamination — result ≡ the exact operator (the
    // sketch only prunes, the semi-join confirms), so it hash-checks
    // against a plain exact oracle. Different split/n than q_decontaminate
    // so the two gates don't collapse into one query.
    "q_bloom_decontaminate" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.contaminatedIdsBloom(
        dd.where(col("doc_id") >= 25), dd.where(col("doc_id") < 25),
        "doc_id", "text", n = 4)
        .orderBy("doc_id")
    }),

    // BM25 term ranking (k1=1.2, b=0.75) in EXACT integer arithmetic: with
    // integer idf (bit-length of N div df, as q_tfidf_rank), T = total
    // corpus tokens and N = docs, the BM25 fraction
    //   idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))      with avgdl = T/N
    // multiplies out to   idf·22·tf·T / (10·tf·T + 3·T + 9·dl·N).
    // Multiplying that out directly puts tf·T in the numerator — int64 dies
    // at tf·T ≈ 2·10^13 (a 10^10-token corpus with tf in the hundreds), NOT
    // "10^13 corpus tokens". So the common T is divided out FIRST as a
    // per-doc length-penalty milli-term  bb = (9000·dl·N) div T  (one extra
    // exactly-defined integer rounding of ≤1 part in thousands), leaving
    //   score_milli = (idf·22·tf·1000000) div (10000·tf + 3000 + bb)
    // — every factor integer, bit-identical on any engine, and the binding
    // bound is now dl·N < 10^15 (a ~10^12-doc corpus at typical dl≈10^3),
    // with the numerator safe to tf ≈ 10^10. Same two-exchange shape as
    // q_tfidf_rank: tf shuffle, tiny df shuffle, broadcast scalars, one
    // window for top-3 per doc.
    "q_bm25_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dd = docs(s, d)
      val tk = dd.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val tf = tk.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dl = tk.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val tot = tk.agg(count(lit(1)).as("t_tokens"))
        .crossJoin(dd.agg(count(lit(1)).as("n_docs")))
      val scored = tf.join(dl, Seq("doc_id")).join(dfreq, Seq("tok"))
        .crossJoin(broadcast(tot))
        // stays in int64 end to end: `div`, not `/` (which would detour
        // through a double and lose exactness past 2^53)
        .withColumn("idf", length(bin(expr("n_docs div df"))).cast("long"))
        .withColumn("bb_milli", expr("(dl * n_docs * 9000) div t_tokens"))
        .withColumn("score_milli",
          expr("(idf * 22 * tf * 1000000) div (tf * 10000 + 3000 + bb_milli)"))
      val w = Window.partitionBy("doc_id").orderBy(col("score_milli").desc, col("tok").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3 && col("doc_id") < 50)
        .select("doc_id", "tok", "tf", "dl", "df", "score_milli", "rnk")
        .orderBy("doc_id", "rnk")
    }),

    // The FULL pretraining-data pipeline as one plan: exact dedup →
    // quality + language filter → benchmark decontamination → context-
    // window chunking → SEQUENCE PACKING. What a corpus build actually
    // ships to the trainer, end to end: each stage is the operator gated
    // above, composed. The narrow work (filters, shingling, chunking) fuses
    // into its enclosing codegen stages; the corpus IS read once per
    // logical use (dedup groups, curated base, contamination index). The
    // pack stage is two-pass by design (partition totals, then the prefix
    // scan); packSequences pins its range-partitioned input with an eager
    // localCheckpoint internally — both for the 2.3× measured here when
    // the totals probe re-derived the whole chain, and for correctness
    // (one partitioning for both passes; see packSequences scaladoc) —
    // the gate-scale stand-in for the write-to-parquet a production build
    // does between curation and packing anyway.
    "q_pipeline_e2e" -> ((s, d) => {
      val dd = docs(s, d)
      val corpus = dd.where(col("doc_id") >= 10)
      val bench = dd.where(col("doc_id") < 10)
      val canon = Dedup.exactGroups(corpus, "doc_id", "text")
        .select(col("canonical_id").as("cid"))
      val curated = corpus.join(canon, col("doc_id") === col("cid"), "left_semi")
        .where(qualityScore(col("text")) >= 70 && predictLang(col("text")) === col("lang"))
      val clean = Dedup.decontaminate(curated, bench, "doc_id", "text", n = 5)
      val chunks = CurationQueries.chunkWindows(clean, "doc_id", "text")
      CurationQueries.packSequences(chunks, Seq("doc_id", "chunk_idx"), "n_tokens", 256L)
        .select("doc_id", "chunk_idx", "n_tokens", "chunk_sig", "pack_id", "pack_offset")
        .orderBy("doc_id", "chunk_idx")
    }),

    // The curation composite: one pipeline keeping canonical (non-dup),
    // quality-passing, language-consistent documents — the operators above
    // composed the way a pretraining corpus build actually chains them.
    "q_corpus_curation" -> ((s, d) => {
      val dd = docs(s, d)
      val canon = Dedup.exactGroups(dd, "doc_id", "text")
        .select(col("canonical_id").as("cid"))
      dd.join(canon, col("doc_id") === col("cid"), "left_semi")
        .where(qualityScore(col("text")) >= 70 && predictLang(col("text")) === col("lang"))
        .select(col("doc_id"), col("lang"), qualityScore(col("text")).as("score"))
        .orderBy("doc_id")
    }),

    // ---- tokenizer-training statistics ----------------------------------
    // Corpus vocabulary coverage: global token frequencies, the top-50
    // vocabulary by (count desc, token asc), each row carrying its
    // cumulative count and the corpus total — what a greedy vocabulary of
    // that size covers, in exact integers (tokenizer sizing reads exactly
    // this table). Plan: one token explode into a map-side partial count,
    // then ONE mixed aggregate carrying both the bounded TopKStructs
    // buffer AND the corpus-total sum — a 50-row buffer plus one long
    // cross the final exchange, the distinct-token table never sorts, and
    // the corpus is scanned once (a separate total branch would re-scan
    // and re-aggregate everything; audited out of the plan). The
    // cumulative window runs over exactly 50 rows.
    "q_vocab_coverage" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      docs(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .agg(graft.functions.TopKStructs.topK(
          struct((-col("cnt")).as("negcnt"), col("tok").as("t")), 50).as("top"),
          sum(col("cnt")).as("total_tokens"))
        .select(col("total_tokens"), posexplode(col("top")).as(Seq("pos", "r")))
        .select((col("pos") + 1).cast("long").as("rnk"),
          col("r.t").as("tok"), (-col("r.negcnt")).as("cnt"), col("total_tokens"))
        // deliberately unpartitioned: the window runs over exactly 50
        // bounded rows (the top-k above). WindowExec's "No Partition
        // Defined" WARN is silenced centrally in Bench/Verify — a literal
        // partitionBy would not help, Spark 4's EliminateWindowPartitions
        // strips foldable partition specs back out.
        .withColumn("cum_cnt", sum(col("cnt")).over(
          Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rnk"), col("tok"), col("cnt"), col("cum_cnt"), col("total_tokens"))
        .orderBy("rnk")
    }),

    // Incremental corpus curation: the diff engine (the reference's
    // flagship operator) reused as the CHANGE DETECTOR for a pipeline
    // refresh. Corpus v2 = v1 with ~2% of docs edited, ~2% dropped, a few
    // added; the joindiff on doc_id yields exactly the delta, and quality
    // scoring re-runs ONLY on the '+' rows — at 100 TB this is the
    // difference between an hourly incremental refresh (work ∝ delta) and
    // a full-corpus reprocess (work ∝ corpus). Drops are '-' keys with no
    // '+' partner (an edited doc's stale '-' image is superseded by its
    // '+'), via a broadcast-sized left-anti join on the delta itself.
    "q_incremental_curation" -> ((s, d) => {
      val v1 = docs(s, d).select(col("doc_id"), col("text"))
      val v2 = v1.where(col("doc_id") % 53 =!= 0)
        .withColumn("text", when(col("doc_id") % 37 === 0,
          concat(col("text"), lit(" edited edit"))).otherwise(col("text")))
        .unionByName(v1.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val delta = graft.diff.JoinDiffer.diff(v1, v2, Seq("doc_id"), Seq("text"))
      val plus = delta.where(col("sign") === "+").select(col("doc_id"), col("text"))
      val drops = delta.where(col("sign") === "-").select(col("doc_id"))
        .join(plus.select(col("doc_id")), Seq("doc_id"), "left_anti")
      drops.select(col("doc_id"), lit("drop").as("action"),
          lit(null).cast("long").as("score"))
        .unionByName(plus.select(col("doc_id"), lit("upsert").as("action"),
          qualityScore(col("text")).as("score")))
        .orderBy("doc_id", "action")
    }),

    // Incremental near-dup search for the same v1→v2 refresh fixture as
    // q_incremental_curation: only the upserted docs are minhashed and
    // band-joined against the unchanged corpus and each other —
    // index×index pairs (the 10⁶×-bigger quadrant at a 0.1% refresh of a
    // 100 TB corpus) are never computed. The oracle replays the FULL LSH
    // over v2 and filters to delta-involving pairs: both spellings must
    // agree pair-for-pair and band-count-for-band-count.
    "q_delta_dedup" -> ((s, d) => {
      val v1 = docs(s, d).select(col("doc_id"), col("text"))
      val v2 = v1.where(col("doc_id") % 53 =!= 0)
        .withColumn("text", when(col("doc_id") % 37 === 0,
          concat(col("text"), lit(" edited edit"))).otherwise(col("text")))
        .unionByName(v1.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val delta = graft.diff.JoinDiffer.diff(v1, v2, Seq("doc_id"), Seq("text"))
      val plus = delta.where(col("sign") === "+").select(col("doc_id"), col("text"))
      val unchanged = v2.join(plus.select("doc_id"), Seq("doc_id"), "left_anti")
      Dedup.deltaMinhashCandidates(unchanged, plus, "doc_id", "text")
        .orderBy("doc_a", "doc_b")
    }),

    // First BPE merge-step statistics: adjacent-token-pair counts across
    // the corpus, top-20 by (count desc, pair asc) — the argmax of this
    // table is exactly the first merge a BPE tokenizer learns, and
    // tokenizer training re-runs it after every merge. Same scale shape
    // as the shingle operators: a narrow per-doc transform explodes to
    // one row per adjacent pair, counts partial-aggregate map-side, and
    // only the bounded 20-pair buffer crosses the final exchange.
    "q_bpe_pairs" -> ((s, d) => {
      val arr = tokens(col("text"))
      // adjacent pairs via arrays_zip of the two shifted slices — plain
      // codegen'd expressions; the earlier transform(sequence(...),
      // i => concat(element_at ...)) lambda was CodegenFallback
      // (interpreted + per-element boxing) and dominated the gate
      docs(s, d)
        .select(explode(arrays_zip(
          slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))))).as("p"))
        .select(concat(col("p.0"), lit(" "), col("p.1")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .agg(graft.functions.TopKStructs.topK(
          struct((-col("cnt")).as("negcnt"), col("pair").as("p")), 20).as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "r")))
        .select((col("pos") + 1).cast("long").as("rnk"),
          col("r.p").as("pair"), (-col("r.negcnt")).as("cnt"))
        .orderBy("rnk")
    }),

    // BPE merge APPLICATION — the other half of the tokenizer:
    // q_bpe_pairs learns merge statistics, this gate spends a learned
    // vocab, encoding every document with the ten-merge fixture table
    // through the broadcast + codegen'd expression path. The oracle
    // replays the ascending-rank pass form as a replace() chain over a
    // char-wrapped encoding (equivalence argued in BpeEncode's scaladoc,
    // property-pinned in BpeEncodeSpec).
    "q_bpe_encode" -> ((s, d) => {
      val merges = BpeFixtureMerges.zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }
      val mergesDf = s.createDataFrame(merges).toDF("rank", "left", "right")
      bpeEncode(docs(s, d), "doc_id", "text", mergesDf).orderBy("doc_id")
    }),

    // BPE merge TRAINING, three rounds of the real iterative loop: each
    // round re-tokenizes with the merges learned so far and adopts the
    // argmax pair. The oracle replays all three rounds in SQL — pair
    // counts over the char-wrapped corpus, scalar-subquery argmax,
    // replace, repeat — so the gate proves the whole train loop, not one
    // round. (q_bpe_pairs is round 1's count table; this is the loop.)
    "q_bpe_learn" -> ((s, d) =>
      learnBpeMerges(docs(s, d), "text", rounds = 3).orderBy("rank")),

    // Vocab lookup over BPE output: token -> id via a typedlit map in a
    // codegen'd element_at (map-only, no join), OOV -> -1. The id
    // sequence is the actual artifact a training pipeline materializes.
    "q_bpe_ids" -> ((s, d) => {
      val mergesDf = s.createDataFrame(BpeFixtureMerges.zipWithIndex
        .map { case ((l, r), i) => (i, l, r) }).toDF("rank", "left", "right")
      val vocabDf = s.createDataFrame(BpeFixtureVocab.zipWithIndex
        .map { case (t, i) => (t, i.toLong) }).toDF("token", "id")
      bpeTokenIds(docs(s, d), "doc_id", "text", mergesDf, vocabDf)
        .orderBy("doc_id")
    }),

    // Incremental SimHash pairing: the %43 stratum re-arrives as a delta
    // (new ids); only delta×(index∪delta) blocks join — the index×index
    // quadrant is never computed (see Dedup.deltaHammingNearDup). The
    // oracle brute-forces the FULL Hamming join over index∪delta and
    // filters to delta-involving pairs — both spellings must agree
    // pair-for-pair.
    "q_simhash_delta" -> ((s, d) => {
      val v = docs(s, d).select(col("doc_id"), col("text"))
      Dedup.deltaHammingNearDup(
        Dedup.simhash(v.where(col("doc_id") % 43 =!= 0), "doc_id", "text"),
        Dedup.simhash(v.where(col("doc_id") % 43 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")), "doc_id", "text"),
        "doc_id", "simhash", maxHamming = 3, bits = 48)
        .orderBy("doc_a", "doc_b")
    }),

    // Model-based quality filter in the fastText shape: a LINEAR classifier
    // over hashed unigram features (hash token → one of 1024 buckets, sum
    // the buckets' learned weights, threshold the logit) — the
    // quality-classifier step of GPT-3/LLaMA-style curation pipelines,
    // which score every document against a small trained model. The weight
    // table here is a deterministic stand-in for trained weights (integer
    // centi-logits in [−100,100] derived from md5 of the bucket id), so the
    // oracle can rebuild it; a real checkpoint drops in as the same
    // 1024-row table. Plan shape is the part that matters at 100 TB: the
    // model is a BROADCAST dim (any hashed-feature model is KB–MB), the
    // corpus explodes to tokens and probes it map-side, and the only
    // exchange is the per-doc partial-aggregating sum — classifier
    // inference is one narrow pass, never a shuffle of the corpus against
    // the model. The per-token average is computed on a +100-shifted
    // numerator so the integer division never sees a negative operand
    // (Spark `div` truncates toward zero, DuckDB `//` floors — they agree
    // only on non-negatives).
    "q_quality_classifier" -> ((s, d) =>
      qualityClassifier(docs(s, d), "doc_id", "text").orderBy("doc_id")),

    // Unicode NFC normalization (graft.functions.UnicodeNormalize — Spark
    // has no builtin; DuckDB's nfc_normalize is the oracle). The corpus is
    // ASCII, so the gate DETERMINISTICALLY derives a decomposed-Unicode
    // variant — replace every 'e' with 'e' + U+0301 (combining acute) —
    // then normalizes it back to composed form on both engines. Code-point
    // counts before/after prove composition actually happened (length()
    // counts code points on both engines); the all-ASCII original passes
    // through the expression's no-copy fast path, exercised by the
    // unchanged original column.
    "q_unicode_nfc" -> ((s, d) => {
      val deco = regexp_replace(col("c_name"), "e", "e\u0301")
      Tables.load(s, d, "customer")
        .select(col("c_custkey"), deco.as("raw"),
          graft.functions.UnicodeNormalize.nfc(deco).as("nfc_text"),
          graft.functions.UnicodeNormalize.nfc(col("c_name")).as("ascii_same"))
        .select(col("c_custkey"), col("nfc_text"),
          length(col("raw")).cast("long").as("n_raw_cp"),
          length(col("nfc_text")).cast("long").as("n_nfc_cp"),
          (col("raw") =!= col("nfc_text")).as("changed"),
          col("ascii_same"))
        .orderBy("c_custkey")
    }),
  )

  // ---- oracle SQL ------------------------------------------------------

  private val toks = "string_split(trim(text), ' ')"
  private val shingles =
    s"list_distinct([t.toks[i] || ' ' || t.toks[i+1] || ' ' || t.toks[i+2] for i in range(1, len(t.toks)-1)])"
  private val stopList = "('the','a','of','and','to','in','is')"

  private val scoreSql =
    s"""(CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 40 ELSE 10 END)
       |     + (CASE WHEN len($toks) >= 20 THEN 30 ELSE 10 END)
       |     + (CASE WHEN len([t for t in $toks if t IN $stopList]) > 0 THEN 30 ELSE 0 END)""".stripMargin

  /** Shared CTE chain: minhash LSH candidates → symmetric edges → recursive
    * min-label walk (components read via `SELECT id, min(comp) FROM walk
    * GROUP BY id`). */
  private val componentsWith =
    s"""WITH RECURSIVE hs AS (
       |  SELECT doc_id, [('0x' || substring(md5(s), 1, 12))::BIGINT for s in $shingles] AS hl
       |  FROM (SELECT doc_id, $toks AS toks FROM documents) t),
       |sig AS (
       |  SELECT doc_id,
       |    [list_min([((2*i+1)*h + 7919*i) % ${graft.dedup.Dedup.MinhashMod} for h in hl]) for i in range(0, 64)] AS sg
       |  FROM hs WHERE len(hl) > 0),
       |bands AS (
       |  SELECT doc_id, b,
       |    md5(array_to_string(list_transform(sg[b*4+1:b*4+4], v -> v::VARCHAR), ',')) AS bh
       |  FROM sig, range(16) r(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM cand
       |  UNION ALL SELECT doc_b, doc_a FROM cand),
       |walk(id, comp) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id)""".stripMargin

  private val predictedLangSql =
    s"""CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
       |     WHEN len([t for t in $toks if t IN ('el','la','de','los','que')]) >
       |          greatest(len([t for t in $toks if t IN ('the','a','of','and','to')]),
       |                   len([t for t in $toks if t IN ('le','et','les','une','dans')]),
       |                   len([t for t in $toks if t IN ('der','die','das','und','ist')])) THEN 'es'
       |     WHEN len([t for t in $toks if t IN ('le','et','les','une','dans')]) >
       |          greatest(len([t for t in $toks if t IN ('the','a','of','and','to')]),
       |                   len([t for t in $toks if t IN ('der','die','das','und','ist')])) THEN 'fr'
       |     WHEN len([t for t in $toks if t IN ('der','die','das','und','ist')]) >
       |          len([t for t in $toks if t IN ('the','a','of','and','to')]) THEN 'de'
       |     ELSE 'en' END""".stripMargin

  // ---- shared BPE oracle plumbing (chr(1)/chr(2)-wrapped char encoding,
  // replayed in DuckDB; see q_bpe_encode's comment for the semantics) ----
  private def bpeSqlStr(s: String) = "'" + s.replace("'", "''") + "'"
  private def bpeTok(s: String) = s"chr(1) || ${bpeSqlStr(s)} || chr(2)"
  /** The fixture merge chain applied to `expr` (ascending rank). */
  private def bpeChain(expr: String): String =
    BpeFixtureMerges.foldLeft(
      s"""regexp_replace($expr, '(.)', chr(1) || '\\1' || chr(2), 'g')""") {
      case (acc, (l, r)) =>
        s"replace($acc, ${bpeTok(l)} || ${bpeTok(r)}, ${bpeTok(l + r)})"
    }
  /** CTEs ending in `un(doc_id, bpe_text)` — the fixture encode of every
    * document. */
  private def bpeTextCtes: String =
    s"""WITH enc AS (SELECT doc_id, ${bpeChain("text")} AS s FROM documents),
       |nosp AS (SELECT doc_id, replace(s, chr(1) || ' ' || chr(2), '') AS s FROM enc),
       |un AS (SELECT doc_id,
       |  CASE WHEN s = '' THEN ''
       |       ELSE substr(replace(s, chr(2) || chr(1), ' '), 2,
       |                   length(replace(s, chr(2) || chr(1), ' ')) - 2) END AS bpe_text
       |  FROM nosp)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_vocab_coverage" ->
      s"""WITH tok AS (SELECT unnest($toks) AS tok FROM documents),
         |c AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
         |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM c),
         |top AS (
         |  SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
         |  FROM c ORDER BY cnt DESC, tok LIMIT 50)
         |SELECT rnk, tok, cnt,
         |  CAST(SUM(cnt) OVER (ORDER BY rnk) AS BIGINT) AS cum_cnt,
         |  t.total_tokens
         |FROM top, t ORDER BY rnk""".stripMargin,

    "q_incremental_curation" ->
      s"""WITH v1 AS (SELECT doc_id, text FROM documents),
         |v2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 37 = 0 THEN text || ' edited edit' ELSE text END AS text
         |  FROM documents WHERE doc_id % 53 <> 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 10),
         |plus AS (
         |  SELECT b.doc_id, b.text FROM v2 b LEFT JOIN v1 a ON a.doc_id = b.doc_id
         |  WHERE a.doc_id IS NULL OR a.text IS DISTINCT FROM b.text),
         |drops AS (
         |  SELECT a.doc_id FROM v1 a LEFT JOIN v2 b ON a.doc_id = b.doc_id
         |  WHERE b.doc_id IS NULL)
         |SELECT doc_id, 'drop' AS action, CAST(NULL AS BIGINT) AS score FROM drops
         |UNION ALL
         |SELECT doc_id, 'upsert' AS action,
         |  CAST($scoreSql AS BIGINT) AS score FROM plus
         |ORDER BY doc_id, action""".stripMargin,

    "q_bpe_pairs" ->
      s"""WITH t AS (SELECT $toks AS l FROM documents),
         |p AS (SELECT unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS pair FROM t),
         |c AS (SELECT pair, COUNT(*) AS cnt FROM p GROUP BY pair)
         |SELECT row_number() OVER (ORDER BY cnt DESC, pair) AS rnk, pair, cnt
         |FROM c ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    // Replays the ascending-rank pass form of BPE encode: wrap every char
    // as chr(1)<c>chr(2), then one literal replace() per merge in rank
    // order (left-to-right non-overlapping — replace()'s scan — matching
    // the expression's merge pass), drop space tokens, unwrap. Chain is
    // generated from the same BpeFixtureMerges constant the gate uses.
    "q_bpe_encode" ->
      s"""$bpeTextCtes
         |SELECT doc_id,
         |  CAST(CASE WHEN bpe_text = '' THEN 0
         |            ELSE len(str_split(bpe_text, ' ')) END AS BIGINT) AS n_bpe_tokens,
         |  bpe_text
         |FROM un ORDER BY doc_id""".stripMargin,

    // Replays the full three-round training loop: per round, pair counts
    // over the wrapped corpus, scalar-subquery argmax ordered by the
    // SPLIT left/right columns — NOT the concatenated "left right"
    // string, whose single-key compare diverges from Spark's
    // (left, right) tuple order when a token contains a char below
    // 0x20 — then replace, repeat. Like every wrapped-oracle gate this
    // assumes corpus text contains none of the sentinels chr(1)/chr(2)/
    // chr(31) (true of the documents fixture; the Spark side has no such
    // restriction).
    "q_bpe_learn" -> {
      def toksOf(sCol: String) =
        s"str_split(replace(substr($sCol, 2, length($sCol) - 2), chr(2) || chr(1), chr(31)), chr(31))"
      def pair(am: String, merged: Boolean): String = {
        val l = s"split_part((SELECT pair FROM $am), ' ', 1)"
        val r = s"split_part((SELECT pair FROM $am), ' ', 2)"
        if (merged) s"chr(1) || $l || $r || chr(2)"
        else s"chr(1) || $l || chr(2) || chr(1) || $r || chr(2)"
      }
      val rounds = (1 to 3).map { k =>
        s"""p$k AS (SELECT unnest([l[i] || ' ' || l[i+1] for i in range(1, len(l))]) AS pair
           |  FROM (SELECT ${toksOf("s")} AS l FROM s${k - 1})),
           |c$k AS (SELECT pair, COUNT(*) AS cnt FROM p$k GROUP BY pair),
           |m$k AS (SELECT pair, cnt FROM c$k
           |  ORDER BY cnt DESC, split_part(pair, ' ', 1), split_part(pair, ' ', 2) LIMIT 1),
           |s$k AS (SELECT replace(s, ${pair(s"m$k", merged = false)},
           |  ${pair(s"m$k", merged = true)}) AS s FROM s${k - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH w0 AS (SELECT unnest(str_split(trim(text), ' ')) AS word FROM documents),
         |s0 AS (SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS s
         |  FROM w0 WHERE word <> ''),
         |$rounds
         |SELECT CAST(k AS BIGINT) AS rank,
         |  split_part(pair, ' ', 1) AS "left", split_part(pair, ' ', 2) AS "right",
         |  CAST(cnt AS BIGINT) AS cnt
         |FROM (SELECT 1 AS k, pair, cnt FROM m1
         |      UNION ALL SELECT 2, pair, cnt FROM m2
         |      UNION ALL SELECT 3, pair, cnt FROM m3)
         |ORDER BY rank""".stripMargin
    },

    "q_bpe_ids" -> {
      val caseChain = "CASE t " + BpeFixtureVocab.zipWithIndex.map {
        case (tok, i) => s"WHEN ${bpeSqlStr(tok)} THEN $i" }.mkString(" ") +
        " ELSE -1 END"
      s"""$bpeTextCtes,
         |t AS (SELECT doc_id,
         |  CASE WHEN bpe_text = '' THEN CAST([] AS VARCHAR[])
         |       ELSE str_split(bpe_text, ' ') END AS toks FROM un)
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
         |  array_to_string(list_transform(toks, t -> CAST($caseChain AS VARCHAR)), ',') AS ids_csv,
         |  CAST(len(list_filter(toks, t -> $caseChain = -1)) AS BIGINT) AS n_oov
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "q_token_count" ->
      s"""SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_lex_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len,
         |  CAST(len($toks) AS BIGINT) AS n_tokens,
         |  CAST(len([t for t in $toks if t IN $stopList]) AS BIGINT) AS n_stopwords,
         |  CAST((CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 40 ELSE 10 END)
         |     + (CASE WHEN len($toks) >= 20 THEN 30 ELSE 10 END)
         |     + (CASE WHEN len([t for t in $toks if t IN $stopList]) > 0 THEN 30 ELSE 0 END) AS BIGINT) AS score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      s"""SELECT doc_id, lang,
         |  $predictedLangSql AS predicted_lang
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH b AS (
        |  SELECT DISTINCT ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
        |    SELECT unnest([array_to_string(t.toks[i:i+4], ' ') for i in range(1, len(t.toks)-3)]) AS s
        |    FROM (SELECT string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id < 10) t)),
        |c AS (
        |  SELECT doc_id, ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
        |    SELECT doc_id, unnest([array_to_string(t.toks[i:i+4], ' ') for i in range(1, len(t.toks)-3)]) AS s
        |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id >= 10) t))
        |SELECT DISTINCT doc_id FROM c WHERE h IN (SELECT h FROM b) ORDER BY doc_id""".stripMargin,

    "q_contamination_score" ->
      """WITH b AS (
        |  SELECT DISTINCT ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
        |    SELECT unnest([array_to_string(t.toks[i:i+4], ' ') for i in range(1, len(t.toks)-3)]) AS s
        |    FROM (SELECT string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id < 10) t)),
        |c AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, unnest([array_to_string(t.toks[i:i+4], ' ') for i in range(1, len(t.toks)-3)]) AS s
        |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id >= 10) t)),
        |scored AS (
        |  SELECT doc_id, COUNT(*) AS n_ngrams,
        |    CAST(SUM(CASE WHEN ('0x' || substring(md5(s), 1, 12))::BIGINT IN (SELECT h FROM b)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_ngrams, n_shared, (n_shared * 20 > n_ngrams) AS flag_heavy
        |FROM scored WHERE n_shared > 0 ORDER BY doc_id""".stripMargin,

    // exact oracle: the bloom is a pruning device, not a semantics change
    "q_bloom_decontaminate" ->
      """WITH b AS (
        |  SELECT DISTINCT ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
        |    SELECT unnest([array_to_string(t.toks[i:i+3], ' ') for i in range(1, len(t.toks)-2)]) AS s
        |    FROM (SELECT string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id < 25) t)),
        |c AS (
        |  SELECT doc_id, ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
        |    SELECT doc_id, unnest([array_to_string(t.toks[i:i+3], ' ') for i in range(1, len(t.toks)-2)]) AS s
        |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id >= 25) t))
        |SELECT DISTINCT doc_id FROM c WHERE h IN (SELECT h FROM b) ORDER BY doc_id""".stripMargin,

    "q_bm25_rank" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY 1),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM tk) AS t_tokens,
         |               (SELECT COUNT(*) FROM documents) AS n_docs),
         |scored AS (
         |  SELECT t.doc_id, t.tok, t.tf, dl.dl, dfq.df,
         |    (length(format('{:b}', tot.n_docs // dfq.df)) * 22 * t.tf * 1000000) //
         |      (t.tf * 10000 + 3000 + (dl.dl * tot.n_docs * 9000) // tot.t_tokens) AS score_milli
         |  FROM tf t JOIN dl USING (doc_id) JOIN dfq ON t.tok = dfq.tok, tot)
         |SELECT doc_id, tok, tf, dl, df, score_milli, rnk FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY score_milli DESC, tok ASC) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 3 AND doc_id < 50
         |ORDER BY doc_id, rnk""".stripMargin,

    "q_pipeline_e2e" ->
      s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id >= 10),
         |b AS (
         |  SELECT DISTINCT ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
         |    SELECT unnest([array_to_string(t.toks[i:i+4], ' ') for i in range(1, len(t.toks)-3)]) AS s
         |    FROM (SELECT string_split(trim(text), ' ') AS toks FROM documents WHERE doc_id < 10) t)),
         |c AS (
         |  SELECT doc_id, ('0x' || substring(md5(s), 1, 12))::BIGINT AS h FROM (
         |    SELECT doc_id, unnest([array_to_string(t.toks[i:i+4], ' ') for i in range(1, len(t.toks)-3)]) AS s
         |    FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM corpus) t)),
         |contam AS (SELECT DISTINCT doc_id FROM c WHERE h IN (SELECT h FROM b)),
         |curated AS (
         |  SELECT doc_id, text FROM corpus
         |  WHERE doc_id IN (SELECT min(doc_id) FROM corpus GROUP BY text)
         |    AND $scoreSql >= 70
         |    AND ($predictedLangSql) = lang
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |tt AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM curated),
         |nn AS (SELECT doc_id, toks,
         |  CASE WHEN len(toks) <= 32 THEN 1
         |       ELSE 1 + (len(toks) - 32 + 23) // 24 END AS n_chunks FROM tt),
         |ch AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM nn),
         |chunks AS (
         |  SELECT doc_id, chunk_idx,
         |    CAST(len(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32]) AS BIGINT) AS n_tokens,
         |    md5(array_to_string(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ')) AS chunk_sig
         |  FROM ch),
         |p AS (
         |  SELECT doc_id, chunk_idx, n_tokens, chunk_sig,
         |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS cum_excl
         |  FROM chunks)
         |SELECT doc_id, chunk_idx, n_tokens, chunk_sig,
         |  CAST(cum_excl // 256 AS BIGINT) AS pack_id,
         |  CAST(cum_excl % 256 AS BIGINT) AS pack_offset
         |FROM p ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_corpus_curation" ->
      s"""SELECT doc_id, lang, CAST($scoreSql AS BIGINT) AS score
         |FROM documents
         |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
         |  AND $scoreSql >= 70
         |  AND ($predictedLangSql) = lang
         |ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_normalized" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS text_hash,
        |  min(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, ('0x' || substring(md5(unnest($shingles)), 1, 12))::BIGINT AS s
         |  FROM (SELECT doc_id, $toks AS toks FROM documents) t),
         |freq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
         |kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq ON sh.s = freq.s WHERE freq.df <= 50),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
         |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common, n_common / (sa.sz + sb.sz - n_common) AS jaccard
         |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Recomputes the identical sketches: the estimator is a deterministic
    // function of the bottom-256 md5-derived hashes, so even the float
    // estimates hash-match across engines.
    "q_kmv_overlap" ->
      s"""WITH sh AS (
         |  SELECT t.doc_id, ('0x' || substring(md5(unnest($shingles)), 1, 12))::BIGINT AS h
         |  FROM (SELECT doc_id, $toks AS toks FROM documents) t),
         |ska AS (SELECT DISTINCT h FROM sh WHERE doc_id % 2 = 0 ORDER BY h LIMIT 256),
         |skb AS (SELECT DISTINCT h FROM sh WHERE doc_id % 3 = 0 ORDER BY h LIMIT 256),
         |un AS (
         |  SELECT h, (h IN (SELECT h FROM ska))::INT AS in_a,
         |         (h IN (SELECT h FROM skb))::INT AS in_b
         |  FROM (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb))
         |  ORDER BY h LIMIT 256),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used, max(h) AS hk,
         |        CAST(sum(in_a * in_b) AS BIGINT) AS rho FROM un)
         |SELECT k_used, hk, rho,
         |  CASE WHEN k_used < 256 THEN k_used::DOUBLE
         |    ELSE (k_used - 1)::DOUBLE * 281474976710656.0 / hk::DOUBLE END AS union_est,
         |  rho::DOUBLE / k_used::DOUBLE AS jaccard_est,
         |  rho::DOUBLE / k_used::DOUBLE
         |    * CASE WHEN k_used < 256 THEN k_used::DOUBLE
         |      ELSE (k_used - 1)::DOUBLE * 281474976710656.0 / hk::DOUBLE END AS inter_est
         |FROM m""".stripMargin,

    "q_tfidf_rank" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
         |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT doc_id, tok, tf, df, score, rnk FROM (
         |  SELECT t.doc_id, t.tok, t.tf, dfq.df,
         |    t.tf * length(format('{:b}', n.n_docs // dfq.df)) AS score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id
         |      ORDER BY t.tf * length(format('{:b}', n.n_docs // dfq.df)) DESC, t.tok ASC) AS BIGINT) AS rnk
         |  FROM tf t JOIN dfq ON t.tok = dfq.tok, n)
         |WHERE rnk <= 3 AND doc_id < 50
         |ORDER BY doc_id, rnk""".stripMargin,

    "q_lm_surprisal" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |cnt AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS t FROM tk)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(length(format('{:b}', tot.t // cnt.c))) AS BIGINT) AS surprisal_bits,
         |  (CAST(SUM(length(format('{:b}', tot.t // cnt.c))) AS BIGINT) * 1000) // COUNT(*) AS avg_millibits
         |FROM tk JOIN cnt USING (tok), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dedup_components" ->
      s"""$componentsWith
         |SELECT id, min(comp) AS comp FROM walk GROUP BY id ORDER BY id""".stripMargin,

    "q_dedup_survivors" ->
      s"""$componentsWith,
         |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
         |scored AS (
         |  SELECT c.comp, c.id, CAST($scoreSql AS BIGINT) AS score
         |  FROM comps c JOIN documents ON c.id = doc_id)
         |SELECT comp, id AS survivor_id, score FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY comp ORDER BY score DESC, id ASC) AS rn
         |  FROM scored) WHERE rn = 1 ORDER BY comp""".stripMargin,

    "q_minhash_lsh" ->
      s"""WITH hs AS (
         |  SELECT doc_id, [('0x' || substring(md5(s), 1, 12))::BIGINT for s in $shingles] AS hl
         |  FROM (SELECT doc_id, $toks AS toks FROM documents) t),
         |sig AS (
         |  SELECT doc_id,
         |    [list_min([((2*i+1)*h + 7919*i) % ${graft.dedup.Dedup.MinhashMod} for h in hl]) for i in range(0, 64)] AS sg
         |  FROM hs WHERE len(hl) > 0),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(array_to_string(list_transform(sg[b*4+1:b*4+4], v -> v::VARCHAR), ',')) AS bh
         |  FROM sig, range(16) r(b))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
         |FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_delta_dedup" ->
      s"""WITH v1 AS (SELECT doc_id, text FROM documents),
         |v2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 37 = 0 THEN text || ' edited edit' ELSE text END AS text
         |  FROM documents WHERE doc_id % 53 <> 0
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 10),
         |plus AS (
         |  SELECT b.doc_id FROM v2 b LEFT JOIN v1 a ON a.doc_id = b.doc_id
         |  WHERE a.doc_id IS NULL OR a.text IS DISTINCT FROM b.text),
         |hs AS (
         |  SELECT doc_id, [('0x' || substring(md5(s), 1, 12))::BIGINT for s in $shingles] AS hl
         |  FROM (SELECT doc_id, $toks AS toks FROM v2) t),
         |sig AS (
         |  SELECT doc_id,
         |    [list_min([((2*i+1)*h + 7919*i) % ${graft.dedup.Dedup.MinhashMod} for h in hl]) for i in range(0, 64)] AS sg
         |  FROM hs WHERE len(hl) > 0),
         |bands AS (
         |  SELECT doc_id, b,
         |    md5(array_to_string(list_transform(sg[b*4+1:b*4+4], v -> v::VARCHAR), ',')) AS bh
         |  FROM sig, range(16) r(b)),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
         |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, p.n_shared_bands FROM pairs p
         |WHERE p.doc_a IN (SELECT doc_id FROM plus)
         |   OR p.doc_b IN (SELECT doc_id FROM plus)
         |ORDER BY 1, 2""".stripMargin,

    "q_simhash" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM documents),
         |bits AS (
         |  SELECT doc_id, i,
         |    SUM(CASE WHEN ((('0x' || substring(md5(tok), 1, 12))::BIGINT >> i) & 1) = 1
         |        THEN 1 ELSE -1 END) AS s
         |  FROM tk, range(48) r(i) GROUP BY doc_id, i)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The oracle brute-forces the all-pairs Hamming join the pigeonhole
    // block join avoids — both must emit identical pairs (the block join
    // is exact by the pigeonhole bound).
    "q_simhash_neardup" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM documents),
         |bits AS (
         |  SELECT doc_id, i,
         |    SUM(CASE WHEN ((('0x' || substring(md5(tok), 1, 12))::BIGINT >> i) & 1) = 1
         |        THEN 1 ELSE -1 END) AS s
         |  FROM tk, range(48) r(i) GROUP BY doc_id, i),
         |sim AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY 1, 2""".stripMargin,

    "q_simhash_delta" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM documents),
         |bits AS (
         |  SELECT doc_id, i,
         |    SUM(CASE WHEN ((('0x' || substring(md5(tok), 1, 12))::BIGINT >> i) & 1) = 1
         |        THEN 1 ELSE -1 END) AS s
         |  FROM tk, range(48) r(i) GROUP BY doc_id, i),
         |sim AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id),
         |allr AS (
         |  SELECT doc_id, simhash FROM sim WHERE doc_id % 43 <> 0
         |  UNION ALL
         |  SELECT doc_id + 500000 AS doc_id, simhash FROM sim WHERE doc_id % 43 = 0)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM allr a JOIN allr b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |  AND (a.doc_id >= 500000 OR b.doc_id >= 500000)
         |ORDER BY 1, 2""".stripMargin,

    "q_quality_classifier" ->
      s"""WITH wtab AS (
         |  SELECT CAST(b AS BIGINT) AS bucket,
         |    ('0x' || substring(md5('w|' || b::VARCHAR), 1, 12))::BIGINT % 201 - 100 AS w
         |  FROM range(1024) r(b)),
         |tk AS (
         |  SELECT doc_id,
         |    ('0x' || substring(md5(tok), 1, 12))::BIGINT % 1024 AS bucket
         |  FROM (SELECT doc_id, unnest($toks) AS tok FROM documents)),
         |sc AS (
         |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS logit_centi
         |  FROM tk JOIN wtab USING (bucket) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, CAST(logit_centi AS BIGINT) AS logit_centi,
         |  CAST(((logit_centi + 100 * n_tokens) * 10) // n_tokens - 1000 AS BIGINT)
         |    AS avg_millilogit,
         |  logit_centi > 0 AS flag_keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q_unicode_nfc" ->
      """WITH r AS (
        |  SELECT c_custkey, replace(c_name, 'e', 'e' || chr(769)) AS raw, c_name
        |  FROM customer)
        |SELECT c_custkey, nfc_normalize(raw) AS nfc_text,
        |  length(raw) AS n_raw_cp,
        |  length(nfc_normalize(raw)) AS n_nfc_cp,
        |  (raw != nfc_normalize(raw)) AS changed,
        |  c_name AS ascii_same
        |FROM r ORDER BY c_custkey""".stripMargin,
  )
}
