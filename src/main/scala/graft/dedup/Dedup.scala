package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for large text corpora.
  *
  * Four families, all shuffle-conscious:
  *  - exact:   one groupBy on a 128-bit content hash.
  *  - n-gram Jaccard: shingle inverted index with a document-frequency cap
  *    (stop-shingles would otherwise blow up the candidate join on a skewed
  *    corpus — the cap bounds per-shingle fan-out at df^2 pairs).
  *  - MinHash + LSH: 64 md5-derived min-hashes, 16 bands × 4 rows; candidate
  *    pairs share at least one band bucket. Only signatures shuffle, never
  *    documents.
  *  - SimHash: 48-bit bit-majority hash; near-dups have small Hamming
  *    distance. Hashes are md5-based so any engine reproduces them.
  */
object Dedup {

  /** 48-bit integer from the first 12 md5 hex digits of `c` — the custom
    * codegen'd [[graft.functions.Md5Bits48]], bit-identical to
    * `conv(substring(md5(c), 1, 12), 16, 10)` minus the per-row hex-string
    * round-trip (this is the hottest scalar in every shingle pipeline). */
  def md5Int48(c: Column): Column = graft.functions.Md5Bits48.head(c)

  /** Exact dedup groups: content hash → canonical (min) id + copy count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Canonical text for normalization-insensitive dedup: lowercase,
    * non-alphanumerics collapsed to single spaces, trimmed. The regex class
    * means the same thing in Java regex and RE2, so external engines agree. */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Exact dedup after canonicalization — catches case/punctuation/spacing
    * variants of the same content. */
  def normalizedExactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(canonicalText(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) inverted-index rows, distinct shingles per doc.
    *
    * Built with posexplode + window `lead` instead of exploding the
    * `TextFunctions.shingles` array: array lambdas run on the interpreted
    * CodegenFallback path (~1ms/doc measured), while tokenize → lead →
    * concat is whole-stage codegen end to end. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shingleIndexRaw(df, idCol, textCol, n).distinct()

  /** As `shingleIndex` but WITHOUT per-doc dedup of shingles. Consumers
    * whose aggregation is idempotent (minhash: MIN over hash transforms)
    * skip the distinct's extra shuffle — duplicates can't change a min.
    *
    * Shingles are assembled by indexing back into the kept token array
    * (posexplode + element_at) — a NARROW, fully codegen'd pipeline. The
    * two rejected shapes: array lambdas (interpreted CodegenFallback,
    * ~1ms/doc), and window `lead` over exploded tokens (costs a full
    * shuffle+sort of the token stream just to see the next token). */
  def shingleIndexRaw(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      carry: Seq[String] = Nil): DataFrame = {
    val kept = carry.map(col)
    df.select((col(idCol).as("doc_id") +: TextFunctions.tokens(col(textCol)).as("t") +: kept): _*)
      .select((col("doc_id") +: col("t") +: kept) :+ posexplode(col("t")).as(Seq("pos", "tok")): _*)
      .where(col("pos") <= size(col("t")) - n)
      .select((col("doc_id") +:
        concat_ws(" ", col("tok") +:
          (1 until n).map(k => element_at(col("t"), col("pos") + k + 1)): _*).as("s") +:
        kept): _*)
  }

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ threshold. Shingles are
    * hashed to 48-bit ints up front: every shuffle below moves 8-byte keys
    * instead of ~20-byte strings.
    *
    * EXACT two-exchange plan (every alternative measured slower — prefix
    * filtering à la PPJoin, per-shingle doc-list collect + pair explode,
    * and array_intersect verification all add exchanges, object-hash
    * aggregates, or codegen-heavy array stages that dominate at any scale
    * where the df cap is doing its job):
    *  1. one hash(s) exchange serves the whole index side: (doc_id, s)
    *     dedup, the document-frequency aggregation, and its join back all
    *     only need clustering by s, so none adds an exchange, and the
    *     self-join's two sides reuse the same exchange (or one side
    *     broadcasts under AQE). The df comes from groupBy+join rather than
    *     a count-over-partition window: WindowExec would BUFFER each
    *     shingle's partition group, so one stop-shingle spanning the corpus
    *     becomes one unsplittable task — exactly the rows the cap is there
    *     to kill. Filtering the one-row-per-shingle frequency side before
    *     the join makes stop-shingle index rows plain join misses instead;
    *  2. n_common = COUNT of shared kept shingles straight off the join —
    *     no per-doc arrays, no verify stage. Per-doc capped set sizes ride
    *     along as a window over doc_id (the only other exchange); the
    *     final (doc_a, doc_b) aggregation needs NO shuffle because
    *     hash(doc_id) clustering already covers its keys.
    * The df cap is the scale guard: a kept shingle joins with ≤ dfCap
    * occurrences, so join volume is ≤ dfCap·|index| — linear in the
    * corpus, never quadratic. Everything is whole-stage codegen. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, dfCap: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = shingleIndexRaw(df, idCol, textCol)
      .select(col("doc_id"), md5Int48(col("s")).as("s"))
      .repartition(col("s"))
      .distinct()
    val freq = base.groupBy("s").agg(count(lit(1)).as("df"))
    val kept = base.join(freq.where(col("df") <= dfCap), Seq("s"))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .select("doc_id", "s", "sz")
    kept.select(col("doc_id").as("doc_a"), col("s"), col("sz").as("sa"))
      .join(kept.select(col("doc_id").as("doc_b"), col("s"), col("sz").as("sb")), Seq("s"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"), first(col("sa")).as("sa"), first(col("sb")).as("sb"))
      .withColumn("jaccard", col("n_common") / (col("sa") + col("sb") - col("n_common")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  /** Modulus for the linear min-hash family (largest value under 2^48 that
    * keeps (2i+1)·h inside a long for i<64, h<2^48). */
  val MinhashMod: Long = (1L << 48) - 59

  /** MinHash signature over a precomputed 48-bit shingle-hash array: each
    * shingle is md5'd ONCE, then the 64 hash functions are cheap linear
    * transforms h_i(s) = ((2i+1)·md5_48(s) + 7919·i) mod M. No explode, no
    * shuffle — the signature is a codegen'd projection per row. (The classic
    * one-md5-per-(i,shingle) variant costs 64× the hashing plus a
    * doc×i×shingle explode; at corpus scale that shuffle dominates.) */
  /** LSH band buckets: md5 of each 4-slot signature slice.
    *
    * Implementation notes (both alternatives measured much slower):
    *  - array-lambda signatures (transform/aggregate/zip_with) run on
    *    Spark's interpreted CodegenFallback path, and CollapseProject can
    *    inline the shingle-hash array into a 64-iteration lambda, re-running
    *    tokenize+md5 per iteration (20× regression);
    *  - the classic one-md5-per-(i,shingle) explode costs 64× the hashing
    *    plus a doc×i×shingle shuffle.
    * Here each shingle is md5'd once in the exploded index, and the
    * signature is 64 codegen'd `min` aggregates of linear transforms
    * h_i(s) = ((2i+1)·md5_48(s) + 7919·i) mod M — one partial-aggregating
    * shuffle of (doc_id, h) pairs, everything whole-stage codegen. */
  def lshBands(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    require(numHashes > 0 && rowsPerBand > 0 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand " +
        s"($rowsPerBand) — a remainder would aggregate min-hashes that no " +
        "band ever uses, silently buying less recall than configured")
    val numBands = numHashes / rowsPerBand
    val sh = shingleIndexRaw(df, idCol, textCol)
      .select(col("doc_id"), md5Int48(col("s")).as("h"))
    val minAggs = (0 until numHashes).map(i =>
      min((lit(2L * i + 1) * col("h") + lit(7919L * i)) % MinhashMod).as(s"mh_$i"))
    val sig = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b.toLong).as("band"),
        md5(concat_ws(",", (0 until rowsPerBand).map(r =>
          col(s"mh_${b * rowsPerBand + r}").cast("string")): _*)).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate near-dup pairs: docs sharing ≥1 LSH band bucket. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val bands = lshBands(df, idCol, textCol, numHashes, rowsPerBand)
    bands.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bh")), Seq("band", "bh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Incremental LSH: near-dup candidates for a corpus REFRESH without
    * re-pairing the existing corpus against itself. `index` is the
    * already-deduped corpus (at production scale its band signatures are a
    * precomputed table — recomputing them here is one scan, no pair work);
    * `delta` is the new/changed documents. Ids must be disjoint across the
    * two sides (a refresh upsert replaces its old row, it doesn't coexist
    * with it).
    *
    * Candidates = (delta × index) ∪ (delta × delta) sharing an LSH band —
    * exactly the pairs a full re-run would emit that INVOLVE a delta doc,
    * with the index×index quadrant (the overwhelming mass at 100 TB: a
    * 0.1% refresh makes it 10⁶× the delta×delta quadrant) never computed.
    * Same band-join shape as minhashCandidates, so skew behavior and AQE
    * splitting carry over; the two quadrants are unioned BEFORE the final
    * per-pair count so shared-band tallies match the full run's.
    */
  def deltaMinhashCandidates(index: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame =
    deltaMinhashCandidatesFromBands(
      lshBands(index, idCol, textCol, numHashes, rowsPerBand),
      delta, idCol, textCol, numHashes, rowsPerBand)

  /** The production spelling of [[deltaMinhashCandidates]]: the corpus
    * index arrives as its STORED band signatures (doc_id, band, bh) — the
    * table a 100 TB pipeline maintains across refreshes — so a refresh
    * scans and hashes only the delta. */
  def deltaMinhashCandidatesFromBands(indexBands: DataFrame, delta: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val bi = indexBands
    val bd = lshBands(delta, idCol, textCol, numHashes, rowsPerBand)
    val cross = bd.select(col("doc_id").as("doc_x"), col("band"), col("bh"))
      .join(bi.select(col("doc_id").as("doc_y"), col("band"), col("bh")),
        Seq("band", "bh"))
      .select(least(col("doc_x"), col("doc_y")).as("doc_a"),
        greatest(col("doc_x"), col("doc_y")).as("doc_b"))
    val within = bd.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
      .join(bd.select(col("doc_id").as("doc_b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    cross.unionByName(within)
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Per-document LSH bands as a plain-Scala kernel, bit-identical to
    * [[lshBands]] (same tokenizer, 3-shingles, md5-48, linear hash family,
    * band md5 — parity is spec-pinned). Exists for STREAMS: the batch band
    * computation is a per-doc aggregation a stream cannot run statelessly,
    * while this is a pure per-row function usable inside a typed flatMap —
    * zero state, zero shuffle. Batch pipelines should keep using
    * [[lshBands]] (whole-stage codegen'd; this walks Scala objects).
    * Returns (band, bandHash) pairs; empty for docs with no 3-shingle. */
  /** Plain-Scala per-row n-gram shingle hashes — bit-identical to the DF
    * spelling `shingleIndexRaw(...)` + `md5Int48` (same tokenization:
    * split with limit −1 keeps interior empties, matching Spark's regex
    * split; same 48-bit head-of-md5). The kernel streaming operators use
    * where the batch side runs the DataFrame aggregation. */
  def shingleHashesOf(text: String, n: Int): Seq[Long] = {
    if (text == null) return Seq.empty
    // Spark's trim() strips ASCII space 0x20 ONLY; Java String.trim strips
    // everything <= U+0020 (tabs, newlines) — a text starting with '\t'
    // would shingle differently here than in the DF spelling and silently
    // break the bit-identical-parity contract the streaming operators
    // depend on
    def trimSpaces(s: String): String = {
      var i = 0
      var j = s.length
      while (i < j && s.charAt(i) == ' ') i += 1
      while (j > i && s.charAt(j - 1) == ' ') j -= 1
      if (i == 0 && j == s.length) s else s.substring(i, j)
    }
    val toks = trimSpaces(text).split(" ", -1)
    if (toks.length < n) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(s: String): Long = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
        ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    }
    toks.sliding(n).map(g => h48(g.mkString(" "))).toSeq
  }

  def bandsOfText(text: String, numHashes: Int = 64,
      rowsPerBand: Int = 4): Seq[(Long, String)] = {
    require(numHashes > 0 && rowsPerBand > 0 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    val hs = shingleHashesOf(text, 3).toArray
    if (hs.isEmpty) return Seq.empty
    val sig = Array.tabulate(numHashes) { i =>
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = ((2L * i + 1) * hs(j) + 7919L * i) % MinhashMod
        if (v < m) m = v
        j += 1
      }
      m
    }
    val numBands = numHashes / rowsPerBand
    (0 until numBands).map { b =>
      val s = (0 until rowsPerBand)
        .map(r => sig(b * rowsPerBand + r).toString).mkString(",")
      (b.toLong, org.apache.commons.codec.digest.DigestUtils.md5Hex(s))
    }
  }

  /** Benchmark decontamination: ids of corpus documents sharing at least
    * one word n-gram with ANY benchmark document — training-data hygiene,
    * dropping pretraining docs that leak evaluation content. The benchmark
    * index (distinct 48-bit shingle hashes of a small eval set) is
    * broadcast; the corpus side left-semi-joins against it, so corpus text
    * never shuffles and the corpus-side cost is one narrow hash pass. */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val bench = shingleIndexRaw(benchmark, idCol, textCol, n)
      .select(md5Int48(col("s")).as("h")).distinct()
    shingleIndexRaw(corpus, idCol, textCol, n)
      .select(col("doc_id"), md5Int48(col("s")).as("h"))
      .join(broadcast(bench), Seq("h"), "left_semi")
      .select("doc_id").distinct()
  }

  /** As [[contaminatedIds]], but with a Bloom-sketch prefilter — the shape
    * for when the benchmark n-gram index outgrows a broadcast. The exact
    * variant broadcasts the full distinct-hash index (8 bytes/n-gram: a
    * 1B-n-gram eval suite is an 8 GB broadcast — dead on arrival); here the
    * index is folded into a fixed-size Bloom filter by one partial
    * aggregating pass (only the sketch ever reaches the driver), the corpus
    * probes it with Spark's codegen'd `might_contain` (a narrow scan-side
    * filter, no shuffle), and only the surviving ~fpp fraction of corpus
    * shingles flows into an exact shuffle semi-join that removes the false
    * positives. Results are therefore IDENTICAL to `contaminatedIds` — the
    * sketch only prunes work, never decides membership — which is what the
    * gate query verifies against the exact DuckDB oracle.
    *
    * The probe reuses Catalyst's runtime-filter expressions
    * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
    * behind `spark.sql.optimizer.runtime.bloomFilter`), so the probe stays
    * inside whole-stage codegen; they are constructed directly because
    * Spark registers neither as a public SQL function.
    *
    * `bloomBits` sizes the sketch (default 2^23 bits = 1 MiB ≈ 1% fp at a
    * million items); `expectedItems` only seeds the hash-count heuristic. */
  def contaminatedIdsBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      expectedItems: Long = 1L << 20, bloomBits: Long = 1L << 23): DataFrame = {
    // materialize the index once: the bloom build is its own action and the
    // confirm join is another — without this the index's distinct shuffle
    // runs twice (the index is big by premise; it stays on the executors)
    val bench = benchmarkIndex(benchmark, idCol, textCol, n).localCheckpoint()
    val corpusH = shingleIndexRaw(corpus, idCol, textCol, n)
      .select(col("doc_id"), md5Int48(col("s")).as("h"))
    indexBloom(bench, expectedItems, bloomBits) match {
      case None =>  // empty benchmark → empty bloom → nothing contaminated
        corpusH.select("doc_id").where(lit(false))
      case Some(bytes) =>
        // The confirm join is deliberately NOT broadcast: at the scale this
        // variant exists for, `bench` doesn't fit an executor; the join is a
        // plain shuffle semi-join whose probe side the bloom already cut to
        // ~fpp·|corpus shingles| (AQE will still broadcast small cases).
        corpusH.where(bloomProbe(bytes, col("h")))
          .join(bench, Seq("h"), "left_semi")
          .select("doc_id").distinct()
    }
  }

  /** The clean corpus: `corpus` minus every document sharing an n-gram
    * with the benchmark — the call a pipeline actually makes (the
    * `contaminatedIds*` operators return the flagged side). `bloom = true`
    * switches to the sketch-prefiltered variant for benchmarks whose
    * n-gram index outgrows a broadcast; results are identical either way. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      bloom: Boolean = false): DataFrame = {
    val flagged =
      if (bloom) contaminatedIdsBloom(corpus, benchmark, idCol, textCol, n)
      else contaminatedIds(corpus, benchmark, idCol, textCol, n)
    corpus.join(flagged.withColumnRenamed("doc_id", "_contaminated_id"),
      col(idCol) === col("_contaminated_id"), "left_anti")
  }

  /** Contamination REPORT per affected document — the decontamination
    * counterpart of diff statistics: how many of the document's distinct
    * n-grams appear in the benchmark, plus an integer severity flag
    * (>5 % overlap ⇔ 20·shared > total — cross-multiplied so no float
    * exists to drift between engines). Same broadcast-index plan shape as
    * `contaminatedIds`; only flagged docs are emitted. */
  def contaminationScores(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val bench = benchmarkIndex(benchmark, idCol, textCol, n)
    shingleIndex(corpus, idCol, textCol, n)
      .select(col("doc_id"), md5Int48(col("s")).as("h"))
      .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .where(col("n_shared") > 0)
      .withColumn("flag_heavy", col("n_shared") * 20 > col("n_ngrams"))
  }

  /** Distinct 48-bit shingle hashes of a benchmark/eval set — the exact
    * membership index both decontamination variants confirm against. */
  def benchmarkIndex(benchmark: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    shingleIndexRaw(benchmark, idCol, textCol, n)
      .select(md5Int48(col("s")).as("h")).distinct()

  /** Fold a Long-hash index into a serialized Bloom sketch via one partial
    * aggregating pass — only the fixed-size sketch reaches the driver.
    * None when the index is empty (the aggregate yields no filter). */
  def indexBloom(index: DataFrame, expectedItems: Long = 1L << 20,
      bloomBits: Long = 1L << 23): Option[Array[Byte]] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    // BloomFilterAggregate Math.min-clamps its sizing against the session's
    // runtime-bloom-filter maxima (4M items / 2^26 bits by default) — an
    // oversized request would SILENTLY saturate the sketch and the prefilter
    // would prune ~nothing (results stay correct via the confirm join, but
    // the perf contract vanishes). Fail loudly instead, naming the confs.
    val conf = index.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && bloomBits <= maxBits,
      s"indexBloom sized past the session's bloom-filter maxima " +
        s"(expectedItems=$expectedItems vs max $maxItems, bloomBits=$bloomBits vs " +
        s"max $maxBits): BloomFilterAggregate would silently clamp and the sketch " +
        "would saturate. Raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems / " +
        ".maxNumBits to the requested size first.")
    val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(col("h")),
      Literal(expectedItems), Literal(bloomBits)).toAggregateExpression())
    Option(index.agg(bloomAgg.as("bf")).head.getAs[Array[Byte]]("bf"))
  }

  /** Codegen'd membership probe of a serialized Bloom sketch (Catalyst's
    * `might_contain`, constructed directly — Spark registers it for its
    * runtime-filter rule, not as a public function). `h` must be a Long. */
  def bloomProbe(bloomBytes: Array[Byte], h: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), ColumnBridge.expression(h)))
  }

  /** Connected components over an undirected pair list — the step after
    * candidate generation (LSH/Jaccard) that turns near-dup PAIRS into
    * dedup GROUPS: each doc gets the minimum doc id reachable from it, the
    * group's canonical representative.
    *
    * Iterative min-label propagation: each round joins labels to the
    * (symmetrized) edge list and takes the per-vertex min over self +
    * neighbors, converging in ≤ graph-diameter rounds. Near-dup graphs are
    * shallow (dup clusters are cliques or short chains), so a handful of
    * rounds suffices; every round is one equi-join + one aggregation, all
    * shuffle-partitionable. `localCheckpoint` bounds lineage so the plan
    * does not grow with iterations. (For adversarially deep graphs swap in
    * the large-star/small-star variant; the round structure is identical.)
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50, localThreshold: Long = 4000000L): DataFrame = {
    // Materialize the pair list ONCE up front: it is the (small) output of
    // an expensive candidate-generation pipeline, and everything below
    // would otherwise re-evaluate that lineage per round.
    val p = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint(true)
    if (p.count() <= localThreshold) return localComponents(p)
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val neighborMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      val next = labels.join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      converged = next.where(col("comp") =!= col("old")).limit(1).count() == 0
      labels = next.select("id", "comp")
      round += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          "(graph diameter exceeds maxRounds — raise it, or pre-contract with large-star/small-star)")
    labels
  }

  /** Driver-side union-find for pair lists under the locality threshold.
    * LSH/Jaccard candidate pairs are the PRUNED output of near-dup search —
    * tiny relative to the corpus — so below a few million edges an
    * O(E·α(E)) union-find beats scheduling O(diameter) distributed rounds.
    * The same cutoff idea as the reference's bisection_threshold: small
    * enough → download and finish locally (hashdiff_tables.py:19,236). */
  private def localComponents(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    p.as[(Long, Long)].collect().foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = parent.keys.toSeq.map(v => (v, find(v))).sortBy(_._1)
    out.toDF("id", "comp")
  }

  /** Corpus-overlap estimation from KMV (k-minimum-values) sketch set
    * algebra (Beyer et al., "On Synopses for Distinct-Value Estimation
    * Under Multiset Operations", SIGMOD'07): keep each corpus's k smallest
    * distinct 48-bit shingle hashes; the merged bottom-k is a valid sketch
    * of the UNION, and the fraction ρ/k of its members present in both
    * input sketches estimates Jaccard — so |A∪B| ≈ (k−1)·2^48/h_k and
    * |A∩B| ≈ J·|A∪B|, all from two k-row synopses.
    *
    * This is the 100 TB shape for "how much do these corpora overlap":
    * each side costs one linear scan into a map-side partial bottom-k
    * (TakeOrderedAndProject — no full sort, no shuffle of the element
    * stream beyond the hash-distinct), the sketches are k rows each, and
    * every set operation happens on sketches. The exact alternative — a
    * distinct-shingle join across corpora — shuffles BOTH full shingle
    * sets; this never moves more than 2k rows after the scans. Hashes are
    * md5-derived, so the estimates are deterministic and any engine
    * reproduces them bit for bit. */
  def kmvOverlap(a: DataFrame, b: DataFrame, idCol: String, textCol: String,
      k: Int = 256, n: Int = 3): DataFrame = {
    def sketch(df: DataFrame) =
      shingleIndexRaw(df, idCol, textCol, n)
        .select(md5Int48(col("s")).as("h")).distinct()
        .orderBy(col("h").asc).limit(k)
    val ska = sketch(a).withColumn("in_a", lit(1))
    val skb = sketch(b).withColumn("in_b", lit(1))
    // ≤2k rows from here on: the union sketch is the bottom-k of the merge
    val merged = ska.join(skb, Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("in_a"), lit(0)).as("in_a"),
        coalesce(col("in_b"), lit(0)).as("in_b"))
      .orderBy(col("h").asc).limit(k)
    // KMV rule: an UNSATURATED union sketch (k_used < k) holds the entire
    // distinct union, so the exact count is already in hand — applying
    // the (k−1)·U/h_k estimator there replaces an exactly-knowable answer
    // with sampling noise (at 75 union shingles whose hashes happen to
    // cluster low, the estimator can be 2× off).
    val unionEst = when(col("k_used") < k, col("k_used").cast("double"))
      .otherwise((col("k_used") - 1).cast("double") * lit(281474976710656.0)
        / col("hk").cast("double"))
    val jacc = col("rho").cast("double") / col("k_used").cast("double")
    merged.agg(
        count(lit(1)).as("k_used"), max(col("h")).as("hk"),
        sum(col("in_a") * col("in_b")).as("rho"))
      .select(col("k_used"), col("hk"), col("rho"),
        unionEst.as("union_est"), jacc.as("jaccard_est"),
        (jacc * unionEst).as("inter_est"))
  }

  /** 48-bit SimHash per document over distinct whitespace tokens. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 48): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
      .groupBy("doc_id")
      .agg(graft.functions.SimhashBits.simhash(md5Int48(col("tok")), bits).as("simhash"))

  /** The explode spelling of [[simhash]] — |tokens|·bits rows through two
    * exchanges where the [[graft.functions.SimhashBits]] aggregate ships
    * one bits-long counter buffer per doc; kept as the parity-spec
    * reference. */
  def simhashExplode(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 48): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val bitSums = toks
      .withColumn("h", md5Int48(col("tok")))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("i"))
      .withColumn("sign", when(expr("(shiftright(h, i) & 1) = 1"), 1L).otherwise(-1L))
      .groupBy("doc_id", "i").agg(sum(col("sign")).as("s"))
    bitSums.groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), i)")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs via the pigeonhole block join (Manku et al.
    * 2007, "Detecting Near-Duplicates for Web Crawling"): split each
    * `bits`-bit signature into `maxHamming + 1` equal blocks — any pair
    * within Hamming distance `maxHamming` differs in at most `maxHamming`
    * blocks, so it AGREES on at least one; bucket-join on (block index,
    * block value) and confirm candidates with the exact
    * `bit_count(a ^ b)`. EXACT, not approximate: the pigeonhole bound
    * guarantees recall 1.0, and the confirm filter removes the block-
    * collision false positives. Scale shape: each doc fans out to
    * `maxHamming + 1` narrow rows, the self-join shuffles on 12-bit-ish
    * block values (AQE-splittable when one block value is hot), candidate
    * volume is bounded by block-collision density — the O(n²) all-pairs
    * Hamming scan never happens. Output: (doc_a, doc_b, hamming), one row
    * per confirmed pair. */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 48): DataFrame =
    hammingNearDup(simhash(df, idCol, textCol, bits), "doc_id", "simhash",
      maxHamming, bits)

  /** The pigeonhole block join over ANY integer-signature column (the
    * back half of [[simhashNearDup]], shared with the perceptual image
    * dedup's dHashes): exact Hamming-≤`maxHamming` pairs without the
    * O(n²) all-pairs scan — see [[simhashNearDup]]'s scaladoc for the
    * bound and plan shape. Output: (doc_a, doc_b, hamming). */
  def hammingNearDup(sig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, bits: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    require(maxHamming >= 0 && bits % nBlocks == 0,
      s"hammingNearDup needs bits divisible by maxHamming+1, got $bits/$nBlocks")
    val w = bits / nBlocks
    require(w < 64, s"block width must be < 64 bits, got $w")
    val blocks = sig
      .select(col(idCol).as("doc_id"), col(sigCol).as("sg"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("bval", expr(s"shiftright(sg, blk * $w) & ${(1L << w) - 1}"))
    val a = blocks.select(col("blk"), col("bval"),
      col("doc_id").as("doc_a"), col("sg").as("sig_a"))
    val b = blocks.select(col("blk"), col("bval"),
      col("doc_id").as("doc_b"), col("sg").as("sig_b"))
    a.join(b, Seq("blk", "bval"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .distinct() // a pair agreeing on several blocks matches once
      .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Incremental Hamming pairing — the delta-refresh form of
    * [[hammingNearDup]], same economics as `deltaMinhashCandidates`: only
    * the DELTA's signatures block-join against the stored index
    * signatures and each other; the index×index quadrant (10⁶× the work
    * at a 0.1% refresh) is never computed. Pair-identical to the full
    * operator over index ∪ delta restricted to delta-involving pairs
    * (spec-pinned). Ids must be disjoint between the two sides. */
  def deltaHammingNearDup(indexSig: DataFrame, deltaSig: DataFrame,
      idCol: String, sigCol: String, maxHamming: Int, bits: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    require(maxHamming >= 0 && bits % nBlocks == 0,
      s"deltaHammingNearDup needs bits divisible by maxHamming+1, got $bits/$nBlocks")
    val w = bits / nBlocks
    require(w < 64, s"block width must be < 64 bits, got $w")
    def blocksOf(df: DataFrame) = df
      .select(col(idCol).as("doc_id"), col(sigCol).as("sg"),
        explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"))
      .withColumn("bval", expr(s"shiftright(sg, blk * $w) & ${(1L << w) - 1}"))
    val di = blocksOf(deltaSig)
    val both = blocksOf(indexSig).unionByName(di)
    // delta side A × (index ∪ delta) side B: every emitted pair involves
    // ≥1 delta id; doc_a < doc_b dedups the delta×delta quadrant's
    // mirror, and index-side ids appear on either side of the ordering
    val a = di.select(col("blk"), col("bval"),
      col("doc_id").as("doc_a"), col("sg").as("sig_a"))
    val b = both.select(col("blk"), col("bval"),
      col("doc_id").as("doc_b"), col("sg").as("sig_b"))
    val fwd = col("doc_a") < col("doc_b")
    a.join(b, Seq("blk", "bval"))
      .where(col("doc_a") =!= col("doc_b"))
      // normalize pair order WITH the signatures riding along — a
      // delta×delta pair is found from both directions and must collapse
      // to one row under the distinct
      .select(
        when(fwd, col("doc_a")).otherwise(col("doc_b")).as("doc_a"),
        when(fwd, col("doc_b")).otherwise(col("doc_a")).as("doc_b"),
        when(fwd, col("sig_a")).otherwise(col("sig_b")).as("sig_a"),
        when(fwd, col("sig_b")).otherwise(col("sig_a")).as("sig_b"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as bigint)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
