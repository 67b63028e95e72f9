package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.api.Graft
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.streaming.StreamingDiff

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different text with other words entirely"),
    (3L, "the quick brown fox jumps over the lazy dog")   // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups duplicates under min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .where(col("n_copies") > 1).collect()
    assert(g.length == 1 && g(0).getLong(1) == 0L && g(0).getLong(2) == 2L)
  }

  test("normalized dedup groups case/punctuation variants together") {
    val v = Seq(
      (0L, "Hello, World!"), (1L, "hello  world"), (2L, "HELLO WORLD."),
      (3L, "different")).toDF("doc_id", "text")
    val g = Dedup.normalizedExactGroups(v, "doc_id", "text")
      .where(col("n_copies") > 1).collect()
    assert(g.length == 1 && g(0).getLong(1) == 0L && g(0).getLong(2) == 3L)
  }

  test("SimhashBits aggregate is bit-identical to the explode spelling") {
    val rnd = new scala.util.Random(11L)
    val vocab = Vector("a", "b", "c", "dd", "ee", "fff", "gg", "hh", "iii", "jj")
    def text() = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0L until 80L).map(i => (i, text())).toDF("doc_id", "text")
      .repartition(7) // partial buffers must merge across partitions
    val fast = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val ref = Dedup.simhashExplode(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fast == ref)
  }

  test("simhashNearDup equals the brute-force all-pairs Hamming join") {
    // random docs over a tiny vocab so near-identical token SETS (and so
    // low-Hamming simhash pairs) occur naturally; exact dups give d = 0
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def text() = Seq.fill(4 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val data = (0L until 40L).map(i => (i, text())) ++ Seq((100L, "a b c"), (101L, "a b c"))
    val df = data.toDF("doc_id", "text")
    val got = Dedup.simhashNearDup(df, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(got == brute)
    assert(got.contains((100L, 101L, 0L)), "exact dup pair must appear at d=0")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(df, "doc_id", "text", maxHamming = 4) // 48 % 5 != 0
    }
  }

  test("fuzz: hammingNearDup and its delta form agree with brute force") {
    val rnd = new scala.util.Random(43L)
    for (round <- 1 to 8) {
      // clustered signatures so low-Hamming pairs actually occur: a few
      // 48-bit anchors, most sigs are an anchor with 0-5 bits flipped
      val anchors = Array.fill(4)(rnd.nextLong() & ((1L << 48) - 1))
      val sigs = (0L until 60L).map { i =>
        var s = anchors(rnd.nextInt(anchors.length))
        (0 until rnd.nextInt(6)).foreach(_ => s ^= 1L << rnd.nextInt(48))
        (i, s)
      }
      val df = sigs.toDF("doc_id", "sig")
      val got = Dedup.hammingNearDup(df, "doc_id", "sig", maxHamming = 3, bits = 48)
        .as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h.toLong)).toSet
      assert(got == brute, s"round $round")
      // delta form: ids >= 40 are the refresh — identical to the full
      // operator restricted to delta-involving pairs, no dup rows
      val idx = sigs.filter(_._1 < 40L).toDF("doc_id", "sig")
      val delta = sigs.filter(_._1 >= 40L).toDF("doc_id", "sig")
      val gotDelta = Dedup.deltaHammingNearDup(idx, delta, "doc_id", "sig",
        maxHamming = 3, bits = 48)
        .as[(Long, Long, Long)].collect()
      assert(gotDelta.length == gotDelta.toSet.size, s"round $round: dup rows")
      assert(gotDelta.toSet == brute.filter(p => p._1 >= 40L || p._2 >= 40L),
        s"round $round delta")
    }
  }

  test("deltaMinhashCandidates equals the full LSH restricted to delta pairs") {
    // index: 3 docs (0 ≈ 1 near-dups, 2 distinct). delta: 10 is a copy of
    // 0 (cross-quadrant hit), 11/12 are copies of each other but nothing
    // in the index (within-delta hit), 13 matches nothing.
    val index = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "completely different text with other words entirely")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "sphinx of black quartz judge my vow now"),
      (12L, "sphinx of black quartz judge my vow now"),
      (13L, "unrelated singleton content nothing shares this")).toDF("doc_id", "text")
    val got = Dedup.deltaMinhashCandidates(index, delta, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val deltaIds = Set(10L, 11L, 12L, 13L)
    val full = Dedup.minhashCandidates(index.unionByName(delta), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
      .filter(p => deltaIds(p._1) || deltaIds(p._2))
    assert(got == full)
    assert(got.map(p => (p._1, p._2)).contains((0L, 10L)))
    assert(got.map(p => (p._1, p._2)).contains((11L, 12L)))
    assert(!got.exists(p => !deltaIds(p._1) && !deltaIds(p._2)))
  }

  test("jaccard pairs find near-dups and exact dups") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))  // identical → jaccard 1.0
    assert(pairs.contains((0L, 1L)))  // one word differs → high overlap
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash LSH surfaces the exact dup with all bands shared") {
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(cand((0L, 3L)) == 16L) // identical docs share all 16 bands
    assert(!cand.contains((0L, 2L)))
  }

  test("kmvOverlap with k >= universe degenerates to exact set counts") {
    // when both sketches hold their ENTIRE shingle set, k_used is the true
    // |A ∪ B|, rho the true |A ∩ B|, and jaccard_est the exact Jaccard
    val a = docs.where(col("doc_id") =!= 2L) // shingles of docs 0/1/3
    val b = docs.where(col("doc_id") >= 1L)  // shingles of docs 1/2/3
    val r = Dedup.kmvOverlap(a, b, "doc_id", "text", k = 10000).head()
    def shingleSet(df: org.apache.spark.sql.DataFrame) =
      Dedup.shingleIndex(df, "doc_id", "text").select("s").as[String].collect()
        .toSet
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    assert(r.getAs[Long]("k_used") == (sa ++ sb).size.toLong)
    assert(r.getAs[Long]("rho") == (sa intersect sb).size.toLong)
    assert(r.getAs[Double]("jaccard_est") ==
      (sa intersect sb).size.toDouble / (sa ++ sb).size)
    // inter_est = jaccard * union_est by construction
    assert(math.abs(r.getAs[Double]("inter_est") -
      r.getAs[Double]("jaccard_est") * r.getAs[Double]("union_est")) < 1e-9)
    // KMV rule: unsaturated sketch → the union estimate IS the exact
    // count, not the (k−1)·U/h_k extrapolation (which at this sample size
    // can be 2× off an exactly-knowable answer)
    assert(r.getAs[Double]("union_est") == (sa ++ sb).size.toDouble)
  }

  test("kmvOverlap at small k estimates within sketch error on a real corpus") {
    val base = (0L until 400L).map(i => (i, s"token$i alpha$i beta$i gamma$i delta$i"))
    val df = base.toDF("doc_id", "text")
    val a = df.where(col("doc_id") < 300L)   // 300 docs × 3 shingles, unique
    val b = df.where(col("doc_id") >= 100L)  // overlap: docs 100..299
    val r = Dedup.kmvOverlap(a, b, "doc_id", "text", k = 256).head()
    // true: |A|=900, |B|=900, |∩|=600, |∪|=1200, J=0.5
    assert(r.getAs[Long]("k_used") == 256L)
    val j = r.getAs[Double]("jaccard_est")
    assert(j > 0.35 && j < 0.65, s"jaccard_est $j far from 0.5")
    val u = r.getAs[Double]("union_est")
    assert(u > 800 && u < 1800, s"union_est $u far from 1200")
  }

  test("simhash: identical docs equal, near-dups close in Hamming distance") {
    val h = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(1L)) < ham(h(0L), h(2L)))
  }

  test("bloom decontamination matches the exact operator on real data") {
    val dd = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = dd.where(col("doc_id") >= 10)
    val bench = dd.where(col("doc_id") < 10)
    val exact = Dedup.contaminatedIds(corpus, bench, "doc_id", "text", n = 4)
      .as[Long].collect().toSet
    val bloom = Dedup.contaminatedIdsBloom(corpus, bench, "doc_id", "text", n = 4)
      .as[Long].collect().toSet
    assert(exact.nonEmpty, "fixture produced no contamination — test is vacuous")
    assert(bloom == exact)
  }

  test("fuzz: bloom decontamination agrees with exact on random corpora") {
    // small vocab forces heavy shingle collisions; tiny bloom (2^12 bits)
    // forces real false positives so the confirm join actually earns its
    // keep — with it, agreement must still be exact
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (round <- 1 to 3) {
      val all = (0L until 120L).map(i =>
        (i, Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val bench = all.where(col("doc_id") < 15)
      val corpus = all.where(col("doc_id") >= 15)
      val exact = Dedup.contaminatedIds(corpus, bench, "doc_id", "text", n = 3)
        .as[Long].collect().toSet
      val bloom = Dedup.contaminatedIdsBloom(corpus, bench, "doc_id", "text", n = 3,
        expectedItems = 64, bloomBits = 1L << 12)
        .as[Long].collect().toSet
      assert(bloom == exact, s"round $round: bloom=$bloom exact=$exact")
    }
  }

  test("bloom decontamination with an empty benchmark flags nothing") {
    val dd = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Dedup.contaminatedIdsBloom(
      dd, dd.where(lit(false)), "doc_id", "text", n = 4)
    assert(out.count() == 0L)
  }

  test("indexBloom refuses sizes past the session bloom-filter maxima instead of silently clamping") {
    // BloomFilterAggregate Math.min-clamps to the session maxima (2^26 bits
    // by default) — a 2^30-bit request would build a saturated sketch that
    // prunes nothing. The guard must name the conf to raise.
    val idx = Seq(1L, 2L, 3L).toDF("h")
    val e = intercept[IllegalArgumentException] {
      Dedup.indexBloom(idx, expectedItems = 1L << 20, bloomBits = 1L << 30)
    }
    assert(e.getMessage.contains("bloomFilter.maxNumItems"))
    // at the documented defaults the build still works
    assert(Dedup.indexBloom(idx).nonEmpty)
  }
}

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._
  import graft.operators.CurationQueries

  test("chunkWindows covers every token exactly at stride boundaries") {
    // lengths around the window/stride edges: < w (1 chunk), == w (1),
    // w+1 (2: second starts at stride), exactly 2 strides + w (3)
    val docs = Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" ")),    // 5 tokens
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")),   // == w
      (3L, (1 to 33).map(i => s"t$i").mkString(" ")),   // w+1
      (4L, (1 to 80).map(i => s"t$i").mkString(" ")))   // 1+ceil(48/24)=3 chunks
      .toDF("doc_id", "text")
    val got = CurationQueries.chunkWindows(docs, "doc_id", "text")
      .select("doc_id", "chunk_idx", "n_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 5L),
      (2L, 0L, 32L),
      (3L, 0L, 32L), (3L, 1L, 9L),               // second window: tokens 25..33
      (4L, 0L, 32L), (4L, 1L, 32L), (4L, 2L, 32L))) // 48+stride*2 = tokens 49..80
  }

  test("chunkWindows emits one chunk for degenerate single-token text") {
    val got = CurationQueries.chunkWindows(
      Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
      .select("chunk_idx", "n_tokens").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("packSequences assigns packs by global token prefix, invariant to partitioning") {
    // budget 10; rows in (doc_id) order with token counts 4,4,4,3,10:
    // cum_before = 0,4,8,12,15 → packs 0,0,0,1,1 offsets 0,4,8,2,5
    val chunks = Seq((1L, 0L, 4L), (2L, 0L, 4L), (3L, 0L, 4L), (4L, 0L, 3L), (5L, 0L, 10L))
      .toDF("doc_id", "chunk_idx", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      CurationQueries.packSequences(df, Seq("doc_id", "chunk_idx"), "n_tokens", 10L)
        .select("doc_id", "pack_id", "pack_offset")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = Seq((1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 8L), (4L, 1L, 2L), (5L, 1L, 5L))
    assert(run(chunks) == want)
    // the prefix is GLOBAL: a different physical layout must not change it
    assert(run(chunks.repartition(7)) == want)
    assert(run(chunks.orderBy(col("doc_id").desc)) == want)
    // The totals collect and the prefix scan are separate executions; with a
    // live lineage each would re-run the range exchange with its OWN boundary
    // sampling — divergent partitionings under nondeterministic upstream order
    // ⇒ silently wrong offsets. packSequences pins ONE partitioning with an
    // eager localCheckpoint; the returned plan must be rooted at the
    // checkpointed LogicalRDD, not the live chain.
    val planStr = CurationQueries
      .packSequences(chunks.repartition(3), Seq("doc_id", "chunk_idx"), "n_tokens", 10L)
      .queryExecution.optimizedPlan.toString
    assert(planStr.contains("LogicalRDD"), planStr)
    intercept[IllegalArgumentException] {
      CurationQueries.packSequences(chunks, Seq("doc_id"), "n_tokens", 0L)
    }
  }

  test("dupPassageSpans finds cross-doc and within-doc repeats, merges runs") {
    // n=3 windows. doc 1 and doc 2 share the exact 5-token passage
    // "a b c d e" → windows (a b c),(b c d),(c d e): one run of 3 dup
    // windows each, longest span 3+2 = 5 tokens. doc 3 repeats "x y z"
    // INSIDE itself at two positions → both occurrences are dup windows,
    // but non-consecutive → 2 spans of length 3. doc 4 shares nothing.
    val docs = Seq(
      (1L, "a b c d e p q r s"),
      (2L, "m n a b c d e"),
      (3L, "x y z k1 k2 k3 x y z"),
      (4L, "u v w only here once")).toDF("doc_id", "text")
    val got = CurationQueries.dupPassageSpans(docs, "doc_id", "text", n = 3)
      .select("doc_id", "n_dup_windows", "n_spans", "longest_span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 1L, 5L),
      (2L, 3L, 1L, 5L),
      (3L, 2L, 2L, 3L)))
  }

  test("cutDupPassages removes exactly the covered tokens, keeps clean docs whole") {
    // n=3: docs 1/2 share "a b c d e" → all 5 tokens covered in both.
    // doc 1 keeps "p q r s"; doc 2 keeps "m n"; doc 3 is untouched;
    // doc 4 is shorter than the window → untouched by construction.
    val docs = Seq(
      (1L, "a b c d e p q r s"),
      (2L, "m n a b c d e"),
      (3L, "u v w only here once"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = CurationQueries.cutDupPassages(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    def sig(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got == Set(
      (1L, 9L, 4L, sig("p q r s")),
      (2L, 7L, 2L, sig("m n")),
      (3L, 6L, 6L, sig("u v w only here once")),
      (4L, 2L, 2L, sig("a b"))))
  }

  test("cutDupPassages signs a fully-cut document as the empty stream") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val got = CurationQueries.cutDupPassages(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 0L, "d41d8cd98f00b204e9800998ecf8427e"),
      (2L, 0L, "d41d8cd98f00b204e9800998ecf8427e")))
  }

  test("dupPassageSpans ignores docs shorter than the window") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(CurationQueries.dupPassageSpans(docs, "doc_id", "text", n = 3).count() == 0L)
  }

  test("fuzz: passage span/cut operators agree with a brute-force reference") {
    val rnd = new scala.util.Random(1234L)
    val vocab = Vector("a", "b", "c", "d") // tiny vocab → dense collisions
    val n = 3
    def md5hex(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    for (trial <- 0 until 4) {
      val docs = (0L until 25L).map(i =>
        (i, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val toksBy = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val wins = for ((id, tk) <- toksBy.toSeq; p <- 0 to tk.length - n)
        yield (id, p, tk.slice(p, p + n).mkString(" "))
      val freq = wins.groupBy(_._3).map { case (w, g) => w -> g.size }
      val dup = wins.filter(w => freq(w._3) > 1)
      val spansExp = dup.groupBy(_._1).map { case (id, ws) =>
        val runs = ws.map(_._2).sorted.foldLeft(List.empty[List[Int]]) { (acc, p) =>
          acc match {
            case (h @ (hp :: _)) :: t if p == hp + 1 => (p :: h) :: t
            case _ => List(p) :: acc
          }
        }.map(_.size)
        (id, ws.size.toLong, runs.size.toLong, (runs.max + n - 1).toLong)
      }.toSet
      val df = docs.toDF("doc_id", "text")
      val gotSpans = CurationQueries.dupPassageSpans(df, "doc_id", "text", n)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(gotSpans == spansExp, s"trial $trial spans")
      val covered = dup.flatMap { case (id, p, _) => (p until p + n).map(id -> _) }.toSet
      val cutExp = toksBy.map { case (id, tk) =>
        val kept = tk.zipWithIndex.collect { case (t, i) if !covered((id, i)) => t }
        (id, tk.length.toLong, kept.length.toLong, md5hex(kept.mkString(" ")))
      }.toSet
      val gotCut = CurationQueries.cutDupPassages(df, "doc_id", "text", n)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(gotCut == cutExp, s"trial $trial cut")
      assert(spansExp.nonEmpty, s"vacuous trial $trial") // tiny vocab guarantees dups
    }
  }

  test("chunkWindows refuses a stride that would skip or loop") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    for ((w, stride) <- Seq((32, 33), (32, 0), (32, -1), (0, 1))) {
      val e = intercept[IllegalArgumentException] {
        CurationQueries.chunkWindows(docs, "doc_id", "text", w = w, stride = stride)
      }
      assert(e.getMessage.contains("stride"), s"w=$w stride=$stride")
    }
  }

  test("quality classifier: broadcast-table path equals the pure-function spelling") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "delta"),
      (3L, "zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    def q(name: String) = graft.operators.TextQueries.queries(name)
    // independent spelling: weight computed inline per token (no table,
    // no join) — must agree with the broadcast-dim-join operator exactly
    val bucket = pmod(Dedup.md5Int48(col("tok")), lit(1024))
    val w = pmod(Dedup.md5Int48(concat(lit("w|"), bucket.cast("string"))), lit(201)) - 100
    val want = docs
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("tok"))
      .select(col("doc_id"), w.as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("w").as("logit"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // run the real operator over a parquet copy shaped like `documents`
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = q("q_quality_classifier")(spark, dir)
      .select("doc_id", "n_tokens", "logit_centi", "avg_millilogit", "flag_keep")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 3)
    got.foreach { case (id, n, logit, avg, keep) =>
      val (wn, wl) = want(id)
      assert(n == wn && logit == wl, s"doc $id")
      // shifted-numerator average: floor((logit+100n)*10/n) - 1000, and the
      // numerator is non-negative by w >= -100 — same value in any engine
      assert(avg == ((logit + 100 * n) * 10) / n - 1000, s"doc $id avg")
      assert(keep == (logit > 0), s"doc $id flag")
    }
  }

  test("quality classifier accepts a supplied (trained) weight table") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    // a "checkpoint" where every bucket weighs +7 → logit = 7 · n_tokens
    val wtab = spark.range(0, 1024).toDF("bucket").withColumn("w", lit(7L))
    val got = graft.operators.TextQueries
      .qualityClassifier(docs, "doc_id", "text", weights = Some(wtab))
      .select("doc_id", "n_tokens", "logit_centi", "flag_keep")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((2L, 14L, true)), 2L -> ((1L, 7L, true))))
  }

  test("audio hash refuses samples that cannot fill the window grid") {
    import spark.implicits._
    val tiny = Seq(Multimodal.MediaRow(1L, "audio/wav",
      Multimodal.WavCodec.encodeWav(Array.fill(10)(100), 8000f))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.ahashAudio(tiny).collect() // 10 samples < 49 windows
    }
    assert(e.getMessage.contains("windows") ||
      e.getCause != null && e.getCause.getMessage.contains("windows"))
  }

  test("train shuffle: per-epoch deterministic permutation, contiguous shard seqs") {
    val docs = (0L until 64L).map(i => (i, s"tok$i"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ts").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = CurationQueries.queries("q_train_shuffle")(spark, dir)
      .select("epoch", "shard", "seq", "doc_id", "sort_key")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val a = run()
    // deterministic: identical on re-run (rand() would not be)
    assert(a == run())
    // each document appears exactly once per epoch
    assert(a.groupBy(_._1).forall(_._2.map(_._4).sorted == (0L until 64L)))
    // shard is the sort key mod 16; seq is 1..count contiguous per shard
    a.foreach { case (_, shard, _, _, key) => assert(shard == key % 16) }
    a.groupBy(r => (r._1, r._2)).values.foreach { g =>
      assert(g.map(_._3).sorted == (1L to g.length))
      // within a shard, seq follows ascending sort_key
      assert(g.sortBy(_._3).map(_._5) == g.map(_._5).sorted)
    }
    // epochs are DIFFERENT permutations (salt changes the hash)
    val byEpoch = a.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._2, r._3)).map(_._4)).toMap
    assert(byEpoch(0L) != byEpoch(1L))
  }

  test("writeTrainShards: one sorted file per shard, ordering matches trainShuffle") {
    val docs = (0L until 48L).map(i => (i, s"payload$i")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("shards").toString + "/export"
    CurationQueries.writeTrainShards(docs, "doc_id", out, nEpochs = 2, nShards = 4)
    // exactly one parquet file per (epoch, shard) directory
    for (e <- 0 to 1; s <- 0 to 3) {
      val dir = new java.io.File(s"$out/epoch=$e/shard=$s")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"epoch=$e shard=$s: ${dir.listFiles().toSeq}")
      // file order IS the permutation order: reading the single file split
      // yields rows as written
      val rows = spark.read.parquet(files(0).getPath)
        .select("sort_key", "doc_id").as[(Long, Long)].collect().toSeq
      assert(rows == rows.sortBy(r => (r._1, r._2)), s"epoch=$e shard=$s unsorted")
      assert(rows.forall(_._1 % 4 == s), s"epoch=$e shard=$s wrong shard members")
    }
    // the written corpus is complete per epoch and matches trainShuffle's
    // assignment
    val back = spark.read.parquet(out)
    assert(back.count() == 96)
    val fromOp = CurationQueries.trainShuffle(docs, "doc_id", nEpochs = 2, nShards = 4)
      .select("epoch", "shard", "doc_id").as[(Long, Long, Long)].collect().toSet
    val written = back.select(col("epoch").cast("long"), col("shard").cast("long"),
      col("doc_id")).as[(Long, Long, Long)].collect().toSet
    assert(written == fromOp)
  }

  test("pack efficiency: padded-vs-packed arithmetic on a hand-computed corpus") {
    // token counts 5, 32, 33, 80 → padded seqs 1+1+2+3 = 7, total 150,
    // padding 7*32-150 = 74, util 150*100 div 224 = 66, packed ceil = 5
    val docs = Seq(
      (1L, (1 to 5).map("t" + _).mkString(" ")),
      (2L, (1 to 32).map("t" + _).mkString(" ")),
      (3L, (1 to 33).map("t" + _).mkString(" ")),
      (4L, (1 to 80).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pe").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.queries("q_pack_efficiency")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((4L, 150L, 7L, 74L, 66L, 5L)))
  }
}

class EventsAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ev").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val day = 86400L
    val rows = Seq(
      // user 1: full strict-order funnel, active days 0 and 8
      (1L, ts(100), 1L, "view", 1.0, "{}"),
      (2L, ts(200), 1L, "click", 1.0, "{}"),
      (3L, ts(300), 1L, "purchase", 1.0, "{}"),
      (4L, ts(8 * day + 10), 1L, "error", 1.0, "{}"),
      // user 2: click BEFORE first view only → stage 1; active days 0, 20
      (5L, ts(100), 2L, "click", 1.0, "{}"),
      (6L, ts(200), 2L, "view", 1.0, "{}"),
      (7L, ts(20 * day + 10), 2L, "error", 1.0, "{}"),
      // user 3: view→click ordered, purchase BEFORE the click → stage 2
      (8L, ts(100), 3L, "view", 1.0, "{}"),
      (9L, ts(150), 3L, "click", 1.0, "{}"),
      (10L, ts(120), 3L, "purchase", 1.0, "{}"),
      // user 4: never views → not in the funnel at all
      (11L, ts(100), 4L, "purchase", 1.0, "{}"),
      // user 5: first seen day 7 (cohort week 1), active again day 15
      (12L, ts(7 * day + 10), 5L, "error", 1.0, "{}"),
      (13L, ts(15 * day + 10), 5L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("funnel counts strict first-occurrence ordering only") {
    val got = graft.operators.RelationalQueries.queries("q_funnel")(spark, dir)
      .select("stage", "funnel_step", "n_users")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 3L),
      (2L, "view>click", 2L),
      (3L, "view>click>purchase", 1L)))
  }

  test("funnel plans one scan and one data-sized exchange regardless of stage count") {
    // the chained-join spelling scanned events O(stages²) times (audited:
    // 6 scans / 11 exchanges for 3 stages); the window-cascade spelling
    // must stay at ONE scan + the user hash partition + the final
    // single-partition of per-stage partial counts
    val plan = graft.operators.RelationalQueries.funnel(
      graft.Tables.load(spark, dir, "events"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1, plan)
    assert("Exchange".r.findAllIn(plan).size == 2, plan)
    // retention: window-min first_day (no self-join), distinct reuses the
    // user partitioning in place → 1 scan, 2 exchanges as well
    val rplan = graft.operators.RelationalQueries.retentionCohorts(
      graft.Tables.load(spark, dir, "events"), "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(rplan).size == 1, rplan)
    assert("Exchange".r.findAllIn(rplan).size == 2, rplan)
  }

  test("fuzz: funnel agrees with a brute-force reference on random event sets") {
    val stages = Seq("view", "click", "purchase")
    val types = stages ++ Seq("error", "signup")
    val rnd = new scala.util.Random(21L)
    for (round <- 1 to 15) {
      val evs = for {
        _ <- 0 until (5 + rnd.nextInt(60))
      } yield (rnd.nextInt(6).toLong, types(rnd.nextInt(types.size)),
        (1000L + rnd.nextInt(500)) * 1000000L) // whole-second micros
      val want: Seq[Long] = stages.indices.map { k =>
        evs.groupBy(_._1).values.count { u =>
          var prev = Option.empty[Long]
          var ok = true
          for (i <- 0 to k if ok) {
            val cand = u.collect { case (_, t, us)
              if t == stages(i) && prev.forall(us > _) => us }
            if (cand.isEmpty) ok = false else prev = Some(cand.min)
          }
          ok
        }.toLong
      }
      val df = evs.map { case (u, t, us) =>
        (u, t, new java.sql.Timestamp(us / 1000L)) }.toDF("user_id", "event_type", "ts")
      val got = graft.operators.RelationalQueries
        .funnel(df, "user_id", "event_type", "ts", stages)
        .orderBy("stage").select("n_users").as[Long].collect().toSeq
      assert(got == want, s"round $round: got $got want $want events $evs")
      // conversion-window variant vs the same reference with the gap rule
      val gap = 60L * 1000000L
      val wantGap: Seq[Long] = stages.indices.map { k =>
        evs.groupBy(_._1).values.count { u =>
          var prev = Option.empty[Long]
          var ok = true
          for (i <- 0 to k if ok) {
            val cand = u.collect { case (_, t, us)
              if t == stages(i) && prev.forall(p => us > p && us <= p + gap) => us }
            if (cand.isEmpty) ok = false else prev = Some(cand.min)
          }
          ok
        }.toLong
      }
      val gotGap = graft.operators.RelationalQueries
        .funnel(df, "user_id", "event_type", "ts", stages, maxGapUs = Some(gap))
        .orderBy("stage").select("n_users").as[Long].collect().toSeq
      assert(gotGap == wantGap, s"round $round gap: got $gotGap want $wantGap")
    }
  }

  test("retention cohorts count each user once per active week offset") {
    val got = graft.operators.RelationalQueries.queries("q_retention_cohorts")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 4L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}

class HistogramQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._
  import graft.operators.RelationalQueries

  test("psiDrift: zero for identical distributions, grows with shift, counts one-sided bins") {
    def mk(shift: Double) =
      (1 to 1000).map(i => (i % 100) * 10.0 + shift).toDF("v")
    def psi(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      RelationalQueries.psiDrift(a, b, "v", loCents = 0L, widthCents = 20000L, bins = 16)
        .select("psi_millibits", "n_bins_a_only", "n_bins_b_only", "n_bins_shared")
        .as[(Long, Long, Long, Long)].head()
    val base = mk(0.0)
    assert(psi(base, mk(0.0)) == ((0L, 0L, 0L, 5L))) // identical → zero drift
    val small = psi(base, mk(200.0))._1
    val large = psi(base, mk(600.0))._1
    assert(small > 0L, "shifted distribution must score positive")
    assert(large > small, s"PSI must grow with shift: $small vs $large")
    // every term is non-negative (bitlen is monotone): an adversarial
    // mixed-direction shift still cannot drive the score negative
    val mixed = psi(base, (1 to 1000).map(i =>
      if (i % 2 == 0) 0.0 else 1990.0).toDF("v"))
    assert(mixed._1 >= 0L)
    // disjoint supports: all bins one-sided, none shared
    val disjoint = psi((1 to 100).map(_ => 10.0).toDF("v"),
      (1 to 100).map(_ => 3000.0).toDF("v"))
    assert(disjoint._2 == 1L && disjoint._3 == 1L && disjoint._4 == 0L)
  }

  test("histogramQuantiles picks the first bin reaching the target rank, clamping the range") {
    // group A: 10.0 .. 100.0 in steps of 10 → bins 1..10 at width 10.00;
    // group B: one value far below lo (clamps to bin 0) and one far above
    // (clamps to the last bin)
    val df = ((1 to 10).map(i => ("A", i * 10.0)) ++
      Seq(("B", -5.0), ("B", 500.0))).toDF("g", "v")
    val got = RelationalQueries.histogramQuantiles(df, "g", "v",
      probsMilli = Seq(500, 1000), loCents = 0L, widthCents = 1000L, bins = 12)
      .select("g", "p_milli", "n", "qbin", "est")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("A", 500L)) == ((10L, 5L, 50.0)))   // cum 5 of 10 at bin 5
    assert(got(("A", 1000L)) == ((10L, 10L, 100.0)))
    assert(got(("B", 500L)) == ((2L, 0L, 0.0)))     // clamped low value
    assert(got(("B", 1000L)) == ((2L, 11L, 110.0))) // clamped high value
    // clamp accounting: silent edge-bin pile-up must be VISIBLE — group B
    // had both values out of range, group A none
    val clamped = RelationalQueries.histogramQuantiles(df, "g", "v",
      probsMilli = Seq(500), loCents = 0L, widthCents = 1000L, bins = 12)
      .select("g", "clamped").distinct()
      .as[(String, Long)].collect().toMap
    assert(clamped == Map("A" -> 0L, "B" -> 2L), s"$clamped")
  }

  test("histogramQuantilesAuto derives a covering range: nothing clamps, bins stay tight") {
    val df = ((1 to 10).map(i => ("A", i * 10.0)) ++
      Seq(("B", -5.0), ("B", 500.0))).toDF("g", "v")
    // range derived from the data itself: [-5.00, 500.00] over 16 bins —
    // the clamp column must prove 0 everywhere, including B's extremes
    val auto = RelationalQueries.histogramQuantilesAuto(df, "g", "v",
      probsMilli = Seq(500, 1000), bins = 16)
      .select("g", "p_milli", "qbin", "est", "clamped")
      .as[(String, Long, Long, Double, Long)].collect()
    assert(auto.forall(_._5 == 0L), s"auto range must not clamp: ${auto.mkString(", ")}")
    // derivation is the documented integer arithmetic: lo = -500 cents,
    // width = ceil((50000 - (-500) + 1)/16) = 3157 cents
    val (lo, w) = (-500L, (50000L - -500L + 1 + 15) / 16)
    val explicit = RelationalQueries.histogramQuantiles(df, "g", "v",
      probsMilli = Seq(500, 1000), loCents = lo, widthCents = w, bins = 16)
      .select("g", "p_milli", "qbin", "est", "clamped")
      .as[(String, Long, Long, Double, Long)].collect()
    assert(auto.toSet == explicit.toSet)
    // estimates are exact to one bin width: B's max (500.0) lands in the
    // last occupied bin, whose lower edge is ≤ 500 < edge + width
    val bMax = auto.find(r => r._1 == "B" && r._2 == 1000L).get._4
    assert(bMax <= 500.0 && 500.0 < bMax + w / 100.0, s"$bMax")
    // empty/all-null input refuses loudly instead of deriving nonsense
    intercept[IllegalArgumentException] {
      RelationalQueries.histogramQuantilesAuto(
        Seq.empty[(String, Double)].toDF("g", "v"), "g", "v", Seq(500), 8)
    }
  }

  test("fuzz: the sketch's bin always contains the exact order statistic") {
    // the defining property of the lower-edge rank rule: for every group
    // and probability, qbin == bin(x_(ceil(p·n/1000))) computed from the
    // fully sorted data — i.e. the estimate is exact to the bin width
    val rnd = new scala.util.Random(77L)
    for (round <- 1 to 3) {
      val groups = Seq("a", "b", "c")
      val data = groups.flatMap { g =>
        (1 to 50 + rnd.nextInt(200)).map(_ =>
          (g, (rnd.nextDouble() - 0.2) * 500.0)) // some negatives → clamp path
      }
      val probs = Seq(100, 500, 900, 1000)
      val (lo, width, bins) = (0L, 2500L, 16)
      val got = RelationalQueries.histogramQuantiles(
          data.toDF("g", "v"), "g", "v", probs, lo, width, bins)
        .select("g", "p_milli", "qbin")
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      def binOf(v: Double): Long =
        math.min(bins - 1L, math.max(0L, (math.floor(v * 100).toLong - lo) / width))
      for (g <- groups; p <- probs) {
        val sorted = data.filter(_._1 == g).map(_._2).sorted
        val rank = math.max(1, math.ceil(p * sorted.size / 1000.0).toInt)
        assert(got((g, p.toLong)) == binOf(sorted(rank - 1)),
          s"round $round g=$g p=$p: sketch bin ${got((g, p.toLong))} != " +
            s"bin of exact statistic ${sorted(rank - 1)}")
      }
    }
  }

  test("histogramQuantiles validates bins, width and probabilities") {
    val df = Seq(("A", 1.0)).toDF("g", "v")
    for ((probs, w, b) <- Seq((Seq(500), 0L, 10), (Seq(500), 100L, 0),
        (Seq(1001), 100L, 10), (Seq.empty[Int], 100L, 10))) {
      intercept[IllegalArgumentException] {
        RelationalQueries.histogramQuantiles(df, "g", "v", probs, 0L, w, b)
      }
    }
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("persisted IVF index serves new queries; nProbe=all equals brute force") {
    // two tight clusters on orthogonal axes + one straggler per cluster
    // that leans toward the OTHER cluster — the case nProbe=1 can miss
    val corpus = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(0.98f, 0.1f)), (3L, Array(0.9f, 0.4f)),
      (11L, Array(0.05f, 1.0f)), (12L, Array(0.1f, 0.97f)), (13L, Array(0.45f, 0.9f)))
      .toDF("vec_id", "embedding")
    val labeled = corpus.withColumn("cell",
      when(col("vec_id") < 10L, 0L).otherwise(1L))
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.saveIvfIndex(labeled, "vec_id", "embedding", "cell", path)
    // queries are NEW vectors, never indexed
    val queries = Seq(
      (100L, Array(0.99f, 0.2f)),   // x-cluster query
      (101L, Array(0.2f, 0.99f)),   // y-cluster query
      (102L, Array(0.7f, 0.72f)))   // boundary query — needs both cells
      .toDF("query_id", "qv")
    def run(nProbe: Int) =
      Similarity.ivfQueryIndex(spark, path, queries, k = 3, nProbe = nProbe)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    // nProbe = number of cells degrades to exact brute force
    val brute = Similarity.bruteForceTopK(
      queries, corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
      k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(run(2) == brute)
    // single-probe: the clean-cluster queries (whose true top-3 all live
    // in their own cell) agree with brute force exactly; the boundary
    // query lands in the y cell and ranks ONLY that cell's members —
    // missing its true #2 (vec 3, the x-cell straggler), which is exactly
    // the recall nProbe=2 buys back
    val p1 = run(1)
    assert(p1.filter(_._1 == 100L) == brute.filter(_._1 == 100L))
    assert(p1.filter(_._1 == 101L) == brute.filter(_._1 == 101L))
    assert(p1.filter(_._1 == 102L) ==
      Set((102L, 13L, 1L), (102L, 12L, 2L), (102L, 11L, 3L)))
    assert(brute.filter(_._1 == 102L).map(_._2).contains(3L))
    // serving is deterministic across reads of the same index
    assert(run(2) == brute)
    // the budget guard reads the persisted per-cell POSTING counts
    // (reassigned labels — what the join fans out over), written at build
    assert(spark.read.parquet(s"$path/cellcounts")
      .as[(Long, Long)].collect().toMap == Map(0L -> 3L, 1L -> 3L))
    // an interrupted overwrite can leave a readable-but-EMPTY cellcounts
    // directory: max(n) is NULL (no AnalysisException), which must fall
    // back to the postings aggregate, not NPE
    val ccSchema = spark.read.parquet(s"$path/cellcounts").schema
    spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row], ccSchema)
      .write.mode("overwrite").parquet(s"$path/cellcounts")
    assert(run(2) == brute)
    // pre-cellcounts indexes (older builds) fall back to aggregating the
    // postings and still serve identically
    val fs = new java.io.File(s"$path/cellcounts")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(fs)
    assert(run(2) == brute)
  }

  test("appendToIvfIndex folds a delta in: serving equals rebuild, centroids fixed, counts exact") {
    val base = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(0.98f, 0.1f)),
      (11L, Array(0.05f, 1.0f)), (12L, Array(0.1f, 0.97f)))
      .toDF("vec_id", "embedding")
    val labeled = base.withColumn("cell",
      when(col("vec_id") < 10L, 0L).otherwise(1L))
    val path = java.nio.file.Files.createTempDirectory("ivfapp").toString + "/idx"
    Similarity.saveIvfIndex(labeled, "vec_id", "embedding", "cell", path)
    val centBefore = spark.read.parquet(s"$path/centroids")
      .collect().map(_.mkString("|")).toSet
    // delta: one vector per cluster plus a boundary one
    val delta = Seq(
      (3L, Array(0.95f, 0.2f)), (13L, Array(0.2f, 0.95f)), (21L, Array(0.7f, 0.72f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.appendToIvfIndex(spark, path, delta, "vec_id", "embedding") == 3L)
    // centroids are FIXED — maintenance must never re-cluster
    assert(spark.read.parquet(s"$path/centroids")
      .collect().map(_.mkString("|")).toSet == centBefore)
    // serving ≡ rebuild given fixed centroids: with nProbe = all cells the
    // index degrades to exact brute force over base ∪ delta, so equality
    // here pins that every delta vector landed in exactly one cell with a
    // correctly normalized posting
    val queries = Seq(
      (100L, Array(0.99f, 0.15f)), (101L, Array(0.15f, 0.99f)),
      (102L, Array(0.71f, 0.7f)))
      .toDF("query_id", "qv")
    val served = Similarity.ivfQueryIndex(spark, path, queries, k = 4, nProbe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val union = base.union(delta)
    val brute = Similarity.bruteForceTopK(queries,
        union.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), k = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(served == brute)
    assert(served.map(_._2).intersect(Set(3L, 13L, 21L)).nonEmpty,
      "delta vectors must be servable")
    // the budget guard's persisted counts stay exact: cellcounts after the
    // append equal a fresh aggregate of the postings
    val counts = spark.read.parquet(s"$path/cellcounts")
      .as[(Long, Long)].collect().toMap
    val fromPostings = spark.read.parquet(s"$path/postings")
      .groupBy("cell").count().as[(Long, Long)].collect().toMap
    assert(counts == fromPostings && counts.values.sum == 7L)
    // a second append onto the SAME index keeps the invariant (counts are
    // merged, not overwritten with only the delta's)
    val delta2 = Seq((4L, Array(0.9f, 0.3f))).toDF("vec_id", "embedding")
    assert(Similarity.appendToIvfIndex(spark, path, delta2, "vec_id", "embedding") == 1L)
    val counts2 = spark.read.parquet(s"$path/cellcounts")
      .as[(Long, Long)].collect().toMap
    assert(counts2.values.sum == 8L &&
      counts2 == spark.read.parquet(s"$path/postings")
        .groupBy("cell").count().as[(Long, Long)].collect().toMap)
    // a crashed append can leave the counts OVERSTATED (the safe
    // direction — the budget guard refuses early, never admits a blow-up);
    // repairIvfCellcounts must resync them to the postings exactly
    Seq((0L, 999L), (1L, 999L)).toDF("cell", "n")
      .write.mode("overwrite").parquet(s"$path/cellcounts")
    Similarity.repairIvfCellcounts(spark, path)
    assert(spark.read.parquet(s"$path/cellcounts").as[(Long, Long)].collect().toMap ==
      spark.read.parquet(s"$path/postings")
        .groupBy("cell").count().as[(Long, Long)].collect().toMap)
  }

  test("semanticDecontaminate flags training vectors near a benchmark vector") {
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)), (101L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),  // ~parallel to bench 100 → flagged
      (2L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal to both → clean
      (3L, Array(0.1f, 0.95f, 0.1f)))  // near bench 101 → flagged
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDecontaminate(train, bench, "vec_id", "embedding",
        threshold = 0.9, dim = 3)
      .select("doc_id", "nearest_bench_id", "flag_contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((100L, true)))
    assert(got(2L)._2 == false)
    assert(got(3L) == ((101L, true)))
    // empty benchmark refuses loudly rather than flagging nothing
    intercept[IllegalArgumentException](
      Similarity.semanticDecontaminate(train, bench.where(col("vec_id") < 0),
        "vec_id", "embedding", 0.9, dim = 3).collect())
  }

  test("brute-force top-k ranks by cosine with deterministic tie-break") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.01f))).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val top = Similarity.bruteForceTopK(q, c, 2)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(top(3L) == 1L && top(1L) == 2L)
  }

  test("knnGraph probing all cells equals brute force for every vector") {
    // two tight clusters around (1,0) and (0,1); with nProbe = #cells every
    // query scans every candidate, so the graph must equal the exact
    // brute-force top-k run with all vectors as queries — ids, ranks, AND
    // bit-identical sims (both paths accumulate ascending-index doubles).
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(0.95f, 0.05f)),
      (2L, 0, Array(0.9f, 0.1f)), (3L, 1, Array(0.0f, 1.0f)),
      (4L, 1, Array(0.05f, 0.95f)), (5L, 1, Array(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val graph = Similarity.knnGraph(vecs, "vec_id", "embedding", "label",
      k = 3, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(
      vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(graph == brute)
    assert(graph.map(_._1) == (0L to 5L).toSet) // EVERY vector is a query
  }

  test("knnGraph ≡ brute force at 500 random vectors when probing all cells") {
    // fixed-seed random corpus, 8 cells, nProbe = 8 = all cells: the
    // graph must equal the exact answer on every (query, rank) — a much
    // denser tie/probe surface than the 6-vector fixture
    val rnd = new scala.util.Random(421)
    val vecs = (0L until 500L).map(i =>
      (i, i % 8, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "label", "embedding")
    val graph = Similarity.knnGraph(vecs, "vec_id", "embedding", "label",
      k = 4, nProbe = 8)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    val brute = Similarity.bruteForceTopK(
      vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      vecs.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(graph === brute)
    assert(graph.size === 2000) // 500 queries × 4 ranks
  }

  test("knnGraph single-probe stays within the argmax cell") {
    // with nProbe=1 a query only sees its own cluster: neighbors across
    // the label boundary must be absent even though they exist
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(0.95f, 0.05f)),
      (2L, 1, Array(0.0f, 1.0f)), (3L, 1, Array(0.05f, 0.95f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.knnGraph(vecs, "vec_id", "embedding", "label",
      k = 3, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L)))
  }

  test("knnGraphAuto equals kmeansCells + knnGraph composed by hand") {
    // 12 vectors in two tight clusters, targetCellSize 6 → k-means k=2;
    // the auto path must equal the manual composition row for row
    val vecs = (0 until 12).map { i =>
      val base = if (i < 6) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i.toLong, Array(base(0) + i * 0.01f, base(1) + i * 0.003f))
    }.toDF("vec_id", "embedding")
    val auto = Similarity.knnGraphAuto(vecs, "vec_id", "embedding",
      k = 3, nProbe = 2, targetCellSize = 6)
      .as[(Long, Long, Long, Double)].collect().toSet
    val cells = Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 2)
    val withCell = vecs.join(cells, Seq("vec_id"))
    val manual = Similarity.knnGraph(withCell, "vec_id", "embedding", "cell",
      k = 3, nProbe = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(auto === manual)
    assert(auto.map(_._1) === (0L to 11L).toSet)
  }

  test("knnGraph refuses an over-budget candidate join before any pair runs") {
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(0.9f, 0.1f)),
      (2L, 0, Array(0.8f, 0.2f))).toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraph(vecs, "vec_id", "embedding", "label",
        k = 2, nProbe = 1, maxEstCandidates = 2) // 3 probes × 3 members = 9 > 2
    }
    assert(e.getMessage.contains("Re-cluster"))
  }

  test("knnGraph zero-norm vector gets sim 0 and never outranks real neighbors") {
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(0.9f, 0.1f)),
      (2L, 0, Array(0.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.knnGraph(vecs, "vec_id", "embedding", "label",
      k = 2, nProbe = 1)
      .as[(Long, Long, Long, Double)].collect()
    // the zero vector is a last-ranked sim-0 neighbor, never NaN, never #1
    val zeroRows = got.filter(_._2 == 2L)
    assert(zeroRows.nonEmpty && zeroRows.forall(r => r._4 == 0.0 && r._3 == 2L))
    assert(got.filter(_._1 == 2L).forall(_._4 == 0.0)) // as a query too
  }

  test("knnGraph on an empty corpus returns an empty graph") {
    val vecs = Seq.empty[(Long, Int, Array[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(Similarity.knnGraph(vecs, "vec_id", "embedding", "label", k = 2).isEmpty)
  }

  test("similarPairs refuses an over-budget broadcast before collecting") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.similarPairs(vecs, "vec_id", "embedding", 0.5, dim = 2,
        maxBroadcastBytes = 16) // 3 rows × (16 + 32) bytes > 16
    }
    assert(e.getMessage.contains("ivfTopK"))
    // within budget, the guard stays out of the way
    val ok = Similarity.similarPairs(vecs, "vec_id", "embedding", 0.5, dim = 2)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(ok == Set((0L, 1L))) // only (1,0,0)·(0.9,0.1) clears cosine 0.5
  }

  test("recallAtK counts approximate hits against the exact top-k per query") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L)).toDF("query_id", "neighbor_id", "rank")
    // query 1: approx found 2 of 3; query 2: none (missing entirely)
    val approx = Seq((1L, 10L, 1L), (1L, 12L, 2L), (1L, 99L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.recallAtK(exact, approx, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2L), (2L, 3L, 0L)))
  }

  test("semanticDupFlags dedups within a cell only, keeping the lowest id") {
    // 0 and 1 are identical in cell A → 1 is the dup; 2 is identical to
    // them but in cell B → NOT a dup (cluster restriction is the point);
    // 3 is orthogonal in cell A → clean.
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(1.0f, 0.0f)),
      (2L, 1, Array(1.0f, 0.0f)), (3L, 0, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDupFlags(vecs, "vec_id", "embedding", "label", 0.9)
      .select("id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> false, 1L -> true, 2L -> false, 3L -> false))
  }

  test("deltaSemanticDupFlags equals the full re-run restricted to delta rows") {
    // delta ids above the index ids (arrival order), random vectors in 4
    // cells: the delta flags must match semanticDupFlags over index∪delta
    // filtered to the delta — including dups ONTO higher-id index members,
    // which the incremental kernel checks regardless of id order.
    val rnd = new scala.util.Random(17L)
    def vec() = Array.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val indexRows = (0L until 60L).map(i => (i, (i % 4).toInt, vec()))
    val deltaRows = (100L until 120L).map { i =>
      // half the delta copies an index vector → guaranteed dups
      val v = if (i % 2 == 0) indexRows((i % 60).toInt)._3 else vec()
      (i, (i % 4).toInt, v)
    }
    val index = indexRows.toDF("vec_id", "label", "embedding")
    val delta = deltaRows.toDF("vec_id", "label", "embedding")
    val got = Similarity.deltaSemanticDupFlags(index, delta,
      "vec_id", "embedding", "label", 0.5)
      .select("id", "is_dup").as[(Long, Boolean)].collect().toMap
    val full = Similarity.semanticDupFlags(index.unionByName(delta),
      "vec_id", "embedding", "label", 0.5)
      .where(col("id") >= 100L)
      .select("id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(got.size == 20 && got == full)
    assert(got.values.exists(identity) && got.values.exists(!_), "vacuous fuzz")
  }

  test("fuzz: semanticDupFlags kernel agrees with the declarative join form") {
    // the kernel replaced a cell-keyed join whose HOF dot was interpreted;
    // this pins the replacement to the declarative semantics on random data
    val rnd = new scala.util.Random(6L)
    val vecs = (0L until 80L).map { i =>
      (i, (i % 4).toInt, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val got = Similarity.semanticDupFlags(vecs, "vec_id", "embedding", "label", 0.5)
      .select("id", "is_dup").as[(Long, Boolean)].collect().toMap
    // declarative reference: any lower-id same-cell neighbor with sim >= t
    val nrm = vecs.select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double") /
        sqrt(aggregate(transform(col("embedding"), y => y.cast("double") * y.cast("double")),
          lit(0.0), (a, c) => a + c))).as("nv"))
    val dupIds = nrm.select(col("vec_id").as("ia"), col("label"), col("nv").as("na"))
      .join(nrm.select(col("vec_id").as("ib"), col("label"), col("nv").as("nb")), Seq("label"))
      .where(col("ia") < col("ib"))
      .where(aggregate(zip_with(col("na"), col("nb"), (x, y) => x * y),
        lit(0.0), (a, c) => a + c) >= 0.5)
      .select(col("ib")).as[Long].collect().toSet
    assert(dupIds.nonEmpty && dupIds.size < 80, s"vacuous fuzz: ${dupIds.size} dups")
    got.foreach { case (id, flag) => assert(flag == dupIds.contains(id), s"id $id") }
  }

  test("kmeansCells groups near-identical vectors with their seed, ids interleaved") {
    // 3 tight clusters interleaved across ids; seeds (3 lowest ids: 0,1,2)
    // are one per cluster, so Lloyd rounds must pull each copy to its base
    val base = Seq(Array(1.0f, 0.1f, -0.3f, 0.8f), Array(-0.7f, 0.5f, 0.2f, -0.1f),
      Array(0.2f, -0.9f, 0.4f, 0.6f))
    val vecs = (0L until 9L).map(i =>
      (i, base((i % 3).toInt).map(x => x + (i / 3) * 0.001f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L until 9L).toSet)
    for (i <- 0L until 9L) assert(got(i) == got(i % 3), s"vector $i strayed from its base")
    assert(got.values.toSet.size == 3)
  }

  test("kmeansCells sampled fit assigns the whole corpus deterministically") {
    // three exact-duplicate content groups interleaved by id; the Lloyd
    // rounds fit on the xxhash64 % 2 == 0 sample, the corpus-wide pass
    // assigns everyone. Identical inputs MUST co-assign whatever the
    // fitted centroids are (same kernel, same argmax) — that plus
    // full coverage, seeds-from-the-fit-set, and run-to-run equality is
    // what the sampled path owes, without assuming which clusters the
    // hash sample happens to hit.
    val vecs = (0L until 30L).map { i =>
      val v = (i % 3) match {
        case 0 => Array(1.0f, 0.0f)
        case 1 => Array(0.0f, 1.0f)
        case _ => Array(0.7f, 0.7f)
      }
      (i, v)
    }.toDF("vec_id", "embedding")
    def run() = Similarity.kmeansCells(vecs, "vec_id", "embedding",
      k = 3, fitSampleMod = 2)
      .as[(Long, Long)].collect().sortBy(_._1)
    val got = run()
    assert(got.length === 30 && got.map(_._1).toSet === (0L until 30L).toSet)
    val fitIds = vecs.where(pmod(xxhash64(col("vec_id")), lit(2)) === 0)
      .select("vec_id").as[Long].collect().toSet
    assert(got.map(_._2).toSet.subsetOf(fitIds), "cells must be fit-set seed ids")
    val byContent = got.groupBy(_._1 % 3).values.map(_.map(_._2).toSet)
    assert(byContent.forall(_.size == 1), "identical vectors must co-assign")
    assert(got.toSeq === run().toSeq, "sampled fit must be deterministic")
  }

  test("kmeansCells refuses an empty fit sample and bad knobs loudly") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // a mod no id hashes to 0 under → empty fit set: the old behavior
    // silently assigned the whole corpus to nonexistent cell 0
    val fitless = (3L to 500L).find(m =>
      vecs.where(pmod(xxhash64(col("vec_id")), lit(m)) === 0).isEmpty)
    assume(fitless.nonEmpty, "no fitless mod in range — fixture luck ran out")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 2,
        fitSampleMod = fitless.get)
    }
    assert(e.getMessage.contains("fitSampleMod"))
    intercept[IllegalArgumentException] {
      Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 2, iterations = 0)
    }
  }

  test("kmeansCells refuses a centroid dot that would wrap int64, and a smaller quantScale fixes it") {
    // components ~±2000 quantize to |xi| ≈ 2e9 at the default 1e6 scale, so
    // even a SINGLETON seed centroid puts dim·max|xi|·max|sxi| ≈ 4·(2e9)² ≈
    // 1.6e19 past 2^63 — the guard must trip before any task runs, naming
    // the quantScale remedy. The same corpus at scale 1e3 is three orders
    // of magnitude inside the bound and must cluster correctly.
    val base = Seq(Array(2000.0f, 1900.0f, -2100.0f, 2050.0f),
      Array(-2000.0f, -1950.0f, 2080.0f, -1990.0f))
    val vecs = (0L until 6L).map(i =>
      (i, base((i % 2).toInt).map(x => x + (i / 2) * 0.5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 2)
    }
    assert(e.getMessage.contains("overflow int64") && e.getMessage.contains("quantScale"))
    val got = Similarity.kmeansCells(vecs, "vec_id", "embedding", k = 2,
      quantScale = 1000L).as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L until 6L).toSet)
    for (i <- 0L until 6L) assert(got(i) == got(i % 2), s"vector $i strayed from its base")
    assert(got.values.toSet.size == 2)
  }

  test("semanticDupFlags refuses a cell whose pair count exceeds the compute budget") {
    // 4 members in one cell → 6 pairs; a budget of 5 must trip with the
    // re-cluster message even though the cell easily fits in memory
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.0f, 1.0f)), (3L, 0, Array(0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.semanticDupFlags(vecs, "vec_id", "embedding", "label", 0.9,
        maxPairsPerCell = 5L).collect()
    }
    assert(e.getMessage.contains("candidate pairs") &&
      e.getMessage.contains("Re-cluster with more cells"))
  }

  test("semanticDupFlags refuses an over-sized cell loudly") {
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.semanticDupFlags(vecs, "vec_id", "embedding", "label", 0.9,
        maxCellRows = 2).collect()
    }
    assert(e.getMessage.contains("Re-cluster with more cells"))
  }

  test("ivfTopK refuses a query-x-cell volume past the compute budget") {
    val vecs = (0L until 20L).map(i => (i, 0, Array.fill(4)(i.toFloat + 1)))
      .toDF("vec_id", "label", "embedding")
    // 5 queries × one 20-member cell = 100 candidates; budget 10 must trip
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, "vec_id", "embedding", "label",
        col("vec_id") < 5, k = 3, maxEstCandidates = 10L)
    }
    assert(e.getMessage.contains("Re-cluster with more cells"))
  }

  test("lshNearDup refuses under-provisioned bands before any pair materializes") {
    val vecs = (0L until 100L).map(i => (i, Array.fill(4)(i.toFloat + 1)))
      .toDF("vec_id", "embedding")
    // 8 bands × 1 bit over 100 vectors → ~20k expected candidates; budget 10
    val e = intercept[IllegalArgumentException] {
      Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.5,
        bands = 8, bitsPerBand = 1, dim = 4, maxEstCandidates = 10L)
    }
    assert(e.getMessage.contains("bitsPerBand") && e.getMessage.contains("log2"))
  }

  test("lshNearDup bitsPerBand=0 auto-sizes bands from the corpus count") {
    // a (corpus, budget) combination the gate-scale default refuses —
    // 8 bands × 5 bits over 1000 vectors expects 8·10⁶/32/2 = 125k
    // candidates, over a 100k budget — must RUN with auto-sizing, which
    // derives ceil(log2(1000/32)) = 5... so use a tighter target: the
    // derivation must pick enough bits to clear the same budget
    val rnd = new scala.util.Random(7L)
    val vecs = (0L until 1000L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.9,
        bands = 8, bitsPerBand = 5, dim = 8, maxEstCandidates = 100000L)
    }
    assert(e.getMessage.contains("bitsPerBand = 0"), e.getMessage)
    // auto: bitsPerBand = ceil(log2(1000/8)) = 7 → 8·10⁶/128/2 ≈ 31k ≤ 100k
    val auto = Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.9,
      bands = 8, bitsPerBand = 0, dim = 8, maxEstCandidates = 100000L,
      targetBucketSize = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the derivation is transparent: auto ≡ the explicit derived setting
    val explicit = Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.9,
      bands = 8, bitsPerBand = 7, dim = 8, maxEstCandidates = 100000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == explicit)
  }

  test("lshNearDup finds a subset of the exact pairs, with near-total recall on near-identical vectors") {
    // 3 tight clusters of near-identical vectors + isolated noise: every
    // within-cluster pair has cosine ≈ 1 (sign bits can barely disagree →
    // LSH must keep them); cross-cluster pairs sit far below the threshold.
    val base = Seq(Array(1.0f, 0.1f, -0.3f, 0.8f), Array(-0.7f, 0.5f, 0.2f, -0.1f),
      Array(0.2f, -0.9f, 0.4f, 0.6f))
    val vecs = (for {
      (b, c) <- base.zipWithIndex; i <- 0 until 3
    } yield ((c * 3 + i).toLong, b.map(x => x + i * 0.001f))).toDF("vec_id", "embedding")
    val exact = Similarity.similarPairs(vecs, "vec_id", "embedding", 0.9, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDup(vecs, "vec_id", "embedding", 0.9, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-near-dup pairs: ${lsh -- exact}")
    assert(exact.size == 9) // 3 pairs per cluster
    // near-identical vectors agree on every sign bit unless a projection
    // lands exactly on the boundary — expect (at least) near-total recall
    assert(lsh.size >= 8, s"LSH recall collapsed: ${lsh.size}/${exact.size}")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("MP4 box parser round-trips the synthetic container exactly, incl. multi-chunk stsc") {
    import graft.multimodal.Multimodal.Mp4Video
    for (chunks <- Seq(1, 2, 3)) {
      val seed = 77L
      val n = 7
      val payload = Mp4Video.synthMp4(seed, nSamples = n, w = 32, h = 18, chunks = chunks)
      val m = Mp4Video.parse(payload)
      assert(m.brand == "isom" && m.codec == "avc1", s"chunks=$chunks: $m")
      assert(m.width == 32 && m.height == 18)
      assert(m.timescale == 1000L && m.durationMs == n * 40L)
      assert(m.nSamples == n)
      assert(m.sampleDeltas.toSeq == Seq.fill(n)(3600))
      assert(m.sampleSizes.toSeq == (0 until n).map(Mp4Video.synthSampleSize(seed, _)))
      // the expanded stsz/stsc/stco tables must slice the exact sample
      // bytes out of mdat — this is what makes frame sampling REAL
      for (f <- 0 until n) {
        val got = Mp4Video.sampleBytes(payload, m, f)
        val want = (0 until m.sampleSizes(f))
          .map(j => Mp4Video.synthSampleByte(seed, f, j).toByte).toArray
        assert(java.util.Arrays.equals(got, want),
          s"chunks=$chunks sample $f bytes diverge")
      }
      // offsets strictly increase and sit inside the payload
      assert(m.sampleOffsets.toSeq == m.sampleOffsets.sorted.toSeq)
      assert(m.sampleOffsets.last + m.sampleSizes.last <= payload.length)
    }
  }

  test("MP4 parser refuses non-MP4 and truncated input loudly") {
    import graft.multimodal.Multimodal.{Mp4Video, synthPng}
    intercept[IllegalArgumentException](Mp4Video.parse(synthPng(1L)))
    val ok = Mp4Video.synthMp4(5L)
    // truncating mid-moov must not silently return partial tables
    intercept[IllegalArgumentException](
      Mp4Video.parse(java.util.Arrays.copyOfRange(ok, 0, ok.length - 30)))
    // faststart (moov-BEFORE-mdat) with a cut-short mdat: an explicit
    // mdat size lets the box walk catch the truncation, but live-capture
    // files write size==0 ("to end of file") — there the walk parses the
    // truncated file CLEANLY and only the sample-range validation stands
    // between the caller and silently zero-padded sample bytes
    val fast = Mp4Video.synthMp4(5L, moovFirst = true)
    val mf = Mp4Video.parse(fast) // intact faststart layout parses…
    assert(java.util.Arrays.equals(Mp4Video.sampleBytes(fast, mf, 0),
      Mp4Video.sampleBytes(ok, Mp4Video.parse(ok), 0)),
      "faststart layout must carry the same sample bytes")
    val mdatAt = (0 until fast.length - 4).find(i =>
      fast(i) == 'm' && fast(i + 1) == 'd' && fast(i + 2) == 'a' && fast(i + 3) == 't').get - 4
    val openEnded = fast.clone()
    openEnded(mdatAt) = 0; openEnded(mdatAt + 1) = 0
    openEnded(mdatAt + 2) = 0; openEnded(mdatAt + 3) = 0
    val mo = Mp4Video.parse(openEnded) // size-0 mdat parses when intact
    assert(mo.nSamples == mf.nSamples)
    val e = intercept[IllegalArgumentException](Mp4Video.parse(
      java.util.Arrays.copyOfRange(openEnded, 0, openEnded.length - 10)))
    assert(e.getMessage.contains("truncated mdat"), e.getMessage)
  }

  test("video vHash: strict per-bit majority tolerates a minority of edited frames") {
    import graft.multimodal.Multimodal
    val a = 0xF0F0F0F0F0F0L
    val b = ~a & 0xFFFFFFFFFFFFL
    // 3-of-4 frames agree → the odd frame cannot flip any bit
    assert(Multimodal.majorityHash(Seq(a, a, a, b)) == a)
    // 2-2 tie → strict majority clears every contested bit
    assert(Multimodal.majorityHash(Seq(a, a, b, b)) == 0L)
    // unanimous passes through; empty is zero (no frames set nothing)
    assert(Multimodal.majorityHash(Seq(a, a)) == a)
    assert(Multimodal.majorityHash(Nil) == 0L)
    // end to end: real GIF decode per frame, majority = manual fold
    val payload = Multimodal.GifVideo.synthGif(9L, w = 14, h = 8, nFrames = 4)
    val frames = Multimodal.GifVideo.decodeFrameHashes(payload)
    assert(frames.size == 4)
    import spark.implicits._
    val got = Multimodal.vhashVideos(
      Seq(Multimodal.MediaRow(9L, "image/gif", payload)).toDS()).collect().head
    assert(got.vhash == Multimodal.majorityHash(frames))
  }

  test("optimized (delta-rect) GIFs composite onto the logical screen before hashing") {
    import graft.multimodal.Multimodal
    // real-world optimized GIFs store later frames as sub-rects at an
    // offset: raw-rect hashing would crash on narrow rects or compare
    // incompatible bit grids — compositing must keep every frame a full
    // 14×8 screen and the clip pair-able with itself
    val payload = Multimodal.GifVideo.synthDeltaGif(11L, w = 14, h = 8,
      nFrames = 4, rectW = 4, rectH = 3)
    val frames = Multimodal.GifVideo.decodeFrames(payload)
    assert(frames.size == 4)
    assert(frames.forall { case (_, w, h, _, _) => w == 14 && h == 8 },
      s"every composited frame reports the logical screen size: $frames")
    // frame 0 covers the screen; frame 1's canvas = frame 0 overdrawn by
    // the 4×3 rect at (3, 2) — its gray sum must differ from BOTH frame
    // 0's and a standalone full frame 1's
    val full = Multimodal.GifVideo.decodeFrames(
      Multimodal.GifVideo.synthGif(11L, w = 14, h = 8, nFrames = 2))
    assert(frames(1)._4 != frames(0)._4 && frames(1)._4 != full(1)._4)
    // the hash path rides the same compositing — no crash, 4 signatures
    val hs = Multimodal.GifVideo.decodeFrameHashes(payload)
    assert(hs.size == 4)
    // and an identical clip is an exact dup of itself end to end
    assert(Multimodal.majorityHash(hs) ==
      Multimodal.majorityHash(Multimodal.GifVideo.decodeFrameHashes(payload)))
  }

  test("image dHash: perceptual distance orders tweak < unrelated; exact dup = 0") {
    import spark.implicits._
    def png(f: (Int, Int) => Int, w: Int = 14, h: Int = 8): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y) & 255
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = (x: Int, y: Int) => x * 16 + y * 3
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", png(base)),
      Multimodal.MediaRow(2L, "image/png", png(base)), // exact dup
      // one grid cell's brightness nudged — a tiny perceptual change
      Multimodal.MediaRow(3L, "image/png",
        png((x, y) => if (x == 6 && y == 4) base(x, y) + 120 else base(x, y))),
      // reversed gradient — perceptually opposite
      Multimodal.MediaRow(4L, "image/png", png((x, y) => 255 - base(x, y))))
      .toDS()
    val h = Multimodal.dhashImages(rows).collect().map(r => r.doc_id -> r.dhash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L))
    val tweak = ham(h(1L), h(3L))
    val opposite = ham(h(1L), h(4L))
    assert(tweak >= 1 && tweak <= 4, s"tweak moved $tweak bits")
    assert(opposite > 20, s"opposite image only $opposite bits away")
    // the shared pigeonhole join finds exactly the dup pair at d=0 and
    // the tweaked pair within d=3 (when the tweak stayed under the bound)
    val pairs = graft.dedup.Dedup.hammingNearDup(
      Multimodal.dhashImages(rows).toDF(), "doc_id", "dhash",
      maxHamming = 3, bits = 48)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    if (tweak <= 3) assert(pairs.map(p => (p._1, p._2)).contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("audio aHash: loudness-envelope distance orders tweak < unrelated") {
    import spark.implicits._
    def wav(f: Int => Int) =
      Multimodal.WavCodec.encodeWav(Array.tabulate(245)(f), 8000f)
    // a slow loudness ramp with one window (samples 120-124) nudged louder
    val base = (i: Int) => (i % 49) * 130 - 3000
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", wav(base)),
      Multimodal.MediaRow(2L, "audio/wav", wav(base)), // exact dup
      Multimodal.MediaRow(3L, "audio/wav",
        wav(i => if (i >= 120 && i < 125) base(i) + 900 else base(i))),
      Multimodal.MediaRow(4L, "audio/wav",
        wav(i => (i * 7919) % 65536 - 32768))) // noise — unrelated envelope
      .toDS()
    val h = Multimodal.ahashAudio(rows).collect().map(r => r.doc_id -> r.ahash).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L))
    val tweak = ham(h(1L), h(3L))
    assert(tweak >= 1 && tweak <= 4, s"tweak moved $tweak bits")
    assert(ham(h(1L), h(4L)) > tweak, "unrelated audio should be farther than the tweak")
  }

  test("binary payload pipeline: schema + deterministic stub features") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.featurePipeline(spark, docs, "doc_id", "text")
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3 && feats(1L).byte_sum == 97 + 98 + 99)
    assert(feats(1L).head_byte == 97)
    assert(feats(2L).n_bytes == 0 && feats(2L).head_byte == -1)
    val bin = Multimodal.attachPayload(docs, "doc_id", "text")
    assert(bin.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
  }

  test("a custom MediaCodec injects through the pipeline with unchanged shape") {
    import spark.implicits._
    // a "real decoder" stand-in: recognizably different values, same schema
    object FakeJpeg extends Multimodal.MediaCodec {
      def features(kind: String, payload: Array[Byte]): (Long, Int, Long) =
        (payload.length * 1000L, 42, 7L)
      def resize(frame: Array[Byte], outBytes: Int): Array[Byte] =
        Array.fill[Byte](outBytes)(9)
    }
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val viaStub = Multimodal.featurePipeline(spark, docs, "doc_id", "text")
    val viaFake = Multimodal.featurePipeline(spark, docs, "doc_id", "text", FakeJpeg)
    // identical schema — the pipeline is codec-agnostic
    assert(viaFake.schema == viaStub.schema)
    val feats = viaFake.collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_sum == 3000L && feats(1L).head_byte == 42 && feats(1L).checksum8 == 7L)
    assert(feats(1L).n_bytes == 3L) // payload plumbing untouched by the codec
    val media = Seq(Multimodal.MediaRow(1L, "x", Array.tabulate[Byte](8)(_.toByte))).toDS()
    val resized = Multimodal.resizeFrames(
      Multimodal.sampleFrames(media, frameBytes = 4, stride = 1), outBytes = 3, FakeJpeg)
      .collect()
    assert(resized.forall(_.frame.toSeq == Seq[Byte](9, 9, 9)))
  }

  test("ImageIoCodec decodes real PNG bytes back to the exact generating pixels") {
    // encode through javax.imageio, decode through javax.imageio: the
    // features must equal the formula the bytes were generated from
    // (PNG is lossless) — the same equality the q_multimodal_decode
    // oracle checks against SQL-recomputed pixels
    def ch(seed: Long, x: Int, y: Int, c: Int): Int =
      (((seed * 31 + x * 7 + y * 13 + c * 101) % 256 + 256) % 256).toInt
    val seed = 12345L
    val png = Multimodal.synthPng(seed, 16, 16)
    // a real PNG container: 8-byte signature
    assert(png.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
    val (sum, first, cs) = Multimodal.ImageIoCodec.features("image/png", png)
    var wantSum = 0L
    var wantCs = 0L
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3) {
      wantSum += ch(seed, x, y, c)
      wantCs = (wantCs * 131 + ch(seed, x, y, c)) % 1000000007L
    }
    assert(sum == wantSum && cs == wantCs)
    assert(first == ((ch(seed, 0, 0, 0) << 16) | (ch(seed, 0, 0, 1) << 8) | ch(seed, 0, 0, 2)))
    // distributed end to end: the decode stage reproduces per-row features
    import spark.implicits._
    val docs = Seq((7L, "ignored"), (8L, "ignored")).toDF("doc_id", "text")
    val out = Multimodal.decodeImages(
      Multimodal.attachImagePayload(docs, "doc_id", 16, 16))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(7L).width == 16 && out(7L).height == 16)
    assert(out(7L).pixel_sum == (for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3)
      yield ch(7L, x, y, c).toLong).sum)
    assert(out(7L).pixel_sum != out(8L).pixel_sum)
  }

  test("WavCodec decodes real WAV bytes back to the exact generating samples") {
    // encode through javax.sound.sampled, decode through javax.sound.sampled:
    // the features must equal the formula the bytes were generated from
    // (PCM is uncompressed) — the same equality the q_multimodal_audio
    // oracle checks against SQL-recomputed samples
    def s(seed: Long, i: Int): Int =
      ((((seed * 31 + i.toLong * 7919) % 65536 + 65536) % 65536) - 32768).toInt
    val seed = 54321L
    val wav = Multimodal.synthWav(seed, 256, 8000f)
    // a real RIFF/WAVE container
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    assert(wav.slice(8, 12).map(_.toChar).mkString == "WAVE")
    val (fmt, samples) = Multimodal.WavCodec.decodeSamples(wav)
    assert(fmt.getSampleRate == 8000f && samples.length == 256)
    assert(samples.toSeq == (0 until 256).map(i => s(seed, i)))
    val (sum, first, cs) = Multimodal.WavCodec.features("audio/wav", wav)
    var wantSum = 0L; var wantCs = 0L
    for (i <- 0 until 256) {
      wantSum += s(seed, i)
      wantCs = (wantCs * 131 + (s(seed, i) + 32768)) % 1000000007L
    }
    assert(sum == wantSum && first == s(seed, 0) && cs == wantCs)
    // distributed end to end: the decode stage reproduces per-row features
    import spark.implicits._
    val docs = Seq((7L, "ignored"), (8L, "ignored")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudio(
      Multimodal.attachAudioPayload(docs, "doc_id", 256))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(7L).n_samples == 256L && out(7L).sample_rate == 8000)
    assert(out(7L).sample_sum == (0 until 256).map(i => s(7L, i).toLong).sum)
    assert(out(7L).sample_checksum != out(8L).sample_checksum)
  }

  test("WavCodec resize is a real nearest-neighbor resample, re-encoded as WAV") {
    val wav = Multimodal.synthWav(99L, 64, 8000f)
    val small = Multimodal.WavCodec.resize(wav, outBytes = 32) // 16 samples
    val (fmt, out) = Multimodal.WavCodec.decodeSamples(small)
    assert(fmt.getSampleRate == 8000f && out.length == 16)
    // nearest neighbor: output sample i is a COPY of input sample 4i
    val (_, orig) = Multimodal.WavCodec.decodeSamples(wav)
    for (i <- 0 until 16) assert(out(i) == orig(i * 4))
    // deterministic: same input bytes → same output bytes
    assert(Multimodal.WavCodec.resize(wav, 32).toSeq == small.toSeq)
  }

  test("WavCodec fails loudly on an undecodable or mis-shaped payload") {
    val garbage = Array.tabulate[Byte](32)(i => (i * 17).toByte)
    intercept[Exception](Multimodal.WavCodec.features("audio/wav", garbage))
  }

  test("GifVideo round-trips multi-frame animated GIFs to the exact generating pixels") {
    def g(seed: Long, f: Int, x: Int, y: Int): Int =
      (((seed * 31 + f * 17 + x * 7 + y * 13) % 256 + 256) % 256).toInt
    val seed = 77L
    val gif = Multimodal.GifVideo.synthGif(seed, 8, 8, nFrames = 4)
    // a real GIF89a container
    assert(gif.take(6).map(_.toChar).mkString == "GIF89a")
    val frames = Multimodal.GifVideo.decodeFrames(gif)
    assert(frames.length == 4)
    frames.foreach { case (f, w, h, sum, cs) =>
      assert(w == 8 && h == 8)
      var wantSum = 0L; var wantCs = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        wantSum += g(seed, f, x, y)
        wantCs = (wantCs * 131 + g(seed, f, x, y)) % 1000000007L
      }
      assert(sum == wantSum && cs == wantCs, s"frame $f decoded wrong")
    }
    // distributed 1→N: each payload fans out to its decoded frames
    import spark.implicits._
    val docs = Seq((3L, "ignored"), (4L, "ignored")).toDF("doc_id", "text")
    val out = Multimodal.decodeVideoFrames(
      Multimodal.attachVideoPayload(docs, "doc_id", 8, 8, 4)).collect()
    assert(out.length == 8) // 2 docs × 4 frames
    val f2 = out.filter(v => v.doc_id == 3L && v.frame_idx == 2).head
    assert(f2.gray_sum == (for (y <- 0 until 8; x <- 0 until 8)
      yield g(3L, 2, x, y).toLong).sum)
  }

  test("ImageIoCodec resize is a real nearest-neighbor rescale, re-encoded as PNG") {
    val png = Multimodal.synthPng(99L, 16, 16)
    val small = Multimodal.ImageIoCodec.resize(png, outBytes = 4 * 4 * 3)
    val img = Multimodal.ImageIoCodec.decode(small)
    assert(img.getWidth == 4 && img.getHeight == 4)
    // nearest neighbor: output pixel (x,y) is a COPY of input (4x, 4y)
    val orig = Multimodal.ImageIoCodec.decode(png)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) == (orig.getRGB(x * 4, y * 4) & 0xffffff))
    // deterministic: same input bytes → same output bytes
    assert(Multimodal.ImageIoCodec.resize(png, 48).toSeq == small.toSeq)
  }

  test("ImageIoCodec fails loudly on an undecodable payload") {
    val garbage = Array.tabulate[Byte](32)(i => (i * 17).toByte)
    assertThrows[IllegalArgumentException](
      Multimodal.ImageIoCodec.features("image/png", garbage))
  }

  test("frame sampling fans out strided fixed-width frames; resize shrinks them") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(1L, "x", Array.tabulate[Byte](20)(_.toByte)))
      .toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2).collect()
    // 5 full frames of 4 bytes, stride 2 → indices 0, 2, 4
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(frames.forall(_.frame.length == 4))
    assert(frames.find(_.frame_idx == 2L).get.frame.toSeq == Seq[Byte](8, 9, 10, 11))
    val resized = Multimodal.resizeFrames(Multimodal.sampleFrames(media, 4, 2), outBytes = 2)
      .collect()
    assert(resized.forall(_.frame.length == 2))
    // frame 0 = bytes 0..3 → block averages (0+1)/2=0, (2+3)/2=2
    assert(resized.find(_.frame_idx == 0L).get.frame.toSeq == Seq[Byte](0, 2))
  }
}

class GraftApiSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("patchTable applies a diff so the patched side diffs clean, idempotently") {
    val a = Seq((1L, "x", 10L), (2L, "y2", 20L), (4L, "w", 40L)).toDF("k", "v", "n")
    val b = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L)).toDF("k", "v", "n")
    val diff = Graft.diffTables(
      graft.diff.TableSegment(a, Seq("k")), graft.diff.TableSegment(b, Seq("k")))
    val patched = Graft.patchTable(b, diff, Seq("k"))
    assert(patched.collect().map(_.mkString("|")).toSet ==
      a.collect().map(_.mkString("|")).toSet)
    // clean after patch, and patching again changes nothing
    val rediff = Graft.diffTables(
      graft.diff.TableSegment(a, Seq("k")), graft.diff.TableSegment(patched, Seq("k")))
    assert(rediff.isEmpty)
    assert(Graft.patchTable(patched, rediff, Seq("k")).count() == a.count())
    // normalized-string diffs (pushdown leaf shape) are refused loudly
    val stringDiff = diff.select(col("sign"), col("k").cast("string"),
      col("v"), col("n").cast("string"))
    val e = intercept[IllegalArgumentException](Graft.patchTable(b, stringDiff, Seq("k")))
    assert(e.getMessage.contains("original-typed"))
  }

  test("Algorithm.Estimate measures the regime and picks the matching differ") {
    import graft.diff.TableSegment
    def base(n: Long) = spark.range(n)
      .select(col("id").as("k"), (col("id") % 5).cast("string").as("v"))
    // sparse: 1/500 keys mutated → hashdiff (pruning pays)
    val a = base(10000)
    val sparse = base(10000).withColumn("v",
      when(col("k") % 500 === 0, lit("M")).otherwise(col("v")))
    assert(Graft.chooseAlgorithm(TableSegment(a.toDF(), Seq("k")),
      TableSegment(sparse.toDF(), Seq("k")), Seq("v"),
      Graft.DiffOptions(estimateMod = 4L)) == Graft.Algorithm.HashDiff)
    // dense: half the keys mutated → joindiff (one shuffle wins)
    val dense = base(10000).withColumn("v",
      when(col("k") % 2 === 0, lit("M")).otherwise(col("v")))
    assert(Graft.chooseAlgorithm(TableSegment(a.toDF(), Seq("k")),
      TableSegment(dense.toDF(), Seq("k")), Seq("v"),
      Graft.DiffOptions(estimateMod = 4L)) == Graft.Algorithm.JoinDiff)
    // the picked path produces the same rows as an explicit choice
    for (b <- Seq(sparse, dense)) {
      val est = Graft.diffTables(TableSegment(a.toDF(), Seq("k")),
        TableSegment(b.toDF(), Seq("k")),
        Graft.DiffOptions(algorithm = Graft.Algorithm.Estimate, estimateMod = 4L))
      val ref = Graft.diffTables(TableSegment(a.toDF(), Seq("k")),
        TableSegment(b.toDF(), Seq("k")),
        Graft.DiffOptions(algorithm = Graft.Algorithm.JoinDiff))
      assert(est.collect().map(_.mkString("|")).toSet ==
        ref.collect().map(_.mkString("|")).toSet)
    }
  }

  test("diffTables end-to-end over the public API") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "z")).toDF("k", "v")
    val segA = graft.diff.TableSegment(a, Seq("k"))
    val segB = graft.diff.TableSegment(b, Seq("k"))
    val d = Graft.diffTables(segA, segB).select("sign", "k").as[(String, Long)].collect().toSet
    assert(d == Set(("-", 2L), ("+", 2L)))
  }

  test("materializeDiff appends capped diff rows") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((1L, "X"), (2L, "Y"), (3L, "Z")).toDF("k", "v")
    val out = java.nio.file.Files.createTempDirectory("mdiff").toString + "/diff"
    val d = Graft.diffTables(graft.diff.TableSegment(a, Seq("k")),
      graft.diff.TableSegment(b, Seq("k")))
    Graft.materializeDiff(d, out, limit = 4)
    Graft.materializeDiff(d, out, limit = 4)  // append mode
    assert(spark.read.parquet(out).count() == 8)
  }

  test("ignoreColumns drops a hot column from the compare") {
    val a = Seq((1L, "x", "same")).toDF("k", "noisy", "stable")
    val b = Seq((1L, "y", "same")).toDF("k", "noisy", "stable")
    val segA = graft.diff.TableSegment(a, Seq("k"))
    val segB = graft.diff.TableSegment(b, Seq("k"))
    assert(Graft.diffTables(segA, segB).count() == 2)
    assert(Graft.diffTables(segA, segB,
      Graft.DiffOptions(ignoreColumns = Seq("noisy"))).count() == 0)
    assert(Graft.diffTables(segA, segB, Graft.DiffOptions(
      algorithm = Graft.Algorithm.HashDiff, ignoreColumns = Seq("noisy"))).count() == 0)
  }

  test("jsonColumns: reordered keys are not a diff, value changes are") {
    val a = Seq((1L, """{"x": "1", "y": "2"}"""), (2L, """{"x": "1"}"""))
      .toDF("k", "props")
    val b = Seq((1L, """{"y":"2","x":"1"}"""), (2L, """{"x": "9"}"""))
      .toDF("k", "props")
    val segA = graft.diff.TableSegment(a, Seq("k"))
    val segB = graft.diff.TableSegment(b, Seq("k"))
    assert(Graft.diffTables(segA, segB).count() == 4) // raw strings: both keys differ
    val equiv = Graft.diffTables(segA, segB, Graft.DiffOptions(jsonColumns = Seq("props")))
    val keys = equiv.select("k").as[Long].collect().toSet
    assert(keys == Set(2L)) // key 1 is JSON-equivalent, key 2 genuinely changed
  }

  test("connectToTable reads csv sources and diffs them against parquet") {
    val dir = java.nio.file.Files.createTempDirectory("csvsrc").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    df.write.option("header", "true").mode("overwrite").csv(s"$dir/t_csv")
    df.write.mode("overwrite").parquet(s"$dir/t_parquet")
    val segCsv = Graft.connectToTable(spark, s"csv:$dir/t_csv", Seq("k"))
    val segPq = Graft.connectToTable(spark, s"$dir/t_parquet", Seq("k"))
    assert(Graft.diffTables(segCsv, segPq).count() == 0)
  }

  test("diff formats: jsonl rows and the stats summary line") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "z")).toDF("k", "v")
    val d = Graft.diffTables(graft.diff.TableSegment(a, Seq("k")),
      graft.diff.TableSegment(b, Seq("k")))
    val jsonl = graft.diff.DiffFormat.toJsonl(d).collect()
    assert(jsonl.length == 2 && jsonl.forall(_.contains("\"sign\"")))
    val stats = graft.diff.DiffFormat.collectStats(
      Graft.diffStats(graft.diff.TableSegment(a, Seq("k")), graft.diff.TableSegment(b, Seq("k"))))
    assert(stats == graft.diff.DiffFormat.DiffStatsResult(0, 0, 1, 1))
    assert(graft.diff.DiffFormat.statsString(stats).contains("50.00% difference"))
  }

  test("diffTables rejects duplicate keys when validation is on") {
    val a = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val seg = graft.diff.TableSegment(a, Seq("k"))
    assertThrows[IllegalArgumentException] {
      Graft.diffTables(seg, seg)
    }
  }
}

class StreamingDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("continuous diff emits -old/+new on change, nothing on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
    val q = StreamingDiff.continuousDiff(input.toDS())
      .writeStream.format("memory").queryName("cdiff").outputMode("append").start()
    def row(k: Long, p: String, t: Long) = StreamingDiff.KeyedRow(k, p, new java.sql.Timestamp(t))
    input.addData(row(1, "a", 1), row(2, "b", 2))
    q.processAllAvailable()
    input.addData(row(1, "a", 3))  // replay, no-op
    input.addData(row(2, "c", 4))  // change
    q.processAllAvailable()
    val got = spark.table("cdiff").as[StreamingDiff.DiffEvent].collect().toSet
    q.stop()
    assert(got == Set(
      StreamingDiff.DiffEvent("+", 1, "a", 0), StreamingDiff.DiffEvent("+", 2, "b", 0),
      StreamingDiff.DiffEvent("-", 2, "b", 0), StreamingDiff.DiffEvent("+", 2, "c", 1)))
  }

  test("continuous diff: null payload is a tombstone — delete emitted, state cleared, no crash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
    val q = StreamingDiff.continuousDiff(input.toDS())
      .writeStream.format("memory").queryName("ctomb").outputMode("append").start()
    def row(k: Long, p: String, t: Long) = StreamingDiff.KeyedRow(k, p, new java.sql.Timestamp(t))
    input.addData(row(1, "a", 1))
    q.processAllAvailable()
    input.addData(row(1, null, 2)) // CDC delete
    q.processAllAvailable()
    input.addData(row(1, "b", 3)) // re-insert after the tombstone
    q.processAllAvailable()
    val got = spark.table("ctomb").as[StreamingDiff.DiffEvent].collect().toSeq
    q.stop()
    assert(got.toSet == Set(
      StreamingDiff.DiffEvent("+", 1, "a", 0),
      StreamingDiff.DiffEvent("-", 1, "a", 0),
      StreamingDiff.DiffEvent("+", 1, "b", 0)))
  }

  test("continuous diff orders sub-millisecond transitions by MICROS, not getTime") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
    val q = StreamingDiff.continuousDiff(input.toDS())
      .writeStream.format("memory").queryName("cmicro").outputMode("append").start()
    def rowUs(k: Long, p: String, us: Int) = {
      val t = new java.sql.Timestamp(0L)
      t.setNanos(us * 1000) // sub-millisecond: getTime == 0 for both events
      StreamingDiff.KeyedRow(k, p, t)
    }
    // added LATER-first: a getTime (ms) sort is stable and would keep this
    // arrival order, making "early" the final image
    input.addData(rowUs(1, "late", 900), rowUs(1, "early", 100))
    q.processAllAvailable()
    val got = spark.table("cmicro").as[StreamingDiff.DiffEvent].collect()
    q.stop()
    val finalPlus = got.filter(_.sign == "+").maxBy(_.seq)
    assert(finalPlus.payload == "late", got.mkString(", "))
  }

  test("continuous diff TTL evicts idle keys: beyond-TTL replay resurfaces as '+', no '-'") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
    // 1 s watermark, 1 s TTL so the fixture can age keys out quickly
    val q = StreamingDiff.continuousDiff(input.toDS(), watermark = "1 second", ttlMs = 1000L)
      .writeStream.format("memory").queryName("cttl").outputMode("append").start()
    def row(k: Long, p: String, t: Long) = StreamingDiff.KeyedRow(k, p, new java.sql.Timestamp(t))
    input.addData(row(1, "a", 10000))
    q.processAllAvailable()
    input.addData(row(1, "a", 10500)) // replay INSIDE the TTL: suppressed
    q.processAllAvailable()
    // advance the watermark far past key 1's timeout (10 s + 1 s TTL),
    // then trigger again so the eviction fires under the new watermark
    input.addData(row(99, "z", 30000))
    q.processAllAvailable()
    input.addData(row(98, "y", 31000))
    q.processAllAvailable()
    // beyond-TTL re-arrival of the SAME payload: state is gone, so this
    // is indistinguishable from a new key — '+' again, never a '-'
    input.addData(row(1, "a", 40000))
    q.processAllAvailable()
    val got = spark.table("cttl").as[StreamingDiff.DiffEvent].collect().toSeq
    q.stop()
    val key1 = got.filter(_.key == 1L)
    assert(key1.count(e => e.sign == "+" && e.payload == "a") == 2,
      s"pre- and post-eviction inserts expected, got $got")
    assert(!key1.exists(_.sign == "-"), s"eviction must not emit a CDC delete: $got")
  }

  test("continuousDiff watermark=null: unbounded legacy mode keeps weeks-late events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
    val q = StreamingDiff.continuousDiff(input.toDS(), watermark = null)
      .writeStream.format("memory").queryName("cunb").outputMode("append").start()
    def row(k: Long, p: String, t: Long) = StreamingDiff.KeyedRow(k, p, new java.sql.Timestamp(t))
    input.addData(row(1, "a", 100L * 86400000L)) // day 100
    q.processAllAvailable()
    // ~100 days EARLIER than the max seen event time: any watermark would
    // drop this before the state function — the backfill regime the
    // unbounded mode exists for
    input.addData(row(2, "b", 86400000L))
    q.processAllAvailable()
    val got = spark.table("cunb").as[StreamingDiff.DiffEvent].collect().toSet
    q.stop()
    assert(got == Set(
      StreamingDiff.DiffEvent("+", 1, "a", 0), StreamingDiff.DiffEvent("+", 2, "b", 0)))
  }

  test("hash-state continuous diff: replay suppressed, '-' carries null, repair converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
    val q = StreamingDiff.continuousDiffHashState(input.toDS())
      .writeStream.format("memory").queryName("chash").outputMode("append").start()
    def row(k: Long, p: String, t: Long) = StreamingDiff.KeyedRow(k, p, new java.sql.Timestamp(t))
    input.addData(row(1, "a", 1), row(2, "b", 2))
    q.processAllAvailable()
    input.addData(row(1, "a", 3))  // replay: the 48-bit hash matches, suppressed
    input.addData(row(2, "c", 4))  // change: '-' with null old image, '+' new
    input.addData(row(3, null, 5)) // tombstone for an absent key: nothing
    q.processAllAvailable()
    val got = spark.table("chash").as[StreamingDiff.DiffEvent].collect().toSet
    assert(got == Set(
      StreamingDiff.DiffEvent("+", 1, "a", 0), StreamingDiff.DiffEvent("+", 2, "b", 0),
      StreamingDiff.DiffEvent("-", 2, null, 0), StreamingDiff.DiffEvent("+", 2, "c", 1)))
    // the repair apply needs only keys + final '+' images, so the null
    // '-' payloads must still converge a remote copy
    val eng = graft.sources.DuckDbProcess.engine()
    try {
      eng.update("""CREATE TABLE chash_rt ("key" BIGINT, "payload" VARCHAR)""")
      eng.update("""INSERT INTO chash_rt VALUES (1, 'a'), (2, 'b')""")
      val (del, ins) = StreamingDiff.applyDiffEventsBatch(eng, "chash_rt",
        spark.table("chash").where(col("key") === 2L))
      assert((del, ins) == (1L, 1L))
      val got = eng.query("""SELECT "key", "payload" FROM chash_rt ORDER BY "key"""")
        .map(r => (r(0).get, r(1).get))
      assert(got == Seq(("1", "a"), ("2", "c")))
    } finally { q.stop(); eng.close() }
  }

  test("streaming near-dup: a doc already in the index does not match itself") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = (1 to 12).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((7L, text)).toDF("doc_id", "text")
    val indexBands = graft.dedup.Dedup.lshBands(corpus, "doc_id", "text").localCheckpoint()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingNearDup(input.toDS(), indexBands)
      .writeStream.format("memory").queryName("snself").outputMode("append").start()
    // replayed doc 7 (same id, same text) + a genuine near-dup doc 9
    input.addData(StreamingDiff.Doc(7L, text, new java.sql.Timestamp(1000)),
      StreamingDiff.Doc(9L, text, new java.sql.Timestamp(2000)))
    q.processAllAvailable()
    val got = spark.table("snself").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((9L, 7L)), s"self-pair must be filtered: $got")
  }

  test("streaming dedup retention survives the first-trigger watermark (epoch TTL bug)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingDedup(input.toDS())
      .writeStream.format("memory").queryName("sdttl").outputMode("append").start()
    val t0 = 1700000000000L // a modern event time, far past epoch+1h
    input.addData(StreamingDiff.Doc(1L, "same content", new java.sql.Timestamp(t0)))
    q.processAllAvailable()
    // unrelated doc advances the watermark to ~t0 - 1h >> epoch + 1h: an
    // epoch-based TTL would purge doc 1's state HERE
    input.addData(StreamingDiff.Doc(2L, "other content", new java.sql.Timestamp(t0 + 60000)))
    q.processAllAvailable()
    // replay of doc 1's content 10 minutes after the original — well
    // inside the 1h retention — must still be dropped
    input.addData(StreamingDiff.Doc(3L, "same content", new java.sql.Timestamp(t0 + 600000)))
    q.processAllAvailable()
    val got = spark.table("sdttl").as[StreamingDiff.Doc].collect().map(_.doc_id).toSet
    q.stop()
    assert(got == Set(1L, 2L), s"replayed content must stay deduped: $got")
  }

  test("streaming repair sink keeps a live remote converged to the feed's final state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val eng = graft.sources.DuckDbProcess.engine()
    try {
      eng.update("""CREATE TABLE srep ("key" BIGINT, "payload" VARCHAR)""")
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.KeyedRow]
      val q = StreamingDiff.repairSink(
        StreamingDiff.continuousDiff(input.toDS()), eng, "srep").start()
      def row(k: Long, p: String, t: Long) =
        StreamingDiff.KeyedRow(k, p, new java.sql.Timestamp(t))
      input.addData(row(1, "a", 1), row(2, "b", 2), row(3, "x", 3))
      q.processAllAvailable()
      // k=2 transitions TWICE inside one batch (b→c→d): the final-image
      // rule must land on 'd'; k=3 FLAPS x→y→x inside one batch — every
      // payload's signed count nets to zero, so only event ORDER identifies
      // x as the survivor (the sign-algebra bug deleted the row outright);
      // k=1 replays (no-op)
      input.addData(row(2, "c", 4), row(2, "d", 5), row(1, "a", 6),
        row(3, "y", 7), row(3, "x", 8))
      q.processAllAvailable()
      q.stop()
      val got = eng.query("""SELECT "key", "payload" FROM srep ORDER BY "key"""")
        .map(r => (r(0).get, r(1).get))
      assert(got == Seq(("1", "a"), ("2", "d"), ("3", "x")))
    } finally eng.close()
  }

  test("CDC checksum monitor replays to the exact batch bucket summary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // signed CDC ops: (op, k, v) — insert 1..50, update k=7 (−old +new),
    // delete k=13
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, Long, String)]
    val q = StreamingDiff.cdcChecksumMonitor(
        input.toDS().toDF("op", "k", "v"), Seq("k"), Seq("v"), buckets = 16)
      .writeStream.format("memory").queryName("cdcsum").outputMode("complete").start()
    input.addData((1L to 50L).map(i => (1, i, s"v$i")): _*)
    q.processAllAvailable()
    input.addData((-1, 7L, "v7"), (1, 7L, "V7!"), (-1, 13L, "v13"))
    q.processAllAvailable()
    val streamed = spark.table("cdcsum")
      .where(col("cnt") =!= 0 || col("checksum") =!= 0)
      .select("bucket", "cnt", "checksum")
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    q.stop()
    // the final table state, summarized by the batch path
    val finalState = (1L to 50L).filter(_ != 13L)
      .map(i => (i, if (i == 7L) "V7!" else s"v$i")).toDF("k", "v")
    val batch = graft.diff.TableSegment(finalState, Seq("k"))
      .fastBucketChecksums(graft.diff.HashDiffer.bucketOf(Seq("k"), 16))
      .select("bucket", "cnt", "checksum")
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming histogram quantiles are bit-identical to the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.RelationalQueries
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val q = StreamingDiff.streamingHistogramCounts(
        input.toDS().toDF("ts", "v"), "ts", "v",
        loCents = 0L, widthCents = 1000L, bins = 12, windowDur = "1 hour")
      .writeStream.format("memory").queryName("histq").outputMode("complete").start()
    def t(m: Long) = new java.sql.Timestamp(3600000L + m * 60000L)
    val vals = (1 to 10).map(_ * 10.0)
    input.addData(vals.take(6).map(v => (t(1), v)): _*)
    q.processAllAvailable()
    input.addData(vals.drop(6).map(v => (t(30), v)): _*) // same window, later batch
    q.processAllAvailable()
    val counts = spark.table("histq")
      .select(col("window.start").cast("string").as("grp"), col("bin"), col("cnt"))
    val streamed = RelationalQuantiles.fromCounts(counts)
    q.stop()
    val batch = RelationalQueries.histogramQuantiles(
        vals.map(v => ("w", v)).toDF("g", "v"), "g", "v",
        probsMilli = Seq(500, 1000), loCents = 0L, widthCents = 1000L, bins = 12)
      .select("p_milli", "n", "qbin", "est").as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  private object RelationalQuantiles {
    def fromCounts(counts: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] = {
      import spark.implicits._
      graft.operators.RelationalQueries.quantilesFromBinCounts(counts, "grp",
          probsMilli = Seq(500, 1000), loCents = 0L, widthCents = 1000L)
        .select("p_milli", "n", "qbin", "est").as[(Long, Long, Long, Double)].collect().toSet
    }
  }

  test("streaming decontamination flags benchmark leaks as they arrive, exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "secret eval question about spark internals here"))
      .toDF("doc_id", "text")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingContaminated(input.toDS(), bench, "doc_id", "text", n = 5)
      .writeStream.format("memory").queryName("scontam").outputMode("append").start()
    def doc(id: Long, t: String, ts: Long) = StreamingDiff.Doc(id, t, new java.sql.Timestamp(ts))
    input.addData(
      doc(1, "clean document with entirely unrelated words in it", 1000),
      doc(2, "prefix text secret eval question about spark internals here suffix", 2000))
    q.processAllAvailable()
    input.addData(
      doc(2, "prefix text secret eval question about spark internals here suffix", 3000), // replay → deduped
      doc(3, "another leak: secret eval question about spark internals here", 4000),
      doc(4, "clean again nothing shared with the benchmark at all", 5000))
    q.processAllAvailable()
    val got = spark.table("scontam").select("doc_id").as[Long].collect().toSeq
    q.stop()
    assert(got.sorted == Seq(2L, 3L))
    // agreement with the batch operator over the same final corpus
    val corpus = Seq(
      (1L, "clean document with entirely unrelated words in it"),
      (2L, "prefix text secret eval question about spark internals here suffix"),
      (3L, "another leak: secret eval question about spark internals here"),
      (4L, "clean again nothing shared with the benchmark at all")).toDF("doc_id", "text")
    val batch = graft.dedup.Dedup.contaminatedIds(corpus, bench, "doc_id", "text", n = 5)
      .as[Long].collect().toSet
    assert(batch == Set(2L, 3L))
  }

  test("fuzz: streaming contamination agrees with the batch operator on random corpora") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(99L)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def text() = Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docsData = (0L until 60L).map(i => (i, text()))
    val bench = docsData.filter(_._1 < 8).toDF("doc_id", "text")
    val corpusData = docsData.filter(_._1 >= 8)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingContaminated(input.toDS(), bench, "doc_id", "text", n = 3)
      .writeStream.format("memory").queryName("scontamfuzz").outputMode("append").start()
    // feed in two arbitrary batches
    val (b1, b2) = corpusData.splitAt(30)
    input.addData(b1.map { case (i, t) => StreamingDiff.Doc(i, t, new java.sql.Timestamp(i * 1000)) }: _*)
    q.processAllAvailable()
    input.addData(b2.map { case (i, t) => StreamingDiff.Doc(i, t, new java.sql.Timestamp(i * 1000)) }: _*)
    q.processAllAvailable()
    val streamed = spark.table("scontamfuzz").select("doc_id").as[Long].collect().toSet
    q.stop()
    val batch = graft.dedup.Dedup.contaminatedIds(
      corpusData.toDF("doc_id", "text"), bench, "doc_id", "text", n = 3)
      .as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < 52, s"vacuous fuzz: ${batch.size}")
    assert(streamed == batch)
  }

  test("bandsOfText is bit-identical to the batch lshBands aggregation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "completely different text with other words entirely"),
      (3L, "ab"),                      // < 3 tokens → no bands either way
      (4L, "a  b c d")                 // interior double space: empty token
    ).toDF("doc_id", "text")
    val batch = graft.dedup.Dedup.lshBands(docs, "doc_id", "text")
      .as[(Long, Long, String)].collect().toSet
    val scalaSide = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over the lazy cat",
      2L -> "completely different text with other words entirely",
      3L -> "ab",
      4L -> "a  b c d").flatMap { case (id, t) =>
      graft.dedup.Dedup.bandsOfText(t).map { case (b, bh) => (id, b, bh) }
    }.toSet
    assert(batch.nonEmpty && batch == scalaSide)
  }

  test("streaming near-dup flags arrivals against the stored index, dedups replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "an entirely unrelated reference document lives here")).toDF("doc_id", "text")
    val indexBands = graft.dedup.Dedup.lshBands(corpus, "doc_id", "text").localCheckpoint()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingNearDup(input.toDS(), indexBands)
      .writeStream.format("memory").queryName("sneardup").outputMode("append").start()
    def doc(id: Long, t: String, ts: Long) = StreamingDiff.Doc(id, t, new java.sql.Timestamp(ts))
    input.addData(
      doc(1, "the quick brown fox jumps over the lazy dog", 1000),  // dup of 100
      doc(2, "nothing in the index resembles this sentence at all", 2000))
    q.processAllAvailable()
    input.addData(
      doc(1, "the quick brown fox jumps over the lazy dog", 3000),  // replay → deduped
      doc(3, "an entirely unrelated reference document lives here", 4000)) // dup of 101
    q.processAllAvailable()
    val got = spark.table("sneardup").select("doc_id", "match_id")
      .as[(Long, Long)].collect().toSeq
    q.stop()
    assert(got.sorted == Seq((1L, 100L), (3L, 101L)))
    // agreement with the batch delta operator over the same final delta
    val delta = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "nothing in the index resembles this sentence at all"),
      (3L, "an entirely unrelated reference document lives here")).toDF("doc_id", "text")
    val batchPairs = graft.dedup.Dedup
      .deltaMinhashCandidatesFromBands(indexBands, delta, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 100L), (3L, 101L)))
  }

  test("streaming dedup emits each distinct content once, drops replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingDedup(input.toDS())
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    def doc(id: Long, t: String, ts: Long) = StreamingDiff.Doc(id, t, new java.sql.Timestamp(ts))
    input.addData(doc(1, "alpha", 1000), doc(2, "beta", 2000), doc(3, "alpha", 3000))
    q.processAllAvailable()
    input.addData(doc(4, "alpha", 4000), doc(5, "gamma", 5000)) // later replay + new
    q.processAllAvailable()
    val got = spark.table("sdedup").as[StreamingDiff.Doc].collect().map(_.doc_id).toSet
    q.stop()
    assert(got == Set(1L, 2L, 5L)) // 3 and 4 are duplicate content
  }

  test("streaming curate: dedup, quality gate, and decontamination in one query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "secret eval question about spark internals"))
      .toDF("doc_id", "text")
    // ~25 tokens, 100-2000 chars, contains a stopword → score 100
    def good(tag: String) =
      s"the $tag corpus document carries twenty five ordinary tokens " +
        s"spread across a sentence long enough to clear every quality " +
        s"threshold comfortably $tag"
    val contaminated =
      "the leaked document embeds secret eval question about spark internals " +
        "inside an otherwise long and perfectly ordinary high quality sentence " +
        "with plenty of tokens"
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.Doc]
    val q = StreamingDiff.streamingCurate(input.toDS(), bench, minScore = 60L)
      .writeStream.format("memory").queryName("scurate").outputMode("append").start()
    def doc(id: Long, t: String, ts: Long) = StreamingDiff.Doc(id, t, new java.sql.Timestamp(ts))
    input.addData(
      doc(1, good("alpha"), 1000),
      doc(2, good("alpha"), 2000),   // exact duplicate of 1 → dedup drops
      doc(3, contaminated, 3000),    // benchmark 5-gram → decontamination drops
      doc(4, "tiny noise", 4000),    // score 20 < 60 → quality gate drops
      doc(5, good("beta"), 5000))
    q.processAllAvailable()
    val got = spark.table("scurate").as[StreamingDiff.Doc].collect().map(_.doc_id).toSet
    q.stop()
    assert(got == Set(1L, 5L))
    // each drop agrees with its batch counterpart
    val corpus = Seq(3L -> contaminated).toDF("doc_id", "text")
    assert(graft.dedup.Dedup.contaminatedIds(corpus, bench, "doc_id", "text")
      .as[Long].collect().toSeq == Seq(3L))
    val scores = Seq(good("alpha"), "tiny noise").toDF("text")
      .select(graft.text.TextFunctions.qualityScore(col("text"))).as[Long].collect()
    assert(scores(0) >= 60L && scores(1) < 60L, scores.toSeq.toString)
  }

  test("streaming Hamming near-dup flags arrivals against the stored index, exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val anchor = 0x0000ABCDEF123456L
    val index = Seq((100L, anchor), (101L, anchor ^ (1L << 40) ^ 3L), // 3 bits off
      (102L, ~anchor & ((1L << 48) - 1)))                             // far
      .toDF("doc_id", "sig")
    val blocks = StreamingDiff.indexSigBlocks(index, "doc_id", "sig",
      maxHamming = 3, bits = 48).localCheckpoint()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.SigEvent]
    val q = StreamingDiff.streamingHammingNearDup(input.toDS(), blocks,
      maxHamming = 3, bits = 48)
      .writeStream.format("memory").queryName("shamming").outputMode("append").start()
    def ev(id: Long, s: Long, t: Long) =
      StreamingDiff.SigEvent(id, s, new java.sql.Timestamp(t))
    input.addData(
      ev(1, anchor, 1000),               // matches 100 (d=0) and 101 (d=3)
      ev(2, anchor ^ (1L << 47), 2000))  // 1 bit off anchor: matches 100, not 101 (d=4)
    q.processAllAvailable()
    input.addData(ev(1, anchor, 3000))   // replay → deduped
    q.processAllAvailable()
    val got = spark.table("shamming").select("doc_id", "match_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((1L, 100L, 0L), (1L, 101L, 3L), (2L, 100L, 1L)))
  }

  test("streaming sessionize: watermark-final sessions equal the batch window pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.UserEvent]
    val q = StreamingDiff.streamingSessionize(input.toDS())
      .writeStream.format("memory").queryName("ssess").outputMode("append").start()
    // two open sessions 2000 s apart (> the 1800 s gap) ...
    input.addData(StreamingDiff.UserEvent(1L, ts(5000)),
      StreamingDiff.UserEvent(1L, ts(7000)),
      StreamingDiff.UserEvent(2L, ts(6000)))
    q.processAllAvailable()
    // ... BRIDGED by a late in-watermark arrival into one session of 3
    input.addData(StreamingDiff.UserEvent(1L, ts(6000)))
    q.processAllAvailable()
    // sentinel advances the watermark past 7000+1800 → u1/u2 emit via
    // their event-time TIMEOUTS (they get no data in this batch)
    input.addData(StreamingDiff.UserEvent(99L, ts(20000)))
    q.processAllAvailable()
    // a later u1 session; second sentinel closes it and u99's first
    input.addData(StreamingDiff.UserEvent(1L, ts(19000)))
    q.processAllAvailable()
    input.addData(StreamingDiff.UserEvent(99L, ts(30000)))
    q.processAllAvailable()
    val got = spark.table("ssess").as[StreamingDiff.SessionOut].collect()
      .map(s => (s.user_id, s.session_idx, s.n_events, s.start_us, s.end_us)).toSet
    q.stop()
    val M = 1000000L
    assert(got == Set(
      (1L, 1L, 3L, 5000 * M, 7000 * M),
      (1L, 2L, 1L, 19000 * M, 19000 * M),
      (2L, 1L, 1L, 6000 * M, 6000 * M),
      (99L, 1L, 1L, 20000 * M, 20000 * M)))
    // batch parity: the same events through the batch q_sessionize rule
    // (u99's 30000 s event is still OPEN in the stream, so exclude it)
    val dir = java.nio.file.Files.createTempDirectory("ss").toString
    Seq((1L, 5000L), (1L, 7000L), (2L, 6000L), (1L, 6000L), (1L, 19000L), (99L, 20000L))
      .zipWithIndex.map { case ((u, sec), i) => (i.toLong, ts(sec), u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.operators.RelationalQueries.queries("q_sessionize")(spark, dir)
      .select("user_id", "session_idx", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(batch == got)
  }

  test("streaming funnel emits watermark-final stage hits matching the batch chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    def ev(u: Long, s: String, sec: Long) = StreamingDiff.StageEvent(u, s, ts(sec))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.StageEvent]
    val q = StreamingDiff.streamingFunnel(input.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    // u1 full chain; u2 click BEFORE view (stage 1 only); u3 purchase
    // before click (stage 2); u5's click arrives BEFORE its view but both
    // are in order by event time — the late view must still open stage 1
    input.addData(ev(1, "view", 5000), ev(1, "click", 5100),
      ev(2, "click", 5000), ev(2, "view", 5200),
      ev(3, "view", 5000), ev(3, "purchase", 5050), ev(3, "click", 5100),
      ev(5, "click", 6000), ev(99, "view", 4000))
    q.processAllAvailable()
    input.addData(ev(1, "purchase", 5300), ev(5, "view", 5500))
    q.processAllAvailable()
    // sentinel: watermark past everything above → all hits final
    input.addData(ev(99, "view", 60000))
    q.processAllAvailable()
    val got = spark.table("sfunnel").as[StreamingDiff.FunnelHit].collect()
      .map(h => (h.user_id, h.stage, h.at_us)).toSet
    q.stop()
    val M = 1000000L
    assert(got == Set(
      (1L, 1L, 5000 * M), (1L, 2L, 5100 * M), (1L, 3L, 5300 * M),
      (2L, 1L, 5200 * M),
      (3L, 1L, 5000 * M), (3L, 2L, 5100 * M),
      (5L, 1L, 5500 * M), (5L, 2L, 6000 * M),
      (99L, 1L, 4000 * M)))
    // batch parity on the same events: stage counts agree
    val df = Seq((1L, "view", 5000L), (1L, "click", 5100L), (1L, "purchase", 5300L),
      (2L, "click", 5000L), (2L, "view", 5200L),
      (3L, "view", 5000L), (3L, "purchase", 5050L), (3L, "click", 5100L),
      (5L, "click", 6000L), (5L, "view", 5500L),
      (99L, "view", 4000L), (99L, "view", 60000L))
      .map { case (u, s, sec) => (u, s, ts(sec)) }.toDF("user_id", "event_type", "ts")
    val batch = graft.operators.RelationalQueries
      .funnel(df, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("stage").select("n_users").as[Long].collect().toSeq
    val streamCounts = (1 to 3).map(s => got.count(_._2 == s).toLong)
    assert(batch == streamCounts, s"batch $batch vs stream $streamCounts")
  }

  test("fuzz: streaming funnel + sessionize equal their batch operators on random streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(57L)
    val types = Seq("view", "click", "purchase")
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    for (round <- 1 to 3) {
      // random per-user event streams over ~4 hours; feed in EVENT-TIME
      // order split at random points so watermark drops cannot occur and
      // batch/stream see identical data, while within-batch order is
      // shuffled (the merge logic must not depend on arrival order)
      val evs = (for {
        _ <- 0 until (40 + rnd.nextInt(60))
      } yield (rnd.nextInt(5).toLong, types(rnd.nextInt(3)),
        (10000L + rnd.nextInt(14400)).toLong)).sortBy(_._3)
      val sentinel = (99L, "view", 200000L)
      val batches = {
        val cuts = Seq.fill(3)(rnd.nextInt(evs.length + 1)).sorted
        (Seq(0) ++ cuts ++ Seq(evs.length)).sliding(2)
          .map { case Seq(a, b) => rnd.shuffle(evs.slice(a, b)) }.toSeq
      }
      // ---- streaming funnel vs batch funnel ----
      val fin = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.StageEvent]
      val fq = StreamingDiff.streamingFunnel(fin.toDS(), types)
        .writeStream.format("memory").queryName(s"sfz$round").outputMode("append").start()
      batches.foreach { b =>
        if (b.nonEmpty) {
          fin.addData(b.map { case (u, t, sec) => StreamingDiff.StageEvent(u, t, ts(sec)) }: _*)
          fq.processAllAvailable()
        }
      }
      fin.addData(StreamingDiff.StageEvent(sentinel._1, sentinel._2, ts(sentinel._3)))
      fq.processAllAvailable()
      val streamHits = spark.table(s"sfz$round").as[StreamingDiff.FunnelHit].collect()
        .filter(_.user_id != 99L).map(h => (h.user_id, h.stage)).toSet
      fq.stop()
      val batchDf = (evs :+ sentinel).map { case (u, t, sec) => (u, t, ts(sec)) }
        .toDF("user_id", "event_type", "ts")
      val batchCounts = graft.operators.RelationalQueries
        .funnel(batchDf.where(col("user_id") =!= 99L), "user_id", "event_type", "ts", types)
        .orderBy("stage").select("n_users").as[Long].collect().toSeq
      val streamCounts = (1 to 3).map(s => streamHits.count(_._2 == s).toLong)
      assert(streamCounts == batchCounts, s"round $round: $streamCounts vs $batchCounts")
      // ---- streaming sessionize vs the batch window pass ----
      val sin = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingDiff.UserEvent]
      val sq = StreamingDiff.streamingSessionize(sin.toDS())
        .writeStream.format("memory").queryName(s"ssz$round").outputMode("append").start()
      batches.foreach { b =>
        if (b.nonEmpty) {
          sin.addData(b.map { case (u, _, sec) => StreamingDiff.UserEvent(u, ts(sec)) }: _*)
          sq.processAllAvailable()
        }
      }
      sin.addData(StreamingDiff.UserEvent(99L, ts(sentinel._3)))
      sq.processAllAvailable()
      val streamSess = spark.table(s"ssz$round").as[StreamingDiff.SessionOut].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.session_idx, s.n_events, s.start_us, s.end_us)).toSet
      sq.stop()
      // batch reference: gap rule over sorted per-user times
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val times = es.map(_._3 * 1000000L).sorted
        val sessions = times.foldLeft(List.empty[(Long, Long, Long)]) {
          case (acc, us) => acc match {
            case (s0, e0, n0) :: rest if us - e0 <= 1800000000L =>
              (s0, us, n0 + 1) :: rest
            case _ => (us, us, 1L) :: acc
          }
        }.reverse
        sessions.zipWithIndex.map { case ((s0, e0, n0), i) =>
          (u, i + 1L, n0, s0, e0) }
      }.toSet
      assert(streamSess == want, s"round $round sessionize")
    }
  }

  test("shingleHashesOf is bit-identical to the batch shingling") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g"), (2L, "x  y z"), (3L, "one"), (4L, ""))
      .toDF("doc_id", "text")
    for (n <- Seq(3, 5)) {
      val batch = graft.dedup.Dedup.shingleIndexRaw(docs, "doc_id", "text", n)
        .select(col("doc_id"), graft.dedup.Dedup.md5Int48(col("s")).as("h"))
        .as[(Long, Long)].collect().groupBy(_._1).view
        .mapValues(_.map(_._2).toSeq.sorted).toMap
      val local = docs.as[(Long, String)].collect().map { case (id, t) =>
        id -> graft.dedup.Dedup.shingleHashesOf(t, n).sorted
      }.filter(_._2.nonEmpty).toMap
      assert(local == batch, s"n=$n")
    }
  }
}
