package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity

/** Similarity search over the `embeddings` table (64-dim float vectors). */
object EmbeddingQueries {
  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  val queries: Map[String, Q] = Map(
    "q_ann_topk" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      Similarity.bruteForceTopK(q, c, 10).orderBy("query_id", "rank")
    }),

    "q_embedding_neardup" -> ((s, d) =>
      Similarity.similarPairs(emb(s, d), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b")),

    // Embedding-space decontamination across corpora: label-0 vectors play
    // the benchmark, the rest the training side; every training vector
    // reports its nearest benchmark neighbor and a leak flag. Broadcast-
    // exact (eval sets are small by nature), so the oracle is plain
    // brute force over the same folds.
    // Embedding-distribution drift between two corpus snapshots: cluster
    // shares (the label cells here; kmeansCells when unlabeled) compared
    // with the same integer milli-bits PSI as the numeric histogram
    // monitor (RelationalQueries.psiOverCounts — everything after the two
    // per-cell counts is O(cells)). v2 deterministically drops ~2.4% of
    // vectors and double-weights the %17 stratum, so shares genuinely
    // shift and the PSI is non-zero.
    "q_embedding_drift" -> ((s, d) => {
      val v1 = emb(s, d)
      val v2 = v1.where(col("vec_id") % 41 =!= 0)
        .unionByName(v1.where(col("vec_id") % 17 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label")))
      def counts(df: DataFrame, out: String) =
        df.select(col("label").cast("long").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as(out))
      RelationalQueries.psiOverCounts(counts(v1, "cnt_a"), counts(v2, "cnt_b"))
    }),

    "q_semantic_decontaminate" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.semanticDecontaminate(
        e.where(col("label") =!= 0), e.where(col("label") === 0),
        "vec_id", "embedding", threshold = 0.4)
        .orderBy("doc_id")
    }),

    "q_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopK(emb(s, d), "vec_id", "embedding", "label",
        col("vec_id") < 5, k = 8).orderBy("query_id", "rank")),

    // The SERVING path: 98% of the corpus builds a persisted IVF index
    // (centroid sums + pre-normalized postings on disk), the held-out 2%
    // plays NEW query vectors — scored against the broadcast centroids,
    // probing their 2 best cells (the recall knob), exact dots against
    // only those cells' postings. The oracle replays the whole build +
    // 2-probe serve in SQL.
    "q_ann_ivf_index" -> ((s, d) => {
      val e = emb(s, d)
      val path = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
      Similarity.saveIvfIndex(e.where(col("vec_id") % 100 < 98),
        "vec_id", "embedding", "label", path)
      Similarity.ivfQueryIndex(s, path,
        e.where(col("vec_id") % 100 >= 98)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        k = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // INCREMENTAL index maintenance: 90% of the corpus builds the index,
    // the next 8% arrives later as a delta folded in by appendToIvfIndex
    // (FIXED centroids, postings appended, cellcounts merged), and the
    // held-out 2% serves as queries. The oracle computes centroids from
    // the base slice only and assigns base ∪ delta against them — exactly
    // the fixed-centroid rebuild the append must equal.
    "q_ivf_append" -> ((s, d) => {
      val e = emb(s, d)
      val path = java.nio.file.Files.createTempDirectory("ivfapp").toString + "/idx"
      Similarity.saveIvfIndex(e.where(col("vec_id") % 100 < 90),
        "vec_id", "embedding", "label", path)
      Similarity.appendToIvfIndex(s, path,
        e.where(col("vec_id") % 100 >= 90 && col("vec_id") % 100 < 98),
        "vec_id", "embedding")
      Similarity.ivfQueryIndex(s, path,
        e.where(col("vec_id") % 100 >= 98)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        k = 8, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // LSH-pruned near-dup: the pairs q_embedding_neardup finds, minus any
    // whose 40 deterministic sign bits never collide in a band — recall vs
    // the exact query is the spec's concern; the gate pins the bucketing
    // and the surviving pairs bit-for-bit.
    "q_ann_lsh" -> ((s, d) =>
      Similarity.lshNearDup(emb(s, d), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b")),

    // kNN GRAPH: every vector's top-5 cosine neighbors, 2-probe IVF over
    // the label cells — the all-queries structure SemDeDup/diversity
    // sampling consume. The oracle replays the whole pipeline: integer
    // centroids from the labels, every vector re-scored against them,
    // top-2 probe cells per query vs argmax cell per neighbor, exact
    // unit-vector dots, rank ties to the smaller neighbor id.
    "q_knn_graph" -> ((s, d) =>
      Similarity.knnGraph(emb(s, d), "vec_id", "embedding", "label",
        k = 5, nProbe = 2).orderBy("query_id", "rank")),

    // Auto-clustered kNN graph — the label-free production spelling:
    // cells = max(1, n/32) deterministic k-means cells (so pair volume
    // stays ~nProbe·n·32 at ANY corpus size), then the same 2-probe
    // graph. The oracle replays k-means (corpus-derived seed count via
    // a scalar-subquery LIMIT), re-derives integer centroids from the
    // final assignment, and replays the probe + dot ranking.
    "q_knn_graph_auto" -> ((s, d) =>
      Similarity.knnGraphAuto(emb(s, d), "vec_id", "embedding",
        k = 5, nProbe = 2, targetCellSize = 32)
        .orderBy("query_id", "rank")),

    // ANN EVALUATION as a first-class gate: recall@k of the IVF path against
    // the exact brute force, integer hit counts per query (the caller
    // divides) — how a pipeline decides whether its coarse quantizer is
    // good enough before trusting it at scale.
    "q_ann_recall" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val exact = Similarity.bruteForceTopK(q, c, 8)
      val approx = Similarity.ivfTopK(e, "vec_id", "embedding", "label",
        col("vec_id") < 5, k = 8)
      Similarity.recallAtK(exact, approx, 8).orderBy("query_id")
    }),

    // int8 quantization summarized per vector: the dequantization scale and
    // an md5 signature of the quantized components (proves bit parity of
    // all 64 rounded values without exploding the output).
    "q_embedding_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(emb(s, d), "embedding")
        .select(col("vec_id"), col("maxabs"),
          md5(array_join(transform(col("q"), _.cast("string")), ",")).as("qsig"))
        .orderBy("vec_id")),

    // Deterministic k-means: the cluster column for SemDeDup/IVF when no
    // label exists — lowest-id seeds, integer centroids, broadcast-kernel
    // assignment, 2 Lloyd rounds; bit-identical in any engine.
    "q_kmeans_cells" -> ((s, d) =>
      Similarity.kmeansCells(emb(s, d), "vec_id", "embedding", k = 8, iterations = 2)
        .orderBy("vec_id")),

    // SemDeDup: near-dup flags computed within coarse clusters only (the
    // label column plays the k-means cell) — pair volume n²/k, corpus never
    // broadcast, survivors deterministic (lowest id per similar group).
    "q_semantic_dedup" -> ((s, d) =>
      Similarity.semanticDupFlags(emb(s, d), "vec_id", "embedding", "label", 0.45)
        .select(col("id").as("vec_id"), col("cell").as("label"), col("is_dup"))
        .orderBy("vec_id")),

    // Label-free SemDeDup: the full composition — k-means produces the
    // cells, within-cell near-dup flags follow. What a corpus without
    // curated labels actually runs.
    "q_semantic_dedup_auto" -> ((s, d) => {
      val e = emb(s, d)
      val cells = Similarity.kmeansCells(e, "vec_id", "embedding", k = 8, iterations = 2)
      val withCell = e.join(cells, Seq("vec_id"))
        .select(col("vec_id"), col("cell"), col("embedding"))
      Similarity.semanticDupFlags(withCell, "vec_id", "embedding", "cell", 0.45)
        .select(col("id").as("vec_id"), col("cell"), col("is_dup"))
        .orderBy("vec_id")
    }),

    // Incremental SemDeDup: vectors with vec_id % 11 == 0 play a corpus
    // refresh's NEW arrivals, the rest the existing kept corpus. Only the
    // delta is flagged, only touched cells do kernel work (semi-join on
    // the cell key before anything shuffles) — the embedding-side
    // analogue of q_delta_dedup's refresh economics.
    "q_delta_semantic_dedup" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.deltaSemanticDupFlags(
        e.where(col("vec_id") % 11 =!= 0), e.where(col("vec_id") % 11 === 0),
        "vec_id", "embedding", "label", 0.45)
        .select(col("id").as("vec_id"), col("cell").as("label"), col("is_dup"))
        .orderBy("vec_id")
    }),

    "q_embedding_label_centroid_dist" -> ((s, d) => {
      // Per-label centroid, then each vector's dot with its label centroid —
      // the IVF coarse-quantizer building block. Components are quantized
      // with floor(x*1e6) so every aggregate is exact integer math (a
      // double→decimal cast would tie-break differently across engines).
      // Result is the dot scaled by 1e12·n(label).
      val e = emb(s, d)
      val dims = e.select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("xi", floor(col("x").cast("double") * 1000000).cast("long"))
      val cent = dims.groupBy("label", "pos")
        .agg(sum(col("xi")).as("sxi"), count(lit(1)).as("n"))
      dims.join(broadcast(cent), Seq("label", "pos"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("xi") * col("sxi")).as("dot_q"), min(col("n")).as("n"))
        .orderBy("vec_id")
    }),
  )

  /** Two Lloyd rounds of the deterministic k-means as reusable CTEs
    * (through `a2` = the final (vid, cell) assignment) — shared by the
    * k-means gate, the label-free SemDeDup composition, and the
    * auto-clustered kNN graph. `kSql` is the seed-count expression
    * (a literal, or a scalar subquery for corpus-derived k). */
  private def kmeansCtes(kSql: String = "8") =
    s"""dims AS (
      |  SELECT vec_id AS vid, i - 1 AS pos,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
      |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
      |c0 AS (SELECT vid AS cell, pos, xi AS sxi, 1::BIGINT AS n FROM dims
      |       WHERE vid IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $kSql)),
      |s1 AS (SELECT d.vid, c.cell,
      |         CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score
      |       FROM dims d JOIN c0 c ON d.pos = c.pos GROUP BY d.vid, c.cell),
      |a1 AS (SELECT vid, cell FROM (
      |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, cell ASC) AS rn
      |         FROM s1) WHERE rn = 1),
      |c1 AS (SELECT a1.cell, d.pos, CAST(SUM(d.xi) AS BIGINT) AS sxi, COUNT(*) AS n
      |       FROM dims d JOIN a1 ON d.vid = a1.vid GROUP BY a1.cell, d.pos),
      |s2 AS (SELECT d.vid, c.cell,
      |         CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score
      |       FROM dims d JOIN c1 c ON d.pos = c.pos GROUP BY d.vid, c.cell),
      |a2 AS (SELECT vid, cell FROM (
      |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, cell ASC) AS rn
      |         FROM s2) WHERE rn = 1)""".stripMargin

  /** The shared tail of the two kNN-graph oracles: zero-norm-guarded unit
    * vectors, the probe × argmax-member join (expects CTEs `probes` and
    * `assigned` of (vid, cell)), exact left-fold dots, and the
    * (sim DESC, neighbor ASC) top-5 ranking — one definition so the two
    * replays cannot drift apart. */
  private val knnRankTail =
    """nv AS (
      |  SELECT vec_id, CASE WHEN nrm = 0
      |      THEN list_transform(embedding, x -> 0.0)
      |      ELSE list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm)
      |    END AS nv
      |  FROM (SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
      |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c)) AS nrm
      |    FROM embeddings)),
      |s AS (
      |  SELECT p.vid AS query_id, a.vid AS neighbor_id,
      |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, c.nv),
      |        x -> x[1] * x[2])), (ac, x) -> ac + x) AS sim
      |  FROM probes p JOIN assigned a ON p.cell = a.cell AND p.vid <> a.vid
      |  JOIN nv q ON q.vec_id = p.vid JOIN nv c ON c.vec_id = a.vid)
      |SELECT query_id, neighbor_id, rank, sim FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM s) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_ann_topk" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, c.nv),
        |        x -> x[1] * x[2])), (a, x) -> a + x) AS sim
        |  FROM n q, n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, rank, sim FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM sims) WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_embedding_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |s AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(a.nv, b.nv),
        |        x -> x[1] * x[2])), (ac, x) -> ac + x) AS sim
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM s WHERE sim >= 0.45 ORDER BY id_a, id_b""".stripMargin,

    "q_embedding_drift" ->
      """WITH v2 AS (
        |  SELECT vec_id, label FROM embeddings WHERE vec_id % 41 <> 0
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, label FROM embeddings WHERE vec_id % 17 = 0),
        |ca AS (SELECT CAST(label AS BIGINT) AS bin, COUNT(*) AS cnt_a
        |       FROM embeddings GROUP BY 1),
        |cb AS (SELECT CAST(label AS BIGINT) AS bin, COUNT(*) AS cnt_b
        |       FROM v2 GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ca.bin, cb.bin) AS bin,
        |    CAST(COALESCE(cnt_a, 0) AS BIGINT) AS cnt_a,
        |    CAST(COALESCE(cnt_b, 0) AS BIGINT) AS cnt_b
        |  FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
        |tot AS (SELECT SUM(cnt_a) AS tot_a, SUM(cnt_b) AS tot_b FROM j),
        |p AS (
        |  SELECT CAST((cnt_a * 1000) // tot_a AS BIGINT) AS pa_milli,
        |         CAST((cnt_b * 1000) // tot_b AS BIGINT) AS pb_milli,
        |         cnt_a, cnt_b
        |  FROM j, tot)
        |SELECT
        |  CAST(SUM((pa_milli - pb_milli) *
        |    (length(format('{:b}', pa_milli + 1)) - length(format('{:b}', pb_milli + 1)))) AS BIGINT)
        |    AS psi_millibits,
        |  CAST(SUM(CASE WHEN cnt_a > 0 AND cnt_b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_a_only,
        |  CAST(SUM(CASE WHEN cnt_b > 0 AND cnt_a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_b_only,
        |  CAST(SUM(CASE WHEN cnt_a > 0 AND cnt_b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_shared
        |FROM p""".stripMargin,

    "q_semantic_decontaminate" ->
      """WITH n AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |s AS (
        |  SELECT t.vec_id AS doc_id, b.vec_id AS bench_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(t.nv, b.nv),
        |        x -> x[1] * x[2])), (ac, x) -> ac + x) AS sim
        |  FROM n t JOIN n b ON t.label <> 0 AND b.label = 0),
        |r AS (
        |  SELECT doc_id, bench_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim DESC, bench_id ASC) AS rn
        |  FROM s)
        |SELECT doc_id, bench_id AS nearest_bench_id, sim AS max_sim,
        |  sim >= 0.4 AS flag_contaminated
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_ann_lsh" ->
      """WITH dims AS (
        |  SELECT vec_id AS id, i - 1 AS j,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
        |proj AS (
        |  SELECT id, h,
        |    SUM((('0x' || substring(md5(h::VARCHAR || '|' || j::VARCHAR), 1, 12))::BIGINT
        |         % 2 * 2 - 1) * xi) AS p
        |  FROM dims, unnest(range(0, 40)) AS hh(h) GROUP BY id, h),
        |bk AS (
        |  SELECT id, h // 5 AS band,
        |    SUM(CASE WHEN p >= 0 THEN (1 << (h % 5)) ELSE 0 END) AS bucket
        |  FROM proj GROUP BY id, h // 5),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        |n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |s AS (
        |  SELECT id_a, id_b,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(a.nv, b.nv),
        |        x -> x[1] * x[2])), (ac, x) -> ac + x) AS sim
        |  FROM cand JOIN n a ON cand.id_a = a.vec_id JOIN n b ON cand.id_b = b.vec_id)
        |SELECT id_a, id_b, sim FROM s WHERE sim >= 0.45 ORDER BY id_a, id_b""".stripMargin,

    "q_knn_graph" ->
      ("""WITH dims AS (
        |  SELECT vec_id AS vid, CAST(label AS BIGINT) AS cell, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
        |cent AS (SELECT cell, pos, CAST(SUM(xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM dims GROUP BY cell, pos),
        |scores AS (
        |  SELECT d.vid, c.cell AS ccell,
        |    CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score
        |  FROM dims d JOIN cent c ON d.pos = c.pos GROUP BY d.vid, c.cell),
        |ranked AS (
        |  SELECT vid, ccell AS cell,
        |    ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, ccell ASC) AS rn
        |  FROM scores),
        |probes AS (SELECT vid, cell FROM ranked WHERE rn <= 2),
        |assigned AS (SELECT vid, cell FROM ranked WHERE rn = 1),
        |""".stripMargin + knnRankTail),

    "q_knn_graph_auto" ->
      (s"""WITH ${kmeansCtes("(SELECT greatest(1, count(*) // 32) FROM embeddings)")},""" +
      """
        |cent2 AS (SELECT a2.cell, d.pos, CAST(SUM(d.xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM dims d JOIN a2 ON d.vid = a2.vid GROUP BY a2.cell, d.pos),
        |scores3 AS (
        |  SELECT d.vid, c.cell AS ccell,
        |    CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score
        |  FROM dims d JOIN cent2 c ON d.pos = c.pos GROUP BY d.vid, c.cell),
        |ranked3 AS (
        |  SELECT vid, ccell AS cell,
        |    ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, ccell ASC) AS rn
        |  FROM scores3),
        |probes AS (SELECT vid, cell FROM ranked3 WHERE rn <= 2),
        |assigned AS (SELECT vid, cell FROM ranked3 WHERE rn = 1),
        |""".stripMargin + knnRankTail),

    "q_ann_ivf" ->
      """WITH dims AS (
        |  SELECT vec_id AS vid, label AS cell, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
        |cent AS (SELECT cell, pos, CAST(SUM(xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM dims GROUP BY cell, pos),
        |scores AS (
        |  SELECT d.vid, c.cell AS ccell,
        |    CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score
        |  FROM dims d JOIN cent c ON d.pos = c.pos GROUP BY d.vid, c.cell),
        |assigned AS (
        |  SELECT vid, ccell AS acell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, ccell ASC) AS rn
        |    FROM scores) WHERE rn = 1),
        |unitv AS (
        |  SELECT vec_id AS uid, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |members AS (SELECT u.uid, a.acell, u.nv FROM unitv u JOIN assigned a ON u.uid = a.vid),
        |sims AS (
        |  SELECT q.uid AS query_id, c.uid AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, c.nv),
        |        x -> x[1] * x[2])), (a, x) -> a + x) AS sim
        |  FROM members q JOIN members c ON q.acell = c.acell AND q.uid <> c.uid
        |  WHERE q.uid < 5)
        |SELECT query_id, neighbor_id, rank, sim FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims) WHERE rank <= 8 ORDER BY query_id, rank""".stripMargin,

    "q_ann_ivf_index" ->
      """WITH dims AS (
        |  SELECT vec_id AS vid, label AS cell, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)
        |  WHERE vec_id % 100 < 98),
        |cent AS (SELECT cell, pos, CAST(SUM(xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM dims GROUP BY cell, pos),
        |assigned AS (
        |  SELECT vid, ccell AS acell FROM (
        |    SELECT d.vid, c.cell AS ccell,
        |      CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score,
        |      ROW_NUMBER() OVER (PARTITION BY d.vid
        |        ORDER BY CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) DESC,
        |                 c.cell ASC) AS rn
        |    FROM dims d JOIN cent c ON d.pos = c.pos GROUP BY d.vid, c.cell)
        |  WHERE rn = 1),
        |qdims AS (
        |  SELECT vec_id AS qid, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)
        |  WHERE vec_id % 100 >= 98),
        |probes AS (
        |  SELECT qid, ccell FROM (
        |    SELECT q.qid, c.cell AS ccell,
        |      ROW_NUMBER() OVER (PARTITION BY q.qid
        |        ORDER BY CAST(CAST(SUM(q.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) DESC,
        |                 c.cell ASC) AS rn
        |    FROM qdims q JOIN cent c ON q.pos = c.pos GROUP BY q.qid, c.cell)
        |  WHERE rn <= 2),
        |unitv AS (
        |  SELECT vec_id AS uid, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |members AS (
        |  SELECT u.uid, a.acell, u.nv FROM unitv u JOIN assigned a ON u.uid = a.vid),
        |sims AS (
        |  SELECT p.qid AS query_id, m.uid AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, m.nv),
        |        x -> x[1] * x[2])), (a, x) -> a + x) AS sim
        |  FROM probes p
        |  JOIN members m ON m.acell = p.ccell
        |  JOIN unitv q ON q.uid = p.qid
        |  WHERE m.uid <> p.qid)
        |SELECT query_id, neighbor_id, rank, sim FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims) WHERE rank <= 8 ORDER BY query_id, rank""".stripMargin,

    // fixed-centroid rebuild: centroids from the base slice (< 90) ONLY;
    // base ∪ delta (< 98) argmax-assigned against them — what
    // appendToIvfIndex must be indistinguishable from
    "q_ivf_append" ->
      """WITH bdims AS (
        |  SELECT vec_id AS vid, label AS cell, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)
        |  WHERE vec_id % 100 < 90),
        |cent AS (SELECT cell, pos, CAST(SUM(xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM bdims GROUP BY cell, pos),
        |dims AS (
        |  SELECT vec_id AS vid, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)
        |  WHERE vec_id % 100 < 98),
        |assigned AS (
        |  SELECT vid, ccell AS acell FROM (
        |    SELECT d.vid, c.cell AS ccell,
        |      CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score,
        |      ROW_NUMBER() OVER (PARTITION BY d.vid
        |        ORDER BY CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) DESC,
        |                 c.cell ASC) AS rn
        |    FROM dims d JOIN cent c ON d.pos = c.pos GROUP BY d.vid, c.cell)
        |  WHERE rn = 1),
        |qdims AS (
        |  SELECT vec_id AS qid, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)
        |  WHERE vec_id % 100 >= 98),
        |probes AS (
        |  SELECT qid, ccell FROM (
        |    SELECT q.qid, c.cell AS ccell,
        |      ROW_NUMBER() OVER (PARTITION BY q.qid
        |        ORDER BY CAST(CAST(SUM(q.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) DESC,
        |                 c.cell ASC) AS rn
        |    FROM qdims q JOIN cent c ON q.pos = c.pos GROUP BY q.qid, c.cell)
        |  WHERE rn <= 2),
        |unitv AS (
        |  SELECT vec_id AS uid, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |members AS (
        |  SELECT u.uid, a.acell, u.nv FROM unitv u JOIN assigned a ON u.uid = a.vid),
        |sims AS (
        |  SELECT p.qid AS query_id, m.uid AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, m.nv),
        |        x -> x[1] * x[2])), (a, x) -> a + x) AS sim
        |  FROM probes p
        |  JOIN members m ON m.acell = p.ccell
        |  JOIN unitv q ON q.uid = p.qid
        |  WHERE m.uid <> p.qid)
        |SELECT query_id, neighbor_id, rank, sim FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims) WHERE rank <= 8 ORDER BY query_id, rank""".stripMargin,

    "q_ann_recall" ->
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |exact_sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, c.nv),
        |        x -> x[1] * x[2])), (a, x) -> a + x) AS sim
        |  FROM n q, n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |    FROM exact_sims) WHERE rank <= 8),
        |dims AS (
        |  SELECT vec_id AS vid, label AS cell, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
        |cent AS (SELECT cell, pos, CAST(SUM(xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM dims GROUP BY cell, pos),
        |scores AS (
        |  SELECT d.vid, c.cell AS ccell,
        |    CAST(CAST(SUM(d.xi * c.sxi) AS BIGINT) AS DOUBLE) / MAX(c.n) AS score
        |  FROM dims d JOIN cent c ON d.pos = c.pos GROUP BY d.vid, c.cell),
        |assigned AS (
        |  SELECT vid, ccell AS acell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY score DESC, ccell ASC) AS rn
        |    FROM scores) WHERE rn = 1),
        |members AS (SELECT u.vec_id AS uid, a.acell, u.nv FROM n u JOIN assigned a ON u.vec_id = a.vid),
        |approx_sims AS (
        |  SELECT q.uid AS query_id, c.uid AS neighbor_id,
        |    list_reduce(list_prepend(0.0, list_transform(list_zip(q.nv, c.nv),
        |        x -> x[1] * x[2])), (a, x) -> a + x) AS sim
        |  FROM members q JOIN members c ON q.acell = c.acell AND q.uid <> c.uid
        |  WHERE q.uid < 5),
        |hits AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |    FROM approx_sims) WHERE rank <= 8)
        |SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS k_exact,
        |  CAST(SUM(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        |FROM ex e LEFT JOIN hits h ON e.query_id = h.query_id AND e.neighbor_id = h.neighbor_id
        |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "q_embedding_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS maxabs
        |  FROM embeddings)
        |SELECT vec_id, maxabs,
        |  md5(array_to_string(
        |    [CASE WHEN maxabs = 0.0 THEN 0
        |          ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS BIGINT) END
        |     for x in embedding], ',')) AS qsig
        |FROM m ORDER BY vec_id""".stripMargin,

    "q_kmeans_cells" ->
      s"""WITH ${kmeansCtes()}
         |SELECT vid AS vec_id, cell FROM a2 ORDER BY vec_id""".stripMargin,

    "q_semantic_dedup_auto" ->
      s"""WITH ${kmeansCtes()},
         |n AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
         |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
         |  FROM embeddings),
         |m AS (SELECT n.vec_id, a2.cell, n.nv FROM n JOIN a2 ON n.vec_id = a2.vid),
         |dups AS (
         |  SELECT DISTINCT b.vec_id AS id
         |  FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_reduce(list_prepend(0.0, list_transform(list_zip(a.nv, b.nv),
         |      x -> x[1] * x[2])), (ac, x) -> ac + x) >= 0.45)
         |SELECT m.vec_id, m.cell, (dups.id IS NOT NULL) AS is_dup
         |FROM m LEFT JOIN dups ON m.vec_id = dups.id
         |ORDER BY m.vec_id""".stripMargin,

    "q_delta_semantic_dedup" ->
      """WITH n AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |d AS (SELECT * FROM n WHERE vec_id % 11 = 0),
        |dups AS (
        |  SELECT DISTINCT b.vec_id AS id
        |  FROM d b JOIN n a ON a.label = b.label AND a.vec_id <> b.vec_id
        |  WHERE (a.vec_id % 11 <> 0 OR a.vec_id < b.vec_id)
        |    AND list_reduce(list_prepend(0.0, list_transform(list_zip(a.nv, b.nv),
        |      x -> x[1] * x[2])), (ac, x) -> ac + x) >= 0.45)
        |SELECT d.vec_id, d.label, (dups.id IS NOT NULL) AS is_dup
        |FROM d LEFT JOIN dups ON d.vec_id = dups.id
        |ORDER BY d.vec_id""".stripMargin,

    "q_semantic_dedup" ->
      """WITH n AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
        |      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), (a, c) -> a + c))) AS nv
        |  FROM embeddings),
        |dups AS (
        |  SELECT DISTINCT b.vec_id AS id
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_prepend(0.0, list_transform(list_zip(a.nv, b.nv),
        |      x -> x[1] * x[2])), (ac, x) -> ac + x) >= 0.45)
        |SELECT e.vec_id, e.label, (dups.id IS NOT NULL) AS is_dup
        |FROM embeddings e LEFT JOIN dups ON e.vec_id = dups.id
        |ORDER BY e.vec_id""".stripMargin,

    "q_embedding_label_centroid_dist" ->
      """WITH dims AS (
        |  SELECT vec_id, label, i - 1 AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xi
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS r(i)),
        |cent AS (
        |  SELECT label, pos, CAST(SUM(xi) AS BIGINT) AS sxi, COUNT(*) AS n
        |  FROM dims GROUP BY label, pos)
        |SELECT d.vec_id, d.label,
        |  CAST(SUM(d.xi * c.sxi) AS BIGINT) AS dot_q, min(c.n) AS n
        |FROM dims d JOIN cent c ON d.label = c.label AND d.pos = c.pos
        |GROUP BY d.vec_id, d.label ORDER BY d.vec_id""".stripMargin,
  )
}
