package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity over an `Array[Float]` embedding column.
  *
  * Math is done per element in double precision with a zero-initialized left
  * fold (`aggregate`) so any engine computing the same fold gets the same
  * IEEE result bit-for-bit — no reliance on reduction order.
  *
  * Brute-force top-k broadcasts the (small) query set and streams the
  * candidate table through a broadcast nested-loop join: no shuffle of the
  * big side, scales linearly with candidates on a cluster.
  */
object Similarity {

  /** Codegen'd primitive dot (see [[graft.functions.DotProductDouble]]) —
    * bit-identical accumulation order to [[dotFold]], which stays as the
    * reference spelling the parity spec checks against. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductDouble.dot(a, b)

  /** The higher-order-function fold spelling of [[dot]] (CodegenFallback —
    * interpreted, boxing; kept as the cross-check reference only). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)


  /** √(v·v) through the codegen'd dot — the fold spelling
    * (`aggregate(transform(v, x²))`) multiplies the same elements in the
    * same ascending order, so the sum under the sqrt is bit-identical. */
  def norm(v: Column): Column = sqrt(graft.functions.DotProductDouble.dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalize each vector ONCE (two projections so the norm is
    * evaluated per row, not per element) — pairwise cosine then degrades to
    * a single dot product. On an n² pairs query this removes 2 of the 3
    * folds from the hot loop. */
  private def withUnitVector(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_nrm", norm(col(vecCol)))
      // zero-norm guard: an all-zero embedding (failed/padded embed row)
      // would normalize to NaN, and Spark SORTS NaN above every double and
      // treats NaN >= t as TRUE — the zero vector would rank as the #1
      // neighbor of every query and pass every threshold filter. A zero
      // unit vector instead gives sim 0 everywhere: never ranked, never
      // thresholded in, and consistent with the plain-Scala kernels.
      .withColumn(outCol, transform(col(vecCol), x =>
        when(col("_nrm") === 0.0, lit(0.0)).otherwise(x.cast("double") / col("_nrm"))))
      .drop("_nrm", vecCol)

  /** Top-k cosine neighbors for each query vector (exact, brute force). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // queries: (query_id, qv); candidates: (neighbor_id, cv)
    val qn = withUnitVector(queries, "qv", "qn")
    val cn = withUnitVector(candidates, "cv", "cn")
    val sims = cn.crossJoin(broadcast(qn))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** IVF-style ANN: vectors are assigned to the coarse cell whose MEAN
    * centroid maximizes the dot product (standard IVF coarse quantization);
    * a query only scans candidates in its own cell — at n vectors and k
    * cells the pair count drops from n² to ~n²/k. Centroid math is
    * integer-quantized (floor(x·1e6)): the dot with the component SUM is
    * exact integer, and the only float step is one exactly-rounded division
    * by the member count, so assignment is reproducible on any engine.
    *
    * `cells` here is any coarse-partition column (a k-means label, a
    * locality hash). The within-cell ranking uses the same deterministic
    * unit-vector dot as the brute-force path. */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryFilter: Column, k: Int,
      maxEstCandidates: Long = 2000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vecs.sparkSession
    import spark.implicits._
    val dims = vecs.select(col(idCol).as("vid"), col(cellCol).cast("long").as("cell"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * 1000000).cast("long"))
    val cent = dims.groupBy("cell", "pos")
      .agg(sum(col("xi")).as("sxi"), count(lit(1)).as("n"))
    // Coarse assignment scores every vector against the MEAN centroid (raw
    // sums would bias toward larger cells). Centroids are cells×dims longs —
    // always tiny — so they are collected and broadcast, and assignment is
    // one NARROW kernel pass (the classic IVF shape) instead of a dims×cells
    // join + aggregation + window. Arithmetic stays bit-reproducible: exact
    // integer dot with the component SUM, one exactly-rounded long→double
    // division by the member count, ascending-cell iteration keeping the
    // first maximum (ties break to the smallest cell id, like a
    // (score DESC, cell ASC) rank).
    val cells = collectCentroids(cent)
    if (cells.isEmpty)
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("query_id", "neighbor_id", "rank", "sim")
    // compute budget, same philosophy as lshNearDup/semanticDupFlags: a
    // coarse partition with too few cells doesn't fail, it quietly runs
    // queries·|biggest cell| exact dots. The guard must bound the cells
    // the JOIN actually runs on — the REASSIGNED argmax cells, not the
    // input labels: mean centroids of a coarse labeling can collapse
    // most of the corpus into one argmax cell (hash-partitioned input
    // cells all centroid near the corpus mean, one marginally dominates),
    // and an input-label bound would wave exactly that runaway through.
    // One count per side before any pair materializes.
    val nQueries = vecs.where(queryFilter).count()
    val assigned = assignCells(vecs, idCol, vecCol, cells, maxAbsXi(dims), 1000000L)
    val maxCellRow = assigned.groupBy(col("acell"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head()
    val maxCellN = if (maxCellRow.isNullAt(0)) 0L else maxCellRow.getLong(0)
    val estCandidates = BigInt(nQueries) * BigInt(maxCellN)
    require(estCandidates <= BigInt(maxEstCandidates),
      s"ivfTopK with $nQueries queries against assigned cells of up to $maxCellN " +
        s"members bounds candidates at ~$estCandidates (> $maxEstCandidates). " +
        "Re-cluster with more cells, or raise maxEstCandidates if the runtime " +
        "is acceptable.")
    // assigned is one row per vector id (small); broadcast keeps the unit
    // vectors from shuffling just to pick up their cell label.
    val unit = withUnitVector(vecs.select(col(idCol).as("uid"), col(vecCol).as("v")), "v", "nv")
      .join(broadcast(assigned), col("uid") === col("vid")).select(col("uid"), col("acell"), col("nv"))
    val queries = unit
      .join(vecs.where(queryFilter).select(col(idCol).as("qid")), col("uid") === col("qid"))
      .select(col("uid").as("query_id"), col("acell").as("qcell"), col("nv").as("qn"))
    val cands = unit.select(col("uid").as("neighbor_id"), col("acell").as("ncell"), col("nv").as("cn"))
    // within-cell pair volume is ~n²/k — the dot runs as a JIT'd primitive
    // kernel over the joined pair rows (ascending-index accumulation, bit-
    // identical to the fold-based SQL form) instead of the interpreted
    // CodegenFallback HOF, the same rewrite measured 2× on lshNearDup's
    // verification stage
    val sims = cands.join(broadcast(queries),
        col("qcell") === col("ncell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qn"), col("cn"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.map { case (q, nb, qn, cn) =>
        var s = 0.0
        var i = 0
        while (i < qn.length) { s += qn(i) * cn(i); i += 1 }
        (q, nb, s)
      })
      .toDF("query_id", "neighbor_id", "sim")
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Collect a (cell, pos) → (Σxi, n) centroid frame as dense driver-side
    * arrays: one row per cell of (cellId, component sums, member count),
    * ascending cell id. Always cells×dims longs — tiny by construction. */
  private def collectCentroids(cent: DataFrame): Array[(Long, Array[Long], Long)] = {
    val spark = cent.sparkSession
    import spark.implicits._
    centroidArray(cent.as[(Long, Int, Long, Long)].collect())
  }

  /** The dense-array assembly behind [[collectCentroids]], factored out so
    * a caller that already COLLECTED the (cell, pos, sxi, n) rows (e.g. a
    * build that fuses the centroid aggregate with the overflow-guard max)
    * never re-runs the aggregation job just to group them. */
  private def centroidArray(
      centRows: Array[(Long, Int, Long, Long)]): Array[(Long, Array[Long], Long)] = {
    if (centRows.isEmpty) return Array.empty
    val dim = centRows.iterator.map(_._2).max + 1
    centRows.groupBy(_._1).toSeq.sortBy(_._1).map { case (cellId, rows) =>
      val sxi = new Array[Long](dim)
      rows.foreach(r => sxi(r._2) = r._3)
      (cellId, sxi, rows.head._4)
    }.toArray
  }

  /** Largest |xi| over the exploded (pos, xi) component frame — ONE cheap
    * aggregate job (long max, partial-aggregated map-side) whose result
    * makes the overflow guard in `assignCells` exact instead of assumed.
    * 0 for an empty frame. */
  private def maxAbsXi(dims: DataFrame): Long = {
    val r = dims.agg(max(abs(col("xi")))).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Assign every vector to the broadcast MEAN centroid maximizing the dot
    * product — one narrow kernel pass, no shuffle. Bit-reproducible: exact
    * integer dot with the component SUM, one exactly-rounded long→double
    * division by the member count, ascending-cell iteration keeping the
    * first maximum (ties → smallest cell id, like (score DESC, cell ASC)).
    *
    * Guarded against silent int64 wrap: the kernel's dot is bounded by
    * dim · max|xi| · max|sxi|, and both maxima are exactly known here
    * (max|xi| from one aggregate over the component frame, max|sxi| from
    * the collected centroids), so the worst case is checked in BigInt
    * BEFORE any task runs. Past ~1e5 members/cell at dim 64 and scale 1e6
    * the bound trips — the error names the two fixes (smaller quantScale,
    * more cells) rather than letting assignments silently go wrong at
    * exactly the corpus sizes this operator targets.
    * Returns (vid, acell). */
  /** The int64-overflow preconditions every centroid-dot kernel shares.
    * The dot guard trusts the OBSERVED max|sxi| — which is only
    * trustworthy if the component sums could not themselves have wrapped
    * during aggregation (a wrapped sum reads SMALL and would sneak past);
    * |sxi| ≤ members·max|xi| exactly, so that bound is the precondition. */
  private def requireDotBounds(cells: Array[(Long, Array[Long], Long)],
      maxXi: Long, quantScale: Long): Unit = {
    val dim = if (cells.isEmpty) 0 else cells.iterator.map(_._2.length).max
    val maxSxi = cells.iterator.flatMap(_._2.iterator)
      .foldLeft(0L)((m, x) => math.max(m, math.abs(x)))
    val maxN = cells.iterator.map(_._3).foldLeft(0L)(math.max)
    require(BigInt(maxN) * BigInt(maxXi) < BigInt(Long.MaxValue),
      s"centroid component sums could wrap int64: max members/cell $maxN * " +
        s"max|xi|=$maxXi >= 2^63 — lower quantScale (currently $quantScale) or " +
        "raise k before centroid aggregation can be trusted.")
    val worstDot = BigInt(dim) * BigInt(maxXi) * BigInt(maxSxi)
    require(worstDot < BigInt(Long.MaxValue),
      s"integer centroid dot would overflow int64: dim=$dim * max|xi|=$maxXi * " +
        s"max|sxi|=$maxSxi = $worstDot >= 2^63. Cells hold too many members for " +
        s"quantization scale $quantScale — lower quantScale (e.g. ${quantScale / 1000}) " +
        "or raise k so cells shrink; both keep assignment deterministic.")
  }

  private def assignCells(vecs: DataFrame, idCol: String, vecCol: String,
      cells: Array[(Long, Array[Long], Long)], maxXi: Long,
      quantScale: Long): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // an empty centroid set would leave the kernel's bestCell at its 0L
    // initializer for EVERY row — the whole corpus silently assigned to a
    // nonexistent cell 0 is a wrong answer, not a degenerate-but-valid one
    require(cells.nonEmpty,
      "assignCells with no centroids: the seed/fit set is empty " +
        "(check k, the input row count, and fitSampleMod)")
    requireDotBounds(cells, maxXi, quantScale)
    val bcCells = spark.sparkContext.broadcast(cells)
    vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { iter =>
        val cs = bcCells.value
        iter.map { case (id, v) =>
          val xi = new Array[Long](v.length)
          var i = 0
          while (i < v.length) { xi(i) = math.floor(v(i) * quantScale).toLong; i += 1 }
          var bestCell = 0L
          var bestScore = Double.NegativeInfinity
          for ((cellId, sxi, n) <- cs) {
            var s = 0L
            var p = 0
            while (p < xi.length) { s += xi(p) * sxi(p); p += 1 }
            val sc = s.toDouble / n
            if (sc > bestScore) { bestScore = sc; bestCell = cellId }
          }
          (id, bestCell)
        }
      }.toDF("vid", "acell")
  }

  /** Fused probe+normalize kernel — THE multi-probe assignment pass of the
    * whole IVF surface ([[knnGraph]], [[saveIvfIndex]]/[[appendToIvfIndex]]
    * at nProbe = 1, [[ivfQueryIndex]]'s probe leg): one narrow pass emits,
    * per vector, its `nProbe` best cells by the integer centroid score
    * (same (score DESC, cell ASC) order and overflow guards as
    * [[assignCells]]) AND the pre-normalized unit vector — so the graph
    * join downstream never has to join an n-row assignment frame back onto
    * the vectors (the broadcast [[ivfTopK]] uses, which stops being
    * broadcastable at billions of vectors). Normalization is bit-identical
    * to [[withUnitVector]]: ascending-index Σx², one sqrt, per-element
    * division; a zero-norm vector becomes the zero unit vector (sim 0
    * everywhere — never ranked, never thresholded in).
    * Returns (vid, probe 1..nProbe, acell, nv). */
  private def assignProbesWithUnit(vecs: DataFrame, idCol: String, vecCol: String,
      cells: Array[(Long, Array[Long], Long)], maxXi: Long,
      quantScale: Long, nProbe: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    requireDotBounds(cells, maxXi, quantScale)
    val bcCells = spark.sparkContext.broadcast(cells)
    val np = math.min(nProbe, cells.length)
    vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { iter =>
        val cs = bcCells.value
        iter.flatMap { case (id, v) =>
          val xi = new Array[Long](v.length)
          var ss = 0.0
          var i = 0
          while (i < v.length) {
            xi(i) = math.floor(v(i) * quantScale).toLong
            ss += v(i) * v(i)
            i += 1
          }
          val nrm = math.sqrt(ss)
          val nv = new Array[Double](v.length)
          if (nrm != 0.0) {
            var j = 0
            while (j < v.length) { nv(j) = v(j) / nrm; j += 1 }
          }
          val topCell = new Array[Long](np)
          val topScore = new Array[Double](np)
          java.util.Arrays.fill(topScore, Double.NegativeInfinity)
          for ((cellId, sxi, n) <- cs) {
            var s = 0L
            var p = 0
            while (p < xi.length) { s += xi(p) * sxi(p); p += 1 }
            val sc = s.toDouble / n
            var j = np - 1
            if (sc > topScore(j)) {
              while (j > 0 && sc > topScore(j - 1)) {
                topScore(j) = topScore(j - 1); topCell(j) = topCell(j - 1); j -= 1
              }
              topScore(j) = sc; topCell(j) = cellId
            }
          }
          (0 until np).iterator
            .filter(r => topScore(r) != Double.NegativeInfinity)
            .map(r => (id, (r + 1).toLong, topCell(r), nv))
        }
      }.toDF("vid", "probe", "acell", "nv")
  }

  /** kNN GRAPH: the top-k cosine neighbors of EVERY vector — the
    * all-vectors generalization of [[ivfTopK]], the structure SemDeDup-style
    * curation, graph-based dedup, and diversity sampling consume. Each
    * vector probes its `nProbe` best coarse cells (the IVF recall knob:
    * near-boundary true neighbors living in the runner-up cell are not
    * lost), candidates are the argmax-cell members of the probed cells, and
    * exact unit-vector dots rank them. Pair volume is ~nProbe·n²/k for k
    * cells — never all-pairs.
    *
    * Scale shape (deliberately better than ivfTopK's): the fused kernel
    * emits probe cells AND the unit vector in one pass, so both join sides
    * derive from it directly — the candidate join is a plain shuffle hash
    * join on the cell id with NO n-row broadcast anywhere. Each neighbor
    * lives in exactly one argmax cell and a query's probed cells are
    * distinct, so a pair can match at most once — no dedup stage. The
    * candidate budget is checked EXACTLY before any pair materializes:
    * one aggregate over the probe frame computes Σ_cells (probes into
    * cell × members of cell), the true join fan-out.
    *
    * Determinism: integer-quantized centroid scores (exact int64 dot, one
    * exactly-rounded division), ascending-index float dots — every step
    * replayable bit-for-bit by the SQL oracle. Ranking ties break on the
    * smaller neighbor id. The reference engine has no ANN surface; this is
    * part of the training-pipeline extension (SemDeDup, Abbas et al. 2023,
    * builds exactly this within-cell neighbor structure). */
  def knnGraph(vecs: DataFrame, idCol: String, vecCol: String, cellCol: String,
      k: Int, nProbe: Int = 2, quantScale: Long = 1000000L,
      maxEstCandidates: Long = 2000000000L): DataFrame = {
    require(k >= 1, s"knnGraph needs k >= 1, got $k")
    require(nProbe >= 1, s"knnGraph needs nProbe >= 1, got $nProbe")
    import org.apache.spark.sql.expressions.Window
    val spark = vecs.sparkSession
    import spark.implicits._
    val dims = vecs.select(col(idCol).as("vid"), col(cellCol).cast("long").as("cell"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * quantScale).cast("long"))
    val cent = dims.groupBy("cell", "pos")
      .agg(sum(col("xi")).as("sxi"), count(lit(1)).as("n"))
    val cells = collectCentroids(cent)
    if (cells.isEmpty)
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("query_id", "neighbor_id", "rank", "sim")
    // persisted: the probe+normalize kernel feeds THREE consumers (the
    // fan-out guard aggregate and both join sides) that would otherwise
    // each recompute the O(n·cells·dim) pass — the guard action below
    // materializes the cache once. No unpersist: the result plan keeps
    // referencing the frame; Spark's LRU block eviction reclaims it.
    val probed = assignProbesWithUnit(vecs, idCol, vecCol, cells,
      maxAbsXi(dims), quantScale, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact fan-out guard: Σ over cells of (rows probing the cell ×
    // argmax members of the cell) IS the candidate count the join below
    // produces (before the self-pair filter). One tiny collect (≤ cells
    // rows), summed in BigInt on the driver — at billions of vectors a
    // degenerate clustering makes nq·ni itself overflow int64, and a
    // wrapped estimate would wave through the exact runaway join this
    // guard exists to refuse. Same philosophy as ivfTopK's guard.
    val loads = probed.groupBy(col("acell"))
      .agg(count(lit(1)).as("nq"),
        count(when(col("probe") === 1, 1)).as("ni"))
      .select(col("nq"), col("ni")).as[(Long, Long)].collect()
    val est = loads.foldLeft(BigInt(0)) { case (a, (nq, ni)) =>
      a + BigInt(nq) * BigInt(ni)
    }
    require(est <= BigInt(maxEstCandidates),
      s"knnGraph candidate join would materialize ~$est pairs " +
        s"(> $maxEstCandidates). Re-cluster with more cells, lower nProbe, " +
        "or raise maxEstCandidates if the runtime is acceptable.")
    val index = probed.where(col("probe") === 1)
      .select(col("vid").as("neighbor_id"), col("acell").as("cell"), col("nv").as("cn"))
    val queries = probed
      .select(col("vid").as("query_id"), col("acell").as("cell"), col("nv").as("qn"))
    val sims = queries.join(index, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qn"), col("cn"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.map { case (q, nb, qn, cn) =>
        var s = 0.0
        var i = 0
        while (i < qn.length) { s += qn(i) * cn(i); i += 1 }
        (q, nb, s)
      })
      .toDF("query_id", "neighbor_id", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** The production spelling of [[knnGraph]]'s cells ∝ n discipline: no
    * label column needed and no fixed cell count to outgrow — the corpus
    * is clustered into `max(1, n / targetCellSize)` deterministic k-means
    * cells first, so the GRAPH stage's pair volume stays
    * ~nProbe·n·targetCellSize at ANY corpus size (measured at 10× rows:
    * fixed 64 cells was a 38.8× slowdown; with cells scaled 10× the graph
    * stage ran at 1.6× — exponent 0.19). The clustering stage itself is
    * the scaling knob to watch: its broadcast assignment kernel is
    * O(n·kCells·dim), which is quadratic in n when kCells ∝ n — measured
    * all-in (k-means + graph) 12.3 s at 20k vectors vs 2.1 s at 2k
    * (5.9×/10× rows, exponent 0.77 — still sublinear at this size, but
    * the term grows). At corpus sizes where that kernel dominates, cap
    * `n / targetCellSize` or pass `fitSampleMod` > 1 to fit the centroids
    * on [[kmeansCells]]'s deterministic hash-sample and keep only the
    * single assignment pass over the full corpus. One count action sizes
    * the clustering; everything downstream is [[kmeansCells]] +
    * [[knnGraph]] unchanged, so the determinism story (integer centroids,
    * lowest-id seeds, exact dots) is theirs. */
  def knnGraphAuto(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2, targetCellSize: Int = 32, iterations: Int = 2,
      quantScale: Long = 1000000L,
      maxEstCandidates: Long = 2000000000L,
      fitSampleMod: Long = 1L): DataFrame = {
    require(targetCellSize >= 1, s"targetCellSize must be >= 1, got $targetCellSize")
    val spark = vecs.sparkSession
    import spark.implicits._
    val n = vecs.count()
    if (n == 0)
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("query_id", "neighbor_id", "rank", "sim")
    // clamped: at n >= 2^31·targetCellSize a bare .toInt wraps negative
    // (or to exactly 0), which would flow into empty seeds — the clamp
    // keeps the guarantee honest at any corpus size
    val kCells = math.min(Int.MaxValue.toLong, math.max(1L, n / targetCellSize)).toInt
    val cells = kmeansCells(vecs, idCol, vecCol, kCells,
      iterations = iterations, quantScale = quantScale,
      fitSampleMod = fitSampleMod)
    // kmeansCells returns (vec_id, cell); re-key the corpus on the same
    // long id so the join is unambiguous whatever idCol was called
    val withCell = vecs
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("__v"))
      .join(cells, Seq("vec_id"))
    knnGraph(withCell, "vec_id", "__v", "cell", k, nProbe,
      quantScale, maxEstCandidates)
  }

  /** Build and PERSIST an IVF index for serving: the integer centroid
    * component sums (cells×dims rows) at `path`/centroids and the
    * per-vector postings (assigned cell + pre-normalized unit vector) at
    * `path`/postings. Build is one component aggregation + one broadcast
    * assignment pass; `ivfQueryIndex` then serves arbitrarily many query
    * batches without ever re-clustering, re-assigning, or re-normalizing
    * the corpus — the build-once/query-many discipline a 100 TB embedding
    * store runs (the same persistence philosophy as SnapshotChecksums for
    * the diff engine). */
  def saveIvfIndex(vecs: DataFrame, idCol: String, vecCol: String,
      cellCol: String, path: String, quantScale: Long = 1000000L): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val dims = vecs.select(col(idCol).as("vid"), col(cellCol).cast("long").as("cell"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * quantScale).cast("long"))
    // ONE aggregation pass over the exploded components yields the centroid
    // sums AND the per-group max|xi| whose global max the overflow guard
    // needs — the r19 shape ran the aggregation twice (once for the
    // centroids write, once re-collected for the kernel) plus a third
    // whole-corpus explode just for maxAbsXi. The rows are collected first
    // (cells×dims — tiny by construction) and the centroids parquet is
    // written from the local rows, so the corpus is aggregated exactly once.
    val centRows = dims.groupBy("cell", "pos")
      .agg(sum(col("xi")).as("sxi"), count(lit(1)).as("n"),
        max(abs(col("xi"))).as("mx"))
      .as[(Long, Int, Long, Long, Long)].collect()
    val maxXi = centRows.foldLeft(0L)((m, r) => math.max(m, r._5))
    val cells = centroidArray(centRows.map(r => (r._1, r._2, r._3, r._4)))
    centRows.map(r => (r._1, r._2, r._3, r._4)).toSeq
      .toDF("cell", "pos", "sxi", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    require(cells.nonEmpty,
      "saveIvfIndex over an empty corpus: no centroids to build " +
        "(check the input row count)")
    // Fused assign+normalize kernel (nProbe = 1 IS assignCells' argmax,
    // same tie-break, same guards): ONE corpus pass emits (vid, cell, nv)
    // directly — the r19 shape ran the kernel in a separate assignment
    // pass, normalized in another projection, and joined the two back.
    // The normalization is bit-identical to withUnitVector (ascending-
    // index Σx², one sqrt, per-element division; zero-norm → zero vector).
    val posted = assignProbesWithUnit(vecs, idCol, vecCol, cells,
        maxXi, quantScale, nProbe = 1)
      .select(col("vid"), col("acell").as("cell"), col("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      posted.write.mode("overwrite").parquet(s"$path/postings")
      // Per-cell posting counts under the argmax-REASSIGNED labels — what
      // the postings join actually fans out over. The centroid member
      // counts are input-label sizes; a degenerate reassignment can
      // collapse most postings into one cell, so a query-time budget guard
      // reading centroid counts would pass while the join blows up.
      // Persisting the real counts (k rows) makes the guard exact at zero
      // query-time cost. Computed from the cached kernel output — the r19
      // shape re-ran the whole assignment pass for this k-row aggregate.
      posted.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/cellcounts")
    } finally posted.unpersist()
  }

  /** Incremental IVF maintenance: fold a DELTA of new vectors into a
    * persisted index WITHOUT re-clustering or touching existing postings.
    * Centroids stay FIXED — the delta is argmax-assigned against the
    * stored integer centroids by the exact kernel the original build used,
    * so the appended postings are bit-identical to what a full
    * `saveIvfIndex` over base ∪ delta would produce GIVEN the same
    * centroids, and serving results are too (spec-pinned append ≡
    * rebuild). Cost is ∝ |delta|: one component aggregate over the delta
    * (overflow-guard max|xi|), one broadcast assignment pass, one postings
    * append, and a k-row cellcounts rewrite (old counts + delta counts —
    * the budget guard in `ivfQueryIndex` stays exact). Drifted centroids
    * degrade RECALL only, never correctness (every vector still lives in
    * exactly one cell); re-cluster with `saveIvfIndex` when drift
    * accumulates. Caller contract: append each delta exactly once —
    * replaying a delta duplicates its postings (dedup upstream by vector
    * id). Writes are ordered so a crash can only leave the budget counts
    * OVERSTATED (guard-conservative); [[repairIvfCellcounts]] resyncs
    * them to the postings exactly. Returns the number of vectors
    * appended. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame, idCol: String, vecCol: String,
      quantScale: Long = 1000000L): Long = {
    val cent = spark.read.parquet(s"$path/centroids")
    val cells = collectCentroids(cent)
    require(cells.nonEmpty, s"empty IVF index at $path — build with saveIvfIndex first")
    val dims = delta.select(col(idCol).as("vid"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * quantScale).cast("long"))
    // Fused assign+normalize kernel, cached across this call's two
    // consumers (the delta-count aggregate and the postings append) — the
    // r19 shape ran the kernel once for the assignment, AGAIN inside the
    // postings join, and normalized in a third projection. nProbe = 1 is
    // exactly assignCells' argmax (same tie-break, same overflow guards);
    // the normalization is bit-identical to withUnitVector.
    val posted = assignProbesWithUnit(delta, idCol, vecCol, cells,
        maxAbsXi(dims), quantScale, nProbe = 1)
      .select(col("vid"), col("acell").as("cell"), col("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deltaCounts = posted.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // CRASH-SAFE ORDER: (1) read the base counts from the PRE-append
    // state, (2) overwrite cellcounts with base + delta, (3) append the
    // postings. A crash between (2) and (3) leaves counts that OVERSTATE
    // — the budget guard then refuses too early, never admits a join it
    // should have blocked (the unsafe direction would be understating).
    // Re-running a crashed append adds the delta's counts again (more
    // overstatement, same safe direction); repairIvfCellcounts resyncs
    // counts to the postings exactly whenever in doubt.
    // pre-cellcounts (or interrupted-overwrite-emptied) index: seed the
    // base counts from the postings already on disk
    def fromPostings(): Map[Long, Long] =
      spark.read.parquet(s"$path/postings").groupBy("cell").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseCounts: Map[Long, Long] =
      (try {
        val m = spark.read.parquet(s"$path/cellcounts")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        if (m.nonEmpty) m else fromPostings()
      } catch { case _: org.apache.spark.sql.AnalysisException => fromPostings() })
    val merged = (baseCounts.keySet ++ deltaCounts.keySet).toSeq.map(c =>
      (c, baseCounts.getOrElse(c, 0L) + deltaCounts.getOrElse(c, 0L)))
    import spark.implicits._
    merged.toDF("cell", "n").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/cellcounts")
    try posted.write.mode("append").parquet(s"$path/postings")
    finally posted.unpersist()
    deltaCounts.valuesIterator.sum
  }

  /** Resync the persisted per-cell budget counts to the postings EXACTLY —
    * one aggregate over the postings. Run after an interrupted
    * [[appendToIvfIndex]] (whose crash window can leave counts
    * overstated — safe for the budget guard but drifting) or any manual
    * surgery on the postings directory. */
  def repairIvfCellcounts(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    spark.read.parquet(s"$path/postings").groupBy("cell")
      .agg(count(lit(1)).as("n")).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/cellcounts")

  /** Serve top-k cosine neighbors for NEW query vectors from a persisted
    * IVF index (`saveIvfIndex`): each query scores against the broadcast
    * mean centroids (tiny, read from `path`/centroids), probes its
    * `nProbe` best cells, and runs exact dots against ONLY those cells'
    * postings — ≈ nProbe/k of the corpus per query, the standard IVF
    * recall/cost knob (nProbe = number of cells degrades gracefully to
    * exact brute force — spec-pinned equal to `bruteForceTopK`). The
    * probed queries are the BROADCAST side of the postings join; the
    * corpus never shuffles. The candidate budget is checked exactly from
    * the persisted per-cell POSTING counts (reassigned labels) before
    * any pair materializes. */
  def ivfQueryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int = 1,
      quantScale: Long = 1000000L, maxEstCandidates: Long = 2000000000L,
      /** Drop postings whose id equals the query's id — ONLY for queries
        * drawn from the indexed corpus itself. New query batches usually
        * have an independent id space, where an accidental numeric
        * collision would silently drop a true neighbor (a recall loss
        * indistinguishable from ANN error), so the default keeps
        * everything. */
      excludeSelfId: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val cent = spark.read.parquet(s"$path/centroids")
    val cells = collectCentroids(cent)
    require(cells.nonEmpty, s"empty IVF index at $path")
    val nQueries = queries.count()
    // Budget from the POSTINGS' per-cell counts (argmax-reassigned
    // labels — what the join fans out over), not the centroid member
    // counts (input labels): a degenerate reassignment can collapse most
    // postings into one cell that the centroid counts don't show.
    // `saveIvfIndex` persists them as k rows; older indexes fall back to
    // one cell-column-only aggregate over the postings.
    // null-safe: an interrupted overwrite can leave a readable-but-EMPTY
    // cellcounts directory, where max(n) aggregates to NULL without any
    // AnalysisException — treat that exactly like a missing directory and
    // fall back to aggregating the postings themselves
    def maxOf(df: DataFrame, c: String): Option[Long] = {
      val r = df.agg(max(col(c))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    val maxCellN: Long =
      (try maxOf(spark.read.parquet(s"$path/cellcounts"), "n")
      catch { case _: org.apache.spark.sql.AnalysisException => None })
        .orElse(maxOf(
          spark.read.parquet(s"$path/postings").groupBy("cell").count(), "count"))
        .getOrElse(throw new IllegalArgumentException(
          s"IVF index at $path has no postings — rebuild it"))
    val estCandidates = BigInt(nQueries) * BigInt(math.min(nProbe, cells.length)) * BigInt(maxCellN)
    require(estCandidates <= BigInt(maxEstCandidates),
      s"ivfQueryIndex with $nQueries queries x $nProbe probes against cells of up " +
        s"to $maxCellN members bounds candidates at ~$estCandidates " +
        s"(> $maxEstCandidates). Lower nProbe, or rebuild with more cells.")
    // query-side max|xi| from the query vectors themselves (the corpus
    // bound stored nothing — queries are new data)
    val qdims = queries.select(col("query_id"),
      posexplode(col("qv")).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * quantScale).cast("long"))
    // the fused kernel emits each query's probe cells AND its unit vector
    // in one pass — the r19 shape ran the same kernel but dropped nv,
    // normalized the queries separately, and joined the two frames back
    // together
    val probed = assignProbesWithUnit(queries, "query_id", "qv", cells,
        maxAbsXi(qdims), quantScale, nProbe)
      .select(col("vid").as("query_id"), col("acell").as("cell"),
        col("nv").as("qn"))
    val postings = spark.read.parquet(s"$path/postings")
    val sims = postings.join(broadcast(probed), Seq("cell"))
      .where(if (excludeSelfId) col("query_id") =!= col("vid") else lit(true))
      .select(col("query_id"), col("vid").as("neighbor_id"), col("qn"), col("nv"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.map { case (q, nb, qn, nv) =>
        var s = 0.0
        var i = 0
        while (i < qn.length) { s += qn(i) * nv(i); i += 1 }
        (q, nb, s)
      })
      .toDF("query_id", "neighbor_id", "sim")
    // no pair dedup needed: every posting lives in exactly ONE cell, so a
    // (query, neighbor) pair appears once even under multi-probe
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Deterministic distributed k-means (Lloyd's) — produces the cluster
    * column `semanticDupFlags`/`ivfTopK` consume when no label exists.
    * Engine-reproducible end to end: seeds are the k lowest-id vectors
    * (no RNG), components quantize as floor(x·1e6), centroids are exact
    * integer component sums with member counts, and assignment is the
    * shared broadcast kernel (integer dot, exactly-rounded mean division,
    * ties to the smallest cell) — so any engine replaying the same rounds
    * lands on the same cells, which is what the DuckDB oracle checks.
    *
    * Per iteration: one broadcast-kernel pass (no shuffle) + one
    * (vid→cell) join and partial-aggregating shuffle of the n·dim
    * component rows to re-sum centroids; driver state is k×dim longs.
    * int64 bounds the dot at ~1e5 members/cell at dim 64 and the default
    * `quantScale` 1e6 (sums ≈ members·scale²·dim) — the bound is ENFORCED
    * (exact BigInt check in `assignCells` from the collected centroid
    * sums, before any task runs), and the fix the error names is real:
    * pass a smaller `quantScale` (precision trades linearly) or a larger
    * k. Empty cells simply vanish (fewer centroids next round),
    * identically in any engine. Returns (vec_id, cell) after
    * `iterations` rounds.
    *
    * `fitSampleMod` is the extreme-scale knob: with mod m > 1 the Lloyd
    * ITERATIONS run only over the deterministic hash-sample
    * `xxhash64(id) % m == 0` (~n/m vectors), and the full corpus gets ONE
    * assignment pass against the fitted centroids — the standard
    * fit-on-a-sample discipline that turns the O(n·k·dim·iterations)
    * kernel into O((n/m)·k·dim·iterations + n·k·dim). mod 1 (default) is
    * byte-identical to the full fit (same code path, no extra pass). */
  def kmeansCells(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 2, quantScale: Long = 1000000L,
      fitSampleMod: Long = 1L): DataFrame = {
    require(fitSampleMod >= 1, s"fitSampleMod must be >= 1, got $fitSampleMod")
    require(k >= 1, s"kmeansCells needs k >= 1, got $k")
    require(iterations >= 1, s"kmeansCells needs iterations >= 1, got $iterations")
    val fitVecs = if (fitSampleMod == 1L) vecs
      else vecs.where(pmod(xxhash64(col(idCol).cast("long")), lit(fitSampleMod)) === 0)
    // PERSISTED: every iteration's centroid aggregation (and the final
    // caller-side evaluation) re-reads this frame — without the persist
    // the n·dim posexplode lineage re-runs from the source per round
    // (~2 corpus scans/iteration at 10M×64). Same treatment
    // connectedComponents gives its edge frame. Holds the FIT SET only.
    val dims = fitVecs.select(col(idCol).cast("long").as("vid"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * quantScale).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // component-magnitude bound for the overflow guard: computed ONCE.
    // Under a sampled fit the FINAL pass assigns vectors outside the fit
    // set, whose |xi| the fit frame does not bound — the guard's input
    // must cover the widest vector actually assigned, so it is computed
    // over the full corpus in that case (one narrow max aggregate).
    val mXi =
      if (fitSampleMod == 1L) maxAbsXi(dims)
      else maxAbsXi(vecs.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
        .select(floor(col("x").cast("double") * quantScale).cast("long").as("xi")))
    // seeds: the k lowest FIT-SET vector ids (a TakeOrdered, not a full
    // sort), each a singleton cell keyed by its id
    val seedIds = fitVecs.select(col(idCol).cast("long").as("vid"))
      .orderBy("vid").limit(k)
    var cent = dims.join(broadcast(seedIds), Seq("vid"), "left_semi")
      .select(col("vid").as("cell"), col("pos"), col("xi").as("sxi"), lit(1L).as("n"))
    var assigned: DataFrame = null
    var centUsed: Array[(Long, Array[Long], Long)] = null
    for (_ <- 1 to iterations) {
      centUsed = collectCentroids(cent)
      assigned = assignCells(fitVecs, idCol, vecCol, centUsed, mXi, quantScale)
      cent = dims.join(assigned, Seq("vid"))
        .groupBy(col("acell").as("cell"), col("pos"))
        .agg(sum(col("xi")).as("sxi"), count(lit(1)).as("n"))
    }
    // sampled fit: the corpus-wide pass uses the SAME centroids the last
    // fit-set assignment saw, so mod=1 and a mod>1 whose sample is the
    // whole corpus produce identical assignments
    if (fitSampleMod > 1L)
      assigned = assignCells(vecs, idCol, vecCol, centUsed, mXi, quantScale)
    // pin the final assignment before releasing the component cache: the
    // caller's evaluation must not re-trigger the unpersisted lineage
    assigned.select(col("vid").as("vec_id"), col("acell").as("cell")).localCheckpoint()
    } finally dims.unpersist()
  }

  /** LSH-bucketed near-duplicate pairs — the scale path `similarPairs`
    * points to when exact all-pairs stops being the right query: signed
    * random projections (random-hyperplane LSH, the cosine-distance family)
    * bucket each vector into `bands` buckets of `bitsPerBand` sign bits;
    * only same-(band, bucket) collisions reach the exact cosine check, so
    * the join volume is Σ bucket² instead of n².
    *
    * SIZE THE BANDS TO THE CORPUS: the bucket space is 2^bitsPerBand per
    * band, and expected candidate volume is ~bands·n²/2^bitsPerBand — the
    * gate-scale default (5 bits = 32 buckets) is O(n²/32) at ANY n, a
    * 5×10⁹-pair explosion already at 200k vectors (measured; 16-bit bands
    * keep the same corpus linear-ish at ~27 s). Pick bitsPerBand ≈
    * log2(n/targetBucketSize), or pass `bitsPerBand = 0` to DERIVE exactly
    * that from the corpus count (paid for by the budget guard's own
    * count()); recall for a given threshold then tunes via `bands` (more
    * bands = more chances to collide).
    *
    * Everything before the final cosine is exact integer math, reproducible
    * on any engine: components quantize as floor(x·1e6); each hyperplane is
    * a Rademacher (±1) vector whose sign at (h, j) derives from the 48-bit
    * md5 HEAD of "h|j" — deterministic, seedless, and renderable in plain
    * SQL — and each sign bit is (Σ ±xi ≥ 0). The sign table is H×dim ints,
    * computed ONCE driver-side with the same JVM static the codegen'd md5
    * expression calls (bit-identical to the SQL form the oracle runs) and
    * broadcast; all H projections of a vector then run in one NARROW kernel
    * pass emitting `bands` bucket rows directly. This replaces the previous
    * n·dim·H projection join + aggregation — a 12.8M-row shuffle at n=5k,
    * dim=64, H=40 that dominated the operator's cost (measured ~3.2 s at
    * sf0.1; the kernel pass is the same arithmetic in a JIT'd loop with no
    * exchange at all). */
  def lshNearDup(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 8, bitsPerBand: Int = 5,
      dim: Int = 64, maxEstCandidates: Long = 2000000000L,
      targetBucketSize: Int = 32): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // mis-sized bands don't fail, they run for hours: expected candidate
    // volume under UNIFORM buckets is bands·n²/2^bits/2 (clustered corpora
    // are strictly worse), so an under-provisioned bitsPerBand is checked
    // against a compute budget BEFORE any pair materializes. One cheap
    // count() action buys the guard.
    // bitsPerBand = 0 means DERIVE it from the corpus via the guard's own
    // sizing rule, bitsPerBand = ceil(log2(n/targetBucketSize)): expected
    // bucket occupancy ≈ targetBucketSize at any n, candidate volume
    // ≈ bands·n·targetBucketSize/2 — linear in n instead of quadratic. The
    // same count() the budget guard pays feeds the derivation, so auto-
    // sizing costs nothing extra. (More bits = fewer candidates but lower
    // per-band recall; tune `bands` up if the threshold needs more chances
    // to collide.)
    require(bitsPerBand >= 0, s"bitsPerBand must be >= 0 (0 = auto), got $bitsPerBand")
    val n = vecs.count()
    val bpbEff =
      if (bitsPerBand > 0) bitsPerBand
      else math.min(48, math.max(1,
        math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketSize)) / math.log(2)).toInt))
    val hCount = bands * bpbEff
    val estCandidates =
      BigInt(bands) * BigInt(n) * BigInt(n) / BigInt(2).pow(bpbEff) / 2
    require(estCandidates <= BigInt(maxEstCandidates),
      s"lshNearDup with bands=$bands, bitsPerBand=$bpbEff over $n vectors " +
        s"expects ~$estCandidates candidate pairs even under uniform buckets " +
        s"(> $maxEstCandidates). Size bitsPerBand ≈ log2(n/targetBucketSize) " +
        "— every +1 bit halves the candidate volume — pass bitsPerBand = 0 " +
        "to derive it from the corpus, or raise maxEstCandidates.")
    val signs: Array[Array[Int]] = Array.tabulate(hCount, dim) { (h, j) =>
      val bits = graft.functions.HashUtils.md5Bits48(
        s"$h|$j".getBytes(java.nio.charset.StandardCharsets.UTF_8), false)
      (math.floorMod(bits, 2L) * 2 - 1).toInt // head48 is non-negative; pmod ≡ mod
    }
    val bcSigns = spark.sparkContext.broadcast(signs)
    val (nBands, bpb) = (bands, bpbEff)
    val buckets = vecs
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val sg = bcSigns.value
        it.flatMap { case (id, v) =>
          require(v.length <= sg(0).length,
            s"vector dim ${v.length} exceeds the sign table's $dim — pass dim explicitly")
          val xi = new Array[Long](v.length)
          var j = 0
          while (j < v.length) { xi(j) = math.floor(v(j) * 1000000).toLong; j += 1 }
          (0 until nBands).iterator.map { band =>
            var bucket = 0L
            var bit = 0
            while (bit < bpb) {
              val row = sg(band * bpb + bit)
              var p = 0L
              var k = 0
              while (k < xi.length) { p += row(k) * xi(k); k += 1 }
              if (p >= 0) bucket |= 1L << bit
              bit += 1
            }
            (id, band, bucket)
          }
        }
      }.toDF("id", "band", "bucket")
    val cand = buckets.select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(buckets.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val unit = withUnitVector(
      vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")), "v", "nv")
    // verification joins stay shuffle-based (no broadcast of the corpus —
    // this is the path for corpora similarPairs refuses). The dot itself is
    // a primitive kernel, NOT the fold-based HOF: candidate volume is
    // Σ bucket² and on clustered corpora the bands under-prune (measured at
    // sf0.1: 2k vectors → 464k candidates, 23% of all pairs), so the
    // interpreted CodegenFallback fold was the operator's dominant cost.
    // The kernel accumulates in ascending index order — the same
    // zero-initialized left fold — so sims stay bit-identical to the SQL
    // form the oracle runs. (An element_at unroll was measured 5× slower
    // still: the 64-term expression blows past codegen method limits and
    // deoptimizes the whole stage.)
    cand
      .join(unit.select(col("id").as("id_a"), col("nv").as("na")), Seq("id_a"))
      .join(unit.select(col("id").as("id_b"), col("nv").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("na"), col("nb"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.map { case (a, b, na, nb) =>
        var s = 0.0
        var k = 0
        while (k < na.length) { s += na(k) * nb(k); k += 1 }
        (a, b, s)
      })
      .toDF("id_a", "id_b", "sim")
      .where(col("sim") >= threshold)
  }

  /** SemDeDup-style semantic deduplication: near-duplicate detection
    * restricted to a coarse cluster column, then greedy survivor selection.
    * A vector is a duplicate iff some LOWER-id vector in the SAME cluster
    * has cosine ≥ `threshold` with it — the deterministic equivalent of
    * SemDeDup's keep-one-per-similar-group sweep (ids replace its random
    * visit order, so any engine picks the same survivors).
    *
    * The cluster column is what makes this the 100 TB shape: pairs exist
    * only WITHIN a cell, so the pair count is Σ|cell|² ≈ n²/k instead of
    * n², one shuffle moves each unit vector to its cell, and nothing
    * broadcasts the corpus. `cellCol` is any coarse partitioner — a
    * k-means/IVF label (here the embeddings' label), an LSH band, a
    * language. Output: one row per input vector with its cell and an
    * `is_dup` flag. */
  def semanticDupFlags(vecs: DataFrame, idCol: String, vecCol: String,
      cellCol: String, threshold: Double,
      maxCellRows: Int = 1 << 22,
      maxPairsPerCell: Long = 1000000000L): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // Unit vectors come from the same codegen'd projection as every other
    // similarity path; the kernel below only does ascending-index dots, so
    // sims are bit-identical to the fold-based SQL form the oracle uses.
    val unit = withUnitVector(
      vecs.select(col(idCol).cast("long").as("id"),
        col(cellCol).cast("string").as("cellk"), col(vecCol).as("v")),
      "v", "nv")
      .select(col("cellk"), col("id"), col("nv"))
      .as[(String, Long, Array[Double])]
    // One shuffle on the cell key, then an O(m²/2) primitive kernel per
    // cell. A cell-keyed JOIN would express the same pairs declaratively,
    // but its dot runs on the interpreted CodegenFallback path (array HOFs)
    // — measured minutes at 20M pairs where this kernel takes seconds. The
    // materialized cell is the SemDeDup contract (k is chosen so a cluster
    // fits a worker); the cap fails loudly instead of OOMing mid-task.
    val dups = unit.groupByKey(_._1).flatMapGroups { (cellk, it) =>
      // buffer WITH the cap enforced during iteration: a blind .toArray of
      // a degenerate 50M-vector cell exhausts the task heap before any
      // after-the-fact require could produce the loud, actionable error
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
      while (it.hasNext) {
        require(buf.length < maxCellRows,
          s"semanticDupFlags cell '$cellk' exceeds $maxCellRows vectors. " +
            "Re-cluster with more cells so each fits a worker, or raise maxCellRows.")
        val t = it.next()
        buf += ((t._2, t._3))
      }
      val members = buf.toArray
      // Compute bound, not just memory: an at-cap cell that FITS can still
      // be an O(m²/2) hours-long single task. The pair budget (default 1e9
      // dots ≈ tens of seconds of kernel) trips long before that, with the
      // same remedy.
      val cellPairs = members.length.toLong * (members.length - 1L) / 2L
      require(cellPairs <= maxPairsPerCell,
        s"semanticDupFlags cell '$cellk' implies $cellPairs candidate pairs " +
          s"(> $maxPairsPerCell) — an unsplittable O(m²/2) task. Re-cluster with " +
          "more cells (smaller m), or raise maxPairsPerCell if the runtime is acceptable.")
      java.util.Arrays.sort(members, Ordering.by((m: (Long, Array[Double])) => m._1))
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var j = 1
      while (j < members.length) {
        val vj = members(j)._2
        var found = false
        var i = 0
        while (i < j && !found) {
          val vi = members(i)._2
          var s = 0.0
          var k = 0
          while (k < vj.length) { s += vi(k) * vj(k); k += 1 }
          found = s >= threshold
          i += 1
        }
        if (found) out += members(j)._1
        j += 1
      }
      out.iterator
    }.toDF("did").withColumn("dup", lit(true))
    vecs.select(col(idCol).as("id"), col(cellCol).as("cell"))
      .join(dups, col("id").cast("long") === col("did"), "left")
      .select(col("id"), col("cell"), coalesce(col("dup"), lit(false)).as("is_dup"))
  }

  /** Incremental SemDeDup: dup flags for a corpus refresh's NEW vectors
    * only, against the existing (kept) corpus and each other — the
    * embedding-side analogue of `Dedup.deltaMinhashCandidatesFromBands`.
    * A delta vector is a duplicate iff some vector in the SAME cell that is
    * either (a) any existing-corpus member or (b) an earlier (lower-id)
    * delta member has cosine ≥ `threshold` with it. With delta ids above
    * the index ids (the natural arrival order) this equals the full
    * `semanticDupFlags` re-run restricted to delta rows (spec-pinned), but
    * the work is |delta-in-cell| × |cell| per TOUCHED cell instead of
    * Σ|cell|²/2 over every cell: untouched cells are dropped by a
    * cell-key semi-join before anything shuffles, so a 0.1% refresh does
    * ~0.1% of the full run's kernel work. Output: one row per delta
    * vector with its cell and `is_dup`. */
  def deltaSemanticDupFlags(index: DataFrame, delta: DataFrame,
      idCol: String, vecCol: String, cellCol: String, threshold: Double,
      maxCellRows: Int = 1 << 22,
      maxPairsPerCell: Long = 1000000000L): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    def prep(df: DataFrame, isDelta: Boolean) =
      withUnitVector(df.select(col(idCol).cast("long").as("id"),
        col(cellCol).cast("string").as("cellk"), col(vecCol).as("v")), "v", "nv")
        .select(col("cellk"), col("id"), col("nv"), lit(isDelta).as("isd"))
    val touched = delta.select(col(cellCol).cast("string").as("cellk")).distinct()
    val unit = prep(index, isDelta = false).join(touched, Seq("cellk"), "left_semi")
      .unionByName(prep(delta, isDelta = true))
      .as[(String, Long, Array[Double], Boolean)]
    val dups = unit.groupByKey(_._1).flatMapGroups { (cellk, it) =>
      // cap enforced WHILE buffering — see semanticDupFlags: a blind
      // toArray would OOM before the loud error fires
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Array[Double], Boolean)]
      while (it.hasNext) {
        require(buf.length < maxCellRows,
          s"deltaSemanticDupFlags cell '$cellk' exceeds $maxCellRows vectors. " +
            "Re-cluster with more cells, or raise maxCellRows.")
        buf += it.next()
      }
      val members = buf.toArray
      val nDelta = members.count(_._4)
      val pairBound = nDelta.toLong * members.length
      require(pairBound <= maxPairsPerCell,
        s"deltaSemanticDupFlags cell '$cellk' implies ≤$pairBound candidate pairs " +
          s"(> $maxPairsPerCell) — re-cluster with more cells, or raise maxPairsPerCell.")
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var j = 0
      while (j < members.length) {
        if (members(j)._4) {
          val (idJ, vj) = (members(j)._2, members(j)._3)
          var found = false
          var i = 0
          while (i < members.length && !found) {
            if (i != j && (!members(i)._4 || members(i)._2 < idJ)) {
              val vi = members(i)._3
              var s = 0.0
              var k = 0
              while (k < vj.length) { s += vi(k) * vj(k); k += 1 }
              found = s >= threshold
            }
            i += 1
          }
          if (found) out += idJ
        }
        j += 1
      }
      out.iterator
    }.toDF("did").withColumn("dup", lit(true))
    delta.select(col(idCol).as("id"), col(cellCol).as("cell"))
      .join(dups, col("id").cast("long") === col("did"), "left")
      .select(col("id"), col("cell"), coalesce(col("dup"), lit(false)).as("is_dup"))
  }

  /** Recall@k of an approximate ANN result against the exact one: for each
    * query, how many of the exact top-k neighbors the approximate method
    * returned (both frames in the `(query_id, neighbor_id, rank)` shape
    * `bruteForceTopK`/`ivfTopK` emit). Integer hit counts — the caller
    * divides — so the metric aggregates exactly at any scale. One join on
    * (query, neighbor) + one aggregation; queries missing entirely from
    * the approximate result count as zero hits. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val e = exact.where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    e.join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
  }

  /** Symmetric int8 quantization of an embedding column: each vector is
    * scaled by its max-abs component onto [-127, 127] and rounded half-up —
    * the standard memory-reduction step before ANN serving (4× smaller than
    * float32, 8× than float64). Adds `maxabs` (the dequantization scale)
    * and `q` (array<long> of quantized components). Every step is an
    * exactly-rounded IEEE op (multiply, divide, +0.5, floor), so the
    * quantized values are bit-reproducible on any engine; zero vectors
    * quantize to zeros. */
  def quantizeInt8(vecs: DataFrame, vecCol: String): DataFrame = {
    val absd = transform(col(vecCol), x => abs(x.cast("double")))
    vecs
      .withColumn("maxabs", array_max(absd))
      .withColumn("q", transform(col(vecCol), x =>
        when(col("maxabs") === 0.0, lit(0L)).otherwise(
          floor(x.cast("double") * lit(127.0) / col("maxabs") + lit(0.5)).cast("long"))))
  }

  /** Cross-corpus semantic decontamination: for every training vector, the
    * nearest BENCHMARK vector by cosine and a flag when it clears the
    * contamination threshold — the embedding-space sibling of the n-gram
    * decontamination operators (`Dedup.contaminatedIds`), catching
    * paraphrased leakage that exact n-grams miss.
    *
    * Broadcast-exact by design: benchmark/eval sets are small BY NATURE
    * (thousands of items) while the training side is the 100 TB one, so
    * the right plan is the asymmetric one — normalize and broadcast the
    * bench side (size-guarded like [[similarPairs]]), stream the training
    * side through one map-only pass, zero shuffles, no candidate
    * generation to tune and no recall risk. Ties go to the smallest bench
    * id (strict `>` over the id-sorted broadcast), which is what the SQL
    * oracle's `ORDER BY sim DESC, id ASC` reproduces; dots accumulate in
    * ascending index order from zero, so similarity values are bit-equal
    * to the oracle's fold. */
  def semanticDecontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      vecCol: String, threshold: Double, dim: Int = 64,
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val benchUnit = withUnitVector(
      bench.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")), "v", "nv")
      .select(col("id"), col("nv")).as[(Long, Array[Double])]
    val n = benchUnit.count()
    require(n > 0, "semanticDecontaminate: empty benchmark side")
    val estBytes = n * (8L * dim + 32L)
    require(estBytes <= maxBroadcastBytes,
      s"semanticDecontaminate would broadcast ~$estBytes bytes of benchmark vectors " +
        s"($n rows × dim=$dim), over the $maxBroadcastBytes budget. A benchmark side " +
        "this large should be reduced first (IVF cells or LSH buckets), or raise " +
        "maxBroadcastBytes if the executors really have the memory.")
    val bc = spark.sparkContext.broadcast(benchUnit.collect().sortBy(_._1))
    val trainUnit = withUnitVector(
      train.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")), "v", "nv")
      .select(col("id"), col("nv")).as[(Long, Array[Double])]
    trainUnit.mapPartitions { it =>
      val cands = bc.value
      it.map { case (id, v) =>
        var bestId = -1L
        var best = Double.NegativeInfinity
        var j = 0
        while (j < cands.length) {
          val (bid, bv) = cands(j)
          // bound by the ACTUAL arrays, never the `dim` hint: dim only
          // sizes the broadcast estimate, and looping on it would silently
          // truncate longer vectors or crash on shorter ones
          if (v.length != bv.length) throw new IllegalArgumentException(
            s"semanticDecontaminate: dimension mismatch ${v.length} vs ${bv.length} " +
              s"(train id $id, bench id $bid)")
          var s = 0.0
          var k = 0
          while (k < v.length) { s += v(k) * bv(k); k += 1 }
          if (s > best) { best = s; bestId = bid }
          j += 1
        }
        (id, bestId, best, best >= threshold)
      }
    }.toDF("doc_id", "nearest_bench_id", "max_sim", "flag_contaminated")
  }

  /** All pairs with cosine ≥ threshold (exact, O(n²) — use LSH buckets or
    * an IVF coarse quantizer to restrict candidates at scale).
    *
    * Executed as a broadcast nested-loop join with a primitive-array kernel:
    * the unit vectors are broadcast once (n·dim doubles — the same smallness
    * bound any broadcast join assumes) and each partition of the streaming
    * side runs a tight JIT'd multiply-add loop against them. Row-at-a-time
    * alternatives are far slower at n² pairs: array HOFs (zip_with/
    * aggregate) run on the interpreted CodegenFallback path, and expanding
    * to `dim` scalar columns makes the join materialize 2·dim columns per
    * pair (measured 8×). The kernel accumulates in ascending-index order —
    * the same zero-initialized left fold as the SQL form, so results are
    * bit-identical to the fold-based oracle. For corpora whose unit-vector
    * matrix outgrows a broadcast, restrict candidates first (ivfTopK /
    * lshBands) — exact all-pairs at that scale is the wrong query, and the
    * `maxBroadcastBytes` guard fails loudly before the driver collect
    * rather than OOMing mid-job. */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int = 64,
      maxBroadcastBytes: Long = 256L << 20): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val unit = withUnitVector(
      vecs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v")), "v", "nv")
      .select(col("id"), col("nv"))
      .as[(Long, Array[Double])]
    // The guard must run BEFORE the collect: counting is one cheap
    // aggregate job, while an oversized collect kills the driver with no
    // recourse. ~(8·dim + 32) bytes per (id, Array[Double]) entry.
    val n = unit.count()
    val estBytes = n * (8L * dim + 32L)
    require(estBytes <= maxBroadcastBytes,
      s"similarPairs would broadcast ~$estBytes bytes of unit vectors ($n rows × dim=$dim), " +
        s"over the $maxBroadcastBytes budget. Exact all-pairs is the wrong query at this " +
        "scale: restrict candidates first (Similarity.ivfTopK or Dedup.lshBands), or raise " +
        "maxBroadcastBytes if the driver really has the memory.")
    val bc = spark.sparkContext.broadcast(
      unit.collect().sortBy(_._1))
    // stream the already-collected vectors back out instead of re-evaluating
    // the normalization pipeline a second time for the probe side
    val probes = spark.createDataset(spark.sparkContext.parallelize(
      bc.value.toIndexedSeq, spark.sparkContext.defaultParallelism))
    val pairs = probes.mapPartitions { iter =>
      val cands = bc.value
      val ids = cands.map(_._1)
      iter.flatMap { case (ida, va) =>
        // cands is id-sorted: binary-search past ida, keep only id_b > id_a
        var lo = java.util.Arrays.binarySearch(ids, ida)
        lo = if (lo < 0) -lo - 1 else lo + 1
        (lo until cands.length).iterator.map { j =>
          val (idb, vb) = cands(j)
          if (va.length != vb.length) throw new IllegalArgumentException(
            s"similarPairs: dimension mismatch ${va.length} vs ${vb.length} " +
              s"(ids $ida, $idb)")
          var s = 0.0
          var k = 0
          while (k < va.length) { s += va(k) * vb(k); k += 1 }
          (ida, idb, s)
        }.filter(_._3 >= threshold)
      }
    }.toDF("id_a", "id_b", "sim")
    pairs
  }
}
