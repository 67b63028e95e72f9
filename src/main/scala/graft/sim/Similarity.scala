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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalize each vector ONCE (two projections so the norm is
    * evaluated per row, not per element) — pairwise cosine then degrades to
    * a single dot product. On an n² pairs query this removes 2 of the 3
    * folds from the hot loop. */
  private def withUnitVector(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_nrm", norm(col(vecCol)))
      .withColumn(outCol, transform(col(vecCol), x => x.cast("double") / col("_nrm")))
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
      queryFilter: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = vecs.select(col(idCol).as("vid"), col(cellCol).as("cell"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("xi", floor(col("x").cast("double") * 1000000).cast("long"))
    val cent = dims.groupBy("cell", "pos")
      .agg(sum(col("xi")).as("sxi"), count(lit(1)).as("n"))
    // score every vector against every cell centroid — exact integer dot with
    // the component SUM, then divide by the member count so ranking uses the
    // MEAN centroid (raw sums would bias assignment toward larger cells).
    // long→double and one division are exactly-rounded IEEE ops, so the sort
    // key is bit-identical on any engine; ccell breaks exact ties.
    val scores = dims.select(col("vid"), col("pos"), col("xi"))
      .join(cent.select(col("cell").as("ccell"), col("pos"), col("sxi"), col("n")), Seq("pos"))
      .groupBy("vid", "ccell")
      .agg((sum(col("xi") * col("sxi")).cast("double") / max(col("n"))).as("score"))
    val wAssign = Window.partitionBy(col("vid")).orderBy(col("score").desc, col("ccell").asc)
    val assigned = scores.withColumn("rn", row_number().over(wAssign)).where(col("rn") === 1)
      .select(col("vid"), col("ccell").as("acell"))
    val unit = withUnitVector(vecs.select(col(idCol).as("uid"), col(vecCol).as("v")), "v", "nv")
      .join(assigned, col("uid") === col("vid")).select(col("uid"), col("acell"), col("nv"))
    val queries = unit
      .join(vecs.where(queryFilter).select(col(idCol).as("qid")), col("uid") === col("qid"))
      .select(col("uid").as("query_id"), col("acell").as("qcell"), col("nv").as("qn"))
    val cands = unit.select(col("uid").as("neighbor_id"), col("acell").as("ncell"), col("nv").as("cn"))
    val sims = cands.join(broadcast(queries),
        col("qcell") === col("ncell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", dot(col("qn"), col("cn")))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** All pairs with cosine ≥ threshold (exact, O(n²) — use LSH buckets or
    * an IVF coarse quantizer to restrict candidates at scale).
    *
    * The n² hot loop avoids array higher-order functions entirely: Spark's
    * zip_with/aggregate are CodegenFallback (interpreted, allocating), which
    * dominates at millions of pairs. Instead each unit vector is expanded to
    * `dim` scalar columns and the dot product is a codegen'd multiply-add
    * chain. The left-associated `+` chain equals the zero-initialized left
    * fold bit-for-bit, so results match the fold-based oracle exactly. */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int = 64): DataFrame = {
    def expanded(side: String) =
      vecs.select(col(idCol).as(s"id_$side"), col(vecCol).as("v"))
        .withColumn("_nrm", norm(col("v")))
        .select(col(s"id_$side") +: (0 until dim).map(i =>
          (element_at(col("v"), i + 1).cast("double") / col("_nrm")).as(s"n${side}_$i")): _*)
    val sim = (0 until dim).map(i => col(s"na_$i") * col(s"nb_$i")).reduce(_ + _)
    expanded("a").crossJoin(expanded("b"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", sim)
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
