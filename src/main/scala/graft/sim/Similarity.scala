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

  /** Top-k cosine neighbors for each query vector (exact, brute force). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // queries: (query_id, qv); candidates: (neighbor_id, cv)
    val sims = candidates.crossJoin(broadcast(queries))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** All pairs with cosine ≥ threshold (exact, O(n²) — use LSH buckets or
    * an IVF coarse quantizer to restrict candidates at scale). */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
