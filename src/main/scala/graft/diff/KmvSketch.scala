package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketch SET OPERATIONS: distinct-count estimates
  * for A∪B, A∩B and A\B from two bottom-k hash sets — without ever joining
  * A against B.
  *
  * Why a diff engine wants this: "how many keys are in A but not in B" is
  * THE pre-flight question before a cross-engine diff (estimate → choose
  * joindiff vs hashdiff vs bisection, cf. DiffEstimate). The exact answer
  * is an anti-join over both tables; the KMV answer ships k=256 hashes per
  * side — each side computes its sketch LOCALLY (on its own engine, of any
  * size), the sketches meet on 8 KB of driver data, and the estimates fall
  * out. At 100 TB that's the difference between a cross-warehouse join and
  * two scans + a constant-size exchange.
  *
  * Estimator (Beyer et al. 2007, "On Synopses for Distinct-Value
  * Estimation under Multiset Operations"): merge the two sketches, keep the
  * bottom k of the union — a valid KMV sketch of A∪B, so
  * est(∪) = (k−1)·2^48 / h_k (exact count when the union has fewer than k
  * distinct hashes). Every member of the merged sketch is below BOTH
  * sides' k-th minima, so per-side membership is decidable from the
  * sketches alone; the fraction of merged members in A∩B (or A only)
  * scales est(∪) into est(∩) / est(\).
  *
  * Determinism: the hash is the engine-wide 48-bit md5 head, the bottom-k
  * is an order on distinct integers (no ties possible), and the estimate
  * doubles are single IEEE expressions over exact integers — the DuckDB
  * oracle reproduces them bit for bit.
  */
object KmvSketch {
  val DefaultK = 256
  private val HashSpace = 281474976710656.0 // 2^48

  /** Bottom-k distinct 48-bit key hashes — one column `h`, ascending.
    * Distinct partial-aggregates map-side; the bottom-k runs as a map-side
    * partial top-k (TakeOrderedAndProject), so the exchange carries at most
    * k rows per partition regardless of table size. */
  def sketch(df: DataFrame, key: Column, k: Int = DefaultK): DataFrame =
    df.where(key.isNotNull)
      .select(graft.functions.Md5Bits48.head(key.cast("string")).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)

  /** Set-operation estimates from two sketches (NOT the base tables): one
    * row with the merged-sketch evidence (k_union, hk_union, membership
    * counts) and the three estimates. Inputs must be [[sketch]] outputs
    * with the same k. */
  def setOps(sketchA: DataFrame, sketchB: DataFrame, k: Int = DefaultK): DataFrame = {
    val a = sketchA.select(col("h"), lit(1L).as("in_a"))
    val b = sketchB.select(col("h"), lit(1L).as("in_b"))
    // full-outer merge of two ≤k-row sets, then bottom-k of the union —
    // everything below is arithmetic on ≤k rows
    val merged = a.join(b, Seq("h"), "full_outer")
      .select(col("h"),
        coalesce(col("in_a"), lit(0L)).as("in_a"),
        coalesce(col("in_b"), lit(0L)).as("in_b"))
      .orderBy(col("h").asc)
      .limit(k)
    merged.agg(
      count(lit(1)).as("k_union"),
      max(col("h")).as("hk_union"),
      sum(col("in_a") * col("in_b")).as("n_both"),
      sum(col("in_a") * (lit(1L) - col("in_b"))).as("n_a_only"),
      sum(col("in_b") * (lit(1L) - col("in_a"))).as("n_b_only"))
      .select(col("k_union"), col("hk_union"), col("n_both"),
        col("n_a_only"), col("n_b_only"),
        when(col("k_union") < k, col("k_union").cast("double"))
          .otherwise((col("k_union") - 1).cast("double") * lit(HashSpace)
            / col("hk_union").cast("double")).as("est_union"))
      .select(col("*"),
        (col("n_both").cast("double") * col("est_union")
          / col("k_union").cast("double")).as("est_inter"),
        (col("n_a_only").cast("double") * col("est_union")
          / col("k_union").cast("double")).as("est_a_not_b"))
  }
}
