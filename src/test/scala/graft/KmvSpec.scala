package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.diff.KmvSketch

class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def ops(aN: Long, abOverlap: Long, bN: Long) = {
    // A = [0, aN), B = [aN - abOverlap, aN - abOverlap + bN)
    val a = (0L until aN).toDF("k")
    val b = ((aN - abOverlap) until (aN - abOverlap + bN)).toDF("k")
    KmvSketch.setOps(
      KmvSketch.sketch(a, col("k")), KmvSketch.sketch(b, col("k")))
      .select("k_union", "n_both", "n_a_only", "n_b_only",
        "est_union", "est_inter", "est_a_not_b")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
  }

  test("small sets are counted exactly (sketch holds the whole set)") {
    val (k, both, aOnly, bOnly, u, i, anb) = ops(100L, 40L, 80L)
    // union = 100 + 80 - 40 = 140 < 256 -> everything exact
    assert(k == 140L && u == 140.0)
    assert(both == 40L && i == 40.0 * 140.0 / 140.0)
    assert(aOnly == 60L && anb == 60.0)
    assert(bOnly == 40L)
  }

  test("membership counts always partition the merged sketch") {
    for ((aN, ov, bN) <- Seq((100L, 10L, 50L), (5000L, 2000L, 4000L),
        (20000L, 0L, 1L), (1L, 1L, 1L))) {
      val (k, both, aOnly, bOnly, _, _, _) = ops(aN, ov, bN)
      assert(both + aOnly + bOnly == k, s"($aN,$ov,$bN)")
    }
  }

  test("estimates land within 20% of truth on large overlapping sets") {
    val (aN, ov, bN) = (30000L, 12000L, 25000L)
    val (_, _, _, _, u, i, anb) = ops(aN, ov, bN)
    val trueUnion = aN + bN - ov
    def within(est: Double, truth: Long, pct: Double): Unit =
      assert(math.abs(est - truth) <= truth * pct,
        s"est=$est truth=$truth")
    within(u, trueUnion, 0.20)
    within(i, ov, 0.35)           // intersection fraction has higher variance
    within(anb, aN - ov, 0.25)
  }

  test("disjoint large sets estimate a near-zero intersection") {
    val (_, both, _, _, _, i, _) = ops(20000L, 0L, 20000L)
    assert(both <= 2L)
    assert(i < 700.0) // each merged member misattributed costs est_union/k
  }

  test("setOps is deterministic under repartitioning") {
    val a = (0L until 10000L).toDF("k").repartition(13)
    val b = (5000L until 15000L).toDF("k").repartition(7)
    val r1 = KmvSketch.setOps(KmvSketch.sketch(a, col("k")),
      KmvSketch.sketch(b, col("k"))).collect().toSeq
    val r2 = KmvSketch.setOps(KmvSketch.sketch(b, col("k")),
      KmvSketch.sketch(a, col("k"))).collect().toSeq
    // A/B swap mirrors the a/b-only columns, everything else identical
    assert(r1.head.getLong(0) == r2.head.getLong(0))
    assert(r1.head.getLong(2) == r2.head.getLong(2))
    assert(r1.head.getLong(3) == r2.head.getLong(4))
    assert(r1.head.getDouble(5) == r2.head.getDouble(5))
  }
}
