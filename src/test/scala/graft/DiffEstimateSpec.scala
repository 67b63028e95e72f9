package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.diff.DiffEstimate

/** DiffEstimate: the sampled strategy pre-flight. The oracle gate
  * (q_diff_estimate) pins the integer decision surface cross-engine;
  * these specs pin the statistics: no phantom diffs from sampling,
  * extrapolation accuracy, Wilson small-sample honesty, and the
  * regime split the recommendation encodes. */
class DiffEstimateSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def base(n: Long) = spark.range(n)
    .select(col("id").as("k"), (col("id") % 7).cast("string").as("v"),
      (col("id") * 3).as("w"))

  test("wilson upper bound: golden values, small-sample honesty") {
    // d=0, n=100: still ~3.7% — a hundred clean samples do NOT prove clean
    val u0 = DiffEstimate.wilsonUpper(0, 100)
    assert(u0 > 0.036 && u0 < 0.038, s"got $u0")
    // d=10, n=1000: p=1%, upper ~1.8%
    val u1 = DiffEstimate.wilsonUpper(10, 1000)
    assert(u1 > 0.017 && u1 < 0.020, s"got $u1")
    assert(DiffEstimate.wilsonUpper(0, 0) == 1.0)
    assert(DiffEstimate.wilsonUpper(50, 50) == 1.0)
  }

  test("identical sides: zero differing keys — sampling manufactures no phantoms") {
    val a = base(5000)
    val e = DiffEstimate.estimate(a, base(5000), Seq("k"), Seq("v", "w"), mod = 8L)
    assert(e.differingKeys == 0L, e)
    assert(e.sampledKeys > 300, s"1/8 of 5000 should sample hundreds: $e")
    assert(e.recommendation == "bisect")
    // but the upper bound is honest: a clean SAMPLE never claims rate 0
    assert(e.upperMilliRate > 0)
  }

  test("extrapolation: ~10% mutated keys estimates near 100 milli, recommends dense") {
    val a = base(20000)
    val b = base(20000).withColumn("v",
      when(col("k") % 10 === 0, lit("MUT")).otherwise(col("v")))
    val e = DiffEstimate.estimate(a, b, Seq("k"), Seq("v", "w"), mod = 4L)
    // ~5000 sampled keys; true rate 100 milli; binomial sd ~4 milli
    assert(e.milliRate > 80 && e.milliRate < 120, e)
    assert(e.recommendation == "dense-join", e)
    assert(e.upperMilliRate >= e.milliRate)
  }

  test("sparse diffs recommend bisect; one-sided keys count as differing") {
    val a = base(20000)
    // 1/1000 keys deleted, nothing else touched
    val b = base(20000).where(col("k") % 1000 =!= 0)
    val e = DiffEstimate.estimate(a, b, Seq("k"), Seq("v", "w"), mod = 4L)
    assert(e.recommendation == "bisect", e)
    assert(e.milliRate <= 5, e)
    assert(e.differingKeys > 0, s"deletions must register: $e")
  }

  test("jsonCols: cosmetically-reordered JSON is not a diff for the estimator") {
    // without the JSON lens every row reads as differing (milli=1000) and
    // the recommendation flips to exactly the wrong strategy
    val a = spark.range(1000).select(col("id").as("k"),
      concat(lit("{\"x\":"), col("id"), lit(",\"y\":1}")).as("j"))
    val b = spark.range(1000).select(col("id").as("k"),
      concat(lit("{\"y\":1,\"x\":"), col("id"), lit("}")).as("j"))
    val raw = DiffEstimate.estimate(a, b, Seq("k"), Seq("j"), mod = 1L)
    assert(raw.milliRate == 1000 && raw.recommendation == "dense-join")
    val json = DiffEstimate.estimate(a, b, Seq("k"), Seq("j"), mod = 1L,
      jsonCols = Set("j"))
    assert(json.differingKeys == 0 && json.recommendation == "bisect", json)
  }

  test("mod=1 degrades to the exact full diff rate") {
    val a = base(2000)
    val b = base(2000).withColumn("w",
      when(col("k") < 200, col("w") + 1).otherwise(col("w")))
    val e = DiffEstimate.estimate(a, b, Seq("k"), Seq("v", "w"), mod = 1L)
    assert(e.sampledKeys == 2000 && e.differingKeys == 200 && e.milliRate == 100, e)
  }
}
