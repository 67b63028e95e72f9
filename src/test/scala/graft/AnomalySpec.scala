package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("median/MAD flags exactly the >3-MAD outlier, on a hand-computed series") {
    // counts per day: 10,10,11,12,11,12,10,50 — median 11, deviations
    // 1,1,0,1,0,1,1,39 -> MAD 1; only the 50 exceeds 3*MAD
    val days = Seq(10, 10, 11, 12, 11, 12, 10, 50)
    val rows = days.zipWithIndex.flatMap { case (n, di) =>
      (0 until n).map(i => (di.toLong * 1000 + i, 7L,
        java.sql.Timestamp.valueOf(f"2024-01-${di + 1}%02d 12:00:00"), 1.0))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.ExtendedQueries.queries("q_anomaly_mad")(spark, dir)
      .select("day", "n_orders", "med2", "dev2", "mad4", "is_anomaly")
      .as[(java.sql.Date, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.size == 8)
    // median of 10,10,10,11,11,12,12,50 = 11 -> med2 = 22
    assert(got.forall(_._3 == 22L))
    // dev2 of the midpoint-interpolated median: |2x - 22|
    assert(got.map(_._4).sorted ==
      Seq(0L, 0L, 2L, 2L, 2L, 2L, 2L, 78L))
    // median(dev2) = 2 -> mad4 = 4; flag iff 2*dev2 > 12 <=> dev2 > 6
    assert(got.forall(_._5 == 4L))
    val anomalies = got.filter(_._6)
    assert(anomalies.map(_._2) == Seq(50L), s"flagged: $anomalies")
  }

  test("even-count series interpolates the median exactly in doubled integers") {
    // counts 10,20 -> median 15 -> med2 = 30 exactly (no float residue)
    val rows = Seq.tabulate(10)(i => (i.toLong, 1L,
      java.sql.Timestamp.valueOf("2024-02-01 08:00:00"), 1.0)) ++
      Seq.tabulate(20)(i => (100L + i, 1L,
        java.sql.Timestamp.valueOf("2024-02-02 08:00:00"), 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("2-HIGH"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.ExtendedQueries.queries("q_anomaly_mad")(spark, dir)
      .select("med2", "dev2", "mad4", "is_anomaly")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.forall(_._1 == 30L))
    assert(got.map(_._2).sorted == Seq(10L, 10L)) // |20-30|, |40-30|
    assert(got.forall(_._3 == 20L))               // 2 * median(10,10)
    // dev2=10 vs threshold 2*10 > 3*20? no -> a symmetric two-point series
    // has no outlier
    assert(got.forall(!_._4))
  }
}
