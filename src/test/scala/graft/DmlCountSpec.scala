package graft.layout

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The DML report counts ride the rewrite itself as an observed metric
  * (one scan per statement). That metric must sit ABOVE zCluster's range
  * exchange: below it, the range boundary-sampling job executes the scan
  * a second time whenever the rewrite lands in 2+ files (count doubles),
  * and an all-rows-removed rewrite leaves the exchange output empty,
  * letting AQE's empty-relation propagation prune the metric node out of
  * the final plan (`key not found` instead of a count). These pin both
  * shapes with exact expected counts. */
class DmlCountSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("k"))

  /** 4000 rows clustered on k into 8 files — ~500-wide key stripes. */
  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_dmlcount").toString + "/t"
    val df = spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 97).as("amt"))
    DataLayout.writeZOrdered(df, dims, 16, Seq("k"), dir, 8)
    dir
  }

  test("updateWhere count is exact-once when the rewrite spans 3 files") {
    val dir = fresh()
    val r = DataLayout.updateWhere(spark, dir, dims, 16, Seq("k"),
      col("k").between(400, 1100), Map("amt" -> lit(-1L)))
    assert(r.filesRewritten >= 2, s"need the multi-file sampling shape: $r")
    assert(r.rowsUpdated == 701L, r.toString)
    assert(DataLayout.readLayout(spark, dir)
      .where(col("amt") === -1L).count() == 701L)
  }

  test("deleteWhere count is exact-once when the rewrite spans 3 files") {
    val dir = fresh()
    val r = DataLayout.deleteWhere(spark, dir, dims, 16, Seq("k"),
      Seq(("k", 400L, 1100L)))
    assert(r.filesRewritten >= 2, s"need the multi-file sampling shape: $r")
    assert(r.rowsDeleted == 701L, r.toString)
    assert(DataLayout.readLayout(spark, dir).count() == 4000L - 701L)
  }

  test("deleteWhere over already-soft-deleted rows: empty rewrite, count 0") {
    val dir = fresh()
    // soft-delete the whole first stripe, then physically delete the same
    // range: the envelope still hits the file, but every masked row is
    // gone — the rewrite's exchange output is EMPTY and the metric must
    // come back 0, not hang and not crash
    val dv = DataLayout.deleteVectors(spark, dir, Seq(("k", 0L, 499L)))
    assert(dv.rowsDeleted == 500L, dv.toString)
    val r = DataLayout.deleteWhere(spark, dir, dims, 16, Seq("k"),
      Seq(("k", 0L, 499L)))
    assert(r.rowsDeleted == 0L, r.toString)
    assert(r.filesRewritten >= 1, r.toString) // the DV'd file purges for good
    assert(DataLayout.readLayout(spark, dir).count() == 3500L)
    assert(DataLayout.readLayout(spark, dir).where(col("k") < 500).isEmpty)
  }
}
