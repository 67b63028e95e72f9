package graft.layout

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Envelope-prefiltered DML pass 1 (r18): the Column-predicate mutation
  * surface (`updateWhere`, `deleteVectorsWhere` — SQL UPDATE/DELETE's
  * engine) must locate hit files through the manifest min/max envelopes
  * when the predicate is range-shaped, scanning coordinates ∝ envelope
  * hits on a clustered layout instead of the whole table; predicates
  * that contribute no envelope test fall back to the full scan, the
  * always-correct shape. (In package graft.layout to pin the
  * `envelopePrefilter` candidate sets directly.)
  */
class DmlPruneSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("k"))

  /** 4000 rows clustered on k into 8 files — each file owns ~a 500-wide
    * key stripe, so a narrow k-range hits 1-2 envelopes. */
  private def fresh(): String = {
    val dir = Files.createTempDirectory("graft_dmlprune").toString + "/t"
    val df = spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 97).as("amt"),
        concat(lit("s"), col("id")).as("tag"))
    DataLayout.writeZOrdered(df, dims, 16, Seq("k"), dir, 8)
    dir
  }

  test("updateWhere scans only envelope-hit files for a range predicate") {
    val dir = fresh()
    val total = DataLayout.aliveManifest(spark, dir).count().toInt
    assert(total == 8)
    val r = DataLayout.updateWhere(spark, dir, dims, 16, Seq("k"),
      col("k").between(100, 180), Map("amt" -> lit(-1L)))
    assert(r.rowsUpdated == 81)
    assert(r.filesScanned >= 1 && r.filesScanned < total,
      s"pass 1 should be envelope-pruned: scanned ${r.filesScanned}/$total")
    assert(r.filesRewritten <= r.filesScanned)
    // correctness: exactly the matched rows changed
    val got = DataLayout.readLayout(spark, dir)
    assert(got.where(col("amt") === -1L).count() == 81)
    assert(got.where(col("k").between(100, 180) && col("amt") =!= -1L).isEmpty)
    assert(got.count() == 4000)
  }

  test("deleteVectorsWhere prunes candidates; unpruneable predicates full-scan") {
    val dir = fresh()
    val total = DataLayout.aliveManifest(spark, dir).count().toInt
    val r1 = DataLayout.deleteVectorsWhere(spark, dir,
      col("k") >= 3900 && col("amt") >= 0)
    assert(r1.rowsDeleted == 100)
    assert(r1.filesScanned >= 1 && r1.filesScanned < total,
      s"range predicate should prune: scanned ${r1.filesScanned}/$total")
    // a modulus predicate contributes no envelope test — every file scans
    val r2 = DataLayout.deleteVectorsWhere(spark, dir, pmod(col("k"), lit(1000)) === 7)
    assert(r2.rowsDeleted == 4) // k = 7, 1007, 2007, 3007
    assert(r2.filesScanned == total)
    assert(DataLayout.readLayout(spark, dir).count() == 4000 - 104)
  }

  test("a range miss scans nothing and commits nothing") {
    val dir = fresh()
    val v0 = DataLayout.currentVersion(spark, dir)
    val r = DataLayout.updateWhere(spark, dir, dims, 16, Seq("k"),
      col("k") > 1000000, Map("amt" -> lit(0L)))
    assert(r.rowsUpdated == 0L && r.filesScanned == 0)
    assert(DataLayout.currentVersion(spark, dir) == v0)
  }

  test("envelopePrefilter: conjunct shapes contribute, opaque predicates don't") {
    val mcols = Set("file", "min_k", "max_k", "nulls_k", "min_tag", "max_tag")
    def cands(c: org.apache.spark.sql.Column): Option[Set[String]] = {
      val dir = fresh()
      val alive = DataLayout.aliveManifest(spark, dir)
      DataLayout.envelopePrefilter(alive.columns.toSet, c).map(t =>
        alive.where(t).select("file").collect().map(_.getString(0)).toSet)
    }
    // unrecognizable shapes → None (full-scan fallback)
    assert(DataLayout.envelopePrefilter(mcols, pmod(col("k"), lit(2)) === 0).isEmpty)
    assert(DataLayout.envelopePrefilter(mcols, col("k") + 1 > 5).isEmpty)
    // a disjunction is not a conjunction of bounds → None
    assert(DataLayout.envelopePrefilter(mcols, col("k") < 5 || col("k") > 100).isEmpty)
    // stats-less column → None; mixed with a covered column → the covered
    // conjunct still prunes
    assert(DataLayout.envelopePrefilter(mcols, col("amt") === 3).isEmpty)
    assert(DataLayout.envelopePrefilter(mcols,
      col("amt") === 3 && col("k") === 5).isDefined)
    // literal-first, IN, equality: each selects a strict file subset
    for (c <- Seq(lit(150) > col("k"), col("k").isin(10, 20, 30),
        col("k") === 1999, expr("k BETWEEN 500 AND 600"))) {
      val hit = cands(c)
      assert(hit.isDefined && hit.get.nonEmpty && hit.get.size < 8, s"$c → $hit")
    }
  }

  test("equality DML on a bloom-indexed unclustered column prunes via the index") {
    val dir = fresh() // clustered on k; amt is uncorrelated with files
    val total = DataLayout.aliveManifest(spark, dir).count().toInt
    DataLayout.buildBloomIndex(spark, dir, "amt")
    // amt = 96: k ∈ {96, 96+97, 96+2*97, …} — rows spread across the k
    // clustering, so the k-envelopes can't prune; the amt bloom can
    val r = DataLayout.updateWhere(spark, dir, dims, 16, Seq("k"),
      col("amt") === 10096L, Map("tag" -> lit("hit")))
    assert(r.rowsUpdated == 0L) // no such amt: every file bloom-skipped
    assert(r.filesScanned == 0, s"bloom did not prune: $r")
    val r2 = DataLayout.deleteVectorsWhere(spark, dir, col("amt") === 96L)
    assert(r2.rowsDeleted == (0 until 4000).count(_ % 97 == 96).toLong)
    assert(r2.filesScanned <= total, r2.toString)
    // correctness: exactly those rows masked
    assert(DataLayout.readLayout(spark, dir).where(col("amt") === 96L).isEmpty)
    // equality + range conjunction: both prunes compose
    val r3 = DataLayout.updateWhere(spark, dir, dims, 16, Seq("k"),
      col("amt") === 50L && col("k") < 500, Map("tag" -> lit("x")))
    assert(r3.rowsUpdated == (0 until 500).count(_ % 97 == 50).toLong)
    assert(r3.filesScanned < total, r3.toString)
  }

  test("bloom DML prefilter survives schema evolution and index damage") {
    // a file that PREDATES the bloom-indexed column has no such footer
    // field: deriving the probe type from an arbitrary file's footer
    // crashed UPDATE/DELETE WHERE on the evolved column (r18); the layout
    // schema is the authority, and any un-consultable index must mean
    // "prune nothing", never a crashed mutation
    val dir = Files.createTempDirectory("graft_dmlprune").toString + "/t"
    DataLayout.writeZOrdered(
      spark.range(0, 2000).select(col("id").as("k"), (col("id") % 97).as("amt")),
      dims, 16, Seq("k"), dir, 4)
    // evolution: `tag` arrives with the second batch only
    DataLayout.appendZOrdered(
      spark.range(2000, 4000).select(col("id").as("k"),
        (col("id") % 97).as("amt"), concat(lit("s"), col("id")).as("tag")),
      dims, 16, Seq("k"), dir, 4)
    DataLayout.buildBloomIndex(spark, dir, "tag")
    val r = DataLayout.deleteVectorsWhere(spark, dir, col("tag") === "s2500")
    assert(r.rowsDeleted == 1L, r.toString)
    assert(DataLayout.readLayout(spark, dir).where(col("tag") === "s2500").isEmpty)
    // index damage: an empty crash-residue index dir must not crash the
    // DML path — the prefilter yields nothing and pass 2 full-scans
    val idxDir = new java.io.File(dir, s"${DataLayout.BloomDir}/amt")
    def rmChildren(f: java.io.File): Unit =
      Option(f.listFiles).foreach(_.foreach { c =>
        if (c.isDirectory) { rmChildren(c); () }
        c.delete(); ()
      })
    DataLayout.buildBloomIndex(spark, dir, "amt")
    rmChildren(idxDir) // dir remains, no readable parquet inside
    val r2 = DataLayout.deleteVectorsWhere(spark, dir, col("amt") === 96L)
    assert(r2.rowsDeleted > 0L, r2.toString)
  }

  test("SQL UPDATE/DELETE land on the pruned pass untouched (end-to-end)") {
    val dir = fresh()
    LayoutConfig.record(spark, dir,
      LayoutConfig.Config(Seq("k"), 16, Seq("k"), 8))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW dmlp USING graft OPTIONS (path '$dir')")
    val up = GraftSql(spark, "UPDATE dmlp SET amt = 777 WHERE k BETWEEN 10 AND 20")
    assert(up.select("rows_updated").head().getLong(0) == 11L)
    val del = GraftSql(spark, "DELETE FROM dmlp WHERE k >= 3990")
    assert(del.select("rows_deleted").head().getLong(0) == 10L)
    val back = DataLayout.readLayout(spark, dir)
    assert(back.where(col("amt") === 777).count() == 11)
    assert(back.count() == 3990)
  }
}
