package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Hardening pins for the driver-local metadata-log reader (LogLocal):
  *
  *  1. CAP CROSSING — the 64 MB size guard is the entire 100 TB safety
  *     argument for driver-local serving: past it the distributed read
  *     owns the log. The `graft.test.localLogMaxMB` system property
  *     forces the cap to 0 inside this JVM, and every metadata-derived
  *     answer (current version, alive set, schema, masked read, change
  *     feed) must be IDENTICAL through the fallback.
  *  2. COMMIT/VACUUM INVALIDATION — the decode LRU is keyed on the log
  *     dir + every part file's (name, len, mtime); any commit adds a file
  *     and any vacuum rewrites the set. A cached decode must never serve
  *     a pre-commit alive set or a pre-vacuum version.
  */
class LogLocalSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_loglocal_$tag").toString + "/t"

  private def seed(dir: String, n: Int = 400): Unit =
    DataLayout.writeZOrdered(
      spark.range(n).select(col("id").as("k"), (col("id") * 3 % 97).as("x")),
      Seq(col("k"), col("x")), 16, Seq("k", "x"), dir, numFiles = 4)

  private def withCap[A](mb: String)(f: => A): A = {
    sys.props("graft.test.localLogMaxMB") = mb
    try f finally sys.props.remove("graft.test.localLogMaxMB")
  }

  test("a log past the size cap answers identically through the distributed fallback") {
    val dir = freshDir("cap")
    seed(dir)
    DataLayout.appendZOrdered(
      spark.range(400, 500).select(col("id").as("k"), (col("id") * 3 % 97).as("x")),
      Seq(col("k"), col("x")), 16, Seq("k", "x"), dir, numFiles = 2)
    DataLayout.deleteVectors(spark, dir, Seq(("k", 10L, 30L)))

    def snapshot(): (Long, Seq[String], Seq[String], Seq[(Long, Long)], Long) = (
      DataLayout.currentVersion(spark, dir),
      DataLayout.aliveManifest(spark, dir).select("file")
        .collect().map(_.getString(0)).toSeq.sorted,
      DataLayout.schemaFor(spark, dir).fieldNames.toSeq,
      DataLayout.readLayout(spark, dir).as[(Long, Long)]
        .collect().toSeq.sorted,
      DataLayout.changeFeed(spark, dir, 0L, 2L, Seq("k"), Seq("x")).count())

    val local = snapshot()
    val fallback = withCap("0")(snapshot())
    assert(local == fallback,
      s"driver-local vs distributed disagree:\n$local\n$fallback")
  }

  test("a commit and a vacuum each invalidate the decode cache") {
    val dir = freshDir("inval")
    seed(dir)
    // warm the cache with every probe shape
    val v0 = DataLayout.currentVersion(spark, dir)
    val alive0 = DataLayout.aliveManifest(spark, dir).count()
    assert(v0 == 0L)

    // COMMIT: the appended version and its files must be visible at once
    DataLayout.appendZOrdered(
      spark.range(1000, 1100).select(col("id").as("k"), lit(1L).as("x")),
      Seq(col("k"), col("x")), 16, Seq("k", "x"), dir, numFiles = 2)
    val v1 = DataLayout.currentVersion(spark, dir)
    val alive1 = DataLayout.aliveManifest(spark, dir).count()
    assert(v1 == v0 + 1, s"cached decode served a pre-commit version: $v1")
    assert(alive1 > alive0, s"cached decode served a pre-commit alive set")

    // a rewrite commit (delete) must surface its tombstones immediately
    DataLayout.deleteWhere(spark, dir, Seq(col("k"), col("x")), 16,
      Seq("k", "x"), Seq(("k", 1000L, 1100L)))
    val v2 = DataLayout.currentVersion(spark, dir)
    assert(v2 == v1 + 1)
    assert(DataLayout.readLayout(spark, dir).where(col("k") >= 1000L).isEmpty)

    // VACUUM rewrites the log file set (compaction + horizon marker) — a
    // stale decode would still read horizon 0 and promise time travel to
    // versions whose files are gone
    assert(DataLayout.vacuumHorizon(spark, dir) == 0L)
    val rowsBefore = DataLayout.readLayout(spark, dir).count()
    DataLayout.vacuum(spark, dir, retainVersions = 0)
    assert(DataLayout.vacuumHorizon(spark, dir) == v2,
      "cached decode served the pre-vacuum horizon")
    assert(DataLayout.currentVersion(spark, dir) == v2)
    assert(DataLayout.readLayout(spark, dir).count() == rowsBefore)
    intercept[IllegalArgumentException](
      DataLayout.readLayout(spark, dir, 0L).count())
  }
}
