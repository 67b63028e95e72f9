package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Cross-layout file-granular diff: every write stamps each file's
  * manifest row with an additive, row-order-insensitive content
  * fingerprint, so `diffLayouts` proves equality (globally or per file)
  * from O(files) metadata and reads ONLY genuinely-different files — the
  * rsync of table diffs, generalized from one layout's versions
  * (`diffVersions`) to any two layouts. The nightly 100 TB replica
  * verify: clean = one manifest scan per side, zero data I/O.
  */
class LayoutDiff2Spec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("x"), col("y"))

  private def mk(ids: Range) =
    ids.map(i => (i.toLong, (i * 13L) % 65536L, (i * 31L) % 65536L))
      .toDF("id", "x", "y")

  private def write(dir: String, ids: Range, files: Int = 6): Unit =
    DataLayout.writeZOrdered(mk(ids), dims, 16, Seq("x", "y"), dir, files)

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("id").as[Long].collect().sorted.toSeq

  test("clean clone verifies with ZERO data reads") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 3000)
    DataLayout.cloneLayout(spark, s"$root/a", s"$root/b")
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b", Seq("id"))
    assert(d.filesReadA == 0 && d.filesReadB == 0)
    assert(d.df.isEmpty)
  }

  test("equal content under DIFFERENT clustering still verifies metadata-only") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 3000, files = 6)
    // same rows, clustered by a different dimension into a different file
    // count: no per-file fingerprint can match, but the ADDITIVE total does
    DataLayout.writeZOrdered(mk(0 until 3000), Seq(col("id")), 16,
      Seq("id"), s"$root/b", 4)
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b", Seq("id"))
    assert(d.filesReadA == 0 && d.filesReadB == 0)
    assert(d.df.isEmpty)
  }

  test("clone + localized delete: only the churned files are read, diff exact") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 3000)
    DataLayout.cloneLayout(spark, s"$root/a", s"$root/b")
    DataLayout.deleteWhere(spark, s"$root/b", dims, 16, Seq("x", "y"),
      Seq(("x", 0L, 2000L)))
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    // pruning: shared (fingerprint-equal) files never read on either side
    assert(d.filesReadA < d.filesTotalA, s"$d")
    assert(d.filesReadB < d.filesTotalB, s"$d")
    // the diff is exactly the deleted rows, all '-'
    val want = (0 until 3000).map(_.toLong)
      .filter(i => (i * 13L) % 65536L <= 2000L).sorted
    val got = d.df.select("sign", "id").as[(String, Long)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq == want)
  }

  test("an update shows as -/+ pair; fingerprint collisions don't hide inserts") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 2000)
    // b: one row's payload changed, three rows added
    val b = mk(0 until 2000)
      .withColumn("y", when(col("id") === 7L, lit(9999L)).otherwise(col("y")))
      .unionByName(mk(5000 until 5003))
    DataLayout.writeZOrdered(b, dims, 16, Seq("x", "y"), s"$root/b", 6)
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    val got = d.df.select("sign", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("-", 7L), ("+", 7L),
      ("+", 5000L), ("+", 5001L), ("+", 5002L)))
  }

  test("DV-carrying files re-fingerprint effectively: masked rows diff, clean files cancel") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 3000)
    DataLayout.cloneLayout(spark, s"$root/a", s"$root/b")
    // soft delete on the clone: the shared files' BYTES are identical to
    // the source's, but effective rows are not — matching by the RECORDED
    // fingerprint would silently hide the delete, so DV'd files get an
    // EFFECTIVE fingerprint over the masked read instead; files whose
    // mask changed nothing still cancel, untouched shared files cancel by
    // the recorded fingerprint, and only genuinely-different files read
    DataLayout.deleteVectors(spark, s"$root/b", Seq(("x", 0L, 1500L)))
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    assert(d.filesReadA < d.filesTotalA && d.filesReadA > 0, d.toString)
    assert(d.filesReadA == d.filesReadB, d.toString)
    val want = (0 until 3000).map(_.toLong)
      .filter(i => (i * 13L) % 65536L <= 1500L).sorted
    val got = d.df.select("sign", "id").as[(String, Long)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq == want)
  }

  test("fingerprint-less manifests (pre-extension) fall back to a full, correct diff") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 1000)
    write(s"$root/b", 0 until 1001)
    // simulate a's manifest predating the content_fp column
    val mPath = s"$root/a/${DataLayout.ManifestDir}"
    val stripped = spark.read.parquet(mPath).drop("content_fp")
      .localCheckpoint(true)
    stripped.write.mode("overwrite").parquet(mPath)
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    assert(d.filesReadA == d.filesTotalA) // no fp on a: everything reads
    assert(d.df.select("sign", "id").as[(String, Long)].collect().toSet ==
      Set(("+", 1000L)))
  }

  test("table-level content fingerprint: the snapshot etag from stats alone") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 1000, files = 6)
    DataLayout.writeZOrdered(mk(0 until 1000), Seq(col("id")), 16,
      Seq("id"), s"$root/b", 3) // same rows, different clustering
    def fp(dir: String): Option[java.math.BigDecimal] = {
      val r = DataLayout.tableStatsFromManifest(spark, dir)
        .select("content_fp").head()
      if (r.isNullAt(0)) None else Some(r.getDecimal(0))
    }
    // equal content → equal etag, regardless of file layout
    assert(fp(s"$root/a").nonEmpty && fp(s"$root/a") == fp(s"$root/b"))
    // content change → etag change
    DataLayout.appendZOrdered(mk(2000 until 2001), dims, 16, Seq("x", "y"),
      s"$root/a", 1)
    assert(fp(s"$root/a") != fp(s"$root/b"))
    // outstanding DVs → unknown (bytes ≠ effective rows), never a lie
    DataLayout.deleteVectors(spark, s"$root/b", Seq(("id", 0L, 100L)))
    assert(fp(s"$root/b").isEmpty)
  }

  test("bisection: differently-clustered layouts row-diff only the dirty key segments") {
    val root = Files.createTempDirectory("graft_ld2").toString
    // A clustered by (x, y), B by id — no file fingerprint can cancel, so
    // without bisection the row diff would shuffle both whole tables
    DataLayout.writeZOrdered(mk(0 until 20000), dims, 16,
      Seq("id", "x", "y"), s"$root/a", 12)
    DataLayout.writeZOrdered(mk(0 until 20000), Seq(col("id")), 16,
      Seq("id"), s"$root/b", 12)
    // localized mutation: one contiguous 100-key range leaves B
    DataLayout.deleteWhere(spark, s"$root/b", Seq(col("id")), 16,
      Seq("id"), Seq(("id", 7000L, 7099L)))
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    // the checksum pass touches everything once (nothing cancels)...
    assert(d.filesReadA == d.filesTotalA && d.filesReadB == d.filesTotalB)
    // ...but the ROW diff is confined to the mutation's few segments, and
    // on the id-clustered side to the few files whose envelopes hold them
    assert(d.filesRowDiffedA >= 0, s"bisection did not engage: $d")
    assert(d.segmentsDirty >= 1 && d.segmentsDirty <= 4, d.toString)
    assert(d.segmentsTotal > 100, d.toString)
    assert(d.filesRowDiffedB < d.filesReadB, d.toString)
    val got = d.df.select("sign", "id").as[(String, Long)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq == (7000L to 7099L))
  }

  test("bisection: equal content under different clustering with NO usable fingerprints → zero row work") {
    val root = Files.createTempDirectory("graft_ld2").toString
    DataLayout.writeZOrdered(mk(0 until 5000), dims, 16,
      Seq("id", "x", "y"), s"$root/a", 8)
    DataLayout.writeZOrdered(mk(0 until 5000), Seq(col("id")), 16,
      Seq("id"), s"$root/b", 8)
    // strip A's fingerprints (a manifest predating the column): the global
    // and file fast paths are both unavailable, but the segment checksums
    // still prove equality without a single row-level join
    val mPath = s"$root/a/${DataLayout.ManifestDir}"
    val stripped = spark.read.parquet(mPath).drop("content_fp")
      .localCheckpoint(true)
    stripped.write.mode("overwrite").parquet(mPath)
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    assert(d.segmentsDirty == 0 && d.filesRowDiffedA == 0 &&
      d.filesRowDiffedB == 0, d.toString)
    assert(d.df.isEmpty)
  }

  test("bisection: string keys segment via the byte-order-monotone packing") {
    val root = Files.createTempDirectory("graft_ld2").toString
    def mkS(ids: Range) = ids.map(i =>
      (f"k$i%06d", i.toLong, (i * 13L) % 65536L)).toDF("k", "id", "x")
    DataLayout.writeZOrdered(mkS(0 until 8000), Seq(col("x")), 16,
      Seq("k", "x"), s"$root/a", 8)
    DataLayout.writeZOrdered(mkS(0 until 8000),
      Seq(DataLayout.stringDim(col("k"), 48)), 48, Seq("k"), s"$root/b", 8)
    DataLayout.deleteWhere(spark, s"$root/b",
      Seq(DataLayout.stringDim(col("k"), 48)), 48, Seq("k"),
      Seq(("k", "k003000", "k003099")))
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("k"), Seq("id", "x"))
    assert(d.filesRowDiffedA >= 0, s"bisection did not engage: $d")
    assert(d.segmentsDirty >= 1 && d.segmentsDirty <= 4, d.toString)
    assert(d.filesRowDiffedB < d.filesReadB, d.toString)
    val got = d.df.select("sign", "k").as[(String, String)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq ==
      (3000 until 3100).map(i => f"k$i%06d"))
  }

  test("recursive bisection: a tight row threshold drives extra levels, diff stays exact") {
    val root = Files.createTempDirectory("graft_ld2").toString
    DataLayout.writeZOrdered(mk(0 until 40000), dims, 16,
      Seq("id", "x", "y"), s"$root/a", 12)
    DataLayout.writeZOrdered(mk(0 until 40000), Seq(col("id")), 16,
      Seq("id"), s"$root/b", 12)
    DataLayout.deleteWhere(spark, s"$root/b", Seq(col("id")), 16,
      Seq("id"), Seq(("id", 7000L, 7049L)))
    // threshold 256 rows: level 0's ~156-rows-per-segment estimate on the
    // dirty segment(s) exceeds it only when several segments dirty — force
    // depth with an even tighter bound and verify the levels were taken
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"), bisectRowThreshold = 64L)
    assert(d.bisectLevels >= 2, s"recursion did not engage: $d")
    // depth narrows the row work: the final dirty ranges hold barely more
    // than the 50 deleted keys, so the id-clustered side row-diffs few files
    assert(d.filesRowDiffedB < d.filesReadB, d.toString)
    val got = d.df.select("sign", "id").as[(String, Long)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq == (7000L to 7049L))
    // and the default threshold keeps the old single-level behavior
    val d1 = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("id"), Seq("x", "y"))
    assert(d1.bisectLevels == 1, d1.toString)
  }

  test("compound keys mesh: a low-cardinality leading key no longer saturates the segments") {
    val root = Files.createTempDirectory("graft_ld2").toString
    // key = (status, id): status has 3 values — segmenting on it alone
    // pools every row into 3 ordinal points and the row diff degrades to
    // the whole table; the z-mesh of (status, id) keeps subdividing on id
    def mkS(ids: Range) = ids.map { i =>
      (Seq("F", "O", "P")(i % 3), i.toLong, (i * 13L) % 65536L)
    }.toDF("st", "id", "x")
    DataLayout.writeZOrdered(mkS(0 until 30000), Seq(col("x")), 16,
      Seq("st", "id", "x"), s"$root/a", 10)
    DataLayout.writeZOrdered(mkS(0 until 30000), Seq(col("id")), 16,
      Seq("st", "id"), s"$root/b", 10)
    DataLayout.deleteWhere(spark, s"$root/b", Seq(col("id")), 16,
      Seq("st", "id"), Seq(("id", 9000L, 9099L)))
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("st", "id"), Seq("x"))
    assert(d.filesRowDiffedA >= 0, s"bisection did not engage: $d")
    // the mutation is localized in id: dirty segments stay few and the
    // id-clustered side's row diff is envelope-confined — the two things
    // a status-only segmentation could not deliver
    assert(d.segmentsDirty >= 1 && d.segmentsDirty <= 8, d.toString)
    assert(d.filesRowDiffedB < d.filesReadB, d.toString)
    val got = d.df.select("sign", "id").as[(String, Long)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq == (9000L to 9099L))
  }

  test("3-key mesh: TWO low-cardinality leading keys still confine the diff") {
    val root = Files.createTempDirectory("graft_ld2").toString
    // key = (st, pr, id): st has 3 values and pr 5 — the 2-key mesh of
    // (st, pr) saturates at ~15 z points (the r17 failure shape, one
    // level up) and the row diff re-degrades to the whole table; the
    // third meshed dimension keeps subdividing on id
    def mk3(ids: Range) = ids.map { i =>
      (Seq("F", "O", "P")(i % 3), s"p${i % 5}", i.toLong,
        (i * 13L) % 65536L)
    }.toDF("st", "pr", "id", "x")
    DataLayout.writeZOrdered(mk3(0 until 30000), Seq(col("x")), 16,
      Seq("st", "pr", "id", "x"), s"$root/a", 10)
    DataLayout.writeZOrdered(mk3(0 until 30000), Seq(col("id")), 16,
      Seq("st", "pr", "id"), s"$root/b", 10)
    DataLayout.deleteWhere(spark, s"$root/b", Seq(col("id")), 16,
      Seq("st", "pr", "id"), Seq(("id", 9000L, 9099L)))
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("st", "pr", "id"), Seq("x"))
    assert(d.filesRowDiffedA >= 0, s"bisection did not engage: $d")
    // the mutation is localized in id: the dirty cells are the few
    // (stCell, prCell, idSlab) combos the 100 deleted rows occupy — and
    // the id-clustered side's row diff reads only the files whose id
    // envelope meets that slab. A (st, pr)-only mesh could deliver
    // neither: its ~15 saturated cells each span ALL of id.
    assert(d.segmentsDirty >= 1 && d.segmentsDirty <= 16, d.toString)
    assert(d.filesRowDiffedB < d.filesReadB, d.toString)
    val got = d.df.select("sign", "id").as[(String, Long)].collect()
    assert(got.forall(_._1 == "-"))
    assert(got.map(_._2).sorted.toSeq == (9000L to 9099L))
  }

  test("compound mesh: NULL keys pool in one segment; an equal pool never leaks diffs") {
    val root = Files.createTempDirectory("graft_ld2").toString
    def mkN(ids: Range) = ids.map { i =>
      (if (i % 50 == 0) null else s"g${i % 7}", i.toLong,
        (i * 13L) % 65536L)
    }.toDF("grp", "id", "x")
    DataLayout.writeZOrdered(mkN(0 until 5000), Seq(col("x")), 16,
      Seq("grp", "id"), s"$root/a", 6)
    // b: identical NULL-keyed rows, one non-null-keyed row dropped —
    // diffLayouts' contract is checksum-grade EQUALITY, so the equal null
    // pool must cancel (the JoinDiff itself would pair-up unmatchable
    // null PKs, but it never sees a clean pool)
    DataLayout.writeZOrdered(mkN(0 until 5000).where(col("id") =!= 777L),
      Seq(col("id")), 16, Seq("grp", "id"), s"$root/b", 6)
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b",
      Seq("grp", "id"), Seq("x"))
    assert(d.filesRowDiffedA >= 0, s"bisection did not engage: $d")
    val got = d.df.select("sign", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("-", 777L)), s"$got $d")
    // a DIRTY null pool surfaces its rows to the JoinDiff, where null PKs
    // are unmatchable by contract (exclusive pairs) — the mutation is
    // visible, never silently dropped
    val b2 = mkN(0 until 5000)
      .withColumn("x", when(col("id") === 100L, lit(-1L)).otherwise(col("x")))
    DataLayout.writeZOrdered(b2, Seq(col("id")), 16, Seq("grp", "id"),
      s"$root/b2", 6)
    val d2 = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b2",
      Seq("grp", "id"), Seq("x"))
    val got2 = d2.df.select("sign", "id").as[(String, Long)].collect()
    assert(got2.exists(_ == ("-", 100L)) &&
      got2.exists(_ == ("+", 100L)), s"mutation hidden: ${got2.toSet}")
    // every surfaced row is from the null pool — non-null keys stay clean
    assert(got2.forall(_._2 % 50 == 0), s"non-null rows leaked: ${got2.toSet}")
  }

  test("column order does not matter to the fingerprint; extra columns do") {
    val root = Files.createTempDirectory("graft_ld2").toString
    write(s"$root/a", 0 until 500)
    // same rows, columns in a different order
    DataLayout.writeZOrdered(mk(0 until 500).select("y", "id", "x"),
      dims, 16, Seq("x", "y"), s"$root/b", 3)
    val d = DataLayout.diffLayouts(spark, s"$root/a", s"$root/b", Seq("id"))
    assert(d.filesReadA == 0 && d.filesReadB == 0 && d.df.isEmpty)
  }
}
