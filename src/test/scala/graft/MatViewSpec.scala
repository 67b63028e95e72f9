package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, MatView}

/** Incremental view maintenance: after ANY mutation mix, `refresh` must
  * land the view on exactly what a from-scratch aggregation of the layout
  * produces — while reading only churn (asserted via the refresh report).
  * Long measures keep incremental +/- exact, so equality is literal. */
class MatViewSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_mv_spec").toString

  /** Layout of (id, g, m) clustered by id; g in 0..19, m a long. */
  private def writeBase(dir: String, n: Int = 4000): Unit = {
    val rnd = new scala.util.Random(99)
    val df = (0 until n).map { i =>
      (i.toLong, (i % 20).toLong, rnd.nextLong(1000000L)) }.toDF("id", "g", "m")
    DataLayout.writeZOrdered(df, Seq(col("id")), 16, Seq("id"), dir, 8)
  }

  /** The ground truth the view must equal: a full aggregation of the
    * layout's CURRENT rows, computed independently of MatView. */
  private def recomputed(dir: String): Map[Long, (Long, Long, Long, Long, Long)] =
    DataLayout.readLayout(spark, dir).groupBy("g")
      .agg(count(lit(1)).as("n_rows"), count(col("m")).as("n_m"),
        sum("m").as("s"), min("m").as("mn"), max("m").as("mx"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  private def viewMap(viewDir: String): Map[Long, (Long, Long, Long, Long, Long)] =
    MatView.read(spark, viewDir)
      .select("g", "n_rows", "n_m", "sum_m", "min_m", "max_m")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  test("refresh tracks append, DV delete, targeted delete, and merge exactly") {
    val root = tmp(); val dir = s"$root/t"; val view = s"$root/v"
    writeBase(dir)
    MatView.materialize(spark, dir, view, Seq("g"), Seq("m"), Seq("id"))
    assert(viewMap(view) == recomputed(dir))

    // v1: append 500 fresh rows (new ids, two NEW groups 20 and 21)
    val delta = (10000 until 10500).map { i =>
      (i.toLong, (i % 22).toLong, (i * 37L) % 1000000L) }.toDF("id", "g", "m")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 2)
    // v2: soft-delete an id range (some groups lose their min/max -> dirty)
    DataLayout.deleteVectors(spark, dir, Seq(("id", 100L, 900L)))
    // v3: physical targeted delete of another range
    DataLayout.deleteWhere(spark, dir, Seq(col("id")), 16, Seq("id"),
      Seq(("id", 3000L, 3300L)))
    // v4: merge — move 50 rows to group 5 with fresh measures, insert 10
    val upd = ((1000 until 1050).map(i => (i.toLong, 5L, 42L)) ++
      (20000 until 20010).map(i => (i.toLong, 7L, 7L))).toDF("id", "g", "m")
    DataLayout.mergeInto(spark, dir, Seq(col("id")), 16, Seq("id"),
      upd, Seq("id"), numFiles = 1)

    val rep = MatView.refresh(spark, view)
    assert(rep.fromVersion == 0L && rep.toVersion == 4L)
    assert(viewMap(view) == recomputed(dir))
    // churn, not table size: well under the 4500 live rows, and the
    // dirty-group recompute really fired (deletes clipped some extremum)
    assert(rep.feedRows < 3000, rep.toString)
    assert(rep.groupsRecomputed > 0 && rep.groupsRecomputed <= 22, rep.toString)

    // idempotent: already-current refresh is a no-op report, no change
    val noop = MatView.refresh(spark, view)
    assert(noop == MatView.RefreshReport(4L, 4L, 0L, 0L, 0L))
    assert(viewMap(view) == recomputed(dir))
  }

  test("insert-only refresh never reads the base (zero recomputes)") {
    val root = tmp(); val dir = s"$root/t"; val view = s"$root/v"
    writeBase(dir, n = 1000)
    MatView.materialize(spark, dir, view, Seq("g"), Seq("m"), Seq("id"))
    val delta = (5000 until 5200).map { i =>
      (i.toLong, (i % 20).toLong, 123L) }.toDF("id", "g", "m")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    val rep = MatView.refresh(spark, view)
    assert(rep.feedRows == 200L && rep.groupsRecomputed == 0L, rep.toString)
    assert(viewMap(view) == recomputed(dir))
  }

  test("a group emptied by deletes leaves the view; a compaction step adds nothing") {
    val root = tmp(); val dir = s"$root/t"; val view = s"$root/v"
    // group = id div 100: deleting ids 0..99 empties group 0 exactly
    val df = (0 until 1000).map(i => (i.toLong, i / 100L, i.toLong))
      .toDF("id", "g", "m")
    DataLayout.writeZOrdered(df, Seq(col("id")), 16, Seq("id"), dir, 4)
    MatView.materialize(spark, dir, view, Seq("g"), Seq("m"), Seq("id"))
    DataLayout.deleteVectors(spark, dir, Seq(("id", 0L, 99L)))
    val rep = MatView.refresh(spark, view)
    assert(rep.feedRows == 100L)
    val got = viewMap(view)
    assert(!got.contains(0L) && got.keySet == (1L to 9L).toSet)
    assert(got == recomputed(dir))
    // compaction moves files but no rows: refresh sees an empty feed and
    // only advances the pinned version
    DataLayout.compactZOrdered(spark, dir, Seq(col("id")), 16, Seq("id"),
      rowsPerFile = 1000)
    val rep2 = MatView.refresh(spark, view)
    assert(rep2.feedRows == 0L && rep2.toVersion ==
      DataLayout.currentVersion(spark, dir))
    assert(got == viewMap(view))
  }

  test("null measures: counted in n_rows, absent from n_m/sum/min/max") {
    val root = tmp(); val dir = s"$root/t"; val view = s"$root/v"
    val df = Seq[(Long, Long, Option[Long])](
      (1L, 0L, Some(10L)), (2L, 0L, None), (3L, 1L, None), (4L, 1L, None))
      .toDF("id", "g", "m")
    DataLayout.writeZOrdered(df, Seq(col("id")), 16, Seq("id"), dir, 1)
    MatView.materialize(spark, dir, view, Seq("g"), Seq("m"), Seq("id"))
    // append: a null into g=0, a first non-null into all-null g=1
    val delta = Seq[(Long, Long, Option[Long])](
      (5L, 0L, None), (6L, 1L, Some(77L))).toDF("id", "g", "m")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    MatView.refresh(spark, view)
    val rows = MatView.read(spark, view)
      .select("g", "n_rows", "n_m", "sum_m", "min_m", "max_m")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(t => t._1 -> t).toMap
    assert(rows(0L) == ((0L, 3L, 1L, Some(10L), Some(10L), Some(10L))))
    assert(rows(1L) == ((1L, 3L, 1L, Some(77L), Some(77L), Some(77L))))
    // remove g=1's only non-null value: min/max/sum return to NULL — via
    // the dirty-recompute path, since the removal hits the stored extremum
    DataLayout.deleteVectors(spark, dir, Seq(("id", 6L, 6L)))
    val rep = MatView.refresh(spark, view)
    assert(rep.groupsRecomputed == 1L, rep.toString)
    val g1 = MatView.read(spark, view).where(col("g") === 1L)
      .select("n_rows", "n_m", "sum_m", "min_m", "max_m")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
    assert(g1 == ((2L, 0L, None, None, None)))
  }

  test("multi-measure views maintain each measure independently") {
    val root = tmp(); val dir = s"$root/t"; val view = s"$root/v"
    val df = (0 until 600).map(i =>
      (i.toLong, (i % 3).toLong, i.toLong, (1000 - i).toLong))
      .toDF("id", "g", "m", "w")
    DataLayout.writeZOrdered(df, Seq(col("id")), 16, Seq("id"), dir, 2)
    MatView.materialize(spark, dir, view, Seq("g"), Seq("m", "w"), Seq("id"))
    DataLayout.deleteVectors(spark, dir, Seq(("id", 0L, 50L)))
    val delta = (700 until 720).map(i =>
      (i.toLong, (i % 3).toLong, i.toLong, i.toLong)).toDF("id", "g", "m", "w")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    MatView.refresh(spark, view)
    val want = DataLayout.readLayout(spark, dir).groupBy("g")
      .agg(count(lit(1)).as("n_rows"),
        count(col("m")).as("n_m"), sum("m").as("sum_m"),
        min("m").as("min_m"), max("m").as("max_m"),
        count(col("w")).as("n_w"), sum("w").as("sum_w"),
        min("w").as("min_w"), max("w").as("max_w"))
      .orderBy("g").collect().toSeq
    val got = MatView.read(spark, view)
      .select("g", "n_rows", "n_m", "sum_m", "min_m", "max_m",
        "n_w", "sum_w", "min_w", "max_w")
      .orderBy("g").collect().toSeq
    assert(got == want)
  }

  test("refresh refuses a regressed (replaced) layout") {
    val root = tmp(); val dir = s"$root/t"; val view = s"$root/v"
    writeBase(dir, n = 500)
    DataLayout.deleteVectors(spark, dir, Seq(("id", 0L, 10L))) // v1
    MatView.materialize(spark, dir, view, Seq("g"), Seq("m"), Seq("id"))
    writeBase(dir, n = 500) // rewrites the layout back to version 0
    intercept[IllegalArgumentException] { MatView.refresh(spark, view) }
  }
}
