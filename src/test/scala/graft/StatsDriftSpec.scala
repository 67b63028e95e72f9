package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{Constraints, DataLayout, GraftFileIndex}

/** Stats-drift and NULL-stats correctness: a manifest log legitimately
  * mixes rows written under DIFFERENT statsCols sets (recluster with new
  * stats, an append passing a different set — both documented as allowed;
  * the log merges schemas). Files whose stats for a column were never
  * recorded read NULL there, and every pruning surface — skipScan,
  * deleteWhere, mergeInto targeting, semiJoinScan, GraftFileIndex — must
  * treat "unrecorded" as "may match" (scan it), never "cannot match"
  * (silently lose its rows). An all-NULL column stays prunable: it
  * records min = NULL WITH nulls_ = n_rows, which no range admits.
  */
class StatsDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("k"))

  /** Base layout (k 1..100, stats on k and amt) + a DRIFTED append
    * (k 101..150) whose manifest rows record stats for NOTHING — the
    * state after statsCols drift: min_k/nulls_k read NULL under the
    * merged log schema. */
  private def drifted(): String = {
    val dir = Files.createTempDirectory("graft_drift").toString + "/t"
    DataLayout.writeZOrdered(
      (1 to 100).map(i => (i.toLong, i * 10L)).toDF("k", "amt"),
      dims, 16, Seq("k", "amt"), dir, 4)
    DataLayout.appendZOrdered(
      (101 to 150).map(i => (i.toLong, i * 10L)).toDF("k", "amt"),
      dims, 16, Seq.empty, dir, 1)
    dir
  }

  test("skipScan: a range over the drifted file's keys still finds its rows") {
    val dir = drifted()
    // manifest sanity: the drifted file really reads NULL stats
    val alive = DataLayout.aliveManifest(spark, dir)
    assert(alive.where(col("min_k").isNull && col("nulls_k").isNull).count() == 1)
    val s = DataLayout.skipScan(spark, dir, Seq(("k", 90L, 120L)))
    assert(s.df.select("k").as[Long].collect().sorted.toSeq ==
      (90L to 120L))
    // and the envelope still prunes the files it CAN rule out
    assert(s.filesRead < s.filesTotal)
  }

  test("deleteWhere: rows inside the drifted file actually die") {
    val dir = drifted()
    val r = DataLayout.deleteWhere(spark, dir, dims, 16, Seq("k", "amt"),
      Seq(("k", 95L, 130L)))
    assert(r.rowsDeleted == 36L)
    assert(DataLayout.readLayout(spark, dir).select("k").as[Long]
      .collect().sorted.toSeq == ((1L to 94L) ++ (131L to 150L)))
  }

  test("mergeInto: an upsert of a key living in the drifted file does not duplicate it") {
    val dir = drifted()
    val r = DataLayout.mergeInto(spark, dir, dims, 16, Seq("k", "amt"),
      delta = Seq((120L, -1L)).toDF("k", "amt"), keyCols = Seq("k"),
      numFiles = 1)
    assert(r.rowsUpdated == 1L && r.rowsInserted == 0L)
    val got = DataLayout.readLayout(spark, dir).where(col("k") === 120L)
      .select("amt").as[Long].collect().toSeq
    assert(got == Seq(-1L)) // exactly one row, the updated one
  }

  test("semiJoinScan: dimension keys mapping into the drifted file still read it") {
    val dir = drifted()
    val keys = Seq(110L, 5L).toDF("k")
    val s = DataLayout.semiJoinScan(spark, dir, keys, "k")
    assert(s.df.select("k").as[Long].collect().sorted.toSeq == Seq(5L, 110L))
  }

  test("GraftFileIndex: =, IsNotNull, and range predicates keep NULL-stat files") {
    val dir = drifted()
    val (ldf, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    // Catalyst pushes IsNotNull(k) alongside the comparison — both shapes
    // must keep the drifted file
    assert(ldf.where(col("k") === 120L).count() == 1L)
    assert(ldf.where(col("k") > 140L).count() == 10L)
    assert(ldf.where(col("k").isNotNull).count() == 150L)
    assert(ldf.where(col("k").isNull).count() == 0L)
    // pruning still happens where stats exist: a point probe into the base
    // keeps the drifted file (unknown) but drops base files it can rule out
    ldf.where(col("k") === 3L).count()
    val (kept, total) = idx.lastPruning.get
    assert(kept < total)
  }

  test("an all-NULL column is still prunable (recorded stats, empty envelope)") {
    val dir = Files.createTempDirectory("graft_drift").toString + "/t"
    DataLayout.writeZOrdered(
      (1 to 50).map(i => (i.toLong, None: Option[Long])).toDF("k", "amt"),
      dims, 16, Seq("k", "amt"), dir, 2)
    val s = DataLayout.skipScan(spark, dir, Seq(("amt", 0L, 999L)))
    assert(s.filesRead == 0 && s.df.isEmpty)
  }

  test("mergeInto composite keys: intersecting all envelopes beats head-only targeting") {
    val dir = Files.createTempDirectory("graft_comp").toString + "/t"
    // g alternates 0/1 (utterly unselective leading key); id is selective
    // and drives the clustering, so files partition by id ranges
    val rows = (1 to 4000).map(i => ((i % 2).toLong, i.toLong, i * 3L))
    DataLayout.writeZOrdered(rows.toDF("g", "id", "amt"),
      Seq(col("id")), 16, Seq("g", "id"), dir, 8)
    val delta = Seq((1L, 101L, -1L), (0L, 102L, -2L)).toDF("g", "id", "amt")
    val r = DataLayout.mergeInto(spark, dir, Seq(col("id")), 16,
      Seq("g", "id"), delta, keyCols = Seq("g", "id"), numFiles = 1)
    // head-only targeting on g ∈ {0,1} would rewrite all 8 files; the id
    // envelope intersection pins the two hit keys to one file
    assert(r.filesRewritten == 1)
    assert(r.rowsUpdated == 2L && r.rowsInserted == 0L)
    assert(DataLayout.readLayout(spark, dir)
      .where(col("id").isin(101L, 102L)).select("amt").as[Long]
      .collect().sorted.toSeq == Seq(-2L, -1L))
  }

  test("constraints survive a writeZOrdered overwrite") {
    val dir = Files.createTempDirectory("graft_ckow").toString + "/t"
    DataLayout.writeZOrdered((1 to 20).map(i => (i.toLong, i * 10L))
      .toDF("k", "amt"), dims, 16, Seq("k"), dir, 2)
    Constraints.add(spark, dir, "amt_pos", "amt > 0")
    // full overwrite (new version 0) — the constraint must come through
    DataLayout.writeZOrdered((1 to 30).map(i => (i.toLong, i * 10L))
      .toDF("k", "amt"), dims, 16, Seq("k"), dir, 2)
    assert(Constraints.list(spark, dir).map(_._1) == Seq("amt_pos"))
    intercept[IllegalArgumentException] {
      DataLayout.appendZOrdered(Seq((99L, -5L)).toDF("k", "amt"),
        dims, 16, Seq("k"), dir, 1)
    }
    // and a violating overwrite itself refuses too
    intercept[IllegalArgumentException] {
      DataLayout.writeZOrdered(Seq((1L, -1L)).toDF("k", "amt"),
        dims, 16, Seq("k"), dir, 1)
    }
  }

  test("StartsWith ceiling skips the surrogate cliff instead of mispruning") {
    val dir = Files.createTempDirectory("graft_surr").toString + "/t"
    // values prefixed "a퟿": the naive ceiling "a\uD800" is an unpaired
    // surrogate, UTF8-encoded as "a?" — which sorts BELOW the matches and
    // would wrongly drop the file. The fixed ceiling increments 'a' → "b".
    val rows = Seq((1L, "a퟿x"), (2L, "a퟿y"), (3L, "zzz"))
    DataLayout.writeZOrdered(rows.toDF("k", "s"), dims, 8,
      Seq("k", "s"), dir, 1)
    val (ldf, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    assert(ldf.where(col("s").startsWith("a퟿")).count() == 2L)
    // plain ASCII prefixes still get the two-sided envelope
    assert(ldf.where(col("s").startsWith("zz")).count() == 1L)
  }
}
