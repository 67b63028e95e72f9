package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{Constraints, DataLayout}

class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dims = Seq(col("k"))
  private def freshLayout(rows: Seq[(Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_ck").toString + "/t"
    DataLayout.writeZOrdered(rows.toDF("k", "amt", "tag"), dims, 16,
      statsCols = Seq("k"), outDir = dir, numFiles = 2)
    dir
  }

  test("add validates existing data: a violated invariant is refused, not recorded") {
    val dir = freshLayout((1L to 50L).map(i => (i, i * 10, s"t$i")))
    val e = intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "amt_cap", "amt < 400")
    }
    assert(e.getMessage.contains("already violated"))
    assert(Constraints.list(spark, dir).isEmpty)
    // the same predicate over data that satisfies it is accepted
    Constraints.add(spark, dir, "amt_cap", "amt < 1000")
    assert(Constraints.list(spark, dir) == Seq(("amt_cap", "amt < 1000")))
  }

  test("strict seams refuse violating rows: append, overwrite, mergeInto") {
    val dir = freshLayout((1L to 20L).map(i => (i, i, "ok")))
    Constraints.add(spark, dir, "pos", "amt > 0")
    val bad = Seq((100L, -5L, "neg")).toDF("k", "amt", "tag")
    val ea = intercept[IllegalArgumentException] {
      DataLayout.appendZOrdered(bad, dims, 16, Seq("k"), dir, 1)
    }
    assert(ea.getMessage.contains("'pos'") && ea.getMessage.contains("1 row(s)"))
    val eo = intercept[IllegalArgumentException] {
      DataLayout.writeZOrdered(bad, dims, 16, Seq("k"), dir, 1)
    }
    assert(eo.getMessage.contains("writeZOrdered"))
    val em = intercept[IllegalArgumentException] {
      DataLayout.mergeInto(spark, dir, dims, 16, Seq("k"), bad, Seq("k"), 1)
    }
    assert(em.getMessage.contains("mergeInto"))
    // nothing landed and no version was burned
    assert(DataLayout.currentVersion(spark, dir) == 0L)
    assert(DataLayout.readLayout(spark, dir).count() == 20L)
    // conforming rows still flow
    DataLayout.appendZOrdered(Seq((100L, 5L, "ok")).toDF("k", "amt", "tag"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).count() == 21L)
  }

  test("CHECK(NULL) passes — SQL semantics, and padding covers evolved columns") {
    val dir = freshLayout((1L to 10L).map(i => (i, i, "ok")))
    Constraints.add(spark, dir, "pos", "amt > 0")
    // a NULL amt is UNKNOWN, not FALSE: it must pass
    DataLayout.appendZOrdered(
      Seq((50L, Option.empty[Long], "nullamt")).toDF("k", "amt", "tag"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).count() == 11L)
    // evolve in a new column, constrain it; a delta WITHOUT the column is
    // padded to NULL and passes
    DataLayout.appendZOrdered(
      Seq((60L, 6L, "ok", 1L)).toDF("k", "amt", "tag", "score"),
      dims, 16, Seq("k"), dir, 1)
    Constraints.add(spark, dir, "score_pos", "score > 0")
    DataLayout.appendZOrdered(Seq((70L, 7L, "ok")).toDF("k", "amt", "tag"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).count() == 13L)
    // but a present, violating value is refused
    intercept[IllegalArgumentException] {
      DataLayout.appendZOrdered(
        Seq((80L, 8L, "ok", -1L)).toDF("k", "amt", "tag", "score"),
        dims, 16, Seq("k"), dir, 1)
    }
  }

  test("drop lifts enforcement; the log keeps history; re-add works") {
    val dir = freshLayout((1L to 10L).map(i => (i, i, "ok")))
    Constraints.add(spark, dir, "pos", "amt > 0")
    Constraints.drop(spark, dir, "pos")
    assert(Constraints.list(spark, dir).isEmpty)
    DataLayout.appendZOrdered(Seq((99L, -1L, "neg")).toDF("k", "amt", "tag"),
      dims, 16, Seq("k"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).where(col("amt") < 0).count() == 1L)
    // re-adding now fails validation against the landed negative row
    intercept[IllegalArgumentException] {
      Constraints.add(spark, dir, "pos", "amt > 0")
    }
    // dropping an unknown name is refused
    intercept[IllegalArgumentException] {
      Constraints.drop(spark, dir, "nope")
    }
  }

  test("appendPermissive quarantines violators (null-bearing rows included) and lands the rest") {
    val dir = freshLayout((1L to 10L).map(i => (i, i, "ok")))
    Constraints.add(spark, dir, "pos", "amt > 0")
    Constraints.add(spark, dir, "tagged", "tag IS NOT NULL")
    val delta = Seq(
      (11L, Some(11L), Some("ok")),        // clean
      (12L, Some(-12L), Some("neg")),      // violates pos
      (13L, Some(13L), None),              // violates tagged (null tag)
      (14L, Some(-14L), None),             // violates both
      (15L, None, Some("nullamt"))         // NULL amt passes pos -> clean
    ).toDF("k", "amt", "tag")
    val rejects = Constraints.appendPermissive(delta, dims, 16, Seq("k"), dir, 1)
      .select("k", "violated").as[(Long, String)].collect().toMap
    assert(rejects == Map(12L -> "pos", 13L -> "tagged", 14L -> "pos,tagged"))
    val landed = DataLayout.readLayout(spark, dir)
      .where(col("k") >= 11L).select("k").as[Long].collect().sorted.toSeq
    assert(landed == Seq(11L, 15L))
  }

  test("violations() reports without writing; empty constraint set is a no-op seam") {
    val dir = freshLayout((1L to 5L).map(i => (i, i, "ok")))
    // no constraints: violations is empty, writes are unhindered
    assert(Constraints.violations(spark, dir,
      Seq((9L, -9L, "x")).toDF("k", "amt", "tag")).isEmpty)
    Constraints.add(spark, dir, "pos", "amt > 0")
    val v = Constraints.violations(spark, dir,
      Seq((9L, -9L, "x"), (10L, 10L, "y")).toDF("k", "amt", "tag"))
    assert(v.select("k").as[Long].collect().toSeq == Seq(9L))
    // nothing was written by any of the above
    assert(DataLayout.readLayout(spark, dir).count() == 5L)
  }
}
