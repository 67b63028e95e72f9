package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.layout.{DataLayout, GraftFileIndex}

/** Schema evolution as a versioned metadata artifact: appends may extend
  * the column set without rewriting a byte; readers resolve the schema at
  * their version in O(1) (no 100k-footer mergeSchema pass); time travel
  * shows each version its OWN schema; type changes refuse loudly. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_schema_spec").toString

  test("append extends columns; old rows read NULL; time travel keeps the old schema") {
    val dir = tmp() + "/t"
    val base = (0 until 1000).map(i => (i.toLong, i % 50L)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 4)
    val delta = (1000 until 1500).map(i => (i.toLong, i % 50L, s"tag$i"))
      .toDF("id", "x", "label")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 2)

    val latest = DataLayout.readLayout(spark, dir)
    assert(latest.columns.toSeq == Seq("id", "x", "label"))
    assert(latest.count() == 1500L)
    assert(latest.where(col("label").isNull).count() == 1000L)
    assert(latest.where(col("label") === "tag1200").count() == 1L)
    // version 0 reads with its own, narrower schema
    val v0 = DataLayout.readLayout(spark, dir, 0L)
    assert(v0.columns.toSeq == Seq("id", "x"))
    assert(v0.count() == 1000L)
    // the Catalyst-indexed read resolves the same recorded schema
    val (idx, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    assert(idx.columns.toSeq == Seq("id", "x", "label"))
    assert(idx.where(col("label").isNull).count() == 1000L)
    // skipScan + DV delete still work across mixed-schema files
    DataLayout.deleteVectors(spark, dir, Seq(("id", 0L, 99L)))
    assert(DataLayout.readLayout(spark, dir).count() == 1400L)
    val scan = DataLayout.skipScan(spark, dir, Seq(("id", 0L, 1099L)))
    assert(scan.df.count() == 1000L)
  }

  test("a type change refuses before writing anything") {
    val dir = tmp() + "/t"
    val base = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 1)
    val vBefore = DataLayout.currentVersion(spark, dir)
    val bad = (100 until 120).map(i => (i.toLong, s"s$i")).toDF("id", "x")
    val e = intercept[IllegalArgumentException] {
      DataLayout.appendZOrdered(bad, Seq(col("id")), 16, Seq("id"), dir, 1)
    }
    assert(e.getMessage.contains("cannot change column 'x'"))
    assert(DataLayout.currentVersion(spark, dir) == vBefore)
    assert(DataLayout.readLayout(spark, dir).count() == 100L)
  }

  test("a delta missing an existing column appends; its rows read NULL there") {
    val dir = tmp() + "/t"
    val base = (0 until 100).map(i => (i.toLong, i % 7L)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 1)
    val delta = (100 until 150).map(i => Tuple1(i.toLong)).toDF("id")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    val got = DataLayout.readLayout(spark, dir)
    assert(got.columns.toSeq == Seq("id", "x"))
    assert(got.where(col("x").isNull).count() == 50L)
    assert(got.count() == 150L)
  }

  test("rewrites heal: a delete's fresh files physically carry the full schema") {
    val dir = tmp() + "/t"
    val base = (0 until 1000).map(i => (i.toLong, i % 50L)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 2)
    val delta = (1000 until 1100).map(i => (i.toLong, i % 50L, s"t$i"))
      .toDF("id", "x", "label")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    // targeted delete hits an OLD file (ids 0..99 live in pre-label files)
    DataLayout.deleteWhere(spark, dir, Seq(col("id")), 16, Seq("id"),
      Seq(("id", 0L, 99L)))
    val rewritten = DataLayout.aliveManifest(spark, dir)
      .where(col("file").contains("delete_")).select("file")
      .collect().map(_.getString(0))
    assert(rewritten.nonEmpty)
    // the fresh file's own FOOTER has the label column (healed), null-filled
    val healed = spark.read.parquet(rewritten: _*)
    assert(healed.columns.contains("label"))
    assert(healed.where(col("label").isNotNull).count() == 0L)
  }

  test("diffVersions across the evolution step reads the old side as NULLs") {
    val dir = tmp() + "/t"
    val base = (0 until 200).map(i => (i.toLong, i % 9L)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 1)  // v0
    val delta = (200 until 260).map(i => (i.toLong, i % 9L, s"t$i"))
      .toDF("id", "x", "label")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1) // v1
    val d = DataLayout.diffVersions(spark, dir, 0L, 1L,
      Seq("id"), Seq("x", "label"))
    val got = d.df.select("sign", "id").as[(String, Long)].collect().toSeq
    // only the 60 arrivals differ; surviving rows' (x, NULL-label) match
    assert(got.forall(_._1 == "+") && got.map(_._2).sorted == (200L until 260L))
  }

  test("clone carries the evolved schema as its baseline") {
    val root = tmp(); val src = s"$root/src"; val dst = s"$root/dst"
    val base = (0 until 100).map(i => (i.toLong, i % 5L)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), src, 1)
    val delta = (100 until 160).map(i => (i.toLong, i % 5L, i * 2L))
      .toDF("id", "x", "y")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), src, 1)
    DataLayout.cloneLayout(spark, src, dst)
    val got = DataLayout.readLayout(spark, dst)
    assert(got.columns.toSeq == Seq("id", "x", "y"))
    assert(got.schema("y").dataType == LongType)
    assert(got.where(col("y").isNull).count() == 100L)
  }

  test("an EMPTY delta carrying new columns still widens the schema (one sentinel version)") {
    val dir = tmp() + "/t"
    val base = (0 until 200).map(i => (i.toLong, i % 7L)).toDF("id", "x")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 2)
    // a CDC source can announce a widened schema before its first widened
    // row arrives: the zero-row append must not silently drop the change
    val empty = Seq.empty[(Long, Long, String)].toDF("id", "x", "label")
    DataLayout.appendZOrdered(empty, Seq(col("id")), 16, Seq("id"), dir, 1)
    assert(DataLayout.currentVersion(spark, dir) == 1L)
    val latest = DataLayout.readLayout(spark, dir)
    assert(latest.columns.toSeq == Seq("id", "x", "label"))
    assert(latest.count() == 200L) // sentinel row is never alive
    assert(latest.where(col("label").isNull).count() == 200L)
    // version 0 keeps its own narrower schema
    assert(DataLayout.readLayout(spark, dir, 0L).columns.toSeq == Seq("id", "x"))
    // an empty delta with NO new columns stays a version-free no-op
    DataLayout.appendZOrdered(
      Seq.empty[(Long, Long, String)].toDF("id", "x", "label"),
      Seq(col("id")), 16, Seq("id"), dir, 1)
    assert(DataLayout.currentVersion(spark, dir) == 1L)
  }

  test("pre-evolution layouts (no schema log) still read from file footers") {
    val dir = tmp() + "/t"
    val base = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "p")
    DataLayout.writeZOrdered(base, Seq(col("id")), 16, Seq("id"), dir, 1)
    // simulate a layout written before the schema log existed
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/${DataLayout.SchemaDir}"), true)
    val got = DataLayout.readLayout(spark, dir)
    assert(got.columns.toSeq == Seq("id", "p"))
    assert(got.schema("p").dataType == StringType)
    assert(got.count() == 100L)
    // and an append onto it starts the log from the footer baseline
    val delta = (100 until 120).map(i => (i.toLong, s"v$i", i % 3L))
      .toDF("id", "p", "q")
    DataLayout.appendZOrdered(delta, Seq(col("id")), 16, Seq("id"), dir, 1)
    assert(DataLayout.readLayout(spark, dir).columns.toSeq == Seq("id", "p", "q"))
  }
}
