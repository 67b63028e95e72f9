package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.{DataLayout, GraftFileIndex}

/** Join-driven dynamic file pruning: a plain inner/semi equi-join of an
  * indexed layout against a small dimension must skip manifest files with
  * NO helper API — the JoinPruning rule eagerly evaluates the build side's
  * key domain at optimization time and re-injects it as a literal
  * predicate the FileIndex already knows how to prune on. Results must be
  * byte-identical to the unpruned join in every case; pruning is evidence,
  * never semantics.
  */
class JoinPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  /** Layout of 4000 rows clustered by id into 8 files; id ranges map
    * cleanly onto files, so a narrow key domain must skip most of them. */
  private def freshLayout(): String = {
    val dir = Files.createTempDirectory("graft_jp").toString + "/t"
    DataLayout.writeZOrdered(
      (0 until 4000).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "m"),
      Seq(col("id")), 16, Seq("id"), dir, 8)
    dir
  }

  test("inner join against a small dim prunes files; rows identical to raw join") {
    val dir = freshLayout()
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = Seq((100L, "a"), (110L, "b"), (7000L, "absent"))
      .toDF("id", "tag")
    val got = fact.join(dim, "id").select("id", "m", "tag")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got == Seq((100L, 3L, "a"), (110L, 13L, "b")))
    val (kept, total) = idx.lastPruning.get
    assert(total == 8 && kept < total, s"kept=$kept total=$total")
  }

  test("semi join prunes; a runtime-empty dim prunes EVERYTHING") {
    val dir = freshLayout()
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = Seq(5L, 9L).toDF("id")
    val semi = fact.join(dim, Seq("id"), "left_semi")
    assert(semi.select("id").as[Long].collect().sorted.toSeq == Seq(5L, 9L))
    assert(idx.lastPruning.exists { case (k, t) => t == 8 && k < t })
    // a build side that is only empty AT RUNTIME (a statically-empty one
    // never reaches the rule — PropagateEmptyRelation kills the join in
    // the main optimizer first): parquet-backed, filter matches nothing.
    // The inner join is provably empty — zero files read.
    val dimPath = Files.createTempDirectory("graft_jp").toString + "/dim"
    Seq(5L, 9L).toDF("id").write.parquet(dimPath)
    val (fact2, idx2) = GraftFileIndex.readLayoutIndexed(spark, dir)
    assert(fact2.join(
      spark.read.parquet(dimPath).where(col("id") < 0L), "id").isEmpty)
    // zero files either way: the injected `false` prunes everything, or
    // AQE's empty-relation propagation eliminates the scan before it
    // ever lists (lastPruning None) — both read nothing
    assert(idx2.lastPruning.forall(_._1 == 0), idx2.lastPruning.toString)
  }

  test("beyond the IN cap the min/max range still prunes") {
    val dir = freshLayout()
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    // 400 distinct keys (> MaxInKeys = 256), all inside one narrow range
    val dim = (1000L until 1400L).toDF("id")
    val n = fact.join(dim, "id").count()
    assert(n == 400L)
    val (kept, total) = idx.lastPruning.get
    assert(total == 8 && kept < total, s"kept=$kept total=$total")
  }

  test("a nondeterministic build side is never eagerly evaluated") {
    // pin the rule's guard directly on a handcrafted plan: in a full
    // optimizer run Spark can FOLD provably-true rand comparisons
    // (range reasoning) or pre-evaluate them over local relations
    // (ConvertToLocalRelation), so an end-to-end spelling never delivers
    // a nondeterministic build to the rule — grafting the filter onto
    // the analyzed plan does
    import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, In, Literal, Rand}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val dir = freshLayout()
    val (fact, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dimPath = Files.createTempDirectory("graft_jp").toString + "/dim"
    Seq(42L).toDF("id").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val analyzed = fact.join(dim, "id").queryExecution.analyzed
    def hasInjectedIn(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.exists {
        case f: LFilter => f.condition.exists(_.isInstanceOf[In])
        case _ => false
      }
    // positive control: the deterministic form injects an IN filter
    assert(hasInjectedIn(graft.layout.JoinPruning(analyzed)))
    // nondeterministic build: the rule must not evaluate it eagerly —
    // a re-execution could legally yield different keys
    var wrapped = false
    val withRand = analyzed.transformUp {
      case lr: LogicalRelation
          if !wrapped && lr.output.map(_.name) == Seq("id") =>
        wrapped = true
        LFilter(GreaterThanOrEqual(Rand(Literal(7)), Literal(0.0)), lr)
    }
    assert(wrapped)
    assert(!hasInjectedIn(graft.layout.JoinPruning(withRand)))
  }

  test("outer joins are untouched: all rows survive, no pruning") {
    val dir = freshLayout()
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = Seq((3L, "x")).toDF("id", "tag")
    val n = fact.join(dim, Seq("id"), "left_outer").count()
    assert(n == 4000L)
    assert(idx.lastPruning.exists { case (k, t) => k == t })
  }

  test("layout on the RIGHT of an inner join prunes too") {
    val dir = freshLayout()
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = Seq(2000L, 2001L).toDF("id")
    val got = dim.join(fact, "id").select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2000L, 2001L))
    assert(idx.lastPruning.exists { case (k, t) => t == 8 && k < t })
  }

  test("the injected IN composes with the per-file Bloom index on an unclustered key") {
    // layout clustered by m — id envelopes span every file, so the
    // join-injected IN can only prune through the Bloom index
    val dir = Files.createTempDirectory("graft_jp").toString + "/t"
    DataLayout.writeZOrdered(
      (0 until 4000).map(i => (i.toLong, (i % 97).toLong)).toDF("id", "m"),
      Seq(col("m")), 16, Seq("m", "id"), dir, 8)
    DataLayout.buildBloomIndex(spark, dir, "id")
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = Seq(17L, 3900L).toDF("id")
    val got = fact.join(dim, "id").select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(17L, 3900L))
    val (kept, total) = idx.lastPruning.get
    assert(total == 8 && kept < total, s"kept=$kept total=$total")
  }

  test("pruning composes with a user WHERE on another column") {
    val dir = freshLayout()
    val (fact, idx) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = (100L until 120L).toDF("id")
    val got = fact.where(col("m") < 50L).join(dim, "id")
      .select("id").as[Long].collect().sorted.toSeq
    // m = id % 97: ids 100..119 → m 3..22, all < 50 → all match
    assert(got == (100L until 120L))
    assert(idx.lastPruning.exists { case (k, t) => k < t })
  }

  test("Limit/Sort between relation and join FENCE the injection: rows stay correct") {
    val dir = freshLayout()
    val (fact, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val dim = Seq((5L, "x"), (1999L, "y")).toDF("id", "tag")
    // top-10 by id over the UNPRUNED fact is ids 0..9; joining that with
    // {5, 1999} must yield ONLY id=5. A rule that pushed the key filter
    // beneath the limit would take the top-10 of {5, 1999} instead and
    // wrongly return 1999 too — Spark's own pushdown stops at this fence,
    // and so must the join-pruning injection.
    val got = fact.orderBy("id").limit(10).join(dim, "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(5L), s"limit fence violated: $got")
    // same fence for a window-function dedup shape
    import org.apache.spark.sql.expressions.Window
    val ranked = fact.withColumn("rn",
        row_number().over(Window.orderBy(col("id"))))
      .where(col("rn") <= 10).drop("rn")
    val got2 = ranked.join(dim, "id").select("id").as[Long].collect().toSeq
    assert(got2 == Seq(5L), s"window fence violated: $got2")
    // and pruning STILL fires when only safe nodes intervene
    val (fact2, idx2) = GraftFileIndex.readLayoutIndexed(spark, dir)
    val got3 = fact2.select("id", "m").where(col("m") >= 0).join(dim, "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got3 == Seq(5L, 1999L))
    assert(idx2.lastPruning.exists { case (k, t) => k < t })
  }
}
