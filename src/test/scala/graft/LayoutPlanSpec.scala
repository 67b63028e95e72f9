package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.DataLayout

/** Executed-plan pins for the layout pack — the ".explain until it's the
  * plan you'd want" loop made durable, like the funnel/bucketed-diff plan
  * specs. */
class LayoutPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_zorder_key: one scan, pruned columns, codegen'd, one presentation sort") {
    val df = graft.operators.LayoutQueries.queries("q_zorder_key")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages are visible
    // keep only the final-plan section (AQE prints the initial plan too)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("FileScan".r.findAllIn(plan).size == 1, plan)
    // the 48-term bit fold must stay inside whole-stage codegen ("*(n)"
    // stage markers in the finalized plan)
    assert(plan.contains("*("), plan)
    // only the final ORDER BY exchanges; the key itself is narrow
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    // column pruning reached the scan: 3 needed columns, nothing else
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("o_orderkey") && read.contains("o_custkey") &&
      read.contains("o_totalprice"), read)
    assert(!read.contains("o_orderdate") && !read.contains("o_orderpriority"), read)
  }

  test("skipScan pushes the row filter into the surviving files' scan") {
    val dir = Files.createTempDirectory("graft_layout_plan").toString + "/t"
    val rnd = new scala.util.Random(3)
    val df = (0 until 2000).map(i =>
      (i.toLong, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))).toDF("id", "x", "y")
    DataLayout.writeZOrdered(df, Seq(col("x"), col("y")), 16, Seq("x", "y"),
      dir, numFiles = 4)
    val scan = DataLayout.skipScan(spark, dir,
      Seq(("x", 0L, 9999L), ("y", 0L, 9999L)))
    val plan = scan.df.queryExecution.executedPlan.toString
    // parquet row-group stats get the SAME intervals the manifest used
    // (the y-side filters fall past the plan string's metadata truncation,
    // so assert the x pair + the pushdown prefix)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(x,0)") &&
      plan.contains("LessThanOrEqual(x,9999)"), plan)
  }

  test("semiJoinScan: broadcast LEFT SEMI, keys never collected, scan pre-pruned") {
    val dir = Files.createTempDirectory("graft_layout_plan").toString + "/t"
    val rnd = new scala.util.Random(11)
    val df = (0 until 2000).map(i =>
      (i.toLong, rnd.nextLong(1 << 16), rnd.nextLong(1 << 16))).toDF("id", "x", "y")
    DataLayout.writeZOrdered(df, Seq(col("x"), col("y")), 16, Seq("x", "y"),
      dir, numFiles = 4)
    val ks = df.select("x").distinct().orderBy("x").limit(8)
    val scan = DataLayout.semiJoinScan(spark, dir, ks, "x")
    scan.df.collect() // finalize the adaptive plan
    val plan = scan.df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the dedup'd key side broadcasts into a LEFT SEMI hash join — the
    // fact side never shuffles and no sort-merge appears
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the data scan reads only the envelope-hit files (pruning happened
    // BEFORE the plan, in the manifest)
    assert(scan.filesRead < scan.filesTotal, s"${scan.filesRead}/${scan.filesTotal}")
  }

  test("string-dim skipScan: string bounds reach the parquet scan as pushed filters") {
    val dir = Files.createTempDirectory("graft_layout_plan").toString + "/t"
    val langs = Seq("de", "en", "es", "fr", "zh")
    val rnd = new scala.util.Random(5)
    val df = (0 until 2000).map(i =>
      (i.toLong, langs(rnd.nextInt(langs.size)), rnd.nextLong(4000))).toDF("id", "lang", "n")
    DataLayout.writeZOrdered(df,
      Seq(DataLayout.stringDim(col("lang"), 16), col("n")), 16,
      Seq("lang", "n"), dir, numFiles = 4)
    val scan = DataLayout.skipScan(spark, dir, Seq(("lang", "en", "en")))
    val plan = scan.df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(lang,en)") &&
      plan.contains("LessThanOrEqual(lang,en)"), plan)
  }

  test("appendZOrderedTxn write plan: one range exchange over the batch, base never scanned") {
    val dir = Files.createTempDirectory("graft_layout_plan").toString + "/t"
    val dims = Seq(col("x"))
    DataLayout.writeZOrdered(
      (0 until 5000).map(i => (i.toLong, (i * 13L) % 4096L)).toDF("id", "x"),
      dims, 16, Seq("id", "x"), dir, 4)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // the batch source is an in-memory range: any FileScan in the WRITE
      // plan could only be the base leaking in
      val batch = spark.range(2000).select(
        (col("id") + 100000L).as("id"),
        pmod(col("id") * 7L, lit(4096L)).as("x"))
      DataLayout.appendZOrderedTxn(batch.toDF(), dims, 16, Seq("id", "x"),
        dir, 2, "plan_probe", 0L)
      // listener callbacks are async: poll until the write plan lands.
      // Filter to the DATA write (the append's private stage dir) — the
      // manifest commit also writes parquet, under _graft_manifest/, and
      // its stats aggregation legitimately scans + exchanges
      def writePlans() = plans.toArray(Array.empty[String])
        .filter(_.contains(s"InsertIntoHadoopFsRelationCommand file:$dir/_graft_append_"))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (writePlans().isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      val writes = writePlans()
        .map(_.split("== Initial Plan ==")(0)) // AQE prints both sections
      assert(writes.nonEmpty, "no write plan captured")
      for (w <- writes) {
        // exactly one exchange, and it is the RANGE partition by z-key
        assert("Exchange".r.findAllIn(w).size == 1, w)
        assert(w.contains("rangepartitioning"), w)
        // ingestion reads ONLY its own rows: the 5000-row base never scans
        assert(!w.contains("FileScan"), w)
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("q_dsir_weights: bucket weights broadcast; the corpus never builds a hash side") {
    val df = graft.operators.CurationQueries.queries("q_dsir_weights")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the feature->weight join must be a broadcast of the <=4096-row side
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    // no sort-merge join anywhere: nothing corpus-sized meets anything
    // corpus-sized on a shuffle boundary in this plan
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
