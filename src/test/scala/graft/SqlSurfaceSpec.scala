package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q_exists_subquery de-correlates into one semi and one anti join") {
    val plan = finalPlan(
      graft.operators.SqlSurfaceQueries.queries("q_exists_subquery")(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    // EXISTS must not survive as a per-row subquery probe
    assert(!plan.contains("InSubquery") && !plan.contains("exists#"), plan)
  }

  test("q_scalar_subquery rewrites correlated aggregates into joins") {
    val plan = finalPlan(
      graft.operators.SqlSurfaceQueries.queries("q_scalar_subquery")(spark, sf))
    // both correlated scalar subqueries become aggregate+join, never a
    // re-executed scalar subquery expression in the final plan
    assert(!plan.contains("ScalarSubquery"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q_explode_words: Generate feeds the aggregate; scan reads p_type only") {
    val df = graft.operators.SqlSurfaceQueries.queries("q_explode_words")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("Generate explode"), plan)
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(read.contains("p_type") && !read.contains("p_name"), read)
  }

  test("array HOFs: empty filter result pins heavy_qty to 0, not NULL") {
    // one order whose quantities are all <= 25: the aggregate lambda must
    // start from the literal 0 (the DuckDB oracle coalesces to match)
    Seq((1L, 10L), (1L, 25L), (2L, 30L)).toDF("l_orderkey", "l_quantity")
      .createOrReplaceTempView("graft_hof_fixture")
    val got = spark.table("graft_hof_fixture")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qtys"))
      .select(col("l_orderkey"),
        aggregate(filter(col("qtys"), q => q > 25), lit(0L),
          (acc, q) => acc + q).as("heavy_qty"))
      .orderBy("l_orderkey")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 30L)))
  }
}
