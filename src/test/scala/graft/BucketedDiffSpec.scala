package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.diff.JoinDiffer

/** The co-located diff path: at warehouse scale the dominant cost of a
  * joindiff is shuffling both tables on the key. When the two sides are
  * bucketed the same way — the standard layout for a table that is diffed
  * or joined on its PK repeatedly — Spark's bucketed-scan rule feeds the
  * sort-merge join directly from the bucket files and the exchange
  * disappears from the plan entirely. This spec pins that: same diff
  * result, zero Exchange nodes.
  */
class BucketedDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  test("joindiff over co-bucketed tables plans no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    val a = (1L to 10000L).map(i => (i, s"v$i")).toDF("k", "v")
    val b = (1L to 10000L).map(i => (i, if (i % 97 == 0) "X" else s"v$i")).toDF("k", "v")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_b")
    try {
      val diff = JoinDiffer.diff(
        spark.table("graft_bucket_a"), spark.table("graft_bucket_b"),
        Seq("k"), Seq("v"))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed diff should read bucket files straight into the join:\n$plan")
      // and the diff itself is still exactly right: 103 keys differ
      // (multiples of 97 up to 10000), each emitting '-' old and '+' new
      val signs = diff.groupBy("sign").count().as[(String, Long)].collect().toMap
      assert(signs == Map("-" -> 103L, "+" -> 103L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
