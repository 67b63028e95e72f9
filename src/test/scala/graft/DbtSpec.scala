package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dbt.DbtAdapter

class DbtSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark
  import spark.implicits._

  private val runResults =
    """{"results": [
      |  {"unique_id": "model.proj.users", "status": "success"},
      |  {"unique_id": "model.proj.broken", "status": "error"},
      |  {"unique_id": "model.proj.nokeys", "status": "success"},
      |  {"unique_id": "test.proj.some_test", "status": "success"}
      |]}""".stripMargin

  private val manifest =
    """{"nodes": {
      |  "model.proj.users": {"name": "users", "columns": {
      |    "id": {"meta": {"primary-key": true}, "tags": []},
      |    "region": {"meta": {}, "tags": ["primary-key"]},
      |    "v": {"meta": {}, "tags": []}}},
      |  "model.proj.nokeys": {"name": "nokeys", "columns": {
      |    "x": {"meta": {}, "tags": []}}}
      |}}""".stripMargin

  test("artifacts → diff tasks: success models with declared PKs; rest skipped with reasons") {
    val (tasks, skipped) = DbtAdapter.tasks(runResults, manifest)
    assert(tasks == Seq(DbtAdapter.ModelDiff("users", Seq("id", "region"))))
    assert(skipped.map(_.model) == Seq("nokeys"))
  }

  test("diffAll runs the local diff per model over dev/prod bases") {
    val dir = java.nio.file.Files.createTempDirectory("dbt").toString
    val prod = Seq((1L, "eu", 10.0), (2L, "us", 20.0), (3L, "eu", 30.0)).toDF("id", "region", "v")
    val dev = Seq((1L, "eu", 10.0), (2L, "us", 25.0), (4L, "us", 40.0)).toDF("id", "region", "v")
    prod.write.parquet(s"$dir/prod/users.parquet")
    dev.write.parquet(s"$dir/dev/users.parquet")
    val (tasks, _) = DbtAdapter.tasks(runResults, manifest)
    val diffs = DbtAdapter.diffAll(spark, tasks, s"$dir/dev", s"$dir/prod")
    val signs = diffs("users").select("sign", "id").as[(String, Long)].collect().toSet
    // id 2 updated (-/+), id 3 only in prod (-), id 4 only in dev (+)
    assert(signs == Set(("-", 2L), ("+", 2L), ("-", 3L), ("+", 4L)))
  }
}
