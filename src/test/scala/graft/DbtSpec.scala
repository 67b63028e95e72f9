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

  // Golden structured-JSON document, mirroring the reference's
  // tests/test_format.py::test_jsonify_diff input and expected dict.
  test("dbt structured JSON matches the reference's golden shape") {
    val a = Seq(("1", "3"), ("2", "4")).toDF("id", "value")
    val b = Seq(("1", "201"), ("3", "202")).toDF("id", "value")
    val got = graft.dbt.DbtFormat.jsonify(a, b, Seq("id"), "my_model",
      Seq("db", "schema", "table1"), Seq("db", "schema", "table2"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val expected = mapper.readTree(
      """{
        |  "status": "success", "result": "different", "model": "my_model",
        |  "dataset1": ["db", "schema", "table1"],
        |  "dataset2": ["db", "schema", "table2"],
        |  "rows": {
        |    "exclusive": {
        |      "dataset1": [{"id": {"isPK": true, "value": "2"}, "value": {"isPK": false, "value": "4"}}],
        |      "dataset2": [{"id": {"isPK": true, "value": "3"}, "value": {"isPK": false, "value": "202"}}]
        |    },
        |    "diff": [{
        |      "id": {"isPK": true, "dataset1": "1", "dataset2": "1", "isDiff": false},
        |      "value": {"isPK": false, "dataset1": "3", "dataset2": "201", "isDiff": true}
        |    }]
        |  },
        |  "summary": null,
        |  "columns": {
        |    "dataset1": [
        |      {"name": "id", "type": "string", "kind": "string"},
        |      {"name": "value", "type": "string", "kind": "string"}],
        |    "dataset2": [
        |      {"name": "id", "type": "string", "kind": "string"},
        |      {"name": "value", "type": "string", "kind": "string"}],
        |    "primaryKey": ["id"],
        |    "exclusive": {"dataset1": [], "dataset2": []},
        |    "typeChanged": []
        |  },
        |  "version": "1.1.0"
        |}""".stripMargin)
    assert(mapper.readTree(got) == expected)
  }

  test("dbt summary carries row totals and per-column change counts") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0)).toDF("id", "s", "v")
    val b = Seq((1L, "x", 9.0), (2L, "y", 2.0), (4L, "w", 4.0)).toDF("id", "s", "v")
    val got = graft.dbt.DbtFormat.jsonify(a, b, Seq("id"), "m",
      Seq("t1"), Seq("t2"), withSummary = true, statsOnly = true)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(got)
    assert(node.path("rows").isNull)
    val rows = node.path("summary").path("rows")
    assert(rows.path("total").path("dataset1").asLong == 3
      && rows.path("total").path("dataset2").asLong == 3)
    assert(rows.path("exclusive").path("dataset1").asLong == 1
      && rows.path("exclusive").path("dataset2").asLong == 1)
    assert(rows.path("updated").asLong == 1 && rows.path("unchanged").asLong == 1)
    val counts = node.path("summary").path("stats").path("diffCounts")
    assert(counts.path("s").asLong == 0 && counts.path("v").asLong == 1)
    assert(node.path("result").asText == "different")
  }

  test("key-only tables produce an exclusive-rows-only document") {
    val a = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val b = Seq(Tuple1(1L), Tuple1(3L)).toDF("id")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(graft.dbt.DbtFormat.jsonify(
      a, b, Seq("id"), "m", Seq("t1"), Seq("t2")))
    assert(node.path("result").asText == "different")
    assert(node.path("rows").path("exclusive").path("dataset1").size == 1)
    assert(node.path("rows").path("exclusive").path("dataset2").size == 1)
    assert(node.path("rows").path("diff").size == 0)
  }

  test("failed diff document matches the reference's FailedDiff shape") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(graft.dbt.DbtFormat.jsonifyError(
      Seq("db", "t1"), Seq("db", "t2"), "m", "boom"))
    assert(node.path("status").asText == "failed" && node.path("error").asText == "boom"
      && node.path("version").asText == "1.0.0")
  }
}
