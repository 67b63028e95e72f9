package graft.dbt

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.Graft

/** dbt adapter: turn dbt artifacts into diff tasks (reference:
  * data_diff/dbt.py + dbt_parser.py — reduced to the local-diff path, which
  * is all parity requires per SURVEY.md §3.3; the cloud-API half is out of
  * scope).
  *
  * `run_results.json` names the models that just built (dev side);
  * `manifest.json` provides each model's primary-key columns via
  * column-level `meta: {"primary-key": true}` or a `primary-key` tag — the
  * same conventions the reference's dbt parser reads. Models without a
  * declared primary key are skipped with a reason, mirroring the
  * reference's behavior.
  */
object DbtAdapter {

  final case class ModelDiff(model: String, keys: Seq[String])
  final case class Skipped(model: String, reason: String)

  private val mapper = new ObjectMapper()

  /** Successful models from run_results.json joined to their manifest
    * nodes; one diff task per model with declared PKs. */
  def tasks(runResultsJson: String, manifestJson: String): (Seq[ModelDiff], Seq[Skipped]) = {
    val runResults = mapper.readTree(runResultsJson)
    val manifest = mapper.readTree(manifestJson)
    val nodes = manifest.path("nodes")
    val built = iterate(runResults.path("results"))
      .filter(r => r.path("status").asText() == "success")
      .map(_.path("unique_id").asText())
      .filter(_.startsWith("model."))
    val out = built.map { id =>
      val node = nodes.path(id)
      if (node.isMissingNode) Right(Skipped(id, "not in manifest"))
      else {
        val name = node.path("name").asText()
        val keys = primaryKeys(node)
        if (keys.isEmpty) Right(Skipped(name, "no primary-key columns declared"))
        else Left(ModelDiff(name, keys))
      }
    }
    // dbt enforces unique model names project-wide, but package shadowing
    // can still surface two successful builds with one name — diffAll's
    // Map (and the shared '<base>/<name>.parquet' path) would silently
    // drop one diff, so later duplicates skip loudly instead
    val lefts = out.collect { case Left(t) => t }
    val seen = scala.collection.mutable.Set.empty[String]
    val kept = scala.collection.mutable.ArrayBuffer.empty[ModelDiff]
    val dupSkips = scala.collection.mutable.ArrayBuffer.empty[Skipped]
    lefts.foreach { t =>
      if (seen.add(t.model)) kept += t
      else dupSkips += Skipped(t.model,
        "duplicate model name across packages — diff the packages separately")
    }
    (kept.toSeq, out.collect { case Right(s) => s } ++ dupSkips.toSeq)
  }

  private def primaryKeys(node: JsonNode): Seq[String] = {
    val cols = node.path("columns")
    fields(cols).collect {
      case (colName, col)
          if col.path("meta").path("primary-key").asBoolean(false) ||
            iterate(col.path("tags")).exists(_.asText() == "primary-key") =>
        colName
    }
  }

  /** Diff every task's dev table against prod: tables live at
    * `<base>/<model>.parquet` (any `Graft.connectToTable` source form). */
  def diffAll(spark: SparkSession, ts: Seq[ModelDiff],
      devBase: String, prodBase: String): Map[String, DataFrame] =
    ts.map { t =>
      val dev = Graft.connectToTable(spark, s"$devBase/${t.model}.parquet", t.keys)
      val prod = Graft.connectToTable(spark, s"$prodBase/${t.model}.parquet", t.keys)
      t.model -> Graft.diffTables(prod, dev)
    }.toMap

  private def iterate(n: JsonNode): Seq[JsonNode] = {
    val it = n.elements()
    val b = Seq.newBuilder[JsonNode]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def fields(n: JsonNode): Seq[(String, JsonNode)] = {
    val it = n.fields()
    val b = Seq.newBuilder[(String, JsonNode)]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }
}
