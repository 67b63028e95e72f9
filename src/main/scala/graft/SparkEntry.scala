package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator pack; each entry has (where the
  * semantics are ANSI-SQL-expressible) a matching DuckDB oracle in
  * `oracleSql` with identical column names, used by the driver's
  * correctness gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The engine's raison d'être: a full table diff (orders vs a mutated
    * copy) streaming '-'/'+' rows from one full-outer join. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_joindiff")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.RelationalQueries.queries ++
      graft.operators.DiffQueries.queries ++
      graft.operators.TextQueries.queries ++
      graft.operators.EmbeddingQueries.queries ++
      graft.operators.MultimodalQueries.queries ++
      graft.operators.ExtendedQueries.queries ++
      graft.operators.PushdownQueries.queries ++
      graft.operators.CurationQueries.queries ++
      graft.operators.LayoutQueries.queries ++
      graft.operators.SqlSurfaceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.RelationalQueries.oracleSql ++
      graft.operators.DiffQueries.oracleSql ++
      graft.operators.TextQueries.oracleSql ++
      graft.operators.EmbeddingQueries.oracleSql ++
      graft.operators.MultimodalQueries.oracleSql ++
      graft.operators.ExtendedQueries.oracleSql ++
      graft.operators.PushdownQueries.oracleSql ++
      graft.operators.CurationQueries.oracleSql ++
      graft.operators.LayoutQueries.oracleSql ++
      graft.operators.SqlSurfaceQueries.oracleSql
}
