package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: `entry` must smoke (rows > 0 at sf0.001),
  * and the `queries`/`oracleSql` maps must stay consistent — an oracle
  * whose query was renamed away would silently drop a gate.
  */
class ContractSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("entry emits diff rows at sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle belongs to a query and no pack overwrites another's gate") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).mkString(", ")}")
    // ++ on the pack maps silently keeps the LAST duplicate key — pin that
    // the packs are disjoint so no gate can shadow another
    val packs = Seq(
      graft.operators.RelationalQueries.queries, graft.operators.DiffQueries.queries,
      graft.operators.TextQueries.queries, graft.operators.EmbeddingQueries.queries,
      graft.operators.MultimodalQueries.queries, graft.operators.ExtendedQueries.queries,
      graft.operators.PushdownQueries.queries, graft.operators.CurationQueries.queries,
      graft.operators.LayoutQueries.queries, graft.operators.SqlSurfaceQueries.queries)
    assert(packs.map(_.size).sum == q.size,
      "duplicate query names across packs shadow each other")
  }
}
