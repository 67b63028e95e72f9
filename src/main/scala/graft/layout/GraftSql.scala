package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StreamingFrameShim

/** SQL spellings for the layout's MUTATIONS — the DML half of the `USING
  * graft` surface. `INSERT INTO` is native (the relation implements
  * InsertableRelation — just `spark.sql("INSERT INTO v …")`); DELETE and
  * MERGE have no DSv1 resolution path in Spark (the analyzer demands v2
  * tables), so this helper parses the statement with SPARK'S OWN PARSER
  * and routes it to the layout primitives:
  *
  * {{{
  *   GraftSql(spark, "DELETE FROM v WHERE o_custkey BETWEEN 5 AND 10")
  *   GraftSql(spark, "UPDATE v SET status = 'X', amt = amt * 2 WHERE id < 9")
  *   GraftSql(spark, """MERGE INTO v USING updates s ON v.id = s.id
  *                      WHEN MATCHED THEN UPDATE SET *
  *                      WHEN NOT MATCHED THEN INSERT *""")
  *   GraftSql(spark, "MERGE INTO v USING gone g ON v.id = g.id " +
  *                   "WHEN MATCHED THEN DELETE")
  * }}}
  *
  * The target may be any registered view over a graft layout (a
  * `CREATE TEMPORARY VIEW … USING graft` view, or anything whose analyzed
  * plan bottoms out in the graft relation) or the direct path spelling
  * `` graft.`/path/to/layout` ``. DELETE lands as deletion vectors
  * ([[DataLayout.deleteVectorsWhere]] — no file rewritten); MERGE lands
  * through the envelope-targeted [[DataLayout.mergeInto]] using the
  * layout's persisted write config ([[LayoutConfig]]). Non-canonical
  * merge shapes (per-action conditions, partial-column UPDATE SET lists,
  * WHEN NOT MATCHED BY SOURCE) are refused loudly — the reference's
  * insert/update surface (data_diff/queries/ast_classes.py:433-459,
  * 765-786) is exactly the canonical row-set form supported here.
  *
  * Returns a one-row report frame (`op`, `rows_deleted`, `rows_updated`,
  * `rows_inserted`, `files_touched`).
  */
object GraftSql {

  def apply(spark: SparkSession, sql: String): DataFrame =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case DeleteFromTable(table, condition) =>
        val (dir, indexes) = resolveTarget(spark, table)
        val cfg = LayoutConfig.mandatory(spark, dir)
        // mark via deletion vectors (no rewrite decides WHAT to delete),
        // then purge immediately: only the files that carried matches are
        // rewritten, and the layout ends DV-free — so a clean-path
        // (unmasked, planning-pruned) view stays CORRECT after the
        // refresh below, exactly Delta's default non-DV DELETE shape.
        val r = DataLayout.deleteVectorsWhere(spark, dir,
          toColumn(condition))
        if (r.rowsDeleted > 0L)
          DataLayout.purgeDeletes(spark, dir, cfg.dims, cfg.bits,
            cfg.statsCols)
        indexes.foreach(_.refresh())
        report(spark, "delete", deleted = r.rowsDeleted,
          files = r.filesTouched)
      case UpdateTable(table, assignments, condition) =>
        val (dir, indexes) = resolveTarget(spark, table)
        val cfg = LayoutConfig.mandatory(spark, dir)
        val sets: Map[String, Column] = assignments.map {
          case Assignment(key: UnresolvedAttribute, value) =>
            key.nameParts.last -> toColumn(value)
          case other => throw new IllegalArgumentException(
            s"unsupported SET target in UPDATE: $other")
        }.toMap
        val r = DataLayout.updateWhere(spark, dir, cfg.dims, cfg.bits,
          cfg.statsCols, condition.map(toColumn).getOrElse(lit(true)), sets)
        indexes.foreach(_.refresh())
        report(spark, "update", updated = r.rowsUpdated,
          files = r.filesRewritten)
      case m: MergeIntoTable => merge(spark, m)
      case _: InsertIntoStatement =>
        // native path: the graft relation is InsertableRelation
        spark.sql(sql)
      case other => throw new IllegalArgumentException(
        s"GraftSql handles INSERT INTO / UPDATE / DELETE FROM / MERGE " +
          s"INTO over graft layouts; got ${other.nodeName} — run other " +
          "statements through spark.sql directly")
    }

  /** The INSERT implementation both relation shapes share (see
    * [[InsertableGraftRelation]] / [[MaskedLayoutRelation]]): positional
    * column matching (Spark's output resolution already casts and orders
    * the query to the table schema), then an ordinary manifested write
    * using the persisted config. */
  private[layout] def insertInto(spark: SparkSession, dir: String,
      version: Long, tableCols: Seq[String], data: DataFrame,
      overwrite: Boolean): Unit = {
    require(version == DataLayout.Latest,
      "cannot INSERT INTO a time-travel (versionAsOf) view — the past is " +
        "immutable; insert through a latest-version view")
    val cfg = LayoutConfig.mandatory(spark, dir)
    require(data.columns.length == tableCols.length,
      s"INSERT column count ${data.columns.length} != table arity " +
        s"${tableCols.length}")
    val renamed = data.toDF(tableCols: _*)
    if (overwrite)
      DataLayout.writeZOrdered(renamed, cfg.dims, cfg.bits, cfg.statsCols,
        dir, cfg.numFiles)
    else
      DataLayout.appendZOrdered(renamed, cfg.dims, cfg.bits, cfg.statsCols,
        dir, cfg.numFiles)
  }

  // ---- MERGE ---------------------------------------------------------------

  private def merge(spark: SparkSession, m: MergeIntoTable): DataFrame = {
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is not supported on graft views — " +
        "evolve via an append (appendZOrdered extends columns), then merge")
    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported — mergeInto never " +
        "touches rows outside the source's key envelope by design")
    val (dir, indexes) = resolveTarget(spark, m.targetTable)
    val cfg = LayoutConfig.mandatory(spark, dir)
    val source = StreamingFrameShim.ofRows(spark, m.sourceTable)
    val keys = mergeKeys(m.mergeCondition)
    val layoutCols = DataLayout.readLayout(spark, dir).columns.toSeq
    def star(a: MergeAction, what: String): Unit = a match {
      case UpdateStarAction(None) | InsertStarAction(None) |
           DeleteAction(None) => ()
      case other => throw new IllegalArgumentException(
        s"only unconditional $what is supported on graft views " +
          s"(got $other) — resolve row-level logic in the source query")
    }
    (m.matchedActions, m.notMatchedActions) match {
      // canonical upsert: WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *
      case (Seq(u), Seq(i)) =>
        star(u, "UPDATE SET *"); star(i, "INSERT *")
        require(u.isInstanceOf[UpdateStarAction] &&
          i.isInstanceOf[InsertStarAction],
          "the canonical graft MERGE is WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *")
        val missing = layoutCols.filterNot(source.columns.contains)
        require(missing.isEmpty,
          s"MERGE source lacks layout columns: ${missing.mkString(",")}")
        val r = DataLayout.mergeInto(spark, dir, cfg.dims, cfg.bits,
          cfg.statsCols, source.select(layoutCols.map(col): _*), keys,
          cfg.numFiles)
        indexes.foreach(_.refresh())
        report(spark, "merge", updated = r.rowsUpdated,
          inserted = r.rowsInserted, files = r.filesRewritten)
      // delete-by-key: WHEN MATCHED THEN DELETE (no insert arm)
      case (Seq(d: DeleteAction), Seq()) =>
        star(d, "DELETE")
        val emptyDelta = DataLayout.readLayout(spark, dir).where(lit(false))
        val r = DataLayout.mergeInto(spark, dir, cfg.dims, cfg.bits,
          cfg.statsCols, emptyDelta, keys, cfg.numFiles,
          deleteKeys = Some(source.select(keys.map(col): _*)))
        indexes.foreach(_.refresh())
        report(spark, "merge_delete", deleted = r.rowsDeleted,
          files = r.filesRewritten)
      case other => throw new IllegalArgumentException(
        s"unsupported MERGE shape $other — graft views take the canonical " +
          "upsert (UPDATE SET * + INSERT *) or delete-by-key (WHEN MATCHED " +
          "THEN DELETE)")
    }
  }

  /** Equi-join key names from the ON condition: a conjunction of
    * `target.k = source.k` pairs, same unqualified name both sides. */
  private def mergeKeys(cond: Expression): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        s"MERGE ON must be a conjunction of target.k = source.k equalities " +
          s"on same-named key columns; got: ${other.sql}")
    }.distinct
  }

  // ---- target resolution -----------------------------------------------------

  /** The layout dir behind a DML target — plus the view's pinned
    * [[GraftFileIndex]] snapshots (refreshed after a mutation so the view
    * sees its own write; other views of the same dir keep their
    * creation-time snapshot, ordinary snapshot isolation). Accepts the
    * `` graft.`/path` `` spelling directly, or any view whose ANALYZED
    * plan bottoms out in a graft relation (the `USING graft` DDL view, a
    * plain alias of one, …). */
  private def resolveTarget(spark: SparkSession,
      table: LogicalPlan): (String, Seq[GraftFileIndex]) = {
    val rel = table match {
      case SubqueryAlias(_, child) => child
      case t => t
    }
    rel match {
      case UnresolvedRelation(Seq("graft", path), _, _) => (path, Nil)
      case UnresolvedRelation(nameParts, _, _) =>
        val analyzed = spark.table(nameParts.mkString(".")).queryExecution.analyzed
        val hits: Seq[(String, Option[GraftFileIndex])] = analyzed.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location match {
                  case g: GraftFileIndex => Some((g.layoutDir, Some(g)))
                  case _ => None
                }
              case msk: MaskedLayoutRelation =>
                Some((msk.layoutDir, None)) // rebuilds per scan: no refresh
              case _ => None
            }
        }.flatten
        hits.map(_._1).distinct match {
          case Seq(one) => (one, hits.flatMap(_._2))
          case Seq() => throw new IllegalArgumentException(
            s"${nameParts.mkString(".")} is not a graft-layout view — " +
              "create one with CREATE TEMPORARY VIEW v USING graft " +
              "OPTIONS (path '<dir>'), or use the graft.`/path` spelling")
          case many => throw new IllegalArgumentException(
            s"${nameParts.mkString(".")} spans ${many.size} graft layouts " +
              "— DML needs exactly one target")
        }
      case other => throw new IllegalArgumentException(
        s"unsupported DML target ${other.nodeName} — name a view or use " +
          "the graft.`/path` spelling")
    }
  }

  /** Parsed-but-unresolved condition → Column, with table qualifiers
    * stripped (the executing frame is the bare layout read — `v.x` would
    * not resolve there). */
  private def toColumn(e: Expression): Column = {
    val unqualified = e.transform {
      case a: UnresolvedAttribute if a.nameParts.length > 1 =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }
    expr(unqualified.sql)
  }

  private def report(spark: SparkSession, op: String, deleted: Long = 0L,
      updated: Long = 0L, inserted: Long = 0L, files: Int = 0): DataFrame = {
    import spark.implicits._
    Seq((op, deleted, updated, inserted, files.toLong))
      .toDF("op", "rows_deleted", "rows_updated", "rows_inserted",
        "files_touched")
  }
}
