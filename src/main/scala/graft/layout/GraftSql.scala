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
        // The common case (no outstanding deletion vectors) lands as ONE
        // atomic rewrite version — Delta's default non-DV DELETE; only the
        // files that carry matches rewrite, and the layout stays DV-free
        // so a clean-path (unmasked, planning-pruned) view remains CORRECT
        // after the refresh below. With effective DVs outstanding, the
        // DV-mark + full-purge spelling stays: it must END DV-free, which
        // a targeted rewrite of only the matching files would not.
        val (deleted, files) =
          if (!DataLayout.dvEffectiveAt(spark, dir)) {
            val r = DataLayout.deleteRowsWhere(spark, dir, cfg.dims,
              cfg.bits, cfg.statsCols, toColumn(condition))
            (r.rowsDeleted, r.filesRewritten)
          } else {
            val r = DataLayout.deleteVectorsWhere(spark, dir,
              toColumn(condition))
            if (r.rowsDeleted > 0L)
              DataLayout.purgeDeletes(spark, dir, cfg.dims, cfg.bits,
                cfg.statsCols)
            (r.rowsDeleted, r.filesTouched)
          }
        indexes.foreach(_.refresh())
        report(spark, "delete", deleted = deleted, files = files)
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
    // the recorded schema, not readLayout: schema is all MERGE needs
    // here, and each readLayout frame construction costs a manifest
    // collect plus a DV-log probe — per-statement fixed jobs
    val tgtSchema = DataLayout.schemaFor(spark, dir)
    val layoutCols = tgtSchema.fieldNames.toSeq
    def emptyDelta = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), tgtSchema)
    (m.matchedActions, m.notMatchedActions) match {
      // canonical upsert fast path — the source IS the delta, no join:
      // WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *, unconditional
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
        val missing = layoutCols.filterNot(source.columns.contains)
        require(missing.isEmpty,
          s"MERGE source lacks layout columns: ${missing.mkString(",")}")
        val r = DataLayout.mergeInto(spark, dir, cfg.dims, cfg.bits,
          cfg.statsCols, source.select(layoutCols.map(col): _*), keys,
          cfg.numFiles)
        indexes.foreach(_.refresh())
        report(spark, "merge", updated = r.rowsUpdated,
          inserted = r.rowsInserted, files = r.filesRewritten)
      // delete-by-key fast path: WHEN MATCHED THEN DELETE (no insert arm)
      case (Seq(DeleteAction(None)), Seq()) =>
        val r = DataLayout.mergeInto(spark, dir, cfg.dims, cfg.bits,
          cfg.statsCols, emptyDelta, keys, cfg.numFiles,
          deleteKeys = Some(source.select(keys.map(col): _*)))
        indexes.foreach(_.refresh())
        report(spark, "merge_delete", deleted = r.rowsDeleted,
          files = r.filesRewritten)
      // the GENERAL shape — per-action conditions, partial-column UPDATE
      // SET lists, explicit INSERT column lists, DELETE arms mixed with
      // UPDATE arms — rewrites to the canonical form over a DERIVED
      // source and lands through the same envelope-targeted mergeInto
      case _ => generalMerge(spark, m, dir, cfg, source, keys, tgtSchema,
        emptyDelta, indexes)
    }
  }

  /** Rewrite a non-canonical MERGE to canonical-over-a-derived-source:
    * join the source to the envelope-pruned target once (left join on the
    * keys — the target side reads only files whose envelopes can hold a
    * source key, so cost ∝ source, never table size), evaluate each
    * action's condition FIRST-MATCH-WINS in statement order (SQL MERGE
    * semantics), and derive (a) the upsert delta — updated rows carry the
    * target row with SET assignments applied, partial SET lists keep the
    * other columns; inserted rows build from the insert list, unnamed
    * columns NULL — and (b) the delete-key set from DELETE arms. One
    * [[DataLayout.mergeInto]] call lands everything atomically; its
    * duplicate-key refusal catches both duplicate source keys and a
    * source row matching two target rows (no defined winner, same as
    * Delta's multiple-matches error). Matched rows that satisfy NO arm
    * are untouched. Conditions and values may reference both sides,
    * qualified by the table/alias names; unqualified names resolve to
    * whichever side uniquely has them and refuse when ambiguous. */
  private def generalMerge(spark: SparkSession, m: MergeIntoTable,
      dir: String, cfg: LayoutConfig.Config, source: DataFrame,
      keys: Seq[String], tgtSchema: org.apache.spark.sql.types.StructType,
      emptyDelta: => DataFrame,
      indexes: Seq[GraftFileIndex]): DataFrame = {
    val layoutCols = tgtSchema.fieldNames.toSeq
    def quals(plan: LogicalPlan): Seq[String] = plan match {
      case SubqueryAlias(id, child) => id.name.toLowerCase +: quals(child)
      case UnresolvedRelation(parts, _, _) => Seq(parts.last.toLowerCase)
      case _ => Nil
    }
    val tgtQuals = quals(m.targetTable).toSet
    val srcQuals = quals(m.sourceTable).toSet
    require((tgtQuals & srcQuals).isEmpty,
      s"MERGE source and target share a name/alias (${(tgtQuals & srcQuals)
        .mkString(",")}) — alias one side")
    val srcCols = source.columns.toSeq
    def actual(cols: Seq[String], n: String): Option[String] =
      cols.find(_.equalsIgnoreCase(n))
    // rewrite a parsed expression's attributes onto the joined frame's
    // prefixed columns (_s_* source / _t_* target), then parse to Column
    def resolve(e: Expression): Column = {
      val mapped = e.transform {
        case a: UnresolvedAttribute =>
          val name = a.nameParts.last
          val qual = a.nameParts.dropRight(1).map(_.toLowerCase)
          val side =
            if (qual.exists(srcQuals)) "_s_"
            else if (qual.exists(tgtQuals)) "_t_"
            else if (qual.nonEmpty) throw new IllegalArgumentException(
              s"unknown qualifier '${qual.mkString(".")}' in MERGE " +
                s"expression ${a.sql} — use the source/target table or alias")
            else (actual(srcCols, name), actual(layoutCols, name)) match {
              case (Some(_), Some(_)) => throw new IllegalArgumentException(
                s"ambiguous column '$name' in MERGE expression — qualify " +
                  "it with the source or target alias")
              case (Some(_), None) => "_s_"
              case (None, Some(_)) => "_t_"
              case _ => throw new IllegalArgumentException(
                s"unknown column '$name' in MERGE expression")
            }
          val host = if (side == "_s_") srcCols else layoutCols
          UnresolvedAttribute(Seq(side + actual(host, name).getOrElse(name)))
      }
      expr(mapped.sql)
    }
    // the derived frame: source LEFT JOIN envelope-pruned target. The
    // semi-join scan restricts the target read to files whose first-key
    // envelope admits a source key — a conservative superset of the true
    // matches, so the left join is exact and never reads the whole table.
    val srcPinned = source.localCheckpoint(true) // consulted many times
    val s = srcPinned.select(srcCols.map(c => col(c).as(s"_s_$c")): _*)
    // the match marker is namespaced OUTSIDE the _s_/_t_ prefix space: a
    // target column literally named `exists` prefixes to `_t_exists`,
    // which a bare `_t_exists` marker would silently overwrite
    val marker = "_graft_t_exists"
    val t = DataLayout.semiJoinScan(spark, dir,
        srcPinned.select(keys.map(col): _*), keys.head).df
      .select(layoutCols.map(c => col(c).as(s"_t_$c")): _*)
      .withColumn(marker, lit(true))
    val isMatched = col(marker).isNotNull
    def targetType(c: String) = tgtSchema(
      actual(layoutCols, c).getOrElse(c)).dataType
    def setMap(assignments: Seq[Assignment],
        what: String): Map[String, Column] = assignments.map {
      case Assignment(key: UnresolvedAttribute, value) =>
        val c = actual(layoutCols, key.nameParts.last).getOrElse(
          throw new IllegalArgumentException(
            s"$what names '${key.nameParts.last}', not a layout column"))
        c -> resolve(value).cast(targetType(c))
      case other => throw new IllegalArgumentException(
        s"unsupported $what target: $other")
    }.toMap
    // ONE adjudication pass over the join (the r18 spelling re-scanned the
    // checkpointed join once per arm, then again for delete keys — 2.2×
    // the canonical upsert's cost on identical data): a single CASE chain
    // tags each row with its winning arm — CASE is first-match-wins by
    // construction, which IS SQL MERGE's arm semantics (a NULL condition
    // takes no branch, i.e. reads false) — and rows no arm claims drop
    // BEFORE the checkpoint, so only action rows materialize.
    val act = "_graft_act"
    val armTags: Seq[(Column, String)] =
      m.matchedActions.zipWithIndex.map { case (a, i) =>
        (isMatched && a.condition.map(resolve).getOrElse(lit(true)),
          s"m$i") } ++
      m.notMatchedActions.zipWithIndex.map { case (a, i) =>
        (!isMatched && a.condition.map(resolve).getOrElse(lit(true)),
          s"n$i") }
    val actCol = armTags.tail.foldLeft(
      when(armTags.head._1, lit(armTags.head._2)))((acc, p) =>
        acc.when(p._1, lit(p._2)))
    val tagged = s.join(t,
        keys.map(k => col(s"_s_$k") === col(s"_t_$k")).reduce(_ && _), "left")
      .withColumn(act, actCol)
      .where(col(act).isNotNull)
      .localCheckpoint(true) // the statement's ONE evaluation of the join
    // per (non-delete) arm: the layout-schema output row as one Column per
    // layout column — every branch casts to the target type, so the CASE
    // over arms below is type-consistent
    val valueArms: Seq[(String, Seq[Column])] =
      m.matchedActions.zipWithIndex.collect {
        case (u: UpdateAction, i) =>
          val sets = setMap(u.assignments, "UPDATE SET")
          s"m$i" -> layoutCols.map(c => sets.getOrElse(c, col(s"_t_$c")))
        case (UpdateStarAction(_), i) =>
          val missing = layoutCols.filterNot(c => actual(srcCols, c).isDefined)
          require(missing.isEmpty,
            s"UPDATE SET * needs every layout column in the source; " +
              s"missing: ${missing.mkString(",")}")
          s"m$i" -> layoutCols.map(c =>
            col(s"_s_${actual(srcCols, c).get}").cast(targetType(c)))
      } ++
      m.notMatchedActions.zipWithIndex.map {
        case (ins: InsertAction, i) =>
          val sets = setMap(ins.assignments, "INSERT")
          s"n$i" -> layoutCols.map(c =>
            sets.getOrElse(c, lit(null).cast(targetType(c))))
        case (InsertStarAction(_), i) =>
          val missing = layoutCols.filterNot(c => actual(srcCols, c).isDefined)
          require(missing.isEmpty,
            s"INSERT * needs every layout column in the source; " +
              s"missing: ${missing.mkString(",")}")
          s"n$i" -> layoutCols.map(c =>
            col(s"_s_${actual(srcCols, c).get}").cast(targetType(c)))
        case (other, _) => throw new IllegalArgumentException(
          s"unsupported WHEN NOT MATCHED action: $other")
      }
    val delTags = m.matchedActions.zipWithIndex.collect {
      case (_: DeleteAction, i) => s"m$i"
    }
    val delta =
      if (valueArms.isEmpty) emptyDelta
      else tagged.where(col(act).isin(valueArms.map(_._1): _*))
        .select(layoutCols.zipWithIndex.map { case (c, ci) =>
          valueArms.tail.foldLeft(
            when(col(act) === valueArms.head._1, valueArms.head._2(ci)))(
            (acc, a) => acc.when(col(act) === a._1, a._2(ci))).as(c)
        }: _*)
    val delKeys =
      if (delTags.isEmpty) None
      else Some(tagged.where(col(act).isin(delTags: _*))
        .select(keys.map(k => col(s"_t_$k").as(k)): _*))
    val r = DataLayout.mergeInto(spark, dir, cfg.dims, cfg.bits,
      cfg.statsCols, delta, keys, cfg.numFiles, deleteKeys = delKeys)
    indexes.foreach(_.refresh())
    report(spark, "merge", deleted = r.rowsDeleted, updated = r.rowsUpdated,
      inserted = r.rowsInserted, files = r.filesRewritten)
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
