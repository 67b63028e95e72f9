package graft.layout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge

/** DYNAMIC FILE PRUNING for plain joins over a [[GraftFileIndex]] layout:
  *
  * {{{
  *   val (fact, _) = GraftFileIndex.readLayoutIndexed(spark, dir)
  *   fact.join(dim.where($"c_mktsegment" === "BUILDING"), "custkey")  // prunes files
  * }}}
  *
  * Spark's own dynamic partition pruning only fires on PARTITION columns,
  * and its runtime bloom filters materialize after file listing — neither
  * can skip files of an unpartitioned manifest-backed layout. This rule
  * closes that gap the way the manifest design wants: when an inner/semi
  * equi-join's build side is SMALL (plan-estimated), deterministic, and
  * graft-free, it is executed eagerly at optimization time — exactly the
  * work DPP's subquery would do at runtime, a few ms for a filtered
  * dimension — and the resulting key domain is re-injected as a LITERAL
  * predicate directly above the layout's relation:
  *
  *  - ≤ [[MaxInKeys]] distinct build keys → `key IN (…)`, which the
  *    manifest envelope AND the per-file Bloom index both prune on;
  *  - more → `key BETWEEN min AND max`, the envelope-only prune;
  *  - an EMPTY build side → `false` (an inner/semi join with an empty
  *    build is empty — zero files read).
  *
  * The filter is implied by the join (rows failing it can never match), so
  * results are untouched; FileSourceStrategy hands it to
  * [[GraftFileIndex.listFiles]] like any user WHERE. The rule self-limits:
  * one application per Join node (tree tag), builds capped at
  * [[MaxBuildBytes]], nondeterministic builds skipped (re-executing one
  * could legally produce different keys), and build sides containing a
  * graft relation skipped (no recursive eager execution). Sources are
  * assumed frozen for the query's lifetime — the same contract the layout
  * already holds everywhere else (immutable files, versioned manifest).
  *
  * Registered per session via [[GraftFileIndex.readLayoutIndexed]] (through
  * `spark.experimental.extraOptimizations` — runs after the main optimizer
  * batches, so the injected literal filter lands directly above the
  * relation where the physical strategy collects scan filters).
  */
object JoinPruning extends Rule[LogicalPlan] {

  /** Plan-estimated build-side byte cap — mirrors the broadcast-join
    * intuition: if it's small enough to broadcast, it's small enough to
    * evaluate for its key domain. */
  val MaxBuildBytes: Long = 32L * 1024 * 1024

  /** Distinct-key cap for the IN form (Bloom-probeable); beyond it the
    * min/max range still prunes through the envelope at O(files). */
  val MaxInKeys: Int = 256

  /** One application per Join node: the tag survives fixed-point
    * iterations of the user-rule batch, so the eager build execution
    * happens at most once per planned join. */
  private val PrunedTag = TreeNodeTag[Boolean]("graft.joinPruning.applied")

  private def isGraft(lr: LogicalRelation): Boolean = lr.relation match {
    case h: HadoopFsRelation => h.location.isInstanceOf[GraftFileIndex]
    case _ => false
  }

  private def hasGraft(p: LogicalPlan): Boolean =
    p.exists { case lr: LogicalRelation => isGraft(lr); case _ => false }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** (layout-side key, build-side key) pairs of the join condition. */
  private def equiPairs(cond: Expression, stream: LogicalPlan,
      build: LogicalPlan): Seq[(AttributeReference, AttributeReference)] =
    conjuncts(cond).flatMap {
      case EqualTo(x: AttributeReference, y: AttributeReference) =>
        if (stream.outputSet.contains(x) && build.outputSet.contains(y))
          Some((x, y))
        else if (stream.outputSet.contains(y) && build.outputSet.contains(x))
          Some((y, x))
        else None
      case _ => None
    }

  private def buildEligible(build: LogicalPlan): Boolean =
    !hasGraft(build) &&
      build.stats.sizeInBytes <= MaxBuildBytes &&
      build.find(p => p.expressions.exists(e => !e.deterministic)).isEmpty

  /** Execute the build side's key projection and render its domain as a
    * literal predicate on `streamKey`. */
  private def domainPredicate(streamKey: AttributeReference,
      buildKey: AttributeReference, build: LogicalPlan): Expression = {
    val spark = SparkSession.active
    val keys = ColumnBridge.ofRows(spark, build)
      .select(ColumnBridge.column(buildKey).as("_k"))
      .where(col("_k").isNotNull).distinct()
    val sample = keys.limit(MaxInKeys + 1).collect().map(_.get(0))
    if (sample.isEmpty) Literal.FalseLiteral // empty build: empty join
    else if (sample.length <= MaxInKeys)
      In(streamKey, sample.toSeq.map(v => Literal.create(v, buildKey.dataType)))
    else {
      val mm = keys.agg(org.apache.spark.sql.functions.min("_k"),
        org.apache.spark.sql.functions.max("_k")).head()
      And(
        GreaterThanOrEqual(streamKey, Literal.create(mm.get(0), buildKey.dataType)),
        LessThanOrEqual(streamKey, Literal.create(mm.get(1), buildKey.dataType)))
    }
  }

  /** Inject `pred` directly above the graft relation outputting `key`
    * (where FileSourceStrategy collects scan filters) — but ONLY when the
    * path down to it crosses row-preserving, order-insensitive nodes
    * (Filter/Project/aliases). Pushing a filter beneath a Limit, Sort,
    * Window, Sample, or Aggregate changes WHICH rows those operators
    * select (`fact.orderBy(ts).limit(100).join(dim)` must take the
    * top-100 of the UNPRUNED fact) — Spark's own pushdown stops at the
    * same fence, and so must we. An unsafe path returns the side
    * unchanged: pruning silently skipped, never a wrong answer. */
  private def inject(side: LogicalPlan, key: AttributeReference,
      pred: Expression): LogicalPlan = {
    def go(p: LogicalPlan): LogicalPlan = p match {
      case lr: LogicalRelation if isGraft(lr) && lr.outputSet.contains(key) =>
        Filter(pred, lr)
      case f: Filter => f.copy(child = go(f.child))
      case pj: Project => pj.copy(child = go(pj.child))
      case sa: SubqueryAlias => sa.copy(child = go(sa.child))
      case other => other // Limit/Sort/Window/Sample/Aggregate/Join: fence
    }
    go(side)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), _)
        if j.getTagValue(PrunedTag).isEmpty && (jt == Inner || jt == LeftSemi) =>
      // stream = the side holding a graft layout; build = the other one.
      // Inner joins prune either direction; semi joins only the left
      // (their right side never streams).
      val candidates: Seq[(LogicalPlan, LogicalPlan, Boolean)] =
        Seq((left, right, true)) ++
          (if (jt == Inner) Seq((right, left, false)) else Nil)
      val pruned = candidates.collectFirst {
        case (stream, build, streamIsLeft)
            if hasGraft(stream) && buildEligible(build) &&
              equiPairs(cond, stream, build).exists { case (sk, _) =>
                stream.exists {
                  case lr: LogicalRelation =>
                    isGraft(lr) && lr.outputSet.contains(sk)
                  case _ => false
                }
              } =>
          val preds = equiPairs(cond, stream, build).flatMap { case (sk, bk) =>
            val onRelation = stream.exists {
              case lr: LogicalRelation =>
                isGraft(lr) && lr.outputSet.contains(sk)
              case _ => false
            }
            if (onRelation) Some((sk, domainPredicate(sk, bk, build))) else None
          }
          val newStream = preds.foldLeft(stream) { case (s, (sk, p)) =>
            inject(s, sk, p)
          }
          if (streamIsLeft) j.copy(left = newStream)
          else j.copy(right = newStream)
      }
      val out = pruned.getOrElse(j)
      out.setTagValue(PrunedTag, true)
      out
  }
}
