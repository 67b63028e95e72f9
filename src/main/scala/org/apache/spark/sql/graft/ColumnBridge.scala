package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Column ↔ Catalyst-Expression bridge.
  *
  * Spark 4 split `Column` from Catalyst (connect support) and made the
  * official converters (`classic.ExpressionUtils`) private[sql]; libraries
  * that ship custom expressions host a one-liner accessor inside the
  * `org.apache.spark.sql` namespace instead (the same technique Delta Lake
  * and most expression-bearing Spark libraries use). This object is the
  * engine's only package-private access point — everything else goes
  * through public APIs.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a DataFrame Column (classic sessions). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply an extensions object's injected functions to a registry — lets
    * tests drive the `withExtensions` path end-to-end against an existing
    * session (builder extensions only apply to sessions not yet created). */
  def registerInjectedFunctions(ext: SparkSessionExtensions,
      registry: FunctionRegistry): Unit = {
    ext.registerFunctions(registry)
    ()
  }

  /** Run a logical plan as a DataFrame (`classic.Dataset.ofRows` is
    * private[sql]) — optimizer rules that eagerly evaluate a small build
    * side need this. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
