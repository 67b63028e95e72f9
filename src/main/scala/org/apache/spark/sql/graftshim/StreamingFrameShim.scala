package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` bridge the layout's DSv1 streaming source needs:
  * `MicroBatchExecution` asserts that a v1 `Source.getBatch` result has
  * `isStreaming = true`, and the only way to tag an arbitrary batch plan
  * that way is `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — the same call Spark's own `FileStreamSource`
  * makes (spark/sql/core FileStreamSource.scala). This object lives under
  * `org.apache.spark.sql` purely for that access; no other internals are
  * touched, and the wrapped RDD is the batch plan's own distributed
  * `toRdd` (lazy — nothing is computed or collected here).
  */
object StreamingFrameShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    spark.internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = true)
  }

  /** The sink-side inverse: the frame a v1 `Sink.addBatch` receives is
    * tagged `isStreaming = true`, so handing it to any batch writer
    * (`df.write`, a join against a batch table, …) throws "Queries with
    * streaming sources must be executed with writeStream.start()".
    * Re-wrap the SAME distributed plan (`toRdd` — lazy, nothing collected)
    * as a batch frame, exactly what Delta's `DeltaSink` does with its
    * incoming micro-batch. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    spark.internalCreateDataFrame(qe.toRdd, df.schema, isStreaming = false)
  }

  /** Union N batch frames by CONCATENATING their compiled plans'
    * partitions. A logical `Union` does not guarantee that: under AQE the
    * planner may merge the children's shuffle outputs (observed: two
    * single-partition range-clustered children landed as ONE write
    * partition), but a multi-cluster rewrite needs each child's
    * range-clustered partitions to land as its own output files — an
    * output file spanning the z-gap between clusters widens its envelope
    * over key space where other files sit. `SparkContext.union` of the
    * children's own `toRdd` (lazy — nothing computed or collected here)
    * is the partition-concatenation contract; the frames must agree on
    * column names and types (positional rows). */
  def unionPreservingPartitions(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionPreservingPartitions of nothing")
    val spark = dfs.head.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = dfs.head.schema
    dfs.tail.foreach { d =>
      require(d.schema.fieldNames.sameElements(schema.fieldNames) &&
          d.schema.fields.map(_.dataType).sameElements(
            schema.fields.map(_.dataType)),
        s"schema mismatch in partition-preserving union: ${d.schema} vs $schema")
    }
    val rdds = dfs.map(_.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd)
    spark.internalCreateDataFrame(
      spark.sparkContext.union(rdds), schema, isStreaming = false)
  }

  /** A DataFrame from a parsed-but-unresolved LogicalPlan — what the SQL
    * DML helper (GraftSql) needs to execute a MERGE statement's source
    * subplan. `Dataset.ofRows` is `private[sql]`, hence this bridge. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Column → Catalyst Expression (Spark 4 removed the public `.expr`
    * accessor with the Connect column refactor). The EAGER conversion via
    * `ColumnNodeToExpressionConverter` — `ExpressionUtils.expression`
    * returns a lazy `ColumnNodeExpression` wrapper whose children are
    * still ColumnNodes, useless to a caller pattern-matching the
    * predicate's conjuncts (the DML envelope prefilter). The converter is
    * `private[sql]`, hence this bridge. */
  def expressionOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
