package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time CHECK CONSTRAINTS on a [[DataLayout]] — the invariants a
  * 100 TB table needs ENFORCED AT THE SEAM, not discovered by a nightly
  * validation scan: once `add` accepts a constraint, no write path
  * ([[DataLayout.writeZOrdered]] / [[DataLayout.appendZOrdered]] /
  * [[DataLayout.mergeInto]]) can land a violating row, so readers never
  * have to re-check.
  *
  * Semantics follow the SQL standard for CHECK (and Delta Lake's CHECK
  * constraints, delta.io public docs): a row violates only when the
  * predicate evaluates to FALSE — TRUE and NULL (unknown) both pass.
  * Predicates are ordinary Spark SQL expression strings, evaluated
  * codegen'd inside the write's own pass; enforcement costs one
  * DELTA-sized aggregation (never a table scan).
  *
  * The constraint set is itself a tiny versioned log (append-only parquet
  * under `_graft_constraints`, one row per add/drop, last-per-name wins)
  * so it survives compaction, recluster, clone, and vacuum untouched, and
  * `add` validates EXISTING data once (one masked read of the current
  * version) before accepting — an invariant that does not hold today is
  * refused, not recorded.
  *
  * The reference engine validates data only after the fact (its
  * `--assume-unique`/validation queries re-scan on demand); this is the
  * Spark-native preventive spelling.
  */
object Constraints {

  /** Name of the hidden constraint-log directory under a layout. */
  val ConstraintsDir = "_graft_constraints"

  private def cPath(dir: String) = s"$dir/$ConstraintsDir"

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logExists(spark: SparkSession, dir: String): Boolean =
    fsOf(spark, dir).exists(new org.apache.hadoop.fs.Path(cPath(dir)))

  // explicit schema (cf. DataLayout.dvLog): a dir created by an in-flight
  // or crashed append momentarily holds no part files, and inference over
  // it would throw at any concurrent reader
  private def readLog(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema("name STRING, expr_sql STRING, active BOOLEAN, seq BIGINT")
      .parquet(cPath(dir))

  private def appendLog(spark: SparkSession, dir: String,
      name: String, exprSql: String, active: Boolean): Unit = {
    import spark.implicits._
    // isNullAt guard: a log dir created by a crashed write holds zero rows,
    // and max() over nothing is NULL — that residue must read as "start
    // at 0", not NPE
    val seq = if (!logExists(spark, dir)) 0L
      else {
        val r = readLog(spark, dir).agg(max("seq")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
      }
    Seq((name, exprSql, active, seq))
      .toDF("name", "expr_sql", "active", "seq")
      .coalesce(1).write.mode("append").parquet(cPath(dir))
  }

  /** Run `write` with the constraint log preserved across it: a
    * non-partitioned Spark overwrite deletes the ENTIRE layout dir —
    * including `_graft_constraints` — but invariants outlive any one
    * version, so the log is snapshotted (O(constraints) driver rows)
    * before the write and re-written after. Without this, writeZOrdered
    * over a constrained dir would enforce the constraints one last time
    * and then silently drop them — later appends could land violating
    * rows. */
  private[layout] def preserveAcross(spark: SparkSession, dir: String)
      (write: => Unit): Unit = {
    val snap: Option[Seq[org.apache.spark.sql.Row]] =
      if (!logExists(spark, dir)) None
      else Some(readLog(spark, dir).collect().toSeq).filter(_.nonEmpty)
    write
    snap.foreach { rows =>
      spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava),
        org.apache.spark.sql.types.StructType.fromDDL(
          "name STRING, expr_sql STRING, active BOOLEAN, seq BIGINT"))
        .coalesce(1).write.mode("overwrite").parquet(cPath(dir))
    }
  }

  /** The ACTIVE constraints of a layout: (name, predicate SQL), add-order.
    * Empty when the layout has no constraint log. */
  def list(spark: SparkSession, dir: String): Seq[(String, String)] = {
    if (!logExists(spark, dir)) return Seq.empty
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("name").orderBy(col("seq").desc)
    readLog(spark, dir)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .where(col("active"))
      .orderBy("seq")
      .select("name", "expr_sql")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** A row VIOLATES iff the predicate is FALSE — NULL (unknown) passes,
    * per standard CHECK semantics. */
  private def violates(exprSql: String): Column =
    !coalesce(expr(exprSql), lit(true))

  /** Pad `df` with any layout columns it lacks (typed NULLs) so a
    * constraint over an evolved-in column still resolves against a
    * pre-evolution delta — where it passes, because CHECK(NULL) passes. */
  private def padded(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    DataLayout.schemaAt(spark, dir, Long.MaxValue).fold(df) { sch =>
      sch.fields.filterNot(f => df.columns.contains(f.name))
        .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    }

  /** ADD a constraint. Validates the predicate resolves against the
    * layout's schema and (unless `validate = false`) that every CURRENT
    * row satisfies it — one masked read of the layout, refused with the
    * violation count otherwise. The name must not collide with an active
    * constraint. */
  def add(spark: SparkSession, dir: String, name: String, exprSql: String,
      validate: Boolean = true): Unit = {
    require(name.nonEmpty && !name.contains(","),
      s"constraint name must be non-empty and comma-free: '$name'")
    require(!list(spark, dir).exists(_._1 == name),
      s"constraint '$name' already active on $dir")
    val cur = DataLayout.readLayout(spark, dir)
    val v = violates(exprSql) // resolution errors surface on first use below
    if (validate) {
      val bad = cur.where(v).count()
      require(bad == 0L,
        s"constraint '$name' ($exprSql) already violated by $bad existing " +
          s"row(s) in $dir — fix the data or add with validate = false")
    } else cur.where(v).queryExecution.analyzed // resolve-only, no job
    appendLog(spark, dir, name, exprSql, active = true)
  }

  /** DROP a constraint by name (appends a tombstone row; history stays). */
  def drop(spark: SparkSession, dir: String, name: String): Unit = {
    require(list(spark, dir).exists(_._1 == name),
      s"no active constraint '$name' on $dir")
    appendLog(spark, dir, name, "", active = false)
  }

  /** The rows of `df` violating ANY active constraint, with a `violated`
    * column naming the failed constraints (comma-joined, add-order).
    * Empty constraint set → empty result with the same schema. */
  def violations(spark: SparkSession, dir: String, df: DataFrame): DataFrame = {
    val cs = list(spark, dir)
    val d = padded(spark, dir, df)
    if (cs.isEmpty)
      return d.where(lit(false)).withColumn("violated", lit(""))
    val tags = cs.map { case (n, e) => when(violates(e), n) }
    d.withColumn("violated", concat_ws(",", tags: _*))
      .where(col("violated") =!= "")
  }

  /** ENFORCEMENT hook for the write seams: throws (listing per-constraint
    * violation counts) if any incoming row violates. One delta-sized
    * aggregation; a no-op when the layout has no active constraints. */
  private[layout] def enforce(spark: SparkSession, dir: String,
      incoming: DataFrame, seam: String): Unit = {
    if (!logExists(spark, dir)) return
    val cs = list(spark, dir)
    if (cs.isEmpty) return
    val d = padded(spark, dir, incoming)
    val counts = d.agg(
      count(lit(1)).as("_n"),
      cs.map { case (n, e) =>
        coalesce(sum(when(violates(e), 1L).otherwise(0L)), lit(0L)).as(n)
      }: _*
    ).head()
    val bad = cs.zipWithIndex.collect {
      case ((n, e), i) if counts.getLong(i + 1) > 0 =>
        s"'$n' ($e): ${counts.getLong(i + 1)} row(s)"
    }
    require(bad.isEmpty,
      s"$seam into $dir refused — CHECK constraint violation(s): " +
        bad.mkString("; ") + ". Use Constraints.appendPermissive to " +
        "capture rejects, or drop the constraint.")
  }

  /** PERMISSIVE append: splits the delta on the active constraints,
    * appends only the clean rows (z-ordered, as
    * [[DataLayout.appendZOrdered]]), and RETURNS the rejected rows with
    * their `violated` constraint names — the quarantine pattern: the
    * pipeline keeps flowing and the bad rows land in a reviewable frame
    * instead of the table. The split is pinned before the write so the
    * two sides cannot disagree under a nondeterministic source. */
  def appendPermissive(delta: DataFrame, dims: Seq[Column], bits: Int,
      statsCols: Seq[String], dir: String, numFiles: Int): DataFrame = {
    val spark = delta.sparkSession
    val cs = list(spark, dir)
    val tags = cs.map { case (n, e) => when(violates(e), n) }
    // tag once, split on the tag — an anti-join re-derivation would lose
    // null-bearing reject rows to null-key non-matches
    val tagged = padded(spark, dir, delta)
      .withColumn("violated",
        if (cs.isEmpty) lit("") else concat_ws(",", tags: _*))
      .localCheckpoint(true)
    val clean = tagged.where(col("violated") === "")
    if (!clean.isEmpty)
      // straight to writeClustered: the split above IS the enforcement,
      // re-running the appendZOrdered hook would just re-scan the clean side
      DataLayout.writeClustered(clean.select(delta.columns.map(col): _*),
        dims, bits, statsCols, dir, numFiles, append = true)
    tagged.where(col("violated") =!= "")
  }
}
