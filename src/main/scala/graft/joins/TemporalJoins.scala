package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — temporal operators the reference lacks (SURVEY.md
  * §2.3 "semi/anti, range, as-of, interval joins: absent — optional
  * extensions"), built so neither ever materializes a per-key cross product.
  *
  * Both take the event time as a NUMERIC column (epoch seconds/micros): the
  * caller picks the granularity once, which also sidesteps cross-engine
  * timestamp-precision traps (nanos vs micros).
  */
object TemporalJoins {

  /** Backward as-of join: each left row picks up `payloadCols` from the
    * single right row with the greatest `rightTs` ≤ `leftTs` for the same
    * key (nulls when no such row).
    *
    * Implemented as union → one window pass, the scalable plan shape: both
    * sides shuffle ONCE on the key, a single sort orders each key's
    * timeline, and `last(_, ignoreNulls)` carries the most recent right
    * payload forward onto left rows. No range condition ever reaches a
    * join, so there is no per-key n×m blowup — cost is one shuffle+sort of
    * |L|+|R|, regardless of match density.
    *
    * Right rows must be unique per (key, rightTs) — pre-aggregate ties
    * (e.g. `max_by`) so "the" matched row is well-defined.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    TemporalJoins.requireNoReserved(left, Seq("_k", "_t", "_side", "_p"))
    TemporalJoins.requireNoReserved(right, Seq("_k", "_t", "_side", "_p"))
    // a NULL right event time sorts FIRST under asc and would become the
    // carried payload for left rows with no legitimate earlier match —
    // "greatest rightTs <= leftTs" can never match a null, so drop them
    val rightNN = right.where(col(rightTs).isNotNull)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightNN.select(payloadCols.map(col): _*).schema.fields)
    // the payload travels as ONE struct: the struct itself is non-null for
    // every right row even when members are null, so the window fill cannot
    // splice member values from DIFFERENT right rows (a per-column
    // last(ignoreNulls) would skip a legitimately-null member and reach
    // back to an older row's value).
    val l2 = left
      .select(Seq(col(keyCol).as("_k"), col(leftTs).as("_t"), lit(1).as("_side"))
        ++ leftCols.map(col) :+ lit(null).cast(payloadType).as("_p"): _*)
    val leftSchema = left.schema
    val r2 = rightNN
      .select(Seq(col(keyCol).as("_k"), col(rightTs).as("_t"), lit(0).as("_side"))
        ++ leftCols.map(c => lit(null).cast(leftSchema(c).dataType).as(c))
        :+ struct(payloadCols.map(col): _*).as("_p"): _*)
    // at equal timestamps the right row sorts first (side 0 < 1) → "≤" semantics
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(c => col("_p").getField(c).as(c)): _*)
  }

  /** Inner range join: pairs (l, r) with equal keys and
    * `l.loCol ≤ r.rightTs < l.hiCol`, for intervals no wider than
    * `binWidth`.
    *
    * The inequality is turned into an equi-join on a time bin: every left
    * interval spans at most two bins of width ≥ its length, so the left
    * side is exploded ×2, hash-joined on (key, bin) — shuffle-partitionable
    * like any equi-join, AQE-skew-splittable — and the exact range filter
    * runs post-join on the candidates only. A raw theta join would fall
    * back to a nested-loop join over every key group; this is the standard
    * binning rewrite that keeps range joins O(matches) at cluster scale.
    * Column names of `left` and `right` must be disjoint.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      loCol: String, hiCol: String, rightTs: String, binWidth: Long): DataFrame = {
    requireNoReserved(left, Seq("_bin", "_bin0"))
    requireNoReserved(right, Seq("_bin", "_bin0"))
    val r2 = right.withColumn("_bin", floor(col(rightTs) / binWidth))
    val l2 = left
      // interval wider than the bin would span >2 bins and silently DROP
      // matches — fail loudly per row instead (data-dependent, so it can't
      // be a static require). A NULL bound is NOT an error: under inner-
      // join semantics a null comparison matches nothing, so the row is
      // simply dropped — one bad row must not abort a billion-row join
      // (and the raise_error message itself would be null).
      .where(col(loCol).isNotNull && col(hiCol).isNotNull)
      .where(when(col(hiCol) - col(loCol) <= binWidth, lit(true))
        .otherwise(raise_error(concat(
          lit(s"rangeJoin: interval wider than binWidth=$binWidth at $loCol="), col(loCol).cast("string")))))
      .withColumn("_bin0", floor(col(loCol) / binWidth))
      .withColumn("_bin", explode(array(col("_bin0"), col("_bin0") + 1)))
      .drop("_bin0")
    l2.join(r2, l2(leftKey) === r2(rightKey) && l2("_bin") === r2("_bin"))
      .where(col(rightTs) >= col(loCol) && col(rightTs) < col(hiCol))
      .drop("_bin")
  }

  /** The helper columns these rewrites generate would silently REPLACE a
    * same-named user column (withColumn/union semantics), vanishing its
    * data with no error — refuse loudly instead. */
  private[joins] def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with this join's internal " +
        s"helper columns (${reserved.mkString(", ")}) — rename them first")
  }
}
