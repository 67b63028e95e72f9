package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Same-engine diff via one FULL OUTER JOIN on the primary key
  * (reference: data_diff/joindiff_tables.py:74-95,307-334).
  *
  * Spark-first shape: a single shuffle on the key, then a codegen'd
  * projection. Both the '-' (a-side) and '+' (b-side) rows are produced in
  * the same pass with one explode, so the join executes exactly once — no
  * self-union that would re-run the join. At cluster scale the only exchange
  * is the key shuffle; AQE handles skewed keys and picks broadcast sides.
  */
object JoinDiffer {

  /** The flagged joined frame: per-key a/b column pairs plus
    * `is_exclusive_a` / `is_exclusive_b` / `is_diff` flags — the direct
    * analogue of the reference's `_create_outer_join` select list.
    *
    * Columns named in `jsonCols` compare under JSON equivalence — key
    * order and whitespace do not make a diff (the reference suppresses
    * equivalent-JSON diffs in hashdiff_tables.py:72-84; here the semantics
    * sit directly in the join's diff flag, still codegen'd built-ins).
    *
    * Columns named in `tolerances` (absolute ε) and/or `relTolerances`
    * (relative factor) compare within a numeric envelope:
    * |a−b| ≤ atol + rtol·max(|a|,|b|) is "unchanged" — the float-drift
    * ask the reference leaves open (ETL re-computation, unit migrations,
    * lossy casts all produce value noise a byte-exact diff mislabels as
    * churn). The combined form is the standard isclose shape, symmetric
    * via max(|a|,|b|); a column in only one map gets 0 for the other
    * term. Note the rel-only pitfall near zero: values drifting around 0
    * fail any pure-relative bound (rtol·~0 = ~0) — give such columns a
    * small atol too. Null semantics are unchanged: null vs non-null is a
    * diff, null <=> null is not; NaN vs NaN compares equal via the
    * null-safe branch, and a NaN against a number is a diff (the envelope
    * test is false on NaN). Exactness is the default — only columns
    * explicitly mapped get an envelope. */
  def flagged(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], jsonCols: Set[String] = Set.empty,
      tolerances: Map[String, Double] = Map.empty,
      relTolerances: Map[String, Double] = Map.empty): DataFrame = {
    require((tolerances.values ++ relTolerances.values)
        .forall(e => e >= 0 && !e.isNaN && !e.isInfinite),
      s"tolerances must be non-negative finite, got abs=$tolerances rel=$relTolerances")
    val cols = keyCols ++ compareCols
    val aa = a.select(cols.map(c => col(c).as(s"a_$c")): _*)
    val bb = b.select(cols.map(c => col(c).as(s"b_$c")): _*)
    val cond = keyCols.map(k => aa(s"a_$k") === bb(s"b_$k")).reduce(_ && _)
    val j = aa.join(bb, cond, "full_outer")
    // exclusive_a: the row only exists in a (all b-side keys null), and vice
    // versa — PKs are non-null by validation, so null means "no match".
    val exclA = keyCols.map(k => col(s"b_$k").isNull).reduce(_ && _)
    val exclB = keyCols.map(k => col(s"a_$k").isNull).reduce(_ && _)
    val diffFlags = compareCols.map { c =>
      val neq =
        if (jsonCols.contains(c)) !JsonCompare.jsonEquivalent(col(s"a_$c"), col(s"b_$c"))
        else if (tolerances.contains(c) || relTolerances.contains(c)) {
          val atol = tolerances.getOrElse(c, 0.0)
          val rtol = relTolerances.getOrElse(c, 0.0)
          // try_cast, not cast: under ANSI (Spark 4's default) a plain
          // cast on a non-numeric value ABORTS the whole diff job
          // mid-flight; try_cast yields NULL and the coalesce below
          // falls back to the exact compare for that row
          val da = expr(s"try_cast(`a_$c` AS DOUBLE)")
          val db = expr(s"try_cast(`b_$c` AS DOUBLE)")
          // the finiteness guards are load-bearing: Spark orders NaN
          // EQUAL to itself and ABOVE every double, so a NaN side makes
          // the rtol·greatest(...) bound NaN and `NaN <= NaN` is TRUE;
          // an infinite side makes the bound +Inf and `Inf <= Inf` is
          // TRUE — either way a wildly-different pair would silently
          // count as within-envelope (numpy.isclose says False for
          // both). NaN≡NaN and Inf≡Inf stay handled by <=> above. The
          // coalesce is equally load-bearing: a tolerance on a column
          // double-cast can't evaluate (a string, a date) makes the
          // envelope NULL, and without the fallback the NULL propagates
          // into is_diff — a genuinely different row silently VANISHES
          // from the diff instead of falling back to the exact compare.
          val finite = (c: Column) => !isnan(c) && abs(c) =!= lit(Double.PositiveInfinity)
          !((col(s"a_$c") <=> col(s"b_$c")) ||
            coalesce(
              col(s"a_$c").isNotNull && col(s"b_$c").isNotNull &&
                finite(da) && finite(db) &&
                abs(da - db) <= lit(atol) + lit(rtol) * greatest(abs(da), abs(db)),
              lit(false)))
        } else !(col(s"a_$c") <=> col(s"b_$c"))
      neq.cast("int").as(s"is_diff_$c")
    }
    j.select(
      (exclA.as("is_exclusive_a") +: exclB.as("is_exclusive_b") +:
        diffFlags ++: cols.map(c => col(s"a_$c")) ++: cols.map(c => col(s"b_$c"))): _*)
  }

  /** Diff rows: ('-', a-side values) for rows missing/stale in b,
    * ('+', b-side values) for rows new/changed in b. An updated key yields
    * both signs (reference: joindiff_tables.py:168-226 `_diff_segments`).
    * `compareColsIn = Nil` derives all non-key columns (the convenience
    * default); a genuinely EMPTY compare list — membership-only diff of a
    * key-only link table, or every column ignored — goes through
    * [[diffExplicit]]. */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareColsIn: Seq[String] = Nil, jsonCols: Set[String] = Set.empty,
      tolerances: Map[String, Double] = Map.empty,
      relTolerances: Map[String, Double] = Map.empty): DataFrame =
    diffExplicit(a, b, keyCols,
      if (compareColsIn.nonEmpty) compareColsIn
      else a.columns.toSeq.filterNot(keyCols.contains), jsonCols, tolerances,
      relTolerances)

  /** [[diff]] with the compare list taken LITERALLY: empty means compare
    * nothing but key membership (added/removed rows only). */
  def diffExplicit(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], jsonCols: Set[String] = Set.empty,
      tolerances: Map[String, Double] = Map.empty,
      relTolerances: Map[String, Double] = Map.empty): DataFrame = {
    val cols = keyCols ++ compareCols
    val f = flagged(a, b, keyCols, compareCols, jsonCols, tolerances, relTolerances)
    val anyDiff = compareCols.map(c => col(s"is_diff_$c") === 1)
      .reduceOption(_ || _).getOrElse(lit(false))
    val aRow = struct(lit("-").as("sign") +: cols.map(c => col(s"a_$c").as(c)): _*)
    val bRow = struct(lit("+").as("sign") +: cols.map(c => col(s"b_$c").as(c)): _*)
    f.where(col("is_exclusive_a") || col("is_exclusive_b") || anyDiff)
      .select(explode(array(
        when(!col("is_exclusive_b"), aRow),
        when(!col("is_exclusive_a"), bRow))).as("r"))
      .where(col("r").isNotNull)
      .select("r.*")
  }

  /** One-row diff statistics (reference: diff_tables.py:76-186 DiffStats).
    * Same Nil-derives-all convention as [[diff]]; see [[statsExplicit]]. */
  def stats(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareColsIn: Seq[String] = Nil, jsonCols: Set[String] = Set.empty,
      tolerances: Map[String, Double] = Map.empty,
      relTolerances: Map[String, Double] = Map.empty): DataFrame =
    statsExplicit(a, b, keyCols,
      if (compareColsIn.nonEmpty) compareColsIn
      else a.columns.toSeq.filterNot(keyCols.contains), jsonCols, tolerances,
      relTolerances)

  /** [[stats]] with the compare list taken literally (empty = membership
    * only). Counters are zero, not NULL, on an empty join — two empty
    * tables report four 0s like the reference's DiffStats. `jsonCols`
    * matches [[diff]]'s, so the summary never contradicts the row-level
    * diff it summarizes. */
  def statsExplicit(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], jsonCols: Set[String] = Set.empty,
      tolerances: Map[String, Double] = Map.empty,
      relTolerances: Map[String, Double] = Map.empty): DataFrame = {
    val f = flagged(a, b, keyCols, compareCols, jsonCols, tolerances, relTolerances)
    val anyDiff = compareCols.map(c => col(s"is_diff_$c") === 1)
      .reduceOption(_ || _).getOrElse(lit(false))
    val both = !col("is_exclusive_a") && !col("is_exclusive_b")
    f.agg(
      coalesce(sum(when(col("is_exclusive_a"), 1L).otherwise(0L)), lit(0L)).as("removed"),
      coalesce(sum(when(col("is_exclusive_b"), 1L).otherwise(0L)), lit(0L)).as("added"),
      coalesce(sum(when(both && anyDiff, 1L).otherwise(0L)), lit(0L)).as("updated"),
      coalesce(sum(when(both && !anyDiff, 1L).otherwise(0L)), lit(0L)).as("unchanged"))
  }

  /** Random sample of rows that exist on only one side — the quick "what
    * got added/removed" peek the reference materializes during joindiff
    * (reference: joindiff_tables.py:53-54,356-394 `sample`: ORDER BY
    * random() LIMIT n over exclusive rows). `side` is "a" (removed) or
    * "b" (added). */
  def sampleExclusive(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      side: String, n: Int = 10): DataFrame = {
    require(side == "a" || side == "b", "side must be 'a' or 'b'")
    val compareCols = a.columns.toSeq.filterNot(keyCols.contains)
    val cols = keyCols ++ compareCols
    flagged(a, b, keyCols, compareCols)
      .where(col(s"is_exclusive_$side"))
      .orderBy(rand())
      .limit(n)
      .select(cols.map(c => col(s"${side}_$c").as(c)): _*)
  }

  /** Apply a diff (the output of [[diff]]) to the b side as a patch,
    * producing a table equal to a — the repair half of the reference's
    * find-out-of-sync-rows use case (its README's "then fix them" step;
    * the reference stops at materializing the diff, this closes the loop).
    *
    * Semantics follow the sign convention: every key carrying a '+' row is
    * b-only or stale, so it is deleted; every '-' row is a's version of a
    * missing or stale row, so it is inserted. An updated key carries both
    * signs and is thus replaced.
    *
    * Scale shape: the delete is a left_anti join of b against the '+' KEYS
    * only — diffs are normally a vanishing fraction of the table, so the
    * key set broadcasts and the patch costs one scan of b plus a union
    * with the (small) '-' rows; AQE turns the anti join into a broadcast
    * at runtime when the key set is small (the normal case) and falls back
    * to a key-partitioned shuffle — never a sort — for dense diffs, which
    * is why the broadcast is NOT forced here: in the dense regime the '+'
    * set approaches the size of b itself. */
  def applyDiff(b: DataFrame, diff: DataFrame, keyCols: Seq[String]): DataFrame = {
    val plusKeys = diff.where(col("sign") === "+").select(keyCols.map(col): _*)
    val minusRows = diff.where(col("sign") === "-").drop("sign")
    b.join(plusKeys, keyCols, "left_anti")
      .unionByName(minusRows.select(b.columns.map(col).toIndexedSeq: _*))
  }

  /** Per-column changed-row counts over matched keys
    * (reference: joindiff_tables.py:336-354). */
  def diffCountsPerColumn(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String], jsonCols: Set[String] = Set.empty,
      tolerances: Map[String, Double] = Map.empty,
      relTolerances: Map[String, Double] = Map.empty): DataFrame = {
    val f = flagged(a, b, keyCols, compareCols, jsonCols, tolerances, relTolerances)
    val both = !col("is_exclusive_a") && !col("is_exclusive_b")
    f.where(both).agg(
      coalesce(sum(col(s"is_diff_${compareCols.head}")), lit(0L))
        .as(s"n_diff_${compareCols.head}"),
      compareCols.tail.map(c =>
        coalesce(sum(col(s"is_diff_$c")), lit(0L)).as(s"n_diff_$c")): _*)
  }
}
