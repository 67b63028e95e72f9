package graft.diff

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON-aware comparison: two JSON strings that parse to the same VALUE
  * must not count as a diff, regardless of key order, whitespace, number
  * spelling (1 vs 1.0), or nesting depth (reference:
  * data_diff/utils.py:515-536 `diffs_are_equiv_jsons` compares
  * `json.loads` values; data_diff/hashdiff_tables.py:72-84).
  *
  * Canonicalization is the Jackson-walk expression
  * [[graft.functions.JsonCanonical]]: recursive sorted keys, canonical
  * decimal numbers, type-preserving — '{"a":1}' vs '{"a":"1"}' is a REAL
  * diff (a from_json(Map(String,String)) spelling stringified every value
  * and silently suppressed those), and duplicate keys are last-wins
  * instead of a job-aborting DUPLICATED_MAP_KEY.
  */
object JsonCompare {

  /** Canonical form of a JSON column (any nesting). NULL and parse
    * failures yield NULL. */
  def canonicalize(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.JsonCanonical(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Null-safe equivalence of two JSON columns under canonicalization.
    * Canonicalization maps NULL, malformed, and non-flat payloads all to
    * NULL — those must NOT compare equal to each other, so equivalence
    * requires EITHER matching non-null canonical forms OR raw equality
    * (which also keeps byte-identical nested payloads equivalent). */
  def jsonEquivalent(a: Column, b: Column): Column = {
    val ca = canonicalize(a)
    val cb = canonicalize(b)
    ((ca <=> cb) && ca.isNotNull) || (a <=> b)
  }
}
