package graft.diff

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON-aware comparison: two JSON strings that parse to the same object
  * must not count as a diff, regardless of key order or whitespace
  * (reference: data_diff/utils.py:515-536 `diffs_are_equiv_jsons`,
  * data_diff/hashdiff_tables.py:72-84).
  *
  * Canonicalization here covers flat objects (sorted keys, minified),
  * which is the shape the reference compares after its own minified-string
  * normalization; nested payloads can layer `to_json(from_json(...))` with
  * a typed schema instead.
  */
object JsonCompare {

  /** Canonical form of a flat JSON object column: parse to a map, sort
    * entries by key, re-serialize minified. NULL and parse failures yield
    * NULL (from_json returns null on malformed input). */
  def canonicalize(c: Column): Column =
    to_json(map_from_entries(array_sort(map_entries(
      from_json(c, org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))))))

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
