package graft.diff

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema-level preflight for a diff: column comparison, string-type
  * refinement by sampling, and precision negotiation — the checks the
  * reference runs before any data moves.
  */
object SchemaTools {

  final case class ColDiff(name: String, aType: Option[String], bType: Option[String],
      status: String)

  /** Referential-integrity validation — the FK companion to
    * `TableSegment.validateKeys` (which checks PK uniqueness/nulls):
    * counts child rows whose key has no parent. NULL child keys count as
    * orphans (they reference nothing) and are reported separately so a
    * nullable-FK schema can subtract them. Plan: the child side reduces to
    * one partial-aggregated row per distinct key BEFORE the join (a
    * billion-row child with a million distinct keys joins a million rows),
    * then a left-anti against the parent keys — both sides shuffle on the
    * key, AQE broadcasts the parent when it is small. One summary row out;
    * nothing corpus-sized ever reaches the driver. */
  def refIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val perKey = child.groupBy(col(childKey).as("k"))
      .agg(count(lit(1)).as("n"))
    val orphans = perKey.where(col("k").isNotNull)
      .join(parent.select(col(parentKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(coalesce(sum("n"), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"))
    val totals = child.agg(count(lit(1)).as("n_child_rows"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    totals.crossJoin(orphans)
      .select(col("n_child_rows"),
        coalesce(col("n_null_keys"), lit(0L)).as("n_null_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /** Column-by-column comparison of the two sides' schemas (reference:
    * __main__.py:78-100 diff_schemas — same-DB diffs warn on mismatches
    * before diffing values). `caseSensitive = false` (the default) matches
    * names case-insensitively like the reference's default
    * CaseInsensitiveDict schemas; `true` mirrors its `--case-sensitive`
    * flag (reference: utils.py:73-117 CaseAwareMapping pair). */
  def diffSchemas(a: DataFrame, b: DataFrame,
      caseSensitive: Boolean = false): Seq[ColDiff] = {
    def canon(n: String): String = if (caseSensitive) n else n.toLowerCase
    val at = a.schema.fields.map(f => canon(f.name) -> f.dataType.simpleString).toMap
    val bt = b.schema.fields.map(f => canon(f.name) -> f.dataType.simpleString).toMap
    val names = (a.schema.fields.map(f => canon(f.name)) ++
      b.schema.fields.map(f => canon(f.name))).distinct.toSeq
    names.map { n =>
      (at.get(n), bt.get(n)) match {
        case (Some(x), Some(y)) if x == y => ColDiff(n, Some(x), Some(y), "match")
        case (Some(x), Some(y)) => ColDiff(n, Some(x), Some(y), "type_mismatch")
        case (Some(x), None) => ColDiff(n, Some(x), None, "a_only")
        case (None, Some(y)) => ColDiff(n, None, Some(y), "b_only")
        case _ => throw new IllegalStateException("unreachable")
      }
    }
  }

  /** Field-metadata key recording a string column's refined class — written
    * by remote introspection (RemoteSchema) and by attachStringClasses for
    * local DataFrames; consumed by Normalize (uuid casing alignment). */
  val StringClassKey = "graft.stringClass"

  sealed trait StringClass
  /** Consistently-cased UUIDs — usable as a segmentation key via the
    * 128-bit integer space. */
  final case class UuidStrings(uppercase: Boolean) extends StringClass
  /** All characters in the base-66 alphabet — splittable as big-base
    * numbers for key-range planning. */
  case object AlphanumStrings extends StringClass
  /** Anything else: not reliably checksummable as a key (reference marks
    * plain Text `supported = False` until refined). */
  case object PlainText extends StringClass

  /** Canonical metadata tag for a refined class. */
  def tagOf(cls: StringClass): String = cls match {
    case UuidStrings(upper) => if (upper) "uuid-upper" else "uuid-lower"
    case AlphanumStrings => "alphanum"
    case PlainText => "text"
  }

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  /** Classify one column's sampled values (reference: databases/
    * base.py:1113-1160 — every sample must conform for an upgrade; mixed
    * UUID/non-UUID or mixed-case samples stay PlainText because casing must
    * be consistent for string order to match the numeric key order).
    * `nonNullCount` lets callers whose sample included non-string values
    * force PlainText (values.length < nonNullCount). */
  def classifyStrings(values: Seq[String], nonNullCount: Int): StringClass =
    if (values.length != nonNullCount || values.isEmpty) PlainText
    else if (values.forall(v => UuidRe.matches(v))) {
      val anyUpper = values.exists(_.exists(_.isUpper))
      val anyLower = values.exists(_.exists(_.isLower))
      if (anyUpper && anyLower) PlainText
      else UuidStrings(uppercase = anyUpper)
    } else if (values.forall(_.forall(KeySpace.Alphanums.contains(_)))) {
      AlphanumStrings
    } else PlainText

  /** Dynamic type refinement: sample up to `sample` non-null values per
    * string column and upgrade the column's class when every sampled value
    * conforms (reference: databases/base.py:1113-1160 _refine_coltypes —
    * 64-row sample upgrading Text to String_UUID / String_VaryingAlphanum). */
  def refineStringColumns(df: DataFrame, cols: Seq[String],
      sample: Int = 64): Map[String, StringClass] = {
    // ONE sampling job for all columns (the reference samples the table
    // once, not once per column); non-string values classify as PlainText
    // instead of failing mid-scan.
    val rows = df.select(cols.map(col): _*).limit(sample).collect()
    cols.zipWithIndex.map { case (c, i) =>
      val values = rows.flatMap(r => Option(r.get(i))).collect { case s: String => s }
      val nonNullCount = rows.count(!_.isNullAt(i))
      c -> classifyStrings(values.toSeq, nonNullCount)
    }.toMap
  }

  /** Mutual precision negotiation: both sides compare at the minimum of
    * their declared timestamp/fraction precisions, so a microsecond source
    * never checksum-mismatches a millisecond one (reference:
    * hashdiff_tables.py:118-158). Matters for the md5-parity/pushdown
    * path; Spark-internal hashdiff hashes raw columns and is unaffected. */
  def negotiatePrecision(a: TableSegment, b: TableSegment): (TableSegment, TableSegment) = {
    val fp = math.min(a.fracPrecision, b.fracPrecision)
    val tp = math.min(a.tsPrecision, b.tsPrecision)
    (a.copy(fracPrecision = fp, tsPrecision = tp),
      b.copy(fracPrecision = fp, tsPrecision = tp))
  }
}
