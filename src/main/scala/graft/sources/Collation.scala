package graft.sources

/** Pre-parsed collation facts for a text key column, and the negotiation
  * that decides which side of a cross-engine diff converts its ordering
  * (reference: data_diff/abcs/database_types.py:18-100).
  *
  * Why it matters: key-range segmentation compares STRING bounds on both
  * engines; if the engines sort text differently (locale vs ordinal,
  * case-insensitive vs sensitive), the same bound selects different row
  * sets and segments silently lose or double-count rows. The "greater"
  * collation is the target; the lesser side casts/converts — and engines
  * known to absorb that conversion cheaply (reference boosts Snowflake)
  * rank LOWER so they do the converting.
  */
final case class Collation(
    /** Engines that absorb conversion cost well rank lower on purpose. */
    absorbsDamage: Boolean = false,
    /** Ordinal = byte/codepoint order (what Spark's UTF8 binary does). */
    ordinal: Option[Boolean] = None,
    /** aAbB (lower first) vs AaBb. */
    lowerFirst: Option[Boolean] = None,
    language: Option[String] = None,
    country: Option[String] = None,
    caseSensitive: Option[Boolean] = None,
    accentSensitive: Option[Boolean] = None) {

  /** Reference __eq__: any two ordinal collations compare equal. The
    * locale-field fallback additionally requires the ordinal FLAGS to
    * agree — without that, a collation declared non-ordinal with no
    * further locale facts (all fields None) compared equal to Spark's
    * binary ordering, and segmentation would run on raw string bounds
    * against an engine that said its ordering is NOT byte order: bounds
    * selecting different row sets per engine, rows silently lost. */
  def equivalent(o: Collation): Boolean =
    if (ordinal.contains(true) && o.ordinal.contains(true)) true
    else ordinal == o.ordinal &&
      language == o.language &&
      (country.isEmpty || o.country.isEmpty || country == o.country) &&
      caseSensitive == o.caseSensitive &&
      accentSensitive == o.accentSensitive &&
      lowerFirst == o.lowerFirst

  /** Reference __gt__: the greater collation is the conversion TARGET. */
  def >(o: Collation): Boolean =
    if (equivalent(o)) false
    else if (absorbsDamage && !o.absorbsDamage) false // this side converts
    else if (o.absorbsDamage && !absorbsDamage) true
    else if (ordinal.contains(true) && !o.ordinal.contains(true)) true
    else false
}

object Collation {
  /** Spark's string comparison: UTF8 binary, i.e. ordinal. */
  val SparkBinary: Collation = Collation(ordinal = Some(true))

  /** Negotiate the target collation for a text key compared across two
    * engines: Some(target) when one side should convert to the other,
    * None when they're equivalent (no conversion), and an error when the
    * orderings are incomparable — then key-range segmentation on raw
    * strings is UNSAFE and the caller must cast the key to a binary
    * collation in the pushed SQL. */
  def negotiate(a: Collation, b: Collation): Either[String, Option[Collation]] =
    if (a.equivalent(b)) Right(None)
    else if (a > b) Right(Some(a))
    else if (b > a) Right(Some(b))
    else Left(
      "incomparable text-key collations: segment bounds would select different rows " +
        "on each engine; cast the key column to a binary/ordinal collation in the " +
        "remote query (e.g. COLLATE, or compare on a hex/byte projection)")
}
