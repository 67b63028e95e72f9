package graft.sources

import org.apache.spark.sql.types._

import graft.diff.SchemaTools

/** Remote schema introspection: build the Spark-side logical schema of a
  * table reachable only through a RemoteEngine, so a pushdown diff can run
  * against a warehouse Spark cannot read directly (reference:
  * data_diff/databases/base.py:1031-1066 query_table_schema /
  * _process_table_schema + base.py:1113-1160 _refine_coltypes).
  *
  * The flow mirrors the reference exactly:
  *  1. one catalog query (`profile.tableSchemaSql`) → raw (name, type,
  *     precisions) rows;
  *  2. filter to the diff-relevant columns, case-insensitively (the
  *     reference's CaseInsensitiveDict default);
  *  3. parse each catalog type to the Spark logical type normalization
  *     runs under (`profile.sparkType` — the reference's parse_type);
  *  4. one 64-row sample query refining Text columns to UUID / alphanum /
  *     plain (`SchemaTools.classifyStrings` — shared with the local side's
  *     refineStringColumns), recorded as field metadata;
  *  5. mutual-precision inputs: timestamps take the MINIMUM declared
  *     precision (normalizing finer than an engine stores would pad zeros
  *     only on one side), decimals take the MAXIMUM scale (padding zeros is
  *     consistent on both sides, while rounding away stored digits could
  *     mask sub-precision diffs) — the reference negotiates per column pair
  *     in hashdiff_tables.py:119-168; here the table-wide knobs land in the
  *     returned RemoteTable and the caller aligns the local TableSegment
  *     (Graft.alignPrecision is the local-side counterpart honoring this
  *     rule; SchemaTools.negotiatePrecision takes the MIN of BOTH knobs —
  *     the declared-precision rule for Spark↔Spark pairs — and pairing it
  *     with this introspection would round away the remote's extra
  *     decimal digits, masking exactly the sub-precision diffs the MAX
  *     rule protects).
  */
object RemoteSchema {

  /** Field-metadata key recording a text column's refined class (shared
    * with the local side so Normalize consumes both). */
  val StringClassKey: String = SchemaTools.StringClassKey

  /** Reference sample size (databases/base.py:1114 sample_size=64). */
  val RefineSampleSize = 64

  def introspect(engine: RemoteEngine, table: String,
      keyCols: Seq[String], compareCols: Seq[String],
      extraWhereSql: Option[String] = None,
      keyCollation: Collation = Collation.SparkBinary,
      sampleSize: Int = RefineSampleSize): RemoteTable = {
    val profile = engine.profile
    val raw = engine.query(profile.tableSchemaSql(table))
      .flatMap(profile.parseSchemaRow)
    if (raw.isEmpty)
      throw new IllegalArgumentException(
        s"${profile.name}: table '$table' does not exist, or has no columns")
    // DESCRIBE-style catalogs can repeat columns across sections — first wins
    val byName: Map[String, RawColumnInfo] =
      raw.groupBy(_.name.toLowerCase).view.mapValues(_.head).toMap

    val wanted = keyCols ++ compareCols
    val missing = wanted.filterNot(c => byName.contains(c.toLowerCase))
    require(missing.isEmpty,
      s"columns not found in remote table '$table': ${missing.mkString(", ")}")
    val infos = wanted.map(c => c -> byName(c.toLowerCase))
    // catalog-STORED casing per requested column: SQL this introspection
    // emits itself must quote the stored name — quoting the caller's
    // casing fails on engines where quoted identifiers are case-sensitive
    // (Postgres folds unquoted DDL lowercase, Snowflake uppercase).
    // Returned schema/keyCols keep the CALLER's casing: that is the
    // cross-side contract (local.keyCols == remote.keyCols) and Spark
    // resolves it case-insensitively.
    val storedName: Map[String, String] =
      infos.map { case (c, info) => c -> info.name }.toMap

    val fields = infos.map { case (c, info) =>
      val dt = profile.sparkType(info).getOrElse(throw new IllegalArgumentException(
        s"${profile.name}: unsupported remote type for column '$c': ${info.dataType}"))
      StructField(c, dt, nullable = true)
    }

    // ---- 64-row text refinement, executed remotely -----------------------
    val textCols = fields.collect { case f if f.dataType == StringType => f.name }
    var sampledRows = 0
    val refined: Map[String, SchemaTools.StringClass] =
      if (textCols.isEmpty) Map.empty
      else {
        val sample = engine.query(profile.sampleSql(
          table, textCols.map(c => profile.quote(storedName(c))), sampleSize, extraWhereSql))
        sampledRows = sample.length
        textCols.zipWithIndex.map { case (c, i) =>
          val values = sample.flatMap(_.lift(i).flatten)
          // nonNullCount = sampled ROWS: a NULL-bearing sample stays PlainText
          // (the reference keeps Text when the sample has NULLs) — a mostly-
          // NULL key must not be classified UUID/alphanum from a few values,
          // and NULL keys defeat key-range segmentation downstream anyway
          c -> SchemaTools.classifyStrings(values, nonNullCount = sample.length)
        }.toMap
      }
    val withMeta = fields.map { f =>
      refined.get(f.name).fold(f) { cls =>
        f.copy(metadata = new MetadataBuilder()
          .putString(StringClassKey, SchemaTools.tagOf(cls)).build())
      }
    }
    // a text key that refines to plain text has characters outside the
    // base-66 alphabet: key-range arithmetic cannot segment it (the
    // reference logs "cannot be used as a key", base.py:1148-1152 — here
    // the failure is loud because the caller asked for exactly these keys)
    // An EMPTY sample (empty table, or extraWhereSql matching nothing) is
    // no evidence at all: refusing would make a legitimately-empty remote
    // un-diffable (its diff is simply every local row, one-signed). Warn
    // like the reference (base.py:1148-1152 logs instead of raising) and
    // let the empty range probe resolve it downstream.
    if (sampledRows == 0 && textCols.exists(keyCols.contains))
      Console.err.println(
        s"[graft] remote table '$table' sampled 0 rows — text key classes " +
          "unverified (an empty side diffs fine; a filtered-empty sample " +
          "may mis-segment if the table is not actually empty)")
    else keyCols.foreach { k =>
      if (refined.get(k).contains(SchemaTools.PlainText))
        throw new IllegalArgumentException(
          s"key column '$k' sampled values outside the UUID/alphanumeric key " +
            "space: it cannot drive key-range segmentation")
    }

    // ---- precision inputs (see scaladoc for the min/max asymmetry) -------
    // TIMESTAMP columns only: information_schema reports datetime_precision=0
    // for DATE columns, and date normalization never uses tsPrecision — a
    // date column in this min would truncate every timestamp in the table to
    // whole seconds and silently mask sub-second diffs
    val tsPrecision = infos.collect {
      case (c, info) if withMeta(wanted.indexOf(c)).dataType == TimestampType =>
        info.datetimePrecision.getOrElse(6)
    }.minOption.getOrElse(6).min(6).max(0)
    // MAX of the stored scales, uncapped up to the decimal limit: a cap
    // (formerly 12) silently truncated digits 13..s of a DECIMAL(38,18)
    // column on BOTH sides — rows differing only there checksummed equal,
    // exactly the masking this MAX rule exists to prevent. Any value of a
    // source DECIMAL(p<=38, s) fits DECIMAL(38, s) by construction; mixed
    // extremes (a huge-integer DECIMAL(38,0) next to a scale-18 column)
    // can overflow the shared cast — LOUDLY, with ANSI on — and the
    // remedy is --columns or a casting view, not silent truncation.
    val fracPrecision = withMeta.collect {
      case StructField(_, d: DecimalType, _, _) => d.scale
    }.maxOption.map(_.max(0).min(38)).getOrElse(2)

    RemoteTable(engine, table, keyCols, compareCols, StructType(withMeta.toArray),
      fracPrecision = fracPrecision, tsPrecision = tsPrecision,
      extraWhereSql = extraWhereSql, keyCollation = keyCollation)
  }
}
