package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A table with diff scope: key columns, compared columns, optional key-range
  * bounds and extra filters — the engine's central abstraction
  * (reference: data_diff/table_segment.py:88-286).
  *
  * All scoping is expressed as DataFrame filters so Catalyst pushes key-range
  * and update-range predicates into the source scan (parquet min/max pruning,
  * JDBC pushdown) — the Spark-native equivalent of the reference's
  * `make_select` building WHERE clauses for the remote engine.
  */
final case class TableSegment(
    df: DataFrame,
    keyCols: Seq[String],
    extraCols: Seq[String] = Nil,
    updateCol: Option[String] = None,
    minKey: Option[Seq[Any]] = None,
    maxKey: Option[Seq[Any]] = None,
    minUpdate: Option[Any] = None,
    maxUpdate: Option[Any] = None,
    whereExpr: Option[Column] = None,
    fracPrecision: Int = 2,
    tsPrecision: Int = 6) {

  require(keyCols.nonEmpty, "a segment needs at least one key column")

  /** Columns that participate in compares/checksums, in stable order. The
    * key-exclusion honors the session's resolution rules: engines that
    * uppercase unquoted identifiers (Derby/Oracle style JDBC reads) must
    * not re-include the key as a compare column just because its stored
    * casing differs from the caller's. */
  def relevantCols: Seq[String] =
    keyCols ++ (if (extraCols.nonEmpty) extraCols
                else {
                  val cs = df.sparkSession.conf
                    .get("spark.sql.caseSensitive", "false").toBoolean
                  df.columns.toSeq.filterNot(c =>
                    keyCols.exists(k => if (cs) k == c else k.equalsIgnoreCase(c)))
                })

  /** Product-order key bound: all components ≥ min, all < max
    * (reference: data_diff/table_segment.py:158-179 via utils.Vector). */
  private def boundFilter: Option[Column] = {
    val lo = minKey.map(vs => keyCols.zip(vs).map { case (k, v) => col(k) >= lit(v) }.reduce(_ && _))
    val hi = maxKey.map(vs => keyCols.zip(vs).map { case (k, v) => col(k) < lit(v) }.reduce(_ && _))
    (lo ++ hi).reduceOption(_ && _)
  }

  private def updateFilter: Option[Column] = updateCol.flatMap { u =>
    val lo = minUpdate.map(v => col(u) >= lit(v))
    val hi = maxUpdate.map(v => col(u) < lit(v))
    (lo ++ hi).reduceOption(_ && _)
  }

  /** The scoped relation: filters applied, relevant columns only
    * (reference: table_segment.py:141-179 `make_select`). */
  def scoped: DataFrame = {
    val filtered = (boundFilter ++ updateFilter ++ whereExpr)
      .foldLeft(df)((d, f) => d.where(f))
    filtered.select(relevantCols.map(col): _*)
  }

  def normCols: Seq[Column] =
    Normalize.normalizedCols(df.select(relevantCols.map(col): _*).schema,
      relevantCols, fracPrecision, tsPrecision)

  /** One-pass count + checksum (reference: table_segment.py:239-258). */
  def countAndChecksum(): (Long, Option[BigDecimal]) = {
    val row = scoped.agg(
      count(lit(1)).as("cnt"),
      Checksum.checksumAgg(normCols).as("checksum")).head()
    val cs = if (row.isNullAt(1)) None
             else Some(BigDecimal(row.getDecimal(1)))
    (row.getLong(0), cs)
  }

  /** Per-bucket count + checksum in a single shuffle — the distributed
    * analogue of the reference's per-segment checksum queries. */
  def bucketChecksums(bucketCol: Column): DataFrame =
    scoped.groupBy(bucketCol.as("bucket"))
      .agg(count(lit(1)).as("cnt"), Checksum.checksumAgg(normCols).as("checksum"))

  /** Same shape, but hashing the RAW columns with xxhash64 instead of the
    * md5-parity normalized form. For Spark-internal diffs both sides are
    * hashed by this engine, so cross-engine string parity buys nothing;
    * raw-column hashing also matches JoinDiffer's raw `<=>` compare exactly
    * and skips normalization + md5 (several× cheaper per row). The exact
    * DECIMAL(38,0) sum cannot overflow at any row count.
    *
    * xxhash64 SKIPS null inputs (the running hash passes through), so each
    * column is paired with its null flag — otherwise a value migrating
    * between adjacent columns via nulls, e.g. ('x', null) vs (null, 'x'),
    * would collide and the diff would be silently pruned. */
  def fastBucketChecksums(bucketCol: Column): DataFrame = {
    val hashed = xxhash64(relevantCols.flatMap(c => Seq(col(c), col(c).isNull)): _*)
    scoped.groupBy(bucketCol.as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(hashed.cast(DecimalType(38, 0))).as("checksum"))
  }

  /** Min/max over the key columns (reference: table_segment.py:260-275). */
  def keyRange(): DataFrame = {
    val aggs = keyCols.flatMap(k => Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
    scoped.agg(aggs.head, aggs.tail: _*)
  }

  def withScope(minK: Seq[Any], maxK: Seq[Any]): TableSegment =
    copy(minKey = Some(minK), maxKey = Some(maxK))

  def withExtraFilter(c: Column): TableSegment =
    copy(whereExpr = Some(whereExpr.fold(c)(_ && c)))

  /** Split into key-range segments: query min/max per key column, cut each
    * dimension with KeySpace, cover the space with the mesh of boxes. Each
    * segment's bounds land in the parquet/JDBC scan as pushed-down
    * predicates (reference: diff_tables.py:289-352 + table_segment.py:
    * 189-202).
    *
    * Key types: integral columns split as integers; string columns are
    * parsed as UUIDs (128-bit integer space, reference ArithUUID,
    * utils.py:150-206) or as base-66 alphanumerics (reference
    * ArithAlphanumeric, utils.py:209-307). Both are safe as SQL scan
    * predicates: UUID hex renders preserve numeric order directly, and the
    * alphanumeric mapping justifies length ties by right-padding with the
    * lowest symbol (' '), which makes the numeric order a refinement of SQL
    * string order — distinct checkpoints are therefore strictly increasing
    * under SQL comparison, so the mesh bounds partition the key space with
    * no row lost or double-counted (only segment *balance* is approximate
    * on all-lowest-suffix ties). */
  def splitByKeyRange(count: Int): Seq[TableSegment] = {
    val row = keyRange().head()
    // `count` budgets the TOTAL segment count: compound keys take the Nth
    // root per dimension (reference: table_segment.py:189-197 "Take Nth
    // root of count"), floored at 2 so splitting always makes progress
    val perDim =
      if (keyCols.size == 1) count
      else math.max(2, math.pow(count.toDouble, 1.0 / keyCols.size).toInt)
    val grids = keyCols.zipWithIndex.map { case (_, i) =>
      // min and max parse UNIFORMLY (a column whose min happens to look
      // like a UUID but whose max doesn't must use one arithmetic, not two)
      val Seq(mn, mx0) = TableSegment.toKeys(Seq(row.get(i * 2), row.get(i * 2 + 1)))
      val hi = mx0.next // exclusive upper bound
      // single-distinct-key dimension: AlphanumKey.next is the width-1
      // SQL-order successor (value + '-'), so the range cannot split —
      // one segment covering [min, min·'-') is the whole answer
      if ((hi - mn) <= 0) Seq(mn, hi) else KeySpace.splitKeySpace(mn, hi, perDim)
    }
    KeySpace.createMeshFromPoints(grids).map { case (lo, hi) =>
      withScope(lo.values.map(TableSegment.fromKey), hi.values.map(TableSegment.fromKey))
    }
  }

  /** Split into `count` row-balanced segments bounded by key checkpoints
    * taken at ROW quantiles — the skew-proof alternative to
    * splitByKeyRange's arithmetic mid-points. Sparse or clustered key
    * spaces (snowflake IDs with epoch gaps, tenant-prefixed keys, bulk-
    * deleted ranges) make arithmetic splitting arbitrarily unbalanced:
    * most segments empty, one holding nearly every row — at 100 TB that
    * is one straggler checksumming the whole table while the rest of the
    * cluster idles. Quantile checkpoints are actual key values from the
    * data, so every segment holds ~n/count rows REGARDLESS of the key
    * distribution, and the bounds are still plain range predicates that
    * push into the scan unchanged. (The reference bisects arithmetically
    * only — diff_tables.py:289-352 — and inherits exactly this
    * imbalance on sparse keys.)
    *
    * Also lifts the key-type restriction: checkpoints compare in native
    * column order (no UUID/alphanumeric arithmetic parsing), so ANY
    * orderable single-column key — arbitrary strings included —
    * segments correctly.
    *
    * `exact = true` derives checkpoints from a full ntile sort —
    * deterministic and engine-reproducible, but the window is a
    * SINGLE-PARTITION sort of the whole key column (the auditable,
    * oracle-gated mode; use it at gate scale). `exact = false` (default, the 100 TB
    * path) sorts only a deterministic hash sample of ~`sampleSize`
    * keys per requested segment — the same sample-then-pick-boundaries
    * scheme as Spark's own RangePartitioner, but md5-48-deterministic,
    * so two runs (or two engines) draw the identical sample. Balance
    * becomes approximate; COVERAGE stays exact, because the segments
    * remain a partition of the key line:
    * (lo, c1), [c1, c2), …, [ck, hi). Driver traffic is the
    * checkpoint list itself — `count − 1` values — in both modes. */
  def splitByRowQuantiles(count: Int, exact: Boolean = false,
      sampleSize: Int = 100): Seq[TableSegment] = {
    require(keyCols.size == 1,
      "row-quantile split needs a single key column (compound keys: " +
        "quantile-split the leading column, mesh the rest)")
    if (count <= 1) return Seq(this)
    val cps = TableSegment.quantileCheckpoints(
      scoped.select(col(keyCols.head)), keyCols.head, count, exact, sampleSize)
    if (cps.isEmpty) return Seq(this)
    // Ends inherit this segment's existing scope bounds (None = open).
    val bounds = (minKey +: cps.map(c => Some(Seq(c)))) :+ maxKey
    bounds.sliding(2).map { case Seq(lo, hi) =>
      copy(minKey = lo, maxKey = hi)
    }.toSeq
  }

  /** count(*) vs count(distinct keys) — duplicate-PK validation
    * (reference: joindiff_tables.py:228-248). */
  def validateKeys(): (Long, Long, Long) = {
    val row = scoped.agg(
      count(lit(1)).as("total"),
      countDistinct(col(keyCols.head), keyCols.tail.map(col): _*).as("distinct"),
      sum(when(keyCols.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L)).as("nulls"))
      .head()
    (row.getLong(0), row.getLong(1), if (row.isNullAt(2)) 0L else row.getLong(2))
  }
}

object TableSegment {
  /** Interior checkpoint values for `count` row-balanced segments of
    * `df`'s `k` column — the core of splitByRowQuantiles (the pushdown
    * differ's per-level quantile splitter is a separate spelling of the
    * same scheme: it needs a per-PARENT modulus carried through a join,
    * but draws from the same md5-48 predicate via
    * DiffEstimate.sampleFilter semantics). Checkpoint = FIRST key of
    * ntile buckets 2..count, so with [inclusive, exclusive) bounds
    * segment i reproduces bucket i exactly (keys unique under PK
    * discipline). exact=false samples ~sampleSize·count keys by
    * deterministic md5-48 hash first (one cheap codegen'd filter pass +
    * a count() to size the modulus — two scans of ONE column). NOTE the
    * ntile window is a deliberate single-partition sort: in exact mode
    * the WHOLE key column moves through one task — the auditable,
    * gate-scale mode; at scale use exact=false, where only the
    * ~sampleSize·count sampled keys do. Returns ≤ count−1 values,
    * strictly increasing; driver traffic is the checkpoint list. */
  def quantileCheckpoints(keyDf: DataFrame, k: String, count: Int,
      exact: Boolean, sampleSize: Int = 100): Seq[Any] = {
    val keys = keyDf.select(col(k)).where(col(k).isNotNull)
    val basis =
      if (exact) keys
      else {
        val n = keys.count()
        val mod = math.max(1L, n / math.max(1L, sampleSize.toLong * count))
        keys.where(DiffEstimate.sampleFilter(Seq(k), mod))
      }
    basis
      .withColumn("b", ntile(count).over(
        org.apache.spark.sql.expressions.Window.orderBy(col(k))))
      .where(col("b") > 1)
      .groupBy("b").agg(min(col(k)).as("cp"))
      .orderBy("b").collect().map(_.get(1)).toSeq.distinct
  }

  /** Key value → driver-side arithmetic key (shared by splitByKeyRange and
    * the pushdown differ's bisection). */
  def toKey(v: Any): KeySpace.Key = v match {
    // decimal surrogate keys (Oracle/Teradata-migrated schemas) join the
    // BigInt key space exactly — toBigIntegerExact throws loudly on a
    // fractional PK rather than silently truncating (reference accepts
    // Decimal(precision=0) as IKey, abcs/database_types.py:196-201)
    case d: java.math.BigDecimal => KeySpace.IntKey(BigInt(d.toBigIntegerExact))
    case d: BigDecimal => KeySpace.IntKey(d.toBigIntExact.getOrElse(
      throw new IllegalArgumentException(s"fractional decimal key: $d")))
    case n: Number => KeySpace.IntKey(BigInt(n.longValue))
    case s: String => KeySpace.parseStringKey(s)
    case other => throw new IllegalArgumentException(s"unsupported key value: $other")
  }

  /** Several boundary values of ONE key column → keys of one uniform type
    * (string columns pick UUID vs base-66 arithmetic from ALL values, not
    * per value — see KeySpace.parseStringKeysUniform). */
  def toKeys(vs: Seq[Any]): Seq[KeySpace.Key] =
    if (vs.forall(_.isInstanceOf[String]))
      KeySpace.parseStringKeysUniform(vs.map(_.asInstanceOf[String]))
    else vs.map(toKey)

  /** Arithmetic key → the literal used in scan predicates. Integer keys
    * wider than Long (decimal-keyed tables) render as exact BigDecimal —
    * `toLong` would silently wrap. */
  def fromKey(k: KeySpace.Key): Any = k match {
    case KeySpace.IntKey(v) =>
      if (v.isValidLong) v.toLong else new java.math.BigDecimal(v.bigInteger)
    case u => u.toString
  }
}
