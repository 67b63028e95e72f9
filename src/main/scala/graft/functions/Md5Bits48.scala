package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 48 bits of MD5 as a Long, straight from the digest bytes.
  *
  * The engine's hottest scalar is "12 hex digits of md5 as an integer": the
  * segment checksum reads the LAST 12 (reference:
  * data_diff/databases/base.py:411-421 md5 → bigint via the hex tail) and
  * every dedup/minhash/decontamination pipeline reads the FIRST 12 per
  * shingle. The built-in spelling `conv(substring(md5(x), …, 12), 16, 10)`
  * materializes a 32-char hex string, substrings it, then string-parses
  * base-16 — three allocations and a parse per row that this expression
  * replaces with six byte reads off the raw digest. Bit-identical to the
  * built-in composition (the DuckDB-oracle gates verify that end to end),
  * null-propagating, and codegen'd (the generated Java calls one static
  * helper, exactly like Spark's own Md5 — whole-stage codegen spans are
  * unchanged).
  *
  * `fromTail = false` → first 6 digest bytes (hex chars 1-12, big-endian);
  * `fromTail = true`  → last 6 digest bytes (hex chars 21-32) — the
  * reference checksum's slice. Values are in [0, 2^48), so they always fit
  * a Long with room for the checksum offset subtraction downstream.
  */
case class Md5Bits48(child: Expression, fromTail: Boolean)
    extends UnaryExpression {

  // no ExpectsInputTypes: its AbstractDataType signature is private[sql]
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY input, got ${child.dataType.catalogString} " +
        "(callers cast strings explicitly — see Md5Bits48.head/tail)")
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (fromTail) Md5Bits48.TailName else Md5Bits48.HeadName

  override protected def nullSafeEval(input: Any): Any =
    HashUtils.md5Bits48(input.asInstanceOf[Array[Byte]], fromTail)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtils.md5Bits48($c, $fromTail)")

  override protected def withNewChildInternal(newChild: Expression): Md5Bits48 =
    copy(child = newChild)
}

object Md5Bits48 {
  val HeadName = "graft_md5_head48"
  val TailName = "graft_md5_tail48"

  /** First 12 md5 hex digits of `c` as a Long (dedup/shingle hashing). */
  def head(c: Column): Column =
    ColumnBridge.column(Md5Bits48(expr(c), fromTail = false))

  /** Last 12 md5 hex digits of `c` as a Long (the reference checksum slice). */
  def tail(c: Column): Column =
    ColumnBridge.column(Md5Bits48(expr(c), fromTail = true))

  // Column → Expression via the column's cast-to-binary: the expression
  // expects BinaryType; an explicit cast keeps analysis independent of
  // implicit-coercion rules (string → binary is a plain representation
  // change — UTF8 bytes — matching what md5(string) hashes).
  private def expr(c: Column): Expression =
    ColumnBridge.expression(c.cast("binary"))

  /** Register both variants as SQL functions on `spark`, so `spark.sql`
    * users get them too (`SELECT graft_md5_head48(col) …`). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    def reg(name: String, fromTail: Boolean): Unit =
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[Md5Bits48].getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 1, s"$name expects exactly one argument")
          Md5Bits48(args.head, fromTail)
        })
    reg(HeadName, fromTail = false)
    reg(TailName, fromTail = true)
  }
}

/** Static helper the generated code calls — one digest, six byte reads.
  * A thread-local MessageDigest avoids the per-row `getInstance` lookup
  * that `DigestUtils.md5Hex` (Spark's Md5) pays. */
object HashUtils {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def md5Bits48(bytes: Array[Byte], fromTail: Boolean): Long = {
    val md = digests.get()
    val d = md.digest(bytes) // digest() resets the instance
    val off = if (fromTail) 10 else 0
    ((d(off) & 0xffL) << 40) |
      ((d(off + 1) & 0xffL) << 32) |
      ((d(off + 2) & 0xffL) << 24) |
      ((d(off + 3) & 0xffL) << 16) |
      ((d(off + 4) & 0xffL) << 8) |
      (d(off + 5) & 0xffL)
  }
}
