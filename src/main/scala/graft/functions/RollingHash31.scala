package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash: fold((acc·31 + codePoint) mod 1e9+7)
  * over the string's characters, zero-initialized — the document
  * fingerprint (`TextFunctions.fingerprint`). The fold spelling
  * (`aggregate(transform(split(text, ''), ascii), …)`) materializes a
  * one-string-per-character ARRAY and runs a CodegenFallback fold over it;
  * this expression walks the UTF8String's code points in place. Recurrence,
  * modulus, and per-character value (the code point, which is what `ascii`
  * returns for each single-character split element) are identical, so
  * fingerprints are bit-equal — the parity spec and the `q_fingerprint`
  * DuckDB oracle both pin that. */
case class RollingHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = RollingHash31.Name

  override protected def nullSafeEval(input: Any): Any =
    VecUtils.rollingHash31(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecUtils.rollingHash31($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}

object RollingHash31 {
  val Name = "graft_rolling_hash31"

  def hash(c: Column): Column =
    ColumnBridge.column(RollingHash31(ColumnBridge.expression(c.cast("string"))))
}
