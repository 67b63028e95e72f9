package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-id mapping over BPE-encoded text: each space-separated subword
  * token becomes its vocab id (OOV → −1), joined by commas. The vocab
  * rides an explicit `Broadcast` consumed through a JVM-wide `JHashMap`
  * (O(1) per lookup, one copy per executor) — the same shipping shape as
  * [[BpeTable]], and deliberately NOT a `typedlit` map literal, whose
  * `element_at` is a linear key scan serialized into every task binary
  * (measured 17× slower at 100k vocab than at 1k). Map-only: the corpus
  * never shuffles, and the only driver materialization is the vocab
  * itself, capped by the caller before broadcast.
  */
case class VocabIds(child: Expression, table: VocabTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_vocab_ids"

  override protected def nullSafeEval(input: Any): Any =
    table.ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabTable", table, classOf[VocabTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.ids($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabIds =
    copy(child = newChild)
}

object VocabIds {
  def ids(bpeText: Column, table: VocabTable): Column =
    ColumnBridge.column(VocabIds(ColumnBridge.expression(bpeText.cast("string")), table))
}

/** The token→id table. Every task deserializes its own VocabTable from
  * the task binary, so the lookup map is cached JVM-wide keyed by the
  * broadcast id (same lifetime as the broadcast block), mirroring
  * [[BpeTable]]'s runtime caching.
  */
final class VocabTable(bc: Broadcast[Array[(String, Long)]]) extends Serializable {

  @transient private lazy val map: JHashMap[String, java.lang.Long] = {
    if (VocabTable.maps.size() > 64) VocabTable.maps.clear()
    VocabTable.maps.computeIfAbsent(bc.id, _ => VocabTable.build(bc.value))
  }

  def ids(bpeText: UTF8String): UTF8String = {
    if (bpeText == null) return null
    val s = bpeText.toString
    if (s.isEmpty) return UTF8String.fromString("")
    val toks = s.split(" ", -1)
    val sb = new java.lang.StringBuilder(toks.length * 4)
    var i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(',')
      val id = map.get(toks(i))
      sb.append(if (id == null) -1L else id.longValue())
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object VocabTable {
  private val maps =
    new java.util.concurrent.ConcurrentHashMap[Long, JHashMap[String, java.lang.Long]]()

  private def build(vocab: Array[(String, Long)]): JHashMap[String, java.lang.Long] = {
    val m = new JHashMap[String, java.lang.Long](vocab.length * 2)
    var i = 0
    while (i < vocab.length) {
      m.put(vocab(i)._1, java.lang.Long.valueOf(vocab(i)._2))
      i += 1
    }
    m
  }

  def broadcast(bc: Broadcast[Array[(String, Long)]]): VocabTable =
    new VocabTable(bc)
}
