package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, DecimalNode, ObjectNode}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON rendering for equivalence compares (JsonCompare):
  * object keys sorted recursively, numbers reduced to their canonical
  * decimal form (1, 1.0 and 1E0 all render "1" — the reference compares
  * `json.loads` values, where 1.0 == 1, data_diff/utils.py:515-536),
  * duplicate keys last-wins (legal JSON many producers emit; Jackson's
  * readTree keeps the last value), strings/booleans/null as JSON.
  * NULL input and unparsable text yield NULL — the caller decides what
  * non-JSON means (JsonCompare falls back to raw string equality).
  *
  * Replaces a from_json(MapType(String,String)) spelling that
  * STRINGIFIED every value — '{"a":1}' and '{"a":"1"}' compared equal,
  * suppressing real type changes — and crashed outright on duplicate
  * keys (DUPLICATED_MAP_KEY under the default dedup policy).
  *
  * CodegenFallback is fine here: this expression runs only on declared
  * jsonColumns inside the diff compare, never on a hot scan path. */
case class JsonCanonical(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects a STRING column, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = JsonCanonical.Name

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    try {
      val root = JsonCanonical.mapper.readTree(s)
      if (root == null) null // empty input parses to no node
      else UTF8String.fromString(
        JsonCanonical.mapper.writeValueAsString(JsonCanonical.canon(root)))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsonCanonical =
    copy(child = newChild)
}

object JsonCanonical {
  val Name = "graft_json_canonical"

  private[functions] val mapper = new ObjectMapper()

  /** Recursive canonical rebuild: sorted object keys, canonical decimal
    * numbers. BigDecimal round-trips through toPlainString so the
    * serialized form never uses exponent notation (stripTrailingZeros of
    * 100 is 1E+2; its plain string is "100"). */
  private[functions] def canon(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      val names = {
        val it = o.fieldNames()
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) b += it.next()
        b.sorted
      }
      names.foreach(k => out.set[JsonNode](k, canon(o.get(k))))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      val it = a.elements()
      while (it.hasNext) out.add(canon(it.next()))
      out
    case num if num.isNumber =>
      val stripped = num.decimalValue().stripTrailingZeros()
      DecimalNode.valueOf(new java.math.BigDecimal(stripped.toPlainString))
    case other => other.deepCopy[JsonNode]()
  }
}
