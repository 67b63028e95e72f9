package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as ONE aggregate: per group, each input hash votes ±1 on each
  * of its `bits` bit positions, and the result sets bit b when the vote
  * sum is positive — exactly `sum(sign_b)` per bit followed by the
  * majority threshold, the same math as the explode spelling
  * (`explode(sequence(0, bits-1))` → per-(group, bit) sign sums → per-
  * group reassembly) but without materializing bits× the input: the
  * explode form shuffles |tokens|·bits rows through TWO exchanges, this
  * aggregate shuffles one `bits`-long counter buffer per group with
  * map-side partials — the same bounded-buffer philosophy as
  * [[TopKStructs]]. Bit-identical output (parity spec + the q_simhash /
  * q_simhash_neardup oracles). Null inputs are ignored, an empty group
  * evaluates to 0 — matching the explode form, which emits no row for a
  * group with no hashes (callers guard empties identically). */
case class SimhashBits(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_bits"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buffer(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var b = 0
    while (b < bits) { buffer(b) += other(b); b += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < bits) {
      if (buffer(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 8)
    var b = 0
    while (b < bits) { bb.putLong(buffer(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = new Array[Long](bits)
    var b = 0
    while (b < bits) { buffer(b) = bb.getLong(); b += 1 }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {
  /** Aggregate Column: the `bits`-bit simhash of the group's hash values. */
  def simhash(c: Column, bits: Int): Column =
    ColumnBridge.column(
      SimhashBits(ColumnBridge.expression(c), bits).toAggregateExpression())
}
