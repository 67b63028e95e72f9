package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k-per-group aggregate: keeps the k SMALLEST struct values
  * under the struct's natural (lexicographic, null-aware) ordering and
  * returns them as an ascending array.
  *
  * The scale rationale: "top k per group" via `row_number() OVER
  * (PARTITION BY g ORDER BY …) <= k` forces every row of a group through
  * ONE WindowExec partition — buffered, sorted, unsplittable by AQE — so a
  * hot group at corpus scale becomes the straggler task. This aggregate is
  * the skew-proof form: the buffer never exceeds k rows, partial
  * aggregation runs map-side (each mapper emits at most k rows per group),
  * and merge is k-bounded, so the shuffled volume is groups×k regardless
  * of group skew. Descending dimensions are encoded by negating (numerics)
  * — the same struct-encoding trick the dedup survivor selection uses for
  * its argmax.
  *
  * Buffer serialization mirrors Spark's own `Collect` aggregate: each
  * buffered struct row is UnsafeProjection'd and length-prefixed.
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  // max-at-head ordering: dequeue evicts the LARGEST, keeping the k smallest
  private lazy val ordering: Ordering[InternalRow] =
    RowOrdering.createNaturalAscendingOrdering(structType.fields.toSeq.map(_.dataType))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if RowOrdering.isOrderable(s) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable STRUCT input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_structs"

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering)

  override def update(buffer: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[InternalRow].copy())
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(insert(buffer, _))
    buffer
  }

  private def insert(buffer: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (buffer.size < k) buffer.enqueue(row)
    else if (ordering.lt(row, buffer.head)) { buffer.dequeue(); buffer.enqueue(row) }
  }

  override def eval(buffer: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buffer.toArray.sorted(ordering).asInstanceOf[Array[Any]])

  // per-instance, not per-call: serialize runs once per GROUP on the
  // map side, and rebuilding the generated projection (codegen-cache
  // lookup + class instantiation) plus a 4 KB scratch per group is
  // avoidable hot-path cost. Expression trees are deserialized per task,
  // so instance confinement makes these thread-safe — the same reasoning
  // as the `ordering` lazy val.
  @transient private lazy val serProjection = UnsafeProjection.create(structType)
  @transient private lazy val serScratch = new Array[Byte](4 << 10)

  override def serialize(buffer: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val projection = serProjection
    val scratch = serScratch
    buffer.foreach { row =>
      val unsafe = projection.apply(row)
      out.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, scratch)
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val buffer = createAggregationBuffer()
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    var size = in.readInt()
    while (size >= 0) {
      val data = new Array[Byte](size)
      in.readFully(data)
      val row = new UnsafeRow(structType.length)
      row.pointTo(data, size)
      buffer.enqueue(row)
      size = in.readInt()
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKStructs =
    copy(child = newChild)
}

object TopKStructs {
  /** Aggregate Column: ascending array of the k smallest values of the
    * struct column `c` (encode DESC dimensions by negation). */
  def topK(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKStructs(ColumnBridge.expression(c), k).toAggregateExpression())
}
