package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Aggregate that merges per-row MinHash signatures into a group-level
  * signature by element-wise min — a `TypedImperativeAggregate` with a
  * primitive Array[Long] buffer.
  *
  * Why this is the right sketch for group-level dedup state: MinHash is a
  * lattice — min over a union of sets equals the min of the per-set mins —
  * so the merged signature of a group is EXACTLY the signature of the
  * union of the group members' shingle sets (property-tested in
  * MinHashMergeSpec). That makes it a mergeable sketch in the
  * partial/final aggregation model: partials combine associatively and
  * commutatively on whatever partition layout the cluster chooses, which
  * is what lets a 100 TB corpus build one near-dup index per
  * source/shard/day in a single pass.
  */
case class MinHashMergeAgg(
    child: Expression,
    k: Int,
    sentinel: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_merge requires array<bigint>, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(sentinel)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MinHashMergeAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : MinHashMergeAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashMergeAgg {
  /** Column API: element-wise-min merge of array<long> signatures. */
  def minhashMerge(sig: Column, k: Int, sentinel: Long): Column =
    GraftBridge.column(
      MinHashMergeAgg(GraftBridge.expression(sig), k, sentinel)
        .toAggregateExpression())
}
