package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Group-level MinHash sketch as a custom TypedImperativeAggregate.
  *
  * Input: an array<long> of element hashes per row (e.g. a document's
  * token hashes). Buffer: the running K-component signature — the
  * component-wise min of `perm_i(h)` over every element of every row
  * in the group. The result sketches the group's element SET: equal-
  * component fraction between two signatures estimates Jaccard.
  *
  * One fixed-size long[K] buffer per group, single pass, mergeable —
  * the shape that scales: a corpus-level similarity matrix costs one
  * partial-agg shuffle of K longs per group, never a set materialization.
  * Uses the same [[Hashing]] permutation constants as the per-doc
  * MinHash, so signatures agree with the SQL-oracle formulation.
  */
case class MinHashAgg(child: Expression, k: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val ab: IndexedSeq[(Long, Long)] = Hashing.perms(k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var e = 0
      while (e < arr.numElements()) {
        val h = arr.getLong(e) % Hashing.P
        var i = 0
        while (i < k) {
          val p = (ab(i)._1 * h + ab(i)._2) % Hashing.P
          if (p < buf(i)) buf(i) = p
          i += 1
        }
        e += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashAgg =
    copy(child = c.head)
}

object MinHashAgg {
  /** Column API: minhashAgg(tokenHashes, k) → array<long> signature. */
  def minhashAgg(tokenHashes: Column, k: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(tokenHashes), k)
      .toAggregateExpression())
}
