package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact top-k (score, id) per group via a bounded min-heap — the
  * serving kernel for "best k items per user" at fan-out scale.
  *
  * The sort-based formulation (row_number window + filter) must SORT
  * every candidate row: even with WindowGroupLimit's partial pass,
  * that's an O(rows log rows) sort of the full user×candidate fan-out
  * before anything is dropped (measured: dominant cost of ANN serving
  * at sf0.1). This aggregate keeps a k-element heap per group inside
  * hash aggregation instead: O(rows log k) map-side, and only
  * groups×k survivors ever reach the exchange.
  *
  * EXACT, not approximate: the heap retains precisely the k best by
  * (score DESC, id ASC) whatever the arrival or merge order — the
  * same total order as the window formulation, so results match it
  * row-for-row.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  // Heap head = the WORST retained entry (lowest score, then highest
  // id), so a better arrival evicts it in O(log k).
  private def worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score ranks greater
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id greater
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
    e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
    input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      offer(buf, (sv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
    b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy(t => (-t._1, t._2)) // best-first
    new GenericArrayData(best.map(t => InternalRow(t._2, t._1): Any))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble(), bb.getLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(score = c(0), id = c(1))
}

object TopKAgg {
  /** Column API: topK(score, id, k) → array<struct<id,score>>, best first. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(
      Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
