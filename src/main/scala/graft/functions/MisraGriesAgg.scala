package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a TypedImperativeAggregate.
  *
  * Buffer: at most k (key → counter) pairs. Update: hit → increment;
  * miss with room → insert at 1; miss when full → decrement ALL
  * counters, dropping zeros (the classic MG step — each decrement
  * retires k+1 stream items, so it happens at most N/(k+1) times).
  * Merge (Agarwal et al., "Mergeable Summaries"): sum counts of the
  * union, then subtract the (k+1)-th largest count from every entry
  * and drop non-positives — the result is again a valid MG summary
  * with the SAME additive error bound N/(k+1) over the combined
  * stream, which is what makes this a one-shuffle-of-k-counters
  * operation at any number of partitions.
  *
  * Guarantees (N = stream length):
  *  - estimate ≤ true count ≤ estimate + N/(k+1)
  *  - every key with true count > N/(k+1) is present in the summary.
  *
  * The summary content depends on arrival/merge order, so queries gate
  * the ORDER-INDEPENDENT consequences: membership of provable heavy
  * hitters and the error bound — not the raw counters.
  */
case class MisraGriesAgg(child: Expression, k: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
    input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all; dropping zeros frees ≥1 slot next miss
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { w =>
            val c = buf(w) - 1
            if (c == 0L) dead += w else buf.update(w, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
    b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (w, c) => b1.update(w, b1.getOrElse(w, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = b1.iterator.collect { case (w, c) if c - cut <= 0 => w }.toList
      dead.foreach(b1.remove)
      b1.keysIterator.toList.foreach(w => b1.update(w, b1(w) - cut))
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray
    new ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        entries.map(e => UTF8String.fromString(e._1): Any)),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        entries.map(_._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c.head)
}

object MisraGriesAgg {
  /** Column API: misraGries(key, k) → map<string,long> summary. */
  def misraGries(key: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(key), k)
      .toAggregateExpression())
}
