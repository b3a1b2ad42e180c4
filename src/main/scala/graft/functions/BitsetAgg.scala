package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Exact-distinct BITMAPS over a bounded non-negative id space — the
  * Druid/ClickHouse `groupBitmap` primitive. A bitmap is a MERGEABLE
  * exact-distinct summary: build per-group bitmaps in ONE corpus pass
  * (map-side partial merge is a word-wise OR), then answer every
  * coarser rollup by re-merging k bitmaps — metadata-sized work, no
  * fact re-scan. q58's HLL does this approximately in fixed space;
  * the bitmap is the exact twin when the id space is bounded and
  * dense (surrogate keys). Buffer = Long-word bitset of `nBits` bits;
  * ids outside [0, nBits) fail loudly — a silent drop would be an
  * invisible wrong answer. At warehouse scale the dense bitset is the
  * building block; 15B-id spaces swap in a compressed (roaring)
  * layout with the same OR/merge algebra.
  */
private[graft] object BitsetCodec {
  def bytes(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = (w >>> (8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  def words(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) {
      var w = 0L
      var j = 0
      while (j < 8) { w |= (bytes(i * 8 + j) & 0xffL) << (8 * j); j += 1 }
      out(i) = w
      i += 1
    }
    out
  }

  /** OR `b` into `a`, widening to max(a,b) words — SQL callers can
    * legally mix bitmap widths (two bitset_agg calls with different
    * nBits), and the narrow-into-wide case must not drop high words. */
  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = if (a.length >= b.length) a
              else java.util.Arrays.copyOf(a, b.length)
    var i = 0
    while (i < b.length) { out(i) |= b(i); i += 1 }
    out
  }

  def popcount(a: Array[Long]): Long = {
    var (i, n) = (0, 0L)
    while (i < a.length) { n += java.lang.Long.bitCount(a(i)); i += 1 }
    n
  }
}

/** groupBy-level builder: child is a LONG id, result the bitmap bytes. */
case class BitsetAgg(child: Expression, nBits: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val nWords = (nBits + 63) / 64

  // SQL-exposed: a typed analysis error beats the ClassCastException
  // an INT id column used to hit at execution time
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitset_agg expects an integral id column, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitset_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Number].longValue()
      require(id >= 0 && id < nBits,
        s"bitset_agg id $id outside [0, $nBits) — widen the id bound")
      buf((id >> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    BitsetCodec.or(a, b)

  override def eval(buf: Array[Long]): Any = BitsetCodec.bytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BitsetCodec.bytes(buf)
  override def deserialize(b: Array[Byte]): Array[Long] = BitsetCodec.words(b)

  override def withNewMutableAggBufferOffset(o: Int): BitsetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitsetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitsetAgg =
    copy(child = c.head)
}

/** rollup-level merger: child is bitmap BYTES; evals to the exact
  * distinct count of the OR of all inputs. Buffer grows lazily to the
  * first bitmap's width so the merger needs no nBits of its own. */
case class BitsetMergeCountAgg(child: Expression,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bitset_merge_count expects bitset_agg bitmap bytes, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitset_merge_count"

  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def orInto(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (buf.isEmpty) other
    else if (other.isEmpty) buf
    else BitsetCodec.or(buf, other)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else orInto(buf, BitsetCodec.words(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = orInto(a, b)

  override def eval(buf: Array[Long]): Any = BitsetCodec.popcount(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BitsetCodec.bytes(buf)
  override def deserialize(b: Array[Byte]): Array[Long] = BitsetCodec.words(b)

  override def withNewMutableAggBufferOffset(o: Int): BitsetMergeCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitsetMergeCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitsetMergeCountAgg =
    copy(child = c.head)
}

object BitsetAgg {
  /** Column API: bitset(id, nBits) → binary bitmap. */
  def bitset(id: Column, nBits: Int): Column =
    Bridge.column(BitsetAgg(Bridge.expression(id), nBits)
      .toAggregateExpression())

  /** Column API: bitsetMergeCount(bitmap) → exact distinct count. */
  def bitsetMergeCount(bitmap: Column): Column =
    Bridge.column(BitsetMergeCountAgg(Bridge.expression(bitmap))
      .toAggregateExpression())
}
