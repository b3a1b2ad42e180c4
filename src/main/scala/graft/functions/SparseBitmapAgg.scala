package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Compressed exact-distinct bitmaps for SPARSE / huge id spaces —
  * the swap-in BitsetAgg's scaladoc promises for 15B-id domains
  * (Roaring layout, Chambi et al. 2016, "Better bitmap performance
  * with Roaring bitmaps"): ids partition by their high 48−16 bits
  * into 64Ki-value CHUNKS; a chunk holds either a sorted array of
  * 16-bit lows (sparse — ≤4096 values, 2 bytes each) or a dense
  * 8 KiB bitmap (≥4096 values), converting exactly at the break-even
  * point. Same OR-merge algebra as the dense bitset: map-side
  * partial merge is a chunk-keyed union, rollups re-merge serialized
  * bitmaps without a fact re-scan. A 10-million-customer audience
  * scattered over a 2^47 surrogate space costs megabytes, where the
  * dense bitset would need 16 TiB. */
private[graft] object SparseBitmapCodec {

  /** chunk payloads: sorted unique char array (sparse) or 1024-word
    * bitmap (dense); the 4096 threshold is where 2·n bytes crosses
    * 8 KiB. */
  final val ArrayToBitmapThreshold = 4096
  private final val BitmapWords = 1024 // 65536 bits

  type Chunks = java.util.TreeMap[Integer, AnyRef] // Array[Char] | Array[Long]

  def empty: Chunks = new java.util.TreeMap[Integer, AnyRef]()

  def add(c: Chunks, id: Long): Unit = {
    require(id >= 0 && (id >> 47) == 0,
      s"sparse_bitmap_agg id $id outside [0, 2^47)")
    val key = (id >>> 16).toInt
    val low = (id & 0xffff).toInt
    c.get(key) match {
      case null =>
        c.put(key, Array(low.toChar))
      case arr: Array[Char] =>
        val pos = java.util.Arrays.binarySearch(arr, low.toChar)
        if (pos < 0) {
          if (arr.length + 1 >= ArrayToBitmapThreshold) {
            val words = toBitmap(arr)
            words(low >> 6) |= 1L << (low & 63)
            c.put(key, words)
          } else {
            val ins = -pos - 1
            val out = new Array[Char](arr.length + 1)
            System.arraycopy(arr, 0, out, 0, ins)
            out(ins) = low.toChar
            System.arraycopy(arr, ins, out, ins + 1, arr.length - ins)
            c.put(key, out)
          }
        }
      case words: Array[Long] =>
        words(low >> 6) |= 1L << (low & 63)
    }
  }

  private def toBitmap(arr: Array[Char]): Array[Long] = {
    val words = new Array[Long](BitmapWords)
    var i = 0
    while (i < arr.length) {
      val v = arr(i).toInt; words(v >> 6) |= 1L << (v & 63); i += 1
    }
    words
  }

  private def unionArrays(a: Array[Char], b: Array[Char]): AnyRef = {
    val out = new Array[Char](a.length + b.length)
    var (i, j, k) = (0, 0, 0)
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out(k) = a(i); i += 1 }
      else if (a(i) > b(j)) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k >= ArrayToBitmapThreshold) toBitmap(java.util.Arrays.copyOf(out, k))
    else java.util.Arrays.copyOf(out, k)
  }

  private def orChunk(a: AnyRef, b: AnyRef): AnyRef = (a, b) match {
    case (x: Array[Char], y: Array[Char]) => unionArrays(x, y)
    case (x: Array[Long], y: Array[Long]) =>
      val out = new Array[Long](BitmapWords)
      var i = 0; while (i < BitmapWords) { out(i) = x(i) | y(i); i += 1 }
      out
    case (x: Array[Long], y: Array[Char]) =>
      val out = java.util.Arrays.copyOf(x, BitmapWords)
      var i = 0
      while (i < y.length) {
        val v = y(i).toInt; out(v >> 6) |= 1L << (v & 63); i += 1
      }
      out
    case (x: Array[Char], y: Array[Long]) => orChunk(y, x)
    case _ => throw new IllegalStateException("unknown chunk type")
  }

  /** OR `b` into `a` (mutates a's map; chunk payloads are COPIED on
    * adoption — add() mutates dense chunks in place, so sharing an
    * adopted array between two maps would let a later add(a, id)
    * silently flip bits inside b too). */
  def or(a: Chunks, b: Chunks): Chunks = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = a.get(e.getKey)
      if (mine == null) a.put(e.getKey, e.getValue match {
        case arr: Array[Char]  => java.util.Arrays.copyOf(arr, arr.length)
        case words: Array[Long] => java.util.Arrays.copyOf(words, words.length)
      })
      else a.put(e.getKey, orChunk(mine, e.getValue))
    }
    a
  }

  def cardinality(c: Chunks): Long = {
    var n = 0L
    val it = c.values().iterator()
    while (it.hasNext) it.next() match {
      case arr: Array[Char] => n += arr.length
      case words: Array[Long] =>
        var i = 0
        while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  /** [nChunks][key, tag, payload]*: tag 0 = array (n + chars),
    * tag 1 = bitmap (1024 longs). */
  def bytes(c: Chunks): Array[Byte] = {
    var size = 4
    val it0 = c.values().iterator()
    while (it0.hasNext) it0.next() match {
      case arr: Array[Char]  => size += 4 + 1 + 4 + 2 * arr.length
      case _: Array[Long]    => size += 4 + 1 + 8 * BitmapWords
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(c.size())
    val it = c.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putInt(e.getKey)
      e.getValue match {
        case arr: Array[Char] =>
          bb.put(0.toByte); bb.putInt(arr.length)
          var i = 0; while (i < arr.length) { bb.putChar(arr(i)); i += 1 }
        case words: Array[Long] =>
          bb.put(1.toByte)
          var i = 0; while (i < BitmapWords) { bb.putLong(words(i)); i += 1 }
      }
    }
    bb.array()
  }

  def chunks(bytes: Array[Byte]): Chunks = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = empty
    val n = bb.getInt
    var c = 0
    while (c < n) {
      val key = bb.getInt
      val tag = bb.get()
      if (tag == 0) {
        val len = bb.getInt
        val arr = new Array[Char](len)
        var i = 0; while (i < len) { arr(i) = bb.getChar; i += 1 }
        out.put(key, arr)
      } else {
        val words = new Array[Long](BitmapWords)
        var i = 0; while (i < BitmapWords) { words(i) = bb.getLong; i += 1 }
        out.put(key, words)
      }
      c += 1
    }
    out
  }
}

/** groupBy-level builder: child is a non-negative LONG id < 2^47,
  * result the serialized compressed bitmap. */
case class SparseBitmapAgg(child: Expression,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SparseBitmapCodec.Chunks] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sparse_bitmap_agg expects an integral id column, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sparse_bitmap_agg"

  override def createAggregationBuffer(): SparseBitmapCodec.Chunks =
    SparseBitmapCodec.empty

  override def update(buf: SparseBitmapCodec.Chunks,
      input: InternalRow): SparseBitmapCodec.Chunks = {
    val v = child.eval(input)
    if (v != null) SparseBitmapCodec.add(buf, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: SparseBitmapCodec.Chunks,
      b: SparseBitmapCodec.Chunks): SparseBitmapCodec.Chunks =
    SparseBitmapCodec.or(a, b)

  override def eval(buf: SparseBitmapCodec.Chunks): Any =
    SparseBitmapCodec.bytes(buf)

  override def serialize(buf: SparseBitmapCodec.Chunks): Array[Byte] =
    SparseBitmapCodec.bytes(buf)
  override def deserialize(b: Array[Byte]): SparseBitmapCodec.Chunks =
    SparseBitmapCodec.chunks(b)

  override def withNewMutableAggBufferOffset(o: Int): SparseBitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SparseBitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SparseBitmapAgg = copy(child = c.head)
}

/** rollup-level merger: child is serialized bitmap bytes; evals to
  * the exact distinct count of the OR of all inputs. */
case class SparseBitmapMergeCountAgg(child: Expression,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SparseBitmapCodec.Chunks] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sparse_bitmap_merge_count expects sparse_bitmap_agg bytes, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "sparse_bitmap_merge_count"

  override def createAggregationBuffer(): SparseBitmapCodec.Chunks =
    SparseBitmapCodec.empty

  override def update(buf: SparseBitmapCodec.Chunks,
      input: InternalRow): SparseBitmapCodec.Chunks = {
    val v = child.eval(input)
    if (v == null) buf
    else SparseBitmapCodec.or(buf,
      SparseBitmapCodec.chunks(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: SparseBitmapCodec.Chunks,
      b: SparseBitmapCodec.Chunks): SparseBitmapCodec.Chunks =
    SparseBitmapCodec.or(a, b)

  override def eval(buf: SparseBitmapCodec.Chunks): Any =
    SparseBitmapCodec.cardinality(buf)

  override def serialize(buf: SparseBitmapCodec.Chunks): Array[Byte] =
    SparseBitmapCodec.bytes(buf)
  override def deserialize(b: Array[Byte]): SparseBitmapCodec.Chunks =
    SparseBitmapCodec.chunks(b)

  override def withNewMutableAggBufferOffset(o: Int): SparseBitmapMergeCountAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SparseBitmapMergeCountAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SparseBitmapMergeCountAgg =
    copy(child = c.head)
}

object SparseBitmapAgg {
  /** Column API: sparseBitmap(id) → compressed bitmap bytes. */
  def sparseBitmap(id: Column): Column =
    Bridge.column(SparseBitmapAgg(Bridge.expression(id))
      .toAggregateExpression())

  /** Column API: sparseBitmapMergeCount(bm) → exact distinct count. */
  def sparseBitmapMergeCount(bitmap: Column): Column =
    Bridge.column(SparseBitmapMergeCountAgg(Bridge.expression(bitmap))
      .toAggregateExpression())
}
