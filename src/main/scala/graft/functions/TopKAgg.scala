package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded worst-first binary heap over primitive arrays — no tuple
  * boxing on the 10⁷–10⁸-row serving fan-outs TopKAgg exists for.
  * Head (slot 0) is the WORST retained entry by (score DESC, id ASC),
  * so a better arrival evicts it in O(log k).
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a "worse than" b under (score DESC, id ASC): lower score, then
    * higher id. */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) c < 0 else ia > ib
  }

  def offer(s: Double, i: Long): Unit =
    if (size < k) {
      // sift up
      var c = size
      scores(c) = s; ids(c) = i
      size += 1
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) {
          val ts = scores(c); val ti = ids(c)
          scores(c) = scores(p); ids(c) = ids(p)
          scores(p) = ts; ids(p) = ti
          c = p
        } else c = 0
      }
    } else if (worse(scores(0), ids(0), s, i)) {
      // replace the worst, sift down
      scores(0) = s; ids(0) = i
      var p = 0
      var done = false
      while (!done) {
        val l = 2 * p + 1; val r = l + 1
        var w = p
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == p) done = true
        else {
          val ts = scores(p); val ti = ids(p)
          scores(p) = scores(w); ids(p) = ids(w)
          scores(w) = ts; ids(w) = ti
          p = w
        }
      }
    }
}

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
  * Per-row input evaluation goes through a GENERATED UnsafeProjection
  * over the (already bound) child expressions, not interpreted
  * Expression.eval: CollapseProject inlines upstream projections
  * (e.g. the codegen'd dot_product scoring an ANN candidate) into
  * this aggregate's children, and evaluating that tree interpreted
  * per row measured ~5x slower end-to-end on the 75M-row r16 serve.
  *
  * EXACT, not approximate: the heap retains precisely the k best by
  * (score DESC, id ASC) whatever the arrival or merge order — the
  * same total order as the window formulation, so results match it
  * row-for-row.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  // Codegen'd projection over the bound children; created once per
  // task at first use (transient: never serialized with the plan).
  @transient private lazy val inputProj = UnsafeProjection.create(Array(score, id))

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val row = inputProj(input)
    if (!row.isNullAt(0) && !row.isNullAt(1))
      buf.offer(row.getDouble(0), row.getLong(1))
    buf
  }

  override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = Array.range(0, buf.size).sortBy(i => (-buf.scores(i), buf.ids(i)))
    new GenericArrayData(idx.map(i => InternalRow(buf.ids(i), buf.scores(i)): Any))
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.offer(bb.getDouble(), bb.getLong()))
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
