package graft.plans

import java.security.MessageDigest

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType}
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** Batched media-decode as a COLUMNAR physical operator — the
  * production shape for decode/feature-extract stages: the operator
  * consumes whole [[ColumnarBatch]]es and emits new ones, so a real
  * codec/GPU kernel gets its batch without any per-row Row/Encoder
  * round-trip (the m03 v1 `mapPartitions` + RowEncoder path this
  * replaces). Spark's planner inserts the RowToColumnar /
  * ColumnarToRow transitions automatically around it.
  *
  * Input: (doc_id LONG, payload BINARY). Output: doc_id + 8 DOUBLE
  * features. The "decode" itself stays the deterministic md5 stub
  * (container has no codecs) — swap the digest loop for the kernel
  * call and the operator is unchanged.
  */
case class FeatureDecodePlan(child: LogicalPlan, outAttrs: Seq[Attribute])
    extends UnaryNode {
  override def output: Seq[Attribute] = outAttrs
  // every output attr is produced here (doc_id is re-emitted, not a
  // pass-through reference), so missingInput stays empty however the
  // optimizer rewrites the child
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  // the decode consumes BOTH child columns positionally; without this
  // the node has no expressions, references is empty, and column
  // pruning strips the child down to zero columns under a count()
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): FeatureDecodePlan =
    copy(child = c)
}

object FeatureDecodeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case FeatureDecodePlan(child, out) =>
      FeatureDecodeExec(planLater(child), out) :: Nil
    case _ => Nil
  }
}

case class FeatureDecodeExec(child: SparkPlan, outAttrs: Seq[Attribute])
    extends UnaryExecNode {

  override def output: Seq[Attribute] = outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override def supportsColumnar: Boolean = true
  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(c: SparkPlan): FeatureDecodeExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException(
      "FeatureDecodeExec is columnar-only; the planner must insert ColumnarToRow above it")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] =
    child.executeColumnar().mapPartitions { batches =>
      val digest = MessageDigest.getInstance("MD5")
      val empty = Array.emptyByteArray
      batches.map { batch =>
        val n = batch.numRows()
        val ids = batch.column(0)
        val payloads = batch.column(1)
        val outId = new OnHeapColumnVector(n, LongType)
        val outF = Array.fill(8)(new OnHeapColumnVector(n, DoubleType))
        var i = 0
        while (i < n) {
          if (ids.isNullAt(i)) outId.putNull(i) else outId.putLong(i, ids.getLong(i))
          val bytes = if (payloads.isNullAt(i)) empty else payloads.getBinary(i)
          // DECODE STUB: deterministic md5-derived pseudo-features —
          // a codec/model kernel consumes the same (batch, row) view.
          val h = digest.digest(bytes)
          digest.reset()
          var j = 0
          while (j < 8) {
            outF(j).putDouble(i, (h(j) & 0xff) / 255.0)
            j += 1
          }
          i += 1
        }
        new ColumnarBatch((outId +: outF).toArray[ColumnVector], n)
      }
    }
}

/** DataFrame-level API: df must be exactly (doc_id LONG, payload BINARY). */
object FeatureDecode {
  def decode(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(FeatureDecodeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ FeatureDecodeStrategy
    val lp = Bridge.analyzedPlan(df)
    require(lp.output.map(_.dataType) == Seq(LongType, BinaryType),
      s"decode expects (LONG, BINARY) input, got ${lp.output.map(_.dataType.sql)}")
    val out = AttributeReference(lp.output.head.name, LongType, lp.output.head.nullable)() +:
      (0 until 8).map(i => AttributeReference(s"f$i", DoubleType, nullable = false)())
    Bridge.ofRows(spark, FeatureDecodePlan(lp, out))
  }
}
