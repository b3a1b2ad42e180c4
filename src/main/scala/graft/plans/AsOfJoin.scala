package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeRowJoiner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StructType}

/** AS-OF JOIN as a first-class operator: logical node → planner
  * strategy → physical sort-merge exec, the (c) tier of the custom-
  * operator ladder (Spark has no built-in as-of join; the inequality-
  * join encoding explodes, and the union+window trick — see q21 —
  * can't expose a reusable relational operator).
  *
  * Semantics: for every left row, attach the LAST right row of the
  * same key with rightTime <= leftTime (inner: unmatched left rows are
  * dropped) — DuckDB's `ASOF JOIN ... ON l.k = r.k AND l.t >= r.t`.
  *
  * Scale shape: both sides hash-cluster on the key and sort by
  * (key, time) — one shuffle each, identical to a sort-merge join —
  * then a single forward-only merge pass per partition. State is ONE
  * buffered right row; no per-key materialization, no range blowup.
  *
  * Keys and times are required to be LongType (the API casts) — a
  * deliberate v1 restriction that keeps the merge loop primitive-typed.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
  leftKey: Expression, rightKey: Expression,
  leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
    newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
  leftKey: Expression, rightKey: Expression,
  leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
    newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = StructType(left.output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    val rSchema = StructType(right.output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    val lKeyExprs = Seq(leftKey, leftTime)
    val rKeyExprs = Seq(rightKey, rightTime)
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rProj = UnsafeProjection.create(rKeyExprs, rOut)
      val joiner = GenerateUnsafeRowJoiner.create(lSchema, rSchema)
      val rBuf = rIter.buffered
      var candidate: UnsafeRow = null
      var candidateKey = 0L
      new Iterator[InternalRow] {
        private var nextRow: InternalRow = _
        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next().asInstanceOf[UnsafeRow]
            val lkt = lProj(l)
            val lk = lkt.getLong(0); val lt = lkt.getLong(1)
            // consume right rows up to (lk, lt]; remember the last match
            var continue = true
            while (continue && rBuf.hasNext) {
              val rkt = rProj(rBuf.head.asInstanceOf[UnsafeRow])
              val rk = rkt.getLong(0); val rt = rkt.getLong(1)
              if (rk < lk || (rk == lk && rt <= lt)) {
                val r = rBuf.next().asInstanceOf[UnsafeRow]
                if (rk == lk) {
                  candidate = r.copy(); candidateKey = rk
                }
              } else continue = false
            }
            if (candidate != null && candidateKey == lk) {
              nextRow = joiner.join(l, candidate)
              return true
            }
          }
          false
        }
        override def hasNext: Boolean = nextRow != null || advance()
        override def next(): InternalRow = {
          if (nextRow == null && !advance()) throw new NoSuchElementException
          val r = nextRow; nextRow = null; r
        }
      }
    }
  }
}

/** DataFrame-level API. Column references are resolved by NAME against
  * each side (rename before joining if the sides share names). The
  * strategy self-registers on the session via experimental strategies,
  * so the API works on any session — GraftExtensions also injects it
  * for config-built sessions. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lp = Bridge.analyzedPlan(left)
    val rp = Bridge.analyzedPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${p.output.map(_.name).mkString(", ")}]"))
    def longAttr(p: LogicalPlan, name: String): Attribute = {
      val a = attr(p, name)
      require(a.dataType == LongType,
        s"as-of join v1 requires LongType key/time columns; $name is ${a.dataType.sql}")
      a
    }
    Bridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      longAttr(lp, leftKey), longAttr(rp, rightKey),
      longAttr(lp, leftTime), longAttr(rp, rightTime)))
  }
}
