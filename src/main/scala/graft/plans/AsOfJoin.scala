package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeRowJoiner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** AS-OF JOIN as a first-class operator: logical node → planner
  * strategy → physical sort-merge exec, the (c) tier of the custom-
  * operator ladder (Spark has no built-in as-of join; the inequality-
  * join encoding explodes, and the union+window trick — see q21 —
  * can't expose a reusable relational operator).
  *
  * Semantics: for every left row, attach the LAST right row of the
  * same key with rightTime <= leftTime — DuckDB's
  * `ASOF [LEFT] JOIN ... ON l.k = r.k AND l.t >= r.t`. Inner drops
  * unmatched left rows; left-outer emits them with nulls on the right.
  *
  * Scale shape: both sides hash-cluster on the key and sort by
  * (key, time) — one shuffle each, identical to a sort-merge join —
  * then a single forward-only merge pass per partition. State is ONE
  * buffered right row; no per-key materialization, no range blowup.
  *
  * The merge loop stays primitive-long: the API layer projects
  * non-long key/time types (int, timestamp → epoch micros, date →
  * epoch days) to order-preserving long helper columns before the
  * plan and drops them after, so the exec never branches on type.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
  leftKey: Expression, rightKey: Expression,
  leftTime: Expression, rightTime: Expression,
  isLeftOuter: Boolean,
  rightTie: Option[Expression] = None) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++
    (if (isLeftOuter) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
    newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
  leftKey: Expression, rightKey: Expression,
  leftTime: Expression, rightTime: Expression,
  isLeftOuter: Boolean,
  rightTie: Option[Expression] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++
    (if (isLeftOuter) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // The merge keeps the LAST qualifying right row; with a tiebreak in
  // the sort, equal-(key,time) ties resolve to the GREATEST tiebreak —
  // deterministic across shuffles when the tiebreak is unique. Without
  // one, the pick among exact ties follows partition sort order.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTie.map(t => SortOrder(t, Ascending)).toSeq)

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
    newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = StructType(left.output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val rSchema = StructType(right.output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val lKeyExprs = Seq(leftKey, leftTime)
    val rKeyExprs = Seq(rightKey, rightTime)
    val lOut = left.output
    val rOut = right.output
    val outer = isLeftOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rProj = UnsafeProjection.create(rKeyExprs, rOut)
      val joiner = GenerateUnsafeRowJoiner.create(lSchema, rSchema)
      // all-null right row for outer emission (built once per partition)
      val nullRight = UnsafeProjection.create(rSchema)(
        new GenericInternalRow(rSchema.length)).copy()
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
            } else if (outer) {
              nextRow = joiner.join(l, nullRight)
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
  * for config-built sessions. Key/time columns may be long, int,
  * timestamp, or date; non-long types ride an order-preserving long
  * helper column projected before the plan and dropped after. */
object AsOf {
  import org.apache.spark.sql.functions.{col, datediff, lit, unix_micros}

  def join(left: DataFrame, right: DataFrame,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    joinType: String = "inner",
    direction: String = "backward",
    rightTiebreak: Option[String] = None): DataFrame = {
    val outer = joinType match {
      case "inner" => false
      case "left" | "left_outer" => true
      case t => throw new IllegalArgumentException(
        s"as-of join supports inner and left_outer, got $t")
    }
    // forward as-of (earliest right row AT-OR-AFTER the left time) is
    // the backward join on the NEGATED order-preserving long view:
    // max(-rt) <= -lt  <=>  min(rt) >= lt. One expression, no second
    // exec path to maintain.
    val forward = direction match {
      case "backward" => false
      case "forward" => true
      case t => throw new IllegalArgumentException(
        s"as-of join direction must be backward or forward, got $t")
    }
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy

    // order-preserving long view of a key/time column, added as a
    // helper column when the native type isn't already long
    def numericize(df: DataFrame, name: String, helper: String)
        : (DataFrame, String) =
      df.schema(name).dataType match {
        case LongType => (df, name)
        case ByteType | ShortType | IntegerType =>
          (df.withColumn(helper, col(name).cast(LongType)), helper)
        case TimestampType =>
          (df.withColumn(helper, unix_micros(col(name))), helper)
        case DateType =>
          (df.withColumn(helper,
            datediff(col(name), lit("1970-01-01")).cast(LongType)), helper)
        case dt => throw new IllegalArgumentException(
          s"as-of join: unsupported key/time type ${dt.sql} for $name")
      }

    val (l1, lkName) = numericize(left, leftKey, "__asof_lk")
    val (l2a, ltName0) = numericize(l1, leftTime, "__asof_lt")
    val (r1, rkName) = numericize(right, rightKey, "__asof_rk")
    val (r2a, rtName0) = numericize(r1, rightTime, "__asof_rt")
    val (l2, ltName) =
      if (forward) (l2a.withColumn("__asof_ltf", -col(ltName0)), "__asof_ltf")
      else (l2a, ltName0)
    val (r2b, rtName) =
      if (forward) (r2a.withColumn("__asof_rtf", -col(rtName0)), "__asof_rtf")
      else (r2a, rtName0)
    // optional deterministic tie-break among right rows sharing
    // (key, time): the GREATEST tiebreak value wins. Without it, the
    // pick among exact ties follows partition sort order (both this
    // exec and DuckDB ASOF are arbitrary there).
    val (r2, tieName) = rightTiebreak match {
      case Some(tc) => val (df, n) = numericize(r2b, tc, "__asof_tie"); (df, Some(n))
      case None => (r2b, None)
    }

    val lp = Bridge.analyzedPlan(l2)
    val rp = Bridge.analyzedPlan(r2)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${p.output.map(_.name).mkString(", ")}]"))
    val joined = Bridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, lkName), attr(rp, rkName),
      attr(lp, ltName), attr(rp, rtName), outer,
      tieName.map(attr(rp, _))))
    joined.drop("__asof_lk", "__asof_lt", "__asof_rk", "__asof_rt",
      "__asof_ltf", "__asof_rtf", "__asof_tie")
  }
}
