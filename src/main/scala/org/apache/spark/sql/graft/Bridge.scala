package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these converters
  * private[sql]; extension libraries conventionally expose them from a
  * file in the org.apache.spark.sql namespace (same pattern public
  * Spark-extension projects use for Dataset/Column factories). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: org.apache.spark.sql.SparkSession,
    plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** For a just-(local)checkpointed Dataset — whose analyzed plan is a
    * LogicalRDD over the materialized, block-manager-cached internal
    * RDD — the cached byte size (memory + disk) and partition count.
    * None when the plan isn't a LogicalRDD or the blocks aren't
    * tracked (e.g. a reliable checkpoint, which writes files instead).
    * Driver-side metadata lookup only; never runs a job. */
  def cachedSize(df: org.apache.spark.sql.DataFrame): Option[(Long, Int)] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .filter(_.numCachedPartitions > 0)
          .map(i => (i.memSize + i.diskSize, lr.rdd.getNumPartitions))
      case _ => None
    }
}
