package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}

/** Column-level lineage extraction from the Catalyst ANALYZED plan —
  * the OpenLineage/Unity-Catalog governance primitive: for every output
  * column, which (table, column) leaves does it transitively read?
  *
  * The walk keys everything by `ExprId` (Catalyst's stable attribute
  * identity — names alone are ambiguous under self-joins):
  * `SubqueryAlias` nodes are the lineage BASES (real lineage tools stop
  * at named tables, not file scans), `Project`/`Aggregate` map each
  * named output to the union of its referenced attributes' sources, and
  * every other operator (joins, filters, sorts) passes attribute
  * identity through untouched, so the merged child maps already carry
  * the right entries. Pure plan analysis: runs on the driver against
  * metadata, touches zero data — lineage for a 100 TB query costs the
  * same as for an empty table.
  */
object Lineage {

  def trace(df: DataFrame): Seq[(String, String, String)] = {
    def refsOf(e: Expression): Seq[ExprId] =
      e.collect { case ar: AttributeReference => ar.exprId }

    def walk(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] =
      plan match {
        case sa: SubqueryAlias =>
          sa.output.map(a => a.exprId -> Set((sa.alias, a.name))).toMap
        case p: Project =>
          val cm = walk(p.child)
          cm ++ p.projectList.map { ne =>
            ne.toAttribute.exprId ->
              refsOf(ne).flatMap(cm.get).flatten.toSet
          }.toMap
        case a: Aggregate =>
          val cm = walk(a.child)
          cm ++ a.aggregateExpressions.map { ne =>
            ne.toAttribute.exprId ->
              refsOf(ne).flatMap(cm.get).flatten.toSet
          }.toMap
        case other =>
          other.children.map(walk)
            .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
      }

    val analyzed = df.queryExecution.analyzed
    val m = walk(analyzed)
    analyzed.output.flatMap { a =>
      m.getOrElse(a.exprId, Set.empty).toSeq.sorted
        .map { case (t, c) => (a.name, t, c) }
    }
  }
}
