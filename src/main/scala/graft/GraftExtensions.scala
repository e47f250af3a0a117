package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.sources.GraftViewCommands

/** Session extensions for the graft engine — register with
  *
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  * }}}
  *
  * Today this carries the SQL VIEW surface (d74): a parser intercept
  * for view DDL on IceLite catalogs (stock Spark refuses view DDL
  * outside its session catalog — see GraftSqlParser) and a resolution
  * rule that expands reads of IceLite views into their stored SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser { case (session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate)
    }
    ext.injectResolutionRule(GraftViewSubstitution)
  }
}

/** Expands `UnresolvedRelation`s that name an IceLite view into the
  * view's stored SQL (re-parsed and re-qualified at every read — so
  * underlying-table evolution flows through, and a view over a
  * dropped column fails at read time, honestly). Runs in the
  * Resolution batch: relations Spark's own rules can't resolve reach
  * here before CheckAnalysis fails the query, nested views expand
  * through a seen-set (cycle detection), and everything else is left
  * alone. Writes into views refuse: a view is not a table. */
case class GraftViewSubstitution(
    spark: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a view can be read, never written or time-traveled: relations in
    // those positions keep their stock-Spark error path
    val shielded = plan.collect {
      case i: InsertIntoStatement => i.table
      case t: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel => t.relation
    }.toSet
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming && !shielded.contains(u) =>
        GraftViewCommands.resolveExistingView(spark, u.multipartIdentifier) match {
          case Some((catName, cat, ns, name)) =>
            GraftViewCommands.expandView(spark, catName, cat, ns, name, Set.empty)
          case None => u
        }
      case i: InsertIntoStatement
          if i.table.isInstanceOf[UnresolvedRelation] &&
            GraftViewCommands.resolveExistingView(spark,
              i.table.asInstanceOf[UnresolvedRelation].multipartIdentifier).isDefined =>
        throw new UnsupportedOperationException(
          "cannot write into a view; INSERT targets must be tables")
    }
  }
}
