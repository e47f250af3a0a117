package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.StructType

/** Parser interception for SQL VIEW DDL on IceLite catalogs (d74).
  *
  * Why the parser and not a resolution rule: Spark's
  * ResolveSessionCatalog runs BEFORE injected resolution rules inside
  * the fixed-point Resolution batch and throws
  * MISSING_CATALOG_ABILITY.VIEWS the moment it sees view DDL whose
  * identifier resolved to a non-session catalog — an injected rule
  * never gets a turn. Rewriting the parsed plan, before analysis
  * starts, is the only seam stock Spark leaves open (Iceberg's
  * extensions take the same route). Reads don't have this problem
  * (nothing throws on an unresolved relation until CheckAnalysis), so
  * view READS stay in GraftViewSubstitution, a normal resolution
  * rule.
  *
  * Every non-view statement — and every view statement aimed at a
  * non-IceLite catalog — passes through the delegate untouched.
  */
class GraftSqlParser(spark: SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  /** d83: partition-spec-evolution DDL — stock Spark has NO grammar
    * for `ALTER TABLE … ADD/DROP PARTITION FIELD` (Iceberg's
    * extensions add it via their own ANTLR parser), so the delegate
    * would throw a ParseException before any plan rewrite could run.
    * Match the statement shape FIRST; anything else — including this
    * shape aimed at a catalog without the DDL face — falls through to
    * the delegate untouched (and fails exactly as stock Spark would). */
  private val AddPartFieldRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+`?(\w+)`?\s*;?\s*$""".r
  private val DropPartFieldRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+`?(\w+)`?\s*;?\s*$""".r
  /** d85: transform fields — `ADD/DROP PARTITION FIELD bucket(8, id)`
    * etc. The two arguments accept either order (Iceberg's own docs
    * write `bucket(16, id)` but `truncate(col, 4)`). */
  private val AddPartTransformRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+(\w+)\s*\(\s*([^)]+)\s*\)\s*;?\s*$""".r
  private val DropPartTransformRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+(\w+)\s*\(\s*([^)]+)\s*\)\s*;?\s*$""".r
  /** d89: sort-order DDL — `WRITE ORDERED BY key [ASC|DESC] [NULLS
    * FIRST|LAST][, …]` / `WRITE UNORDERED` (Iceberg's
    * spark-extensions grammar; stock Spark has neither). Keys are
    * plain columns or transform keys (`days(ts)`, `bucket(8, id)`,
    * `truncate(4, s)`) since r14; the canonical encoded form
    * ("days(ts) DESC NULLS LAST,c2") travels through the same string
    * channel the single-column DDL used. */
  private val OrderTok =
    """(?:\w+\s*\(\s*[^)]*\s*\)|`?\w+`?)(?:\s+(?:ASC|DESC))?(?:\s+NULLS\s+(?:FIRST|LAST))?"""
  private val WriteOrderedRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+ORDERED\s+BY\s+(""" +
      OrderTok + """(?:\s*,\s*""" + OrderTok + """)*)\s*;?\s*$""").r
  private val WriteUnorderedRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+UNORDERED\s*;?\s*$""".r
  /** Catch-all for the fuller Iceberg grammar (expression keys,
    * unknown transforms) — recognized and refused with a clear
    * capability message when the table is ours; the stock delegate's
    * generic syntax error would misdirect the user. */
  private val WriteOrderedAnyRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+WRITE\s+ORDERED\s+BY\s+(.+?)\s*;?\s*$""".r

  /** Parse "8, id" / "id, 8" / "ts" into (sourceCol, param). */
  private def transformArgs(raw: String): Option[(String, Int)] = {
    val parts = raw.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
    parts match {
      case Array(one) if one.matches("\\w+") && !one.forall(_.isDigit) =>
        Some((one, 0))
      case Array(a, b) if a.forall(_.isDigit) && b.matches("\\w+") =>
        Some((b, a.toInt))
      case Array(a, b) if b.forall(_.isDigit) && a.matches("\\w+") =>
        Some((a, b.toInt))
      case _ => None
    }
  }

  /** The derived-name convention shared with the catalogs. */
  private def derivedName(transform: String, src: String): String =
    transform match {
      case "bucket" => s"${src}_bucket"
      case "days" => s"${src}_day"
      case "years" => s"${src}_year"
      case "months" => s"${src}_month"
      case "hours" => s"${src}_hour"
      case "truncate" => s"${src}_trunc"
      case other => s"${src}_$other"
    }

  private def partFieldCommand(identText: String, col: String,
      add: Boolean): Option[LogicalPlan] = {
    val parts = identText.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
    val resolved: Option[(String, String, String)] = parts match {
      case Seq(cat, ns, name) => Some((cat, ns, name))
      case Seq(ns, name) =>
        Some((org.apache.spark.sql.graft.Bridge.currentCatalogName(spark), ns, name))
      case Seq(name) =>
        val curNs = org.apache.spark.sql.graft.Bridge.currentNamespace(spark)
        if (curNs.length == 1)
          Some((org.apache.spark.sql.graft.Bridge.currentCatalogName(spark),
            curNs.head, name))
        else None
      case _ => None
    }
    resolved.filter { case (cat, _, _) =>
      try org.apache.spark.sql.graft.Bridge.catalogPlugin(spark, cat)
        .isInstanceOf[SupportsPartitionFieldDdl]
      catch { case _: Exception => false }
    }.map { case (cat, ns, name) =>
      GraftPartitionFieldCommand(cat, ns, name, col, add): LogicalPlan
    }
  }

  private def partTransformCommand(identText: String, transform: String,
      args: String): Option[LogicalPlan] = {
    transformArgs(args).flatMap { case (src, param) =>
      partFieldCommand(identText, src, add = true).map {
        case GraftPartitionFieldCommand(cat, ns, name, _, _) =>
          GraftPartitionTransformCommand(cat, ns, name,
            transform.toLowerCase, src, param): LogicalPlan
        case other => other
      }
    }
  }

  /** d89: route WRITE ORDERED BY / UNORDERED at the same seam —
    * reuses partFieldCommand's identifier resolution + catalog
    * capability check, then re-tags the resolved command. */
  private def writeOrderCommand(identText: String,
      col: Option[String]): Option[LogicalPlan] =
    partFieldCommand(identText, col.getOrElse("_"), add = true).map {
      case GraftPartitionFieldCommand(cat, ns, name, _, _) =>
        GraftWriteOrderCommand(cat, ns, name, col): LogicalPlan
      case other => other
    }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    // catalog check FIRST (writeOrderCommand(_, None)), THEN canon:
    // the extended token grammar admits transform shapes SortKey may
    // still refuse (unknown transform name), and that loud refusal
    // must fire only for OUR tables — anything else falls through to
    // the delegate's own error
    case WriteOrderedRe(ident, order)
        if writeOrderCommand(ident, None).isDefined =>
      // canonicalize ("days(ts) desc , `b`" → "days(ts) DESC,b") at
      // the parse seam so every downstream consumer sees one rendering
      writeOrderCommand(ident,
        Some(graft.icelite.SortKey.canon(order))).get
    case WriteUnorderedRe(ident) =>
      writeOrderCommand(ident, None)
        .getOrElse(rewrite(delegate.parsePlan(sqlText)))
    case WriteOrderedAnyRe(ident, order) if writeOrderCommand(ident, None).isDefined =>
      throw new UnsupportedOperationException(
        s"WRITE ORDERED BY $order: this catalog supports plain-column " +
          "and transform keys (days|months|years|hours(col), " +
          "bucket(n, col), truncate(n, col)) with ASC/DESC and NULLS " +
          "FIRST/LAST — e.g. ALTER TABLE t WRITE ORDERED BY " +
          "days(ts) DESC, c2 NULLS LAST; expression keys are not supported")
    case AddPartTransformRe(ident, transform, args) =>
      partTransformCommand(ident, transform, args)
        .getOrElse(rewrite(delegate.parsePlan(sqlText)))
    case DropPartTransformRe(ident, transform, args) =>
      // drop resolves through the shared derived-name convention
      transformArgs(args).flatMap { case (src, _) =>
        partFieldCommand(ident,
          derivedName(transform.toLowerCase, src), add = false)
      }.getOrElse(rewrite(delegate.parsePlan(sqlText)))
    case AddPartFieldRe(ident, col) =>
      partFieldCommand(ident, col, add = true)
        .getOrElse(rewrite(delegate.parsePlan(sqlText)))
    case DropPartFieldRe(ident, col) =>
      partFieldCommand(ident, col, add = false)
        .getOrElse(rewrite(delegate.parsePlan(sqlText)))
    case _ => rewrite(delegate.parsePlan(sqlText))
  }

  private def partsOf(child: LogicalPlan): Option[Seq[String]] = child match {
    case UnresolvedIdentifier(parts, _) => Some(parts)
    case v: UnresolvedView => Some(v.multipartIdentifier)
    case t: UnresolvedTableOrView => Some(t.multipartIdentifier)
    case _ => None
  }

  private def target(child: LogicalPlan) =
    partsOf(child).flatMap(GraftViewCommands.resolveTarget(spark, _))

  private def existingView(child: LogicalPlan) =
    partsOf(child).flatMap(GraftViewCommands.resolveExistingView(spark, _))

  /** Mutations stay on the OWNING catalog only. */
  private def existingIceView(child: LogicalPlan) =
    partsOf(child).flatMap(GraftViewCommands.resolveTarget(spark, _))
      .filter { case (_, cat, ns, name) =>
        cat.viewExists(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array(ns), name)) }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv: CreateView =>
      target(cv.child).map { case (catName, _, ns, name) =>
        val text = cv.originalText.getOrElse(
          throw new IllegalArgumentException(
            s"CREATE VIEW $catName.$ns.$name has no SQL text to store"))
        GraftCreateViewCommand(catName, ns, name,
          cv.userSpecifiedColumns.map(_._1), cv.comment, cv.properties,
          text, cv.query, cv.allowExisting, cv.replace): LogicalPlan
      }.getOrElse(cv)

    case dv: DropView =>
      target(dv.child).map { case (catName, _, ns, name) =>
        GraftDropViewCommand(catName, ns, name, dv.ifExists): LogicalPlan
      }.getOrElse(dv)

    case sv: ShowViews =>
      val nsParts = sv.namespace match {
        case ns: UnresolvedNamespace => Some(ns.multipartIdentifier)
        case _ => None
      }
      val resolved = nsParts.flatMap {
        case Seq(cat, ns) =>
          GraftViewCommands.resolveViewCatalog(spark, Seq(cat, ns, "_"))
            .map { case (c, _, n, _) => (c, n) }
        case Seq(ns) =>
          GraftViewCommands.resolveViewCatalog(spark, Seq(ns, "_"))
            .map { case (c, _, n, _) => (c, n) }
        case _ => None
      }
      resolved.map { case (catName, ns) =>
        GraftShowViewsCommand(catName, ns, sv.pattern, sv.output): LogicalPlan
      }.getOrElse(sv)

    case av: AlterViewAs =>
      target(av.child).map { case (catName, _, ns, name) =>
        GraftAlterViewAsCommand(catName, ns, name, av.originalText,
          av.query): LogicalPlan
      }.getOrElse(av)

    case sp: SetViewProperties =>
      existingIceView(sp.child).map { case (catName, _, ns, name) =>
        GraftAlterViewPropsCommand(catName, ns, name, sp.properties,
          Nil): LogicalPlan
      }.getOrElse(sp)

    case up: UnsetViewProperties =>
      existingIceView(up.child).map { case (catName, _, ns, name) =>
        GraftAlterViewPropsCommand(catName, ns, name, Map.empty,
          up.propertyKeys): LogicalPlan
      }.getOrElse(up)

    // DESCRIBE / SHOW CREATE TABLE hit the TABLE path first; only a
    // name that IS an existing IceLite view reroutes
    case d: DescribeRelation if d.partitionSpec.isEmpty =>
      existingView(d.relation).map { case (catName, _, ns, name) =>
        GraftDescribeViewCommand(catName, ns, name, d.output): LogicalPlan
      }.getOrElse(d)

    case sc: ShowCreateTable =>
      existingView(sc.child).map { case (catName, _, ns, name) =>
        GraftShowCreateViewCommand(catName, ns, name, sc.output): LogicalPlan
      }.getOrElse(sc)

    case other => other
  }

  // ---- pure delegation ----
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
