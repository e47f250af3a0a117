package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge

/** Runnable commands behind the SQL VIEW surface (d74).
  *
  * Stock Spark 4.1 ships the connector `ViewCatalog` API but never
  * routes DDL to it — `ResolveSessionCatalog` throws
  * MISSING_CATALOG_ABILITY.VIEWS for any non-session catalog (the
  * same gap Iceberg fills with its own extensions). GraftSqlParser
  * intercepts view DDL aimed at an IceLite catalog at parse time and
  * rewrites it to these commands, which drive the catalog's
  * ViewCatalog face — so the SQL path and the API path share one
  * implementation. All commands are metadata-sized: one JSON file
  * touch, nothing scales with data.
  *
  * Reference role: dbt-trino's default `view` materialization
  * (reference README.md:79-98) — `CREATE OR REPLACE VIEW` per model
  * is the reference stack's most common DDL statement.
  */
object GraftViewCommands {

  /** Resolve multi-part identifier `parts` to a graft view-DDL
    * target, honoring the session's current catalog/namespace for
    * short names. Any ViewCatalog-capable plugin qualifies — the
    * local IceLite catalog or a REST attachment (d78: remote view
    * DDL posts definitions through the catalog service). None when
    * the identifier does not land in one (caller passes through to
    * stock Spark). */
  def resolveTarget(spark: SparkSession,
      parts: Seq[String]): Option[(String, ViewCatalog, String, String)] =
    resolveViewCatalog(spark, parts)

  /** Resolve to ANY ViewCatalog-capable plugin (the local IceLite
    * catalog or a REST attachment). */
  def resolveViewCatalog(spark: SparkSession,
      parts: Seq[String]): Option[(String, ViewCatalog, String, String)] = {
    def viewCat(name: String): Option[ViewCatalog] =
      try Bridge.catalogPlugin(spark, name) match {
        case c: ViewCatalog => Some(c)
        case _ => None
      } catch { case _: Exception => None }
    parts match {
      case Seq(cat, ns, name) => viewCat(cat).map((cat, _, ns, name))
      case Seq(ns, name) =>
        val cur = Bridge.currentCatalogName(spark)
        viewCat(cur).map((cur, _, ns, name))
      case Seq(name) =>
        val cur = Bridge.currentCatalogName(spark)
        val curNs = Bridge.currentNamespace(spark)
        if (curNs.length != 1) None
        else viewCat(cur).map((cur, _, curNs.head, name))
      case _ => None
    }
  }

  /** Like resolveViewCatalog, but only when the view actually exists. */
  def resolveExistingView(spark: SparkSession,
      parts: Seq[String]): Option[(String, ViewCatalog, String, String)] =
    resolveViewCatalog(spark, parts).filter { case (_, cat, ns, name) =>
      cat.viewExists(Identifier.of(Array(ns), name))
    }

  /** The read-side expansion: stored SQL text → logical plan, names
    * qualified with the view's stored context, nested views expanded
    * eagerly (seen-set = cycle detection), column aliases applied,
    * wrapped in a SubqueryAlias so `v.col` references resolve. */
  def expandView(spark: SparkSession, catName: String, cat: ViewCatalog,
      ns: String, name: String,
      seen: Set[(String, String, String)]): LogicalPlan = {
    val key = (catName, ns, name)
    if (seen.contains(key)) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "RECURSIVE_VIEW",
      messageParameters = Map("viewIdent" -> s"$catName.$ns.$name",
        "newPath" -> (seen.map(k => s"${k._1}.${k._2}.${k._3}") + s"$catName.$ns.$name")
          .mkString(" -> ")))
    val ident = Identifier.of(Array(ns), name)
    val v = cat.loadView(ident)
    // Spark's CTESubstitution batch already ran by the time this rule
    // injects the parsed body — re-apply it here so WITH aliases in
    // the view body resolve (they become CTERelationRefs, which the
    // Resolution batch still handles) and are never mis-qualified as
    // catalog tables below
    val parsed = org.apache.spark.sql.catalyst.analysis.CTESubstitution(
      Bridge.parsePlan(spark, v.query))
    // stored context names the catalog as the CREATING session knew
    // it; an attached engine (REST) may register the same warehouse
    // under a different alias — if the stored name is not a catalog
    // HERE, relative names re-qualify through the alias the view was
    // reached by (the Iceberg-views rule: catalog names are local)
    val storedCatKnown =
      try { Bridge.catalogPlugin(spark, v.currentCatalog); true }
      catch { case _: Exception => false }
    val viewCat = if (storedCatKnown) v.currentCatalog else catName
    val viewNs = if (storedCatKnown) v.currentNamespace.toSeq else Seq(ns)
    val qualified = parsed.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        val qparts = u.multipartIdentifier match {
          case Seq(one) if viewNs.length == 1 => Seq(viewCat, viewNs.head, one)
          case Seq(a, b) => Seq(viewCat, a, b)
          case other => other
        }
        resolveExistingView(spark, qparts) match {
          case Some((c2, cat2, ns2, n2)) =>
            expandView(spark, c2, cat2, ns2, n2, seen + key)
          case None =>
            if (qparts == u.multipartIdentifier) u
            else u.copy(multipartIdentifier = qparts)
        }
    }
    val aliases = v.columnAliases
    val body =
      if (aliases == null || aliases.isEmpty) qualified
      else {
        val from = v.queryColumnNames
        require(from != null && from.length == aliases.length,
          s"view $catName.$ns.$name stores ${aliases.length} column aliases " +
            s"but ${if (from == null) 0 else from.length} query column names")
        Project(from.zip(aliases).toIndexedSeq.map { case (q, a) =>
          Alias(UnresolvedAttribute.quoted(q), a)() }, qualified)
      }
    SubqueryAlias(
      org.apache.spark.sql.catalyst.AliasIdentifier(name, Seq(catName, ns)),
      body)
  }
}

/** CREATE [OR REPLACE] VIEW cat.ns.v [(aliases)] AS <query> — the
  * query analyzes NOW (names resolve in the current session context,
  * which is stored for read-time re-qualification); the definition
  * lands as one atomic file claim/rename in the warehouse. */
case class GraftCreateViewCommand(
    catName: String, ns: String, name: String,
    userColumns: Seq[String], comment: Option[String],
    properties: Map[String, String], originalText: String,
    query: LogicalPlan, allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array(ns), name)
    if (cat.viewExists(ident) && allowExisting && !replace) return Nil
    // analyze the body now: invalid SQL / missing tables fail at
    // CREATE, and the analyzed output names become the alias base
    val analyzed = Bridge.ofRows(spark, query)
    val schema = analyzed.schema
    if (userColumns.nonEmpty) require(userColumns.length == schema.length,
      s"CREATE VIEW lists ${userColumns.length} column names but the " +
        s"query produces ${schema.length} columns")
    val props = comment.fold(properties)(c =>
      properties + (ViewCatalog.PROP_COMMENT -> c))
    val info = new ViewInfo(ident, originalText,
      Bridge.currentCatalogName(spark), Bridge.currentNamespace(spark),
      schema, schema.fieldNames,
      userColumns.toArray, Array.fill[String](userColumns.length)(null),
      props.asJava)
    if (replace) cat.replaceView(info, true) else cat.createView(info)
    Nil
  }
}

/** DROP VIEW [IF EXISTS] cat.ns.v */
case class GraftDropViewCommand(catName: String, ns: String, name: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val dropped = cat.dropView(Identifier.of(Array(ns), name))
    if (!dropped && !ifExists)
      throw new NoSuchViewException(Identifier.of(Array(ns), name))
    Nil
  }
}

/** d83: `ALTER TABLE cat.ns.t ADD|DROP PARTITION FIELD col` —
  * partition-spec evolution as DDL (parser-intercepted; stock Spark
  * has no grammar or TableChange for it). Dispatches through the
  * SupportsPartitionFieldDdl face both catalog impls share. */
case class GraftPartitionFieldCommand(catName: String, ns: String,
    name: String, col: String, add: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName)
      .asInstanceOf[SupportsPartitionFieldDdl]
    val ident = Identifier.of(Array(ns), name)
    if (add) cat.addPartitionField(ident, col)
    else cat.dropPartitionField(ident, col)
    Nil
  }
}

/** d85: `ALTER TABLE cat.ns.t ADD PARTITION FIELD bucket(8, id)` —
  * transform-spec evolution (hidden layouts), same dispatch face. */
case class GraftPartitionTransformCommand(catName: String, ns: String,
    name: String, transform: String, sourceCol: String, param: Int)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName)
      .asInstanceOf[SupportsPartitionFieldDdl]
    cat.addPartitionFieldTransform(Identifier.of(Array(ns), name),
      transform, sourceCol, param)
    Nil
  }
}

/** d89: `ALTER TABLE cat.ns.t WRITE ORDERED BY col | WRITE UNORDERED`
  * — sort-order DDL (parser-intercepted like d83/d85), dispatching
  * through the shared SupportsPartitionFieldDdl face. */
case class GraftWriteOrderCommand(catName: String, ns: String,
    name: String, col: Option[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Bridge.catalogPlugin(spark, catName)
      .asInstanceOf[SupportsPartitionFieldDdl]
      .setWriteOrder(Identifier.of(Array(ns), name), col)
    Nil
  }
}

/** SHOW VIEWS IN cat.ns ['pattern'] — '*' wildcards, '|' alternation
  * (Spark's SHOW semantics). */
case class GraftShowViewsCommand(catName: String, ns: String,
    pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val names = cat.listViews(ns).map(_.name).toSeq
    val kept = pattern.fold(names) { p =>
      val res = p.split("\\|").toSeq.map(q =>
        java.util.regex.Pattern.compile(
          q.replace("*", ".*"), java.util.regex.Pattern.CASE_INSENSITIVE))
      names.filter(n => res.exists(_.matcher(n).matches()))
    }
    kept.sorted.map(n => Row(ns, n, false))
  }
}

/** ALTER VIEW cat.ns.v AS <query> — replace the definition, keep the
  * properties (Spark's ALTER VIEW AS contract). */
case class GraftAlterViewAsCommand(catName: String, ns: String, name: String,
    originalText: String, query: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val ident = Identifier.of(Array(ns), name)
    val old = cat.loadView(ident)
    val analyzed = Bridge.ofRows(spark, query)
    val info = new ViewInfo(ident, originalText,
      Bridge.currentCatalogName(spark), Bridge.currentNamespace(spark),
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String], old.properties)
    cat.replaceView(info, false)
    Nil
  }
}

/** ALTER VIEW ... SET/UNSET TBLPROPERTIES — through ViewChange. */
case class GraftAlterViewPropsCommand(catName: String, ns: String,
    name: String, set: Map[String, String],
    unset: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val changes: Seq[ViewChange] =
      set.toSeq.sortBy(_._1).map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    cat.alterView(Identifier.of(Array(ns), name), changes: _*)
    Nil
  }
}

/** DESCRIBE cat.ns.v — the stored (create-time) schema, Spark's
  * DESCRIBE layout (col_name, data_type, comment). */
case class GraftDescribeViewCommand(catName: String, ns: String, name: String,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val v = cat.loadView(Identifier.of(Array(ns), name))
    val aliases = v.columnAliases
    v.schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      val n = if (aliases != null && i < aliases.length) aliases(i) else f.name
      Row(n, f.dataType.simpleString, null)
    }
  }
}

/** SHOW CREATE TABLE cat.ns.v (on a view) — reconstructable DDL. */
case class GraftShowCreateViewCommand(catName: String, ns: String,
    name: String,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = Bridge.catalogPlugin(spark, catName).asInstanceOf[ViewCatalog]
    val v = cat.loadView(Identifier.of(Array(ns), name))
    val cols = if (v.columnAliases == null || v.columnAliases.isEmpty) ""
      else v.columnAliases.mkString(" (", ", ", ")")
    Seq(Row(s"CREATE VIEW $catName.$ns.$name$cols AS\n${v.query}"))
  }
}
