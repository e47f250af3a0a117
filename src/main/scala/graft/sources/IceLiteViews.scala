package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.StructType

/** SQL VIEW persistence for the IceLite warehouse (d74).
  *
  * Reference role: dbt-trino's DEFAULT materialization is `view`
  * (reference README.md:79-98 — the onboarding `dbt run` materializes
  * models as views in the Iceberg catalog before anyone opts into
  * `table`/`incremental`), so a catalog without views fails the
  * reference's first workflow. This is the Iceberg-view shape: a view
  * is NAMED SQL TEXT plus the context to re-resolve it (catalog +
  * namespace), stored in the catalog, re-analyzed at every read — so
  * schema changes in underlying tables flow through on the next
  * query, and a view over a dropped column fails at read time (the
  * honest failure), not silently serving stale data.
  *
  * Layout: `<warehouse>/<ns>/_views/<name>.json`. The `_views`
  * directory can never collide with a table: IceLite.listTables
  * admits only directories holding a `manifest.vNNNNNNNN.json`
  * (IceLite.scala listTables), which `_views` never does. One view =
  * one JSON file; CREATE claims the name with an atomic hard-link
  * (same CAS idiom as the manifest commit loop), REPLACE is an
  * atomic rename over the old definition — both safe under
  * concurrent DDL.
  *
  * Scale shape: views are metadata — O(1) files of SQL text, no data
  * pages. Every operation here is a single directory touch; nothing
  * scales with table size.
  */
private[graft] final case class ViewDef(
    sql: String,
    currentCatalog: String,
    currentNamespace: Seq[String],
    schemaDdl: String,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[String],
    properties: Map[String, String])

private[graft] object IceLiteViews {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private def viewsDir(warehouse: String, ns: String): Path =
    Paths.get(warehouse, ns, "_views")

  private def viewPath(warehouse: String, ns: String, name: String): Path =
    viewsDir(warehouse, ns).resolve(s"$name.json")

  def exists(warehouse: String, ns: String, name: String): Boolean =
    Files.exists(viewPath(warehouse, ns, name))

  def list(warehouse: String, ns: String): Seq[String] = {
    val d = viewsDir(warehouse, ns)
    if (!Files.exists(d)) Seq.empty
    else graft.icelite.IceLite.listDir(Files.list(d))(_
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json"))
      .toSeq.sorted)
  }

  def load(warehouse: String, ns: String, name: String): Option[ViewDef] = {
    val p = viewPath(warehouse, ns, name)
    if (!Files.exists(p)) None
    else Some(Serialization.read[ViewDef](Files.readString(p)))
  }

  /** CREATE (replace=false): atomic claim via hard-link — two racing
    * CREATEs see exactly one winner, the loser gets `false` back.
    * REPLACE (replace=true): atomic rename over the previous file. */
  def write(warehouse: String, ns: String, name: String, v: ViewDef,
      replace: Boolean): Boolean = {
    val dir = viewsDir(warehouse, ns)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".$name", ".tmp")
    try {
      Files.writeString(tmp, Serialization.write(v))
      val target = viewPath(warehouse, ns, name)
      if (replace) {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        true
      } else {
        try { Files.createLink(target, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      }
    } finally Files.deleteIfExists(tmp)
  }

  def drop(warehouse: String, ns: String, name: String): Boolean =
    Files.deleteIfExists(viewPath(warehouse, ns, name))

  /** RENAME: atomic only within one namespace dir; cross-namespace is
    * link-then-delete (the link is the atomic claim). */
  def rename(warehouse: String, fromNs: String, fromName: String,
      toNs: String, toName: String): Unit = {
    val from = viewPath(warehouse, fromNs, fromName)
    val to = viewPath(warehouse, toNs, toName)
    Files.createDirectories(to.getParent)
    Files.createLink(to, from)
    Files.deleteIfExists(from)
  }

  /** Adapt a stored definition to Spark's connector View face. */
  def asSparkView(ident: Identifier, v: ViewDef): View = new View {
    override def name(): String = ident.toString
    override def query(): String = v.sql
    override def currentCatalog(): String = v.currentCatalog
    override def currentNamespace(): Array[String] = v.currentNamespace.toArray
    override def schema(): StructType =
      if (v.schemaDdl.isEmpty) new StructType()
      else StructType.fromDDL(v.schemaDdl)
    override def queryColumnNames(): Array[String] = v.queryColumnNames.toArray
    override def columnAliases(): Array[String] = v.columnAliases.toArray
    override def columnComments(): Array[String] = v.columnComments.toArray
    override def properties(): java.util.Map[String, String] =
      v.properties.asJava
  }

  def defOf(info: ViewInfo): ViewDef = ViewDef(
    sql = info.sql,
    currentCatalog = info.currentCatalog,
    currentNamespace = info.currentNamespace.toSeq,
    schemaDdl = info.schema.toDDL,
    queryColumnNames = info.queryColumnNames.toSeq,
    columnAliases = info.columnAliases.toSeq,
    columnComments = info.columnComments.toSeq,
    properties = info.properties.asScala.toMap)
}
