package graft.sources.rest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.icelite.TableRef
import graft.sources.{IceLiteSource, IceLiteTable}

/** The REST-ATTACHED catalog — how a second engine (or a second
  * Spark cluster) mounts a graft warehouse with nothing but a uri,
  * the way Trino attaches to the reference's Iceberg REST catalog
  * (iceberg-template.properties:8-9: `iceberg.catalog.type=rest` +
  * uri; storage shared underneath). Register:
  *
  * {{{
  *   spark.sql.catalog.remote     = graft.sources.rest.IceLiteRestCatalog
  *   spark.sql.catalog.remote.uri = http://host:port/v1
  * }}}
  *
  * METADATA travels over HTTP; DATA is read from the shared
  * warehouse (the reference's engines share MinIO the same way).
  * loadTable fetches the current manifest and SPOOLS it as a local
  * single-JSON manifest version file keyed by the server's version —
  * re-loads of an unchanged table are one GET plus a cache hit, a
  * changed table spools the newer version beside the old (highest
  * wins, the same rule the engine itself uses). The spool's `data/`
  * and `deletes/` are symlinks into the shared warehouse, so every
  * relative path in the manifest — flat, partitioned, MoR sidecars —
  * resolves without rewriting (the local-FS analogue of the absolute
  * object-store URIs real Iceberg manifests carry).
  *
  * Writes: APPEND (INSERT INTO) works end-to-end — executors stage
  * parquet straight into the shared warehouse through the data/
  * mount, then one POST asks the catalog service to CAS-commit the
  * staged set (Iceberg's REST commit: data never proxies through the
  * catalog, the metadata authority never leaves it; concurrent
  * remote and local appenders rebase through the same CAS). History
  * rewrites — overwrite, row-level ops, DDL — refuse toward the
  * owning catalog, and streaming reads refuse too: the spool is a
  * point-in-time snapshot, and a stream that silently never advanced
  * would be a lie.
  */
class IceLiteRestCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.ViewCatalog {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)
  private var catalogName: String = _
  private var uri: String = _
  private var spoolRoot: Path = _
  private var warehouse: String = _
  private val http = HttpClient.newHttpClient()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    uri = options.get("uri")
    require(uri != null, s"catalog '$name' needs spark.sql.catalog.$name.uri")
    uri = uri.stripSuffix("/")
    spoolRoot = Option(options.get("spool")).map(Paths.get(_))
      .getOrElse(Files.createTempDirectory(s"graft_rest_spool_$name"))
    warehouse = (parse(get("/config")) \ "warehouse")
      .asInstanceOf[org.json4s.JString].s
  }

  override def name(): String = catalogName

  private def parse(s: String): org.json4s.JValue =
    org.json4s.jackson.JsonMethods.parse(s)

  private def get(path: String): String = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(uri + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw new RestCatalogException(
      resp.statusCode(), s"GET $path -> ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def post(path: String): Unit = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(uri + path))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw new RestCatalogException(
      resp.statusCode(), s"POST $path -> ${resp.statusCode()}: ${resp.body()}")
  }

  // ---- namespaces ----

  override def listNamespaces(): Array[Array[String]] =
    (parse(get("/namespaces")) \ "namespaces")
      .extract[Seq[String]].map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && listNamespaces().exists(_.sameElements(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    require(namespace.length == 1,
      s"icelite namespaces are single-level, got ${namespace.mkString(".")}")
    post(s"/namespaces/${namespace.head}")
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("icelite namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    refuseWrite("DROP NAMESPACE")

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.length != 1) throw new NoSuchNamespaceException(namespace)
    try (parse(get(s"/namespaces/${namespace.head}/tables")) \ "tables")
      .extract[Seq[String]].map(Identifier.of(namespace, _)).toArray
    catch { case e: RestCatalogException if e.code == 404 =>
      throw new NoSuchNamespaceException(namespace) }
  }

  override def tableExists(ident: Identifier): Boolean =
    try { spoolManifest(ident); true }
    catch { case _: NoSuchTableException => false }

  /** Fetch the current manifest over HTTP and spool it locally keyed
    * by the server's version; returns the spool TableRef. */
  private def spoolManifest(ident: Identifier): TableRef = {
    require(ident.namespace.length == 1,
      s"icelite namespaces are single-level, got ${ident.namespace.mkString(".")}")
    val ns = ident.namespace.head
    val body =
      try parse(get(s"/namespaces/$ns/tables/${ident.name}"))
      catch { case e: RestCatalogException if e.code == 404 =>
        throw new NoSuchTableException(ident) }
    val version = (body \ "version").extract[Long]
    val manifestJson = (body \ "manifest").extract[String]
    val spool = TableRef(spoolRoot.toString, ns, ident.name)
    Files.createDirectories(spool.dir)
    // shared-storage mounts: every relative data/delete path in the
    // manifest resolves through these links (object-store deployments
    // carry absolute URIs instead and need no mount)
    val serverTable = Paths.get(warehouse, ns, ident.name)
    Seq("data", "deletes").foreach { d =>
      val link = spool.dir.resolve(d)
      if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        try Files.createSymbolicLink(link, serverTable.resolve(d))
        catch { case _: java.nio.file.FileAlreadyExistsException => () } // racing loader won
    }
    val mf = spool.dir.resolve(f"manifest.v$version%08d.json")
    if (!Files.exists(mf)) {
      val tmp = Files.createTempFile(spool.dir, ".spool", ".tmp")
      Files.writeString(tmp, manifestJson)
      try Files.createLink(mf, tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp)
    }
    spool
  }

  override def loadTable(ident: Identifier): Table = {
    val spool = spoolManifest(ident)
    new RestReadTable(spool, IceLiteSource.schemaOf(spool), catalogName,
      ident, uri, http)
  }

  private def refuseWrite(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op refused: catalog '$catalogName' is a READ-ONLY REST attachment " +
        "(metadata over HTTP, shared storage underneath); writes go " +
        "through the warehouse's owning catalog (IceLiteCatalog)")

  // ---- views over the wire: the owning engine's dbt models are
  // queryable from this attachment (GraftViewSubstitution resolves
  // through ANY ViewCatalog, this one included); definitions are
  // fetched per read, so a re-run's CREATE OR REPLACE flows through.
  // View DDL mutates catalog state → owning catalog only. ----

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    try (parse(get(s"/namespaces/${ns.head}/views")) \ "views")
      .extract[Seq[String]].map(Identifier.of(ns, _)).toArray
    catch { case e: RestCatalogException if e.code == 404 =>
      throw new NoSuchNamespaceException(ns) }
  }

  override def viewExists(ident: Identifier): Boolean =
    try { loadView(ident); true }
    catch { case _: org.apache.spark.sql.catalyst.analysis.NoSuchViewException => false }

  override def loadView(ident: Identifier): org.apache.spark.sql.connector.catalog.View = {
    require(ident.namespace.length == 1,
      s"icelite namespaces are single-level, got ${ident.namespace.mkString(".")}")
    val vd =
      try Serialization.read[graft.sources.ViewDef](
        get(s"/namespaces/${ident.namespace.head}/views/${ident.name}"))
      catch { case e: RestCatalogException if e.code == 404 =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident) }
    graft.sources.IceLiteViews.asSparkView(ident, vd)
  }

  override def createView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo): org.apache.spark.sql.connector.catalog.View =
    refuseWrite("CREATE VIEW")
  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*): org.apache.spark.sql.connector.catalog.View =
    refuseWrite("ALTER VIEW")
  override def dropView(ident: Identifier): Boolean = refuseWrite("DROP VIEW")
  override def renameView(from: Identifier, to: Identifier): Unit =
    refuseWrite("RENAME VIEW")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    refuseWrite("CREATE TABLE")

  override def dropTable(ident: Identifier): Boolean = refuseWrite("DROP TABLE")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuseWrite("ALTER TABLE")

  override def renameTable(from: Identifier, to: Identifier): Unit =
    refuseWrite("RENAME TABLE")
}

private[rest] class RestCatalogException(val code: Int, msg: String)
  extends RuntimeException(msg)

/** The face a REST attachment serves: the full IceLite scan machinery
  * (manifest pruning, columnar read, MoR delete folds, partition
  * discovery) over the spooled snapshot, plus APPEND writes through
  * the REST commit protocol — executors stage parquet into the
  * SHARED warehouse (the spool's data/ mount), then ONE POST asks the
  * catalog service to commit the staged set (Iceberg's REST-commit
  * division of labor: data never proxies through the catalog, the
  * metadata authority never leaves it). Everything else — overwrite,
  * row-level ops, DDL, streaming — refuses toward the owning catalog:
  * those operations rewrite history, and history belongs to the
  * metadata authority, not to a spool snapshot of it. */
private[rest] class RestReadTable(spool: TableRef, tableSchema: StructType,
    catalogName: String, ident: Identifier, uri: String,
    http: java.net.http.HttpClient)
  extends IceLiteTable(spool, tableSchema) {
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = s"$catalogName.${ident.namespace.head}.${ident.name}"

  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava

  private def refuse(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op refused: ${name()} is a REST attachment (append-only " +
        "writes via the commit protocol); run this through the " +
        "warehouse's owning catalog")

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder = {
    require(org.apache.spark.sql.SparkSession.active.conf
        .getOption("spark.wap.branch").forall(_.isEmpty),
      "spark.wap.branch is set — branch staging commits through the " +
        "owning catalog, not the REST face")
    // plain WriteBuilder (no SupportsTruncate/SupportsOverwrite): the
    // analyzer itself refuses INSERT OVERWRITE/truncate natively
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new RestBatchWrite(spool, info.schema(),
              s"$uri/namespaces/${ident.namespace.head}/tables/${ident.name}/commit-staged",
              http)
        }
    }
  }
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo): org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    refuse("row-level operation")
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = false
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    refuse("DELETE")
  override def createPartition(ident: org.apache.spark.sql.catalyst.InternalRow,
      properties: JMap[String, String]): Unit = refuse("ADD PARTITION")
  override def dropPartition(ident: org.apache.spark.sql.catalyst.InternalRow): Boolean =
    refuse("DROP PARTITION")
}

/** Executors stage one parquet file per non-empty input partition into
  * the SHARED warehouse through the spool's data/ mount (same staging
  * layout as the local writer — pre-commit files are invisible and
  * orphan-GC-able); the driver's commit is ONE POST to the catalog
  * service, which CAS-commits the staged set with footer-derived
  * stats. Concurrent remote and local appenders rebase through the
  * same CAS — nobody's snapshot is lost. */
private[rest] class RestBatchWrite(spool: graft.icelite.TableRef,
    schema: StructType, commitUrl: String, http: java.net.http.HttpClient)
  extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._
  private implicit val formats: org.json4s.Formats =
    Serialization.formats(org.json4s.NoTypeHints)
  private val token = java.util.UUID.randomUUID.toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(spool.dataDir.resolve(token))
    new graft.sources.IceLiteWriterFactory(
      spool.dataDir.resolve(token).toString,
      schema.fields.map(f => (f.name, f.dataType)))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case graft.sources.IceLiteCommitMessage(name) if name != null =>
        s"data/$token/$name"
    }.toSeq.sorted
    if (files.isEmpty) return // empty append: no snapshot
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(URI.create(commitUrl))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          Serialization.write(Map("files" -> files)))).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw new RestCatalogException(
      resp.statusCode(),
      s"REST commit failed (${resp.statusCode()}): ${resp.body()}")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = spool.dataDir.resolve(token)
    if (Files.exists(dir)) {
      graft.icelite.IceLite.listDir(Files.list(dir))(_.toSeq)
        .foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(dir)
    }
  }
}
