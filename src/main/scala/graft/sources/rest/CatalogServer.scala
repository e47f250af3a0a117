package graft.sources.rest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization
import graft.icelite.{IceLite, TableRef}

/** A REST catalog face over an IceLite warehouse — the role the
  * Iceberg REST catalog plays in the reference stack, where ONE
  * catalog service serves Spark and Trino concurrently over HTTP
  * while the engines share the storage layer
  * (docker-compose.yml:3-29 runs the REST catalog container;
  * iceberg-template.properties:8-9 points Trino at its uri; the
  * engines share MinIO). Same architecture here: this server owns
  * METADATA over HTTP — namespaces, table listings, the current
  * manifest — and any engine with access to the shared warehouse
  * path reads the data files directly. Out-of-process clients (the
  * multi-engine case) attach with nothing but the uri.
  *
  * Endpoints (JSON):
  *   GET  /v1/config                                → {warehouse}
  *   GET  /v1/namespaces                            → {namespaces:[..]}
  *   POST /v1/namespaces/{ns}                       → create
  *   GET  /v1/namespaces/{ns}/tables                → {tables:[..]}
  *   GET  /v1/namespaces/{ns}/tables/{t}            → {version, manifest}
  *
  * The manifest travels as the LEGACY single-JSON layout (assembled
  * from the sharded pointer server-side), so a client can spool it
  * as-is and every IceLite reader decodes it — the wire format is
  * version-stable even as the on-disk layout shards. Metadata-sized
  * responses only; data bytes never cross this server.
  *
  * Single-threaded handler (JDK HttpServer default executor) is
  * deliberate: every request is a metadata read measured in
  * microseconds-to-milliseconds; at real scale this component scales
  * the way the reference's does — by fronting the catalog service,
  * not by fanning data through it.
  */
private[rest] final case class CommitStagedReq(files: Seq[String])

class CatalogServer(warehouse: String, port: Int = 0) {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)
  val requests = new AtomicLong(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** The bound uri (port resolved when `port = 0`). */
  def uri: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1"

  /** URL path segments become filesystem path components (TableRef,
    * view files) — whitelist identifier shapes so `..`, separators,
    * or hidden-file prefixes can never address outside the warehouse
    * (the 127.0.0.1 bind is not a sufficient guard: any local process
    * can reach this port). */
  private val IdentRe = "[A-Za-z0-9_][A-Za-z0-9_.-]*".r
  private def validIdent(s: String): Boolean =
    IdentRe.matches(s) && !s.contains("..")

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/v1", (ex: HttpExchange) => {
    requests.incrementAndGet()
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1").stripPrefix("/")
      val parts = path.split('/').filter(_.nonEmpty).toSeq
      // every segment that names a namespace/table/view must be a
      // plain identifier; route keywords pass trivially
      if (!parts.forall(validIdent))
        send(ex, 400, s"""{"error":"invalid identifier in path"}""")
      else (ex.getRequestMethod, parts) match {
        case ("GET", Seq("config")) =>
          send(ex, 200, Serialization.write(Map("warehouse" -> warehouse)))
        case ("GET", Seq("namespaces")) =>
          send(ex, 200, Serialization.write(
            Map("namespaces" -> IceLite.listNamespaces(warehouse))))
        case ("POST", Seq("namespaces", ns)) =>
          IceLite.createNamespace(warehouse, ns)
          send(ex, 200, "{}")
        case ("GET", Seq("namespaces", ns, "tables")) =>
          if (!IceLite.listNamespaces(warehouse).contains(ns))
            send(ex, 404, s"""{"error":"no namespace $ns"}""")
          else send(ex, 200, Serialization.write(
            Map("tables" -> IceLite.listTables(warehouse, ns))))
        case ("GET", Seq("namespaces", ns, "tables", t)) =>
          val ref = TableRef(warehouse, ns, t)
          if (!IceLite.tableExists(ref))
            send(ex, 404, s"""{"error":"no table $ns.$t"}""")
          else {
            val (version, manifest) = IceLite.currentManifestVersioned(ref)
            send(ex, 200, Serialization.write(Map(
              "version" -> version,
              "manifest" -> IceLite.manifestWireJson(manifest))))
          }
        // the WRITE protocol: a remote engine stages parquet into the
        // SHARED warehouse itself (data is never proxied), then asks
        // the catalog service to turn the staged set into one CAS
        // snapshot — the metadata authority stays here, exactly
        // Iceberg's REST-commit division of labor. Stats and row
        // counts come from the staged footers server-side.
        case ("POST", Seq("namespaces", ns, "tables", t, "commit-staged")) =>
          val ref = TableRef(warehouse, ns, t)
          if (!IceLite.tableExists(ref))
            send(ex, 404, s"""{"error":"no table $ns.$t"}""")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            val req = Serialization.read[CommitStagedReq](body)
            require(req.files.nonEmpty, "commit-staged needs staged files")
            require(req.files.forall(f => f.startsWith("data/") &&
              !f.contains("..")), "staged paths must be table-relative data/ files")
            val snap = IceLite.commitStaged(ref, req.files, truncate = false)
            send(ex, 200, Serialization.write(Map(
              "snapshotId" -> snap.id, "rowCount" -> snap.rowCount)))
          }
        // views travel as their stored definition — SQL text + the
        // re-resolution context (d74's persistence, wire-faced)
        case ("GET", Seq("namespaces", ns, "views")) =>
          if (!IceLite.listNamespaces(warehouse).contains(ns))
            send(ex, 404, s"""{"error":"no namespace $ns"}""")
          else send(ex, 200, Serialization.write(
            Map("views" -> graft.sources.IceLiteViews.list(warehouse, ns))))
        case ("GET", Seq("namespaces", ns, "views", v)) =>
          graft.sources.IceLiteViews.load(warehouse, ns, v) match {
            case None => send(ex, 404, s"""{"error":"no view $ns.$v"}""")
            case Some(vd) => send(ex, 200, Serialization.write(vd))
          }
        case (m, p) =>
          send(ex, 404, s"""{"error":"no route $m /${p.mkString("/")}"}""")
      }
    } catch {
      case e: Exception =>
        send(ex, 500, Serialization.write(Map(
          "error" -> Option(e.getMessage).getOrElse(e.getClass.getName))))
    } finally ex.close()
  })

  def start(): CatalogServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
