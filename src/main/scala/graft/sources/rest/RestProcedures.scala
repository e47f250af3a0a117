package graft.sources.rest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.json4s.jackson.Serialization
import graft.icelite.IceLite

/** d80: TABLE MAINTENANCE through the REST attachment — the
  * reference's remote engines run the maintenance loop against the
  * shared catalog (Trino's `expire_snapshots` / `ALTER TABLE …
  * EXECUTE` go through the REST catalog service,
  * extract_load.py:164-178), so `CALL remote.system.<proc>` must
  * work here too. The division of labor follows the data:
  *
  *  - METADATA-ONLY procedures (expire_snapshots, expire_retain_last,
  *    expire_metadata, gc_orphans, rollback_to_snapshot,
  *    eq_live_depth) are one POST — the catalog service runs the same
  *    IceLite metadata commit/sweep the owning catalog would, because
  *    that is where the metadata authority lives.
  *  - DATA-REWRITING maintenance (compact) runs CLIENT-side, like
  *    every remote engine's compaction against a real REST catalog:
  *    this attachment reads the snapshot through its own folding scan
  *    (MoR sidecars applied — compaction is the delete materializer),
  *    restages the rewrite into SHARED storage, and ONE POST asks the
  *    service to swap it in, conditioned on the base being unchanged
  *    (a changed base answers 409 and the client recomputes — the
  *    staged bytes are a function of the base, so there is nothing to
  *    rebase server-side). Flat and sorted layouts restage faithfully
  *    (sorted re-range-partitions on the sort key); partition layouts
  *    refuse toward the owning catalog.
  */
private[rest] class RestProcedures(catalog: IceLiteRestCatalog) {
  import graft.sources.IceLiteProcedures.Proc
  private implicit val formats: org.json4s.Formats =
    Serialization.formats(org.json4s.NoTypeHints)

  /** POST a metadata-only procedure; the server answers a flat Long
    * vector the caller reshapes. */
  private def remoteCall(table: String, name: String,
      intArg: Option[Int] = None, longArg: Option[Long] = None): Seq[Long] = {
    val (ns, t) = catalog.splitTable(table)
    (org.json4s.jackson.JsonMethods.parse(
      catalog.postPath(s"/namespaces/$ns/tables/$t/procedure",
        Serialization.write(ProcReq(name, intArg, longArg)))) \ "values")
      .extract[Seq[Long]]
  }

  def apply(name: String): Option[UnboundProcedure] =
    RestProcedures.aliases.getOrElse(name, name) match {
    case "compact" => Some(new Proc("compact",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("target_files", IntegerType)
          .defaultValue("1").build()),
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("n_files", LongType, nullable = false)))) {
      override def run(in: InternalRow): Array[Array[Any]] = {
        val snap = catalog.remoteCompact(in.getUTF8String(0).toString,
          in.getInt(1))
        Array(Array[Any](snap.id, snap.files.size.toLong))
      }
    })
    case "eq_live_depth" => Some(new Proc("eq_live_depth",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("key_threshold", IntegerType)
          .defaultValue("10000").build()),
      StructType(Seq(
        StructField("sidecars", LongType, nullable = false),
        StructField("delete_keys", LongType, nullable = false),
        StructField("compact_recommended", BooleanType, nullable = false)))) {
      override def run(in: InternalRow): Array[Array[Any]] = {
        val vs = remoteCall(in.getUTF8String(0).toString, "eq_live_depth",
          intArg = Some(in.getInt(1)))
        Array(Array[Any](vs(0), vs(1), vs(2) == 1L))
      }
    })
    case "expire_snapshots" =>
      // same dual signature as the owning catalog: Iceberg's
      // TIMESTAMP form (the reference's verbatim call) or epoch ms
      def expireProc(tsForm: Boolean): Proc = new Proc("expire_snapshots",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in(if (tsForm) "older_than" else "older_than_ms",
            if (tsForm) org.apache.spark.sql.types.TimestampType
            else LongType).build()),
        StructType(Seq(
          StructField("expired_snapshots", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val cutoffMs = if (tsForm) in.getLong(1) / 1000L else in.getLong(1)
          Array(Array[Any](remoteCall(in.getUTF8String(0).toString,
            "expire_snapshots", longArg = Some(cutoffMs)).head))
        }
        override def bind(inputType: org.apache.spark.sql.types.StructType)
            : org.apache.spark.sql.connector.catalog.procedures.BoundProcedure =
          expireProc(inputType.fields.lift(1).exists(
            _.dataType == org.apache.spark.sql.types.TimestampType))
      }
      Some(expireProc(tsForm = false))
    case "expire_retain_last" => Some(new Proc("expire_retain_last",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("retain_last", IntegerType).build()),
      StructType(Seq(
        StructField("expired_snapshots", LongType, nullable = false)))) {
      override def run(in: InternalRow): Array[Array[Any]] =
        Array(Array[Any](remoteCall(in.getUTF8String(0).toString,
          "expire_retain_last", intArg = Some(in.getInt(1))).head))
    })
    case "expire_metadata" => Some(new Proc("expire_metadata",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("keep_last", IntegerType)
          .defaultValue("10").build()),
      StructType(Seq(
        StructField("versions_deleted", LongType, nullable = false)))) {
      override def run(in: InternalRow): Array[Array[Any]] =
        Array(Array[Any](remoteCall(in.getUTF8String(0).toString,
          "expire_metadata", intArg = Some(in.getInt(1))).head))
    })
    case "gc_orphans" => Some(new Proc("gc_orphans",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("grace_ms", LongType)
          .defaultValue("3600000").build()),
      StructType(Seq(
        StructField("orphans_deleted", LongType, nullable = false)))) {
      override def run(in: InternalRow): Array[Array[Any]] =
        Array(Array[Any](remoteCall(in.getUTF8String(0).toString,
          "gc_orphans", longArg = Some(in.getLong(1))).head))
    })
    case "rollback_to_snapshot" => Some(new Proc("rollback_to_snapshot",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("snapshot_id", LongType).build()),
      StructType(Seq(
        StructField("new_snapshot_id", LongType, nullable = false),
        StructField("restored_snapshot_id", LongType, nullable = false)))) {
      override def run(in: InternalRow): Array[Array[Any]] = {
        val vs = remoteCall(in.getUTF8String(0).toString, "rollback_to_snapshot",
          longArg = Some(in.getLong(1)))
        Array(Array[Any](vs(0), vs(1)))
      }
    })
    case _ => None
  }
}

private[rest] object RestProcedures {
  val names: Seq[String] = Seq("compact", "eq_live_depth",
    "expire_snapshots", "expire_retain_last", "expire_metadata",
    "gc_orphans", "rollback_to_snapshot",
    "rewrite_data_files", "remove_orphan_files")

  /** Iceberg's canonical names, same mapping as the owning catalog. */
  val aliases = Map(
    "rewrite_data_files" -> "compact",
    "remove_orphan_files" -> "gc_orphans")
}
