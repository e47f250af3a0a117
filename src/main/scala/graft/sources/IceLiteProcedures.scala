package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.icelite.{IceLite, TableRef}

/** d44: SQL MAINTENANCE PROCEDURES — the `CALL cat.system.<proc>(...)`
  * face of the engine's table-maintenance loop (Iceberg's Spark
  * procedures: `rewrite_data_files`, `expire_snapshots`,
  * `rollback_to_snapshot`, `remove_orphan_files`; the reference runs
  * the same loop through Trino's `ALTER TABLE ... EXECUTE` and
  * `expire_snapshots` calls, extract_load.py:164-178). Each procedure
  * binds by position or name (`table => 'ns.t'`), runs the
  * corresponding IceLite operation, and returns its witness row
  * through a driver-local scan (LocalScan — procedure results are
  * metadata-sized by construction).
  *
  * The steady-state 100 TB maintenance loop is therefore plain SQL:
  * append small files all day, `CALL system.compact(...)` nightly,
  * `CALL system.expire_snapshots(...)` after retention,
  * `CALL system.gc_orphans(...)` to reclaim dead bytes — no JVM
  * client needed, exactly how a warehouse team operates Iceberg.
  */
object IceLiteProcedures {
  val names: Seq[String] = Seq("compact", "compact_range",
    "rewrite_zorder", "expire_snapshots", "expire_retain_last",
    "rollback_to_snapshot", "gc_orphans", "publish_branch",
    "cherrypick_snapshot", "drop_branch", "analyze", "expire_metadata",
    "add_files", "check_views", "rewrite_data_files",
    "remove_orphan_files")

  /** Iceberg's canonical procedure names, aliased to the engine's
    * own — a user migrating from the reference stack types these. */
  private val aliases = Map(
    "rewrite_data_files" -> "compact",
    "remove_orphan_files" -> "gc_orphans")

  def apply(warehouse: String, catName: String,
      name: String): Option[UnboundProcedure] =
    aliases.getOrElse(name, name) match {
      case "compact" => Some(new Proc("compact",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("target_files", IntegerType)
            .defaultValue("1").build()),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val snap = IceLite.compact(SparkSession.active,
            refOf(warehouse, in.getUTF8String(0).toString), in.getInt(1))
          Array(Array[Any](snap.id, snap.files.size.toLong))
        }
      })
      // d73 follow-on: the eq-live maintenance signal — how many
      // equality-delete sidecars (and keys) every reader currently
      // folds at planning, and whether that depth warrants a
      // compact() (Iceberg surfaces the same health signal through
      // its delete-file metadata tables)
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
          val (sidecars, keys) = IceLite.eqLiveDepth(
            refOf(warehouse, in.getUTF8String(0).toString))
          Array(Array[Any](sidecars.toLong, keys,
            keys > in.getInt(1).toLong))
        }
      })
      // d55: Iceberg's `rewrite_data_files(where => ...)` — compact
      // ONLY the files intersecting a stats range on one column; the
      // rest of the table stays byte-identical
      case "compact_range" => Some(new Proc("compact_range",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("col", StringType).build(),
          ProcedureParameter.in("lo", DoubleType).build(),
          ProcedureParameter.in("hi", DoubleType).build(),
          ProcedureParameter.in("target_files", IntegerType)
            .defaultValue("1").build()),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val snap = IceLite.compactRange(SparkSession.active,
            refOf(warehouse, in.getUTF8String(0).toString),
            in.getUTF8String(1).toString, in.getDouble(2), in.getDouble(3),
            in.getInt(4))
          Array(Array[Any](snap.id, snap.files.size.toLong))
        }
      })
      // d59: Iceberg's `rewrite_data_files(sort_order => zorder(..))`
      // — recluster the whole table on the Morton interleave of two
      // columns so conjunctive range predicates prune files again
      case "rewrite_zorder" => Some(new Proc("rewrite_zorder",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("col1", StringType).build(),
          ProcedureParameter.in("col2", StringType).build(),
          ProcedureParameter.in("target_files", IntegerType)
            .defaultValue("8").build()),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val snap = IceLite.rewriteZOrder(SparkSession.active,
            refOf(warehouse, in.getUTF8String(0).toString),
            in.getUTF8String(1).toString, in.getUTF8String(2).toString,
            in.getInt(3))
          Array(Array[Any](snap.id, snap.files.size.toLong))
        }
      })
      case "expire_snapshots" =>
        // Iceberg's canonical signature is (table, older_than
        // TIMESTAMP) — the form the reference calls VERBATIM
        // (extract_load.py:171: `CALL …expire_snapshots('src.t',
        // TIMESTAMP '…')`). The epoch-ms long form predates it here
        // and stays accepted: bind dispatches on the ACTUAL second
        // argument type (InternalRow carries timestamps as micros).
        def expireProc(tsForm: Boolean): Proc = new Proc("expire_snapshots",
          Array(
            ProcedureParameter.in("table", StringType).build(),
            ProcedureParameter.in(if (tsForm) "older_than" else "older_than_ms",
              if (tsForm) org.apache.spark.sql.types.TimestampType
              else LongType).build()),
          StructType(Seq(
            StructField("expired_snapshots", LongType, nullable = false)))) {
          override def run(in: InternalRow): Array[Array[Any]] = {
            val cutoffMs =
              if (tsForm) in.getLong(1) / 1000L else in.getLong(1)
            val expired = IceLite.expireSnapshots(
              refOf(warehouse, in.getUTF8String(0).toString), cutoffMs)
            Array(Array[Any](expired.size.toLong))
          }
          override def bind(inputType: StructType): BoundProcedure =
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
        override def run(in: InternalRow): Array[Array[Any]] = {
          val expired = IceLite.expireSnapshotsRetainLast(
            refOf(warehouse, in.getUTF8String(0).toString), in.getInt(1))
          Array(Array[Any](expired.size.toLong))
        }
      })
      case "rollback_to_snapshot" => Some(new Proc("rollback_to_snapshot",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType).build()),
        StructType(Seq(
          StructField("new_snapshot_id", LongType, nullable = false),
          StructField("restored_snapshot_id", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val restoredFrom = in.getLong(1)
          val snap = IceLite.rollback(
            refOf(warehouse, in.getUTF8String(0).toString), restoredFrom)
          Array(Array[Any](snap.id, restoredFrom))
        }
      })
      // d60: WAP branch lifecycle — the publish/reject halves of the
      // write-audit-publish loop, SQL-callable so the audit job needs
      // no JVM API access (Iceberg's fast_forward role)
      case "publish_branch" => Some(new Proc("publish_branch",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("published_snapshot_id", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val snap = IceLite.publish(
            refOf(warehouse, in.getUTF8String(0).toString),
            in.getUTF8String(1).toString)
          Array(Array[Any](snap.id))
        }
      })
      // d65: the non-fast-forward publish — re-apply the branch's
      // append delta onto an advanced main (Iceberg's
      // cherrypick_snapshot role; publish refuses exactly this case)
      case "cherrypick_snapshot" => Some(new Proc("cherrypick_snapshot",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("published_snapshot_id", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val snap = IceLite.cherrypick(
            refOf(warehouse, in.getUTF8String(0).toString),
            in.getUTF8String(1).toString)
          Array(Array[Any](snap.id))
        }
      })
      case "drop_branch" => Some(new Proc("drop_branch",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("dropped", BooleanType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          IceLite.dropBranch(refOf(warehouse, in.getUTF8String(0).toString),
            in.getUTF8String(1).toString)
          Array(Array[Any](true))
        }
      })
      // d62: bound manifest-version growth (Iceberg's
      // previous-versions-max role) — superseded version files have
      // no reader and never shorten time-travel history
      case "expire_metadata" => Some(new Proc("expire_metadata",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_last", IntegerType)
            .defaultValue("10").build()),
        StructType(Seq(
          StructField("versions_deleted", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val deleted = IceLite.expireMetadata(
            refOf(warehouse, in.getUTF8String(0).toString), in.getInt(1))
          Array(Array[Any](deleted.size.toLong))
        }
      })
      // d61: ANALYZE — fold per-column NDV sketches in one pass and
      // commit them to the table metadata (Iceberg puffin / Trino
      // ANALYZE role); returns one (col, ndv) witness row per column
      case "analyze" => Some(new Proc("analyze",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("cols", StringType).build()),
        StructType(Seq(
          StructField("col", StringType, nullable = false),
          StructField("ndv", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val cols = in.getUTF8String(1).toString.split(',').map(_.trim).toSeq
          val snap = IceLite.analyze(SparkSession.active,
            refOf(warehouse, in.getUTF8String(0).toString), cols)
          cols.map(c => Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(c),
            snap.summary(s"ndv.$c").toLong)).toArray
        }
      })
      // d63: zero-copy migration — register an external directory's
      // parquet files into the table (Iceberg's add_files procedure);
      // hard links + footer stats, no data rewrite
      case "add_files" => Some(new Proc("add_files",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("source_dir", StringType).build()),
        StructType(Seq(
          StructField("snapshot_id", LongType, nullable = false),
          StructField("added_files", LongType, nullable = false),
          StructField("added_rows", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val dir = java.nio.file.Paths.get(in.getUTF8String(1).toString)
          val sources = IceLite.listDir(java.nio.file.Files.list(dir))(_
            .map(p => p)
            .filter(p => p.getFileName.toString.endsWith(".parquet") &&
              !p.getFileName.toString.startsWith("."))
            .toSeq.sortBy(_.getFileName.toString))
          val ref = refOf(warehouse, in.getUTF8String(0).toString)
          val before =
            if (IceLite.tableExists(ref)) IceLite.readManifest(ref).current.rowCount
            else 0L
          val snap = IceLite.addFiles(ref, sources)
          Array(Array[Any](snap.id, sources.size.toLong, snap.rowCount - before))
        }
      })
      // View health (round-8 verdict task #6): a view stores SQL TEXT,
      // so a table rename (d81 — admin-op semantics, references are
      // NOT rewritten) or a DROP breaks it only at READ time. This is
      // Iceberg stored-SQL behavior, but a dbt operator wants the
      // breakage visible at rename time, not at 2am — one CALL lists
      // every view whose body no longer analyzes, with the analyzer's
      // error. Each view re-analyzes through the SAME expansion path
      // reads use (expandView: stored-context qualification, nested
      // views, CTE re-substitution), so "ok" here means exactly
      // "a SELECT would succeed". Metadata-sized: O(views) analyses,
      // no data pages touched.
      case "check_views" => Some(new Proc("check_views",
        Array(
          ProcedureParameter.in("namespace", StringType)
            .defaultValue("''").build()),
        StructType(Seq(
          StructField("namespace", StringType, nullable = false),
          StructField("view", StringType, nullable = false),
          StructField("ok", BooleanType, nullable = false),
          StructField("error", StringType, nullable = true)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val spark = SparkSession.active
          val nsArg = in.getUTF8String(0).toString
          val nss =
            if (nsArg.nonEmpty) Seq(nsArg)
            else IceLite.listNamespaces(warehouse)
          val cat = org.apache.spark.sql.graft.Bridge
            .catalogPlugin(spark, catName)
            .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
          val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString _
          (for {
            ns <- nss
            view <- IceLiteViews.list(warehouse, ns)
          } yield {
            val err =
              try {
                val plan = GraftViewCommands.expandView(
                  spark, catName, cat, ns, view, Set.empty)
                org.apache.spark.sql.graft.Bridge.ofRows(spark, plan)
                None
              } catch { case e: Throwable =>
                Some(Option(e.getMessage).getOrElse(e.getClass.getName)
                  .linesIterator.take(1).mkString.take(300))
              }
            Array[Any](utf8(ns), utf8(view), err.isEmpty,
              err.map(utf8).orNull)
          }).toArray
        }
      })
      case "gc_orphans" => Some(new Proc("gc_orphans",
        Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("grace_ms", LongType)
            .defaultValue("3600000").build()),
        StructType(Seq(
          StructField("orphans_deleted", LongType, nullable = false)))) {
        override def run(in: InternalRow): Array[Array[Any]] = {
          val deleted = IceLite.gcOrphans(
            refOf(warehouse, in.getUTF8String(0).toString), in.getLong(1))
          Array(Array[Any](deleted.size.toLong))
        }
      })
      case _ => None
    }

  private def refOf(warehouse: String, table: String): TableRef = {
    val parts = table.split('.')
    require(parts.length == 2,
      s"procedure table arguments are 'namespace.table', got '$table'")
    TableRef(warehouse, parts(0), parts(1))
  }

  /** One procedure = one class: unbound and bound are the same object
    * (parameters are static; bind() is the identity). The maintenance
    * action runs in call() on the driver; its witness rows come back
    * as a LocalScan. */
  /** Shared with the REST attachment's procedure face (d80). */
  private[graft] abstract class Proc(procName: String,
      params: Array[ProcedureParameter], resultSchema: StructType)
    extends UnboundProcedure with BoundProcedure {
    def run(in: InternalRow): Array[Array[Any]]

    override def name(): String = procName
    override def description(): String = s"icelite maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = run(input).map(r =>
        InternalRow.fromSeq(r.toIndexedSeq): InternalRow)
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
        override def description(): String = s"IceLiteProcedureResult $procName"
      }).iterator()
    }
  }
}
