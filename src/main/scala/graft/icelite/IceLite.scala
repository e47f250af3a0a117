package graft.icelite

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** "IceLite" — a minimal snapshot/manifest table layer over the local
  * filesystem, replacing the role Iceberg plays in the reference
  * (catalog + snapshots + atomic writes + expiry:
  * /root/reference/scripts/extract_load.py:42-51, 94-110, 167-171).
  * See SURVEY.md §7.3.
  *
  * Layout: `warehouse/<namespace>/<table>/manifest.json` + staged
  * Parquet files under `data/`. Every write creates a new snapshot;
  * commit is an atomic rename of `manifest.json.tmp` onto
  * `manifest.json` (single-writer, the same guarantee level the
  * reference's one-driver job relies on). Reads resolve the current
  * (or a time-travelled) snapshot to a concrete file list *before*
  * plan construction, so Catalyst sees ordinary Parquet relations and
  * all pushdown/pruning machinery applies unchanged.
  *
  * At cluster scale the manifest would live on shared storage (S3/
  * HDFS) — the commit protocol (write-new, rename-swap) is the same
  * one Iceberg's REST catalog provides transactionally; file listings
  * here are O(snapshot count + file count), driver-side metadata only.
  */
/** Per-file numeric column range, the manifest-level pruning stat
  * (Iceberg's min/max file-skipping role, SURVEY §4.2). */
final case class ColStats(col: String, min: Double, max: Double)

final case class Snapshot(
    id: Long,
    timestampMs: Long,
    operation: String,            // "create" | "replace" | "append"
    files: Seq[String],           // data files, relative to table dir
    rowCount: Long,
    fileStats: Map[String, Seq[ColStats]] = Map.empty)

final case class Manifest(
    table: String,
    currentSnapshotId: Long,
    snapshots: Seq[Snapshot]) {
  def current: Snapshot = snapshots.find(_.id == currentSnapshotId).get
}

final case class TableRef(warehouse: String, namespace: String, name: String) {
  def nsDir: Path = Paths.get(warehouse, namespace)
  def dir: Path = nsDir.resolve(name)
  def dataDir: Path = dir.resolve("data")
  def manifestPath: Path = dir.resolve("manifest.json")
}

object IceLite {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  /** Drain a java.nio directory stream and CLOSE it — Files.list/walk
    * hold an open directory handle until closed (FD leak otherwise). */
  def listDir[A](stream: java.util.stream.Stream[Path])(f: Iterator[Path] => A): A =
    try f(stream.iterator().asScala) finally stream.close()

  /** a08: CREATE NAMESPACE IF NOT EXISTS (extract_load.py:79). */
  def createNamespace(warehouse: String, namespace: String): Unit =
    Files.createDirectories(Paths.get(warehouse, namespace))

  def listNamespaces(warehouse: String): Seq[String] = {
    val w = Paths.get(warehouse)
    if (!Files.exists(w)) Seq.empty
    else listDir(Files.list(w))(_.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted)
  }

  /** a09: table-exists check (extract_load.py:84-91). */
  def tableExists(ref: TableRef): Boolean = Files.exists(ref.manifestPath)

  def listTables(warehouse: String, namespace: String): Seq[String] = {
    val ns = Paths.get(warehouse, namespace)
    if (!Files.exists(ns)) Seq.empty
    else listDir(Files.list(ns))(_
      .filter(d => Files.exists(d.resolve("manifest.json")))
      .map(_.getFileName.toString).toSeq.sorted)
  }

  def readManifest(ref: TableRef): Manifest =
    Serialization.read[Manifest](Files.readString(ref.manifestPath))

  /** Atomic commit: serialize to manifest.json.tmp, rename over
    * manifest.json (same-directory rename is atomic on POSIX). */
  private def commit(ref: TableRef, m: Manifest): Unit = {
    val tmp = ref.dir.resolve("manifest.json.tmp")
    Files.writeString(tmp, Serialization.writePretty(m))
    Files.move(tmp, ref.manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Stage the DataFrame as Parquet files under data/<snapshotId>/ and
    * return their table-relative paths. */
  private def stage(ref: TableRef, df: DataFrame, snapshotId: Long): Seq[String] = {
    val outDir = ref.dataDir.resolve(snapshotId.toString)
    df.write.mode("overwrite").parquet(outDir.toString)
    listDir(Files.list(outDir))(_
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq.sorted)
      .map(n => s"data/$snapshotId/$n")
  }

  private def nextSnapshotId(ref: TableRef): Long =
    if (tableExists(ref)) readManifest(ref).snapshots.map(_.id).max + 1 else 1L

  /** Collect per-file min/max for the requested numeric columns (one
    * tiny aggregate job per staged file — metadata-sized results). */
  private def collectStats(spark: SparkSession, ref: TableRef,
      files: Seq[String], statsCols: Seq[String]): Map[String, Seq[ColStats]] =
    if (statsCols.isEmpty) Map.empty
    else files.map { f =>
      import org.apache.spark.sql.functions.{max => fmax, min => fmin, col}
      val aggs = statsCols.flatMap(c =>
        Seq(fmin(col(c)).cast("double"), fmax(col(c)).cast("double")))
      val row = spark.read.parquet(ref.dir.resolve(f).toString)
        .agg(aggs.head, aggs.tail: _*).collect().head
      // empty files / all-null columns have null min/max: record no
      // stat (the file is then conservatively kept by pruning)
      f -> statsCols.zipWithIndex.flatMap { case (c, i) =>
        if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) None
        else Some(ColStats(c, row.getDouble(2 * i), row.getDouble(2 * i + 1))) }
    }.toMap

  /** a10: atomic full refresh — new snapshot referencing only the new
    * files (extract_load.py:94-98 createOrReplace). `statsCols`
    * captures per-file min/max for manifest-level pruning. */
  def createOrReplace(ref: TableRef, df: DataFrame,
      statsCols: Seq[String] = Nil): Snapshot = {
    Files.createDirectories(ref.dataDir)
    val id = nextSnapshotId(ref)
    val files = stage(ref, df, id)
    val rows = readFiles(df.sparkSession, ref, files).count()
    val stats = collectStats(df.sparkSession, ref, files, statsCols)
    val op = if (tableExists(ref)) "replace" else "create"
    val snap = Snapshot(id, System.currentTimeMillis(), op, files, rows, stats)
    val prior = if (tableExists(ref)) readManifest(ref).snapshots else Seq.empty
    commit(ref, Manifest(ref.name, id, prior :+ snap))
    snap
  }

  /** a11: append — new snapshot = previous files + new files; create
    * on first load (extract_load.py:100-110). */
  def append(ref: TableRef, df: DataFrame,
      statsCols: Seq[String] = Nil): Snapshot = {
    if (!tableExists(ref)) return createOrReplace(ref, df, statsCols)
    val m = readManifest(ref)
    val id = nextSnapshotId(ref)
    val newFiles = stage(ref, df, id)
    val rows = readFiles(df.sparkSession, ref, newFiles).count()
    val stats = collectStats(df.sparkSession, ref, newFiles, statsCols)
    val snap = Snapshot(id, System.currentTimeMillis(), "append",
      m.current.files ++ newFiles, m.current.rowCount + rows,
      m.current.fileStats ++ stats)
    commit(ref, Manifest(ref.name, id, m.snapshots :+ snap))
    snap
  }

  /** Manifest-level file pruning: resolve only the files whose
    * [min,max] range for `col` intersects [lo,hi]; files without
    * stats are conservatively kept. Pruning happens BEFORE plan
    * construction — Catalyst then adds row-group/page-level skipping
    * on what remains. At 100 TB this is the difference between
    * listing every file and touching only the matching partitions. */
  def prunedFiles(ref: TableRef, col: String, lo: Double, hi: Double): Seq[String] = {
    val snap = readManifest(ref).current
    snap.files.filter { f =>
      snap.fileStats.get(f) match {
        case Some(stats) => stats.find(_.col == col) match {
          case Some(cs) => cs.max >= lo && cs.min <= hi
          case None => true
        }
        case None => true
      }
    }
  }

  /** Read with manifest pruning + the residual filter applied. */
  def readPruned(spark: SparkSession, ref: TableRef,
      col: String, lo: Double, hi: Double): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val files = prunedFiles(ref, col, lo, hi)
    if (files.isEmpty) {
      // preserve schema: read current snapshot's empty slice
      read(spark, ref).where(c(col) >= lo && c(col) <= hi).limit(0)
    } else readFiles(spark, ref, files).where(c(col) >= lo && c(col) <= hi)
  }

  // mergeSchema: appends may evolve the schema (Iceberg v2 semantics,
  // extract_load.py inherits this through format-version=2); older
  // files surface null for later-added columns
  private def readFiles(spark: SparkSession, ref: TableRef, files: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => ref.dir.resolve(f).toString): _*)

  /** Read the current snapshot (schema-on-read from Parquet footers,
    * like extract_load.py:73). */
  def read(spark: SparkSession, ref: TableRef): DataFrame =
    readAt(spark, ref, readManifest(ref).currentSnapshotId)

  /** Time travel: read the table as of a specific snapshot id. */
  def readAt(spark: SparkSession, ref: TableRef, snapshotId: Long): DataFrame = {
    val m = readManifest(ref)
    val snap = m.snapshots.find(_.id == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $snapshotId in ${ref.name}"))
    if (snap.files.isEmpty) spark.emptyDataFrame
    else readFiles(spark, ref, snap.files)
  }

  /** a12/a13: expire snapshots older than `cutoffMs`, always keeping
    * the current one; delete data files referenced by no surviving
    * snapshot (extract_load.py:167-171; README.md:111 7d variant). */
  def expireSnapshots(ref: TableRef, cutoffMs: Long): Seq[Long] = {
    val m = readManifest(ref)
    val (dead, alive) = m.snapshots.partition(s =>
      s.timestampMs < cutoffMs && s.id != m.currentSnapshotId)
    if (dead.isEmpty) return Seq.empty
    val keepFiles = alive.flatMap(_.files).toSet
    val orphans = dead.flatMap(_.files).toSet -- keepFiles
    commit(ref, m.copy(snapshots = alive))
    orphans.foreach(f => Files.deleteIfExists(ref.dir.resolve(f)))
    dead.map(_.id).sorted
  }
}
