package graft.icelite

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The storage seam under IceLite's METADATA layer — every operation
  * the commit protocol and manifest machinery performs on storage,
  * and nothing else.
  *
  * Why it exists: the reference's storage layer is an object store
  * (S3/MinIO — variables.tf:38-48, scripts/extract_load.py:7-12), and
  * at 100 TB there is no shared POSIX filesystem. The local impl
  * below uses java.nio with a HARD-LINK create-if-absent as the CAS
  * primitive; an object-store impl maps each contract onto store
  * semantics instead of pretending a filesystem:
  *
  *  - `claim(target, tmp)` — the commit-protocol primitive: publish
  *    `tmp`'s fully-written content at `target` IFF nothing exists
  *    there, atomically, returning whether we won. Local: hard link
  *    (EEXIST = lost). S3: conditional PUT with `If-None-Match: *`
  *    (supported natively since 2024; on stores without it, a
  *    catalog-side CAS — DynamoDB conditional write, or the REST
  *    catalog's swap — owns the claim and the store holds only
  *    immutable content, which is exactly Iceberg's architecture).
  *  - `replaceAtomic(target, tmp)` — last-writer-wins swap of a
  *    SINGLE object (views, sidecar indexes). Local: atomic rename.
  *    S3: plain PUT (object replace is atomic per key).
  *  - `writeString`/`readString` — immutable content objects
  *    (segments, staged tmp files). Readers may assume a visible
  *    object is complete: locally tmp files are fully written before
  *    link/rename; on S3 a PUT is visible only when complete.
  *  - `list(dir)` — one-level listing. Local: Files.list. S3: LIST
  *    by prefix with '/' delimiter. Manifest discovery does a max()
  *    over this — O(versions), bounded by expireMetadata.
  *  - `delete`/`exists`/`mkdirs` — direct equivalents (mkdirs is a
  *    no-op on object stores; prefixes need no creation).
  *
  * DATA file READS and WRITES deliberately do NOT go through this
  * trait: they are written by Spark's parquet writer and read by
  * Spark's scans, which already run on Hadoop FileSystem connectors
  * (s3a/abfs/gs at cluster scale, file:// here) — re-abstracting them
  * would duplicate an abstraction Spark owns. Data file REGISTRATION
  * (linking an existing immutable file under a table-owned name —
  * add_files' zero-copy migration, table RENAME's data carry-over)
  * does route through `linkOrCopy`, because it is a metadata-layer
  * storage op with a real object-store mapping (server-side copy).
  *
  * The instance is swappable (IceLite.io) so specs can wrap the local
  * impl with fault injection or op counters; production code never
  * mutates it.
  */
private[graft] trait FileIO {
  def readString(p: Path): String
  def writeString(p: Path, s: String): Unit
  /** Publish tmp's content at target iff target is absent; atomic;
    * true = this caller won the claim. Callers delete tmp afterward
    * either way. */
  def claim(target: Path, tmp: Path): Boolean
  /** Replace (or create) target with tmp's content atomically;
    * consumes tmp. */
  def replaceAtomic(target: Path, tmp: Path): Unit
  def exists(p: Path): Boolean
  def delete(p: Path): Boolean
  def list(dir: Path): Seq[Path]
  def mkdirs(p: Path): Unit
  /** Object age, for orphan-sweep grace windows (Iceberg's
    * orphan-cleanup age rule). Local: mtime. S3: LastModified. */
  def mtimeMs(p: Path): Long
  /** Byte length of an immutable metadata object. Default reads the
    * content (correct through any impl); stores with a cheap stat
    * override it — the $manifests census wants O(1), not a full
    * segment read per row. */
  def sizeBytes(p: Path): Long =
    readString(p).getBytes("UTF-8").length.toLong
  /** Register the IMMUTABLE object at `src` under a second name `dst`
    * without rewriting bytes where the store allows it — the zero-copy
    * registration primitive behind add_files (d63) and table RENAME.
    * Local: hard link (a new directory entry; cross-device falls back
    * to a byte copy). S3: server-side CopyObject — no client egress,
    * and the cheapest registration a store offers (real Iceberg
    * sidesteps even that by recording absolute source URIs in the
    * manifest, which a relative-path manifest cannot). `src` must be
    * fully written and never mutated afterward; `dst` must not exist. */
  def linkOrCopy(dst: Path, src: Path): Unit
}

/** java.nio implementation — the sandbox/laptop deployment. The CAS
  * claim is `Files.createLink`: atomic on every POSIX filesystem,
  * EEXIST tells the loser apart reliably (unlike rename, which
  * silently replaces). */
private[graft] object LocalFileIO extends FileIO {
  override def readString(p: Path): String = Files.readString(p)
  override def writeString(p: Path, s: String): Unit = {
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, s)
  }
  override def claim(target: Path, tmp: Path): Boolean =
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  override def replaceAtomic(target: Path, tmp: Path): Unit =
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  override def exists(p: Path): Boolean = Files.exists(p)
  override def delete(p: Path): Boolean = Files.deleteIfExists(p)
  override def list(dir: Path): Seq[Path] =
    if (!Files.exists(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }
  override def mkdirs(p: Path): Unit = Files.createDirectories(p)
  override def mtimeMs(p: Path): Long =
    Files.getLastModifiedTime(p).toMillis
  override def sizeBytes(p: Path): Long = Files.size(p)
  override def linkOrCopy(dst: Path, src: Path): Unit = {
    if (dst.getParent != null) Files.createDirectories(dst.getParent)
    try Files.createLink(dst, src)
    catch { case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
      Files.copy(src, dst) // cross-device: copy is the only option
    }
  }
}
