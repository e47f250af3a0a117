package graft.icelite

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The FileIO storage seam: the whole metadata commit protocol
  * (manifest pointers, segments, the CAS claim) runs through one
  * swappable trait, so an object-store backend replaces ONLY the
  * seam, not the table layer. Pinned with a delegating wrapper:
  * per-commit op counts stay O(delta), and a lost claim retries
  * through the protocol without corrupting anything. */
class FileIOSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Counting/fault-injecting wrapper scoped to one warehouse —
    * operations on any other path delegate untouched, so a parallel
    * suite can never be affected. */
  private class Scoped(scopeDir: String) extends FileIO {
    val claims = new AtomicInteger(0)
    val writes = new AtomicInteger(0)
    @volatile var failNextClaims = 0
    private def inScope(p: Path): Boolean = p.toString.startsWith(scopeDir)
    override def readString(p: Path): String = LocalFileIO.readString(p)
    override def writeString(p: Path, s: String): Unit = {
      if (inScope(p)) writes.incrementAndGet()
      LocalFileIO.writeString(p, s)
    }
    override def claim(target: Path, tmp: Path): Boolean = {
      if (inScope(target)) {
        claims.incrementAndGet()
        if (failNextClaims > 0) { failNextClaims -= 1; return false }
      }
      LocalFileIO.claim(target, tmp)
    }
    override def replaceAtomic(target: Path, tmp: Path): Unit =
      LocalFileIO.replaceAtomic(target, tmp)
    override def exists(p: Path): Boolean = LocalFileIO.exists(p)
    override def delete(p: Path): Boolean = LocalFileIO.delete(p)
    override def list(dir: Path): Seq[Path] = LocalFileIO.list(dir)
    override def mkdirs(p: Path): Unit = LocalFileIO.mkdirs(p)
    override def mtimeMs(p: Path): Long = LocalFileIO.mtimeMs(p)
    override def linkOrCopy(dst: Path, src: Path): Unit =
      LocalFileIO.linkOrCopy(dst, src)
  }

  private def withScopedIO[A](f: (Scoped, TableRef) => A): A = {
    val wh = graft.GraftTmp.dir("seam_wh").toString
    IceLite.createNamespace(wh, "src")
    val scoped = new Scoped(wh)
    val prev = IceLite.io
    IceLite.io = scoped
    try f(scoped, TableRef(wh, "src", "t"))
    finally IceLite.io = prev
  }

  test("one commit = one claim + pointer and delta-segment writes only") {
    withScopedIO { (io, ref) =>
      IceLite.createOrReplace(ref, (1L to 10L).map(k => (k, k * 2.0)).toDF("k", "v"))
      assert(io.claims.get == 1, "create must claim exactly once")
      val (c0, w0) = (io.claims.get, io.writes.get)
      IceLite.append(ref, Seq((100L, 1.0)).toDF("k", "v"))
      assert(io.claims.get - c0 == 1, "append must claim exactly once")
      // O(delta): one delta segment + one pointer, never history
      assert(io.writes.get - w0 == 2,
        s"append wrote ${io.writes.get - w0} metadata objects, expected 2 " +
          "(delta segment + pointer)")
    }
  }

  test("a lost claim rebases and retries to a correct commit") {
    withScopedIO { (io, ref) =>
      IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
      io.failNextClaims = 2
      IceLite.append(ref, Seq((2L, "b")).toDF("k", "s"))
      assert(io.claims.get >= 3, "lost claims must retry")
      assert(IceLite.read(spark, ref).count() == 2)
      val m = IceLite.readManifest(ref)
      assert(m.snapshots.size == 2 && m.current.rowCount == 2)
      // no tmp residue from the failed attempts
      assert(IceLite.listDir(Files.list(ref.dir))(_
        .count(_.getFileName.toString.startsWith(".manifest.tmp"))) == 0)
    }
  }
}
