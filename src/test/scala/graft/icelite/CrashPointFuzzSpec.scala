package graft.icelite

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CRASH-POINT fuzz of the commit protocol (round-8 verdict task #4):
  * kill the process between EVERY pair of metadata-seam operations —
  * for append, replace, partitioned append, MoR delete, and table
  * RENAME (the most-step protocol: registration, dest claim, source
  * re-check, retire) — over BOTH FileIO impls (local hard-link CAS
  * and the object-store conditional-PUT fake), and assert after each
  * kill:
  *
  *  1. NO TORN STATE: every readable manifest decodes and serves
  *     exactly the pre-state or the post-state rows — never a mix,
  *     never a reference to a missing file (segments land before the
  *     pointer; the pointer claim is atomic; data files are immutable).
  *  2. RECOVERY: if the op did not commit, re-running it (a fresh
  *     process — the in-JVM metadata caches are dropped to simulate
  *     the restart) lands the post state; if it did commit, the state
  *     already IS post.
  *  3. RECLAIM: gc with a zero grace window (crash residue is by
  *     definition past any real grace) leaves no unreferenced data
  *     file, no staged pointer tmp, and the table still reads post.
  *
  * The kill is injected by a delegating FileIO that throws before the
  * Nth in-scope seam op; N sweeps 0,1,2,… until a trial completes
  * crash-free, so every gap in the protocol is exercised without
  * hard-coding its length. */
class CrashPointFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private final class InjectedCrash extends RuntimeException("injected crash")

  /** Seam wrapper: every in-scope op first checks the kill switch.
    * Out-of-scope paths delegate untouched (parallel suites). */
  private final class CrashFileIO(inner: FileIO, scope: String) extends FileIO {
    @volatile var crashAt: Int = Int.MaxValue
    val ops = new java.util.concurrent.atomic.AtomicInteger(0)
    def armed: Boolean = crashAt != Int.MaxValue
    private def tick(p: Path): Unit =
      if (p.toString.startsWith(scope) && ops.incrementAndGet() > crashAt)
        throw new InjectedCrash
    override def readString(p: Path): String = { tick(p); inner.readString(p) }
    override def writeString(p: Path, s: String): Unit = { tick(p); inner.writeString(p, s) }
    override def claim(t: Path, tmp: Path): Boolean = { tick(t); inner.claim(t, tmp) }
    override def replaceAtomic(t: Path, tmp: Path): Unit = { tick(t); inner.replaceAtomic(t, tmp) }
    override def exists(p: Path): Boolean = { tick(p); inner.exists(p) }
    override def delete(p: Path): Boolean = { tick(p); inner.delete(p) }
    override def list(dir: Path): Seq[Path] = { tick(dir); inner.list(dir) }
    override def mkdirs(p: Path): Unit = { tick(p); inner.mkdirs(p) }
    override def mtimeMs(p: Path): Long = { tick(p); inner.mtimeMs(p) }
    override def linkOrCopy(dst: Path, src: Path): Unit = { tick(dst); inner.linkOrCopy(dst, src) }
  }

  /** The object-store fake from ObjectStoreFileIOSpec, reduced to the
    * semantics the protocol may rely on (conditional PUT, blind PUT,
    * prefix LIST — no links, no renames). */
  private final class StoreIO(scope: String) extends FileIO {
    final case class Obj(content: String, mtime: Long)
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Obj]()
    private def in(p: Path): Boolean = p.toString.startsWith(scope)
    override def readString(p: Path): String =
      if (!in(p)) LocalFileIO.readString(p)
      else Option(objects.get(p.toString)).map(_.content).getOrElse(
        throw new java.nio.file.NoSuchFileException(p.toString))
    override def writeString(p: Path, s: String): Unit =
      if (!in(p)) LocalFileIO.writeString(p, s)
      else { objects.put(p.toString, Obj(s, System.currentTimeMillis())); () }
    override def claim(t: Path, tmp: Path): Boolean =
      if (!in(t)) LocalFileIO.claim(t, tmp)
      else objects.putIfAbsent(t.toString,
        Obj(readString(tmp), System.currentTimeMillis())) == null
    override def replaceAtomic(t: Path, tmp: Path): Unit =
      if (!in(t)) LocalFileIO.replaceAtomic(t, tmp)
      else { objects.put(t.toString, Obj(readString(tmp),
        System.currentTimeMillis())); objects.remove(tmp.toString); () }
    override def exists(p: Path): Boolean =
      if (!in(p)) LocalFileIO.exists(p) else objects.containsKey(p.toString)
    override def delete(p: Path): Boolean =
      if (!in(p)) LocalFileIO.delete(p) else objects.remove(p.toString) != null
    override def list(dir: Path): Seq[Path] = {
      val disk = LocalFileIO.list(dir)
      if (!in(dir)) disk
      else {
        val prefix = dir.toString + "/"
        import scala.jdk.CollectionConverters._
        (objects.keySet.asScala.toSeq
          .filter(k => k.startsWith(prefix) && !k.drop(prefix.length).contains('/'))
          .map(java.nio.file.Paths.get(_)) ++ disk).distinct
      }
    }
    override def mkdirs(p: Path): Unit = if (!in(p)) LocalFileIO.mkdirs(p) else ()
    override def mtimeMs(p: Path): Long =
      if (!in(p)) LocalFileIO.mtimeMs(p)
      else Option(objects.get(p.toString)).map(_.mtime).getOrElse(
        throw new java.nio.file.NoSuchFileException(p.toString))
    override def linkOrCopy(dst: Path, src: Path): Unit =
      LocalFileIO.linkOrCopy(dst, src)
  }

  private type Rows = Set[(Long, String)]

  private def readRows(ref: TableRef): Option[Rows] =
    if (!IceLite.tableExists(ref)) None
    else Some(IceLite.read(spark, ref).select("k", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet)

  /** Every data/delete/eq file and every pointer segment a surviving
    * manifest references must exist — the "no snapshot references a
    * missing file" invariant. */
  private def assertNoDangling(ref: TableRef, label: String): Unit = {
    val m = IceLite.readManifest(ref) // decodes every chain — a missing
    // segment would throw here
    val missing = m.snapshots.flatMap(s =>
      s.files ++ s.deleteFiles ++ s.eqDeletes.map(_.file))
      .distinct
      .filterNot(rel => Files.exists(ref.dir.resolve(rel)))
    assert(missing.isEmpty, s"[$label] dangling references: $missing")
  }

  /** No unreferenced parquet and no staged pointer tmp survives a
    * zero-grace gc. */
  private def assertResidueReclaimed(ref: TableRef, label: String): Unit = {
    // negative grace = "everything is past the window" — crash residue
    // is by definition abandoned; a 0ms grace would flakily spare
    // files created in the same millisecond as the sweep
    IceLite.gcOrphans(ref, graceMs = -60000L)
    val referenced = IceLite.readManifest(ref).snapshots.flatMap(s =>
      s.files ++ s.deleteFiles ++ s.eqDeletes.map(_.file)).toSet
    val onDisk =
      if (!Files.exists(ref.dataDir)) Nil
      else (Seq(ref.dataDir) ++
        (if (Files.exists(ref.deletesDir)) Seq(ref.deletesDir) else Nil))
        .flatMap(root => IceLite.listDir(Files.walk(root))(_
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet") &&
            !p.getFileName.toString.startsWith("."))
          .map(p => ref.dir.relativize(p).toString).toSeq))
    val stray = onDisk.filterNot(referenced)
    assert(stray.isEmpty, s"[$label] unreclaimed data residue: $stray")
    val tmps = IceLite.io.list(ref.dir).map(_.getFileName.toString)
      .filter(n => n.startsWith(".manifest.tmp.") || n.startsWith(".rename-"))
    assert(tmps.isEmpty, s"[$label] unreclaimed pointer tmps: $tmps")
  }

  /** Sweep the kill point through `action` until a trial runs
    * crash-free. Each trial gets a FRESH table from `setup`. */
  private def sweep(name: String, mkIo: String => FileIO)(
      setup: TableRef => Rows)(action: TableRef => Unit)(
      post: Rows => Rows): Unit = {
    var k = 0
    var crashed = true
    while (crashed) {
      val wh = graft.GraftTmp.dir(s"crash_${name}_$k").toString
      IceLite.createNamespace(wh, "src")
      val ref = TableRef(wh, "src", "t")
      val crashIo = new CrashFileIO(mkIo(wh), wh)
      val prevIo = IceLite.io
      IceLite.io = crashIo
      try {
        val pre = setup(ref)
        val expect = post(pre)
        crashIo.ops.set(0)
        crashIo.crashAt = k
        // SQL-driven actions surface the crash wrapped (SparkException
        // around the driver-side commit) — walk the cause chain
        def isCrash(t: Throwable): Boolean =
          t != null && (t.isInstanceOf[InjectedCrash] || isCrash(t.getCause))
        crashed =
          try { action(ref); false }
          catch { case e: Throwable if isCrash(e) => true }
        crashIo.crashAt = Int.MaxValue
        IceLite.clearMetaCaches() // the crashed process is gone
        val label = s"$name@$k"
        // 1. no torn state: pre or post, never a mix, nothing dangling
        val got = readRows(ref)
        assert(got.contains(pre) || got.contains(expect),
          s"[$label] torn state: $got is neither pre nor post")
        assertNoDangling(ref, label)
        // 2. recovery: a fresh process retries an uncommitted op
        if (got.contains(pre) && pre != expect) action(ref)
        assert(readRows(ref).contains(expect), s"[$label] recovery failed")
        // 3. crash residue is reclaimed, table still healthy
        assertResidueReclaimed(ref, label)
        assert(readRows(ref).contains(expect), s"[$label] gc broke the table")
      } finally IceLite.io = prevIo
      k += 1
    }
    assert(k >= 3, s"$name: kill-point sweep exercised only ${k - 1} ops")
  }

  private def localIo(wh: String): FileIO = LocalFileIO
  private def storeIo(wh: String): FileIO = new StoreIO(wh)

  private def fuzzAll(ioName: String, mkIo: String => FileIO): Unit = {
    test(s"append survives every kill point ($ioName)") {
      sweep(s"append_$ioName", mkIo) { ref =>
        IceLite.createOrReplace(ref,
          Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
        Set((1L, "a"), (2L, "b"))
      } { ref =>
        IceLite.append(ref, Seq((3L, "c"), (4L, "d")).toDF("k", "s"))
      } { pre => pre ++ Set((3L, "c"), (4L, "d")) }
    }

    test(s"replace survives every kill point ($ioName)") {
      sweep(s"replace_$ioName", mkIo) { ref =>
        IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
        Set((1L, "a"))
      } { ref =>
        IceLite.createOrReplace(ref, Seq((9L, "z")).toDF("k", "s"))
      } { _ => Set((9L, "z")) }
    }

    test(s"partitioned append survives every kill point ($ioName)") {
      sweep(s"part_$ioName", mkIo) { ref =>
        IceLite.createOrReplacePartitioned(ref,
          Seq((1L, "A"), (2L, "B")).toDF("k", "s"), "s")
        Set((1L, "A"), (2L, "B"))
      } { ref =>
        IceLite.appendPartitioned(ref, Seq((3L, "A")).toDF("k", "s"), "s")
      } { pre => pre + ((3L, "A")) }
    }

    test(s"MoR delete survives every kill point ($ioName)") {
      sweep(s"mor_$ioName", mkIo) { ref =>
        IceLite.createOrReplace(ref,
          Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
        Set((1L, "a"), (2L, "b"), (3L, "c"))
      } { ref =>
        IceLite.deleteByKeysMoR(spark, ref, Seq(2L).toDF("k"), Seq("k"))
      } { pre => pre.filterNot(_._1 == 2L) }
    }

    test(s"CoW delete survives every kill point ($ioName)") {
      sweep(s"cow_$ioName", mkIo) { ref =>
        IceLite.createOrReplace(ref,
          Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"))
        Set((1L, "a"), (2L, "b"), (3L, "c"))
      } { ref =>
        IceLite.deleteWhere(spark, ref, "k = 2")
      } { pre => pre.filterNot(_._1 == 2L) }
    }

    test(s"transform row-level delete survives every kill point ($ioName)") {
      // the SQL ReplaceData path on a HIDDEN-PARTITION table (d86):
      // runtime-filtered scan → transformed restage → promote →
      // commitReplace swap carrying the spec — the newest commit shape,
      // swept like the rest
      var tbl: String = null
      sweep(s"tfrl_$ioName", mkIo) { ref =>
        val cat = s"crashtf_${java.util.UUID.randomUUID.toString.take(6)}"
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.IceLiteCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.warehouse", ref.warehouse)
        tbl = s"$cat.${ref.namespace}.${ref.name}"
        spark.sql(s"CREATE TABLE $tbl (k BIGINT, s STRING) " +
          "PARTITIONED BY (bucket(4, k))")
        Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s")
          .createOrReplaceTempView("crash_tf_src")
        spark.sql(s"INSERT INTO $tbl SELECT k, s FROM crash_tf_src")
        Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      } { _ =>
        spark.sql(s"DELETE FROM $tbl WHERE k % 2 = 0")
      } { pre => pre.filterNot(_._1 % 2 == 0) }
    }

    test(s"compact (with a live MoR sidecar) survives every kill point ($ioName)") {
      // rows are identical pre/post, so the sweep's value here is the
      // structural invariants at every kill: nothing torn, nothing
      // dangling, residue reclaimed, sidecar semantics preserved
      sweep(s"compact_$ioName", mkIo) { ref =>
        IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
        IceLite.append(ref, Seq((2L, "b"), (3L, "c")).toDF("k", "s"))
        IceLite.deleteByKeysMoR(spark, ref, Seq(1L).toDF("k"), Seq("k"))
        Set((2L, "b"), (3L, "c"))
      } { ref =>
        IceLite.compact(spark, ref)
      } { pre => pre }
    }
  }

  fuzzAll("local", localIo)
  fuzzAll("objectstore", storeIo)

  /** RENAME has the longest protocol (register → dest claim → source
    * re-check → retire) and its own invariant: at EVERY kill point at
    * least one name serves the COMPLETE table (the crash-safe
    * both-names-readable property), and healing (retry, or drop the
    * source when the destination already won) converges to exactly
    * one live table with full history. */
  private def renameFuzz(ioName: String, mkIo: String => FileIO): Unit =
    test(s"rename survives every kill point ($ioName)") {
      val full: Rows = Set((1L, "a"), (2L, "b"), (4L, "d"))
      var k = 0
      var crashed = true
      while (crashed) {
        val wh = graft.GraftTmp.dir(s"crash_ren_${ioName}_$k").toString
        IceLite.createNamespace(wh, "src")
        val from = TableRef(wh, "src", "a")
        val to = TableRef(wh, "src", "b")
        val crashIo = new CrashFileIO(mkIo(wh), wh)
        val prevIo = IceLite.io
        IceLite.io = crashIo
        try {
          // history worth preserving: append + MoR delete sidecar
          IceLite.createOrReplace(from,
            Seq((1L, "a"), (2L, "b"), (3L, "x")).toDF("k", "s"))
          IceLite.append(from, Seq((4L, "d")).toDF("k", "s"))
          IceLite.deleteByKeysMoR(spark, from, Seq(3L).toDF("k"), Seq("k"))
          crashIo.ops.set(0)
          crashIo.crashAt = k
          crashed =
            try { IceLite.renameTable(from, to); false }
            catch { case _: InjectedCrash => true }
          crashIo.crashAt = Int.MaxValue
          IceLite.clearMetaCaches()
          val label = s"rename_$ioName@$k"
          // both-names-readable window: every readable name is COMPLETE
          val gotFrom = readRows(from)
          val gotTo = readRows(to)
          assert(gotFrom.contains(full) || gotTo.contains(full),
            s"[$label] table lost: from=$gotFrom to=$gotTo")
          gotFrom.foreach(r => assert(r == full, s"[$label] torn source: $r"))
          gotTo.foreach(r => assert(r == full, s"[$label] torn dest: $r"))
          // heal: retry while the source name still owns the pointer;
          // drop the source if the destination already claimed
          if (IceLite.tableExists(from) && !IceLite.tableExists(to))
            IceLite.renameTable(from, to)
          else if (IceLite.tableExists(from) && IceLite.tableExists(to)) {
            // the destination already claimed: retire the source the
            // way renameTable's step 6 does — seam ops for metadata
            // (the object store holds the pointers), disk walk for
            // the linked data residue
            IceLite.io.list(from.dir)
              .filter(_.getFileName.toString.startsWith("manifest.v"))
              .sortBy(_.getFileName.toString).foreach(IceLite.io.delete)
            IceLite.io.list(from.dir.resolve("meta")).foreach(IceLite.io.delete)
            if (Files.exists(from.dir))
              IceLite.listDir(Files.walk(from.dir))(_.toSeq)
                .sortBy(-_.getNameCount)
                .foreach(p => scala.util.Try(Files.deleteIfExists(p)))
          }
          assert(!IceLite.tableExists(from), s"[$label] source not retired")
          assert(readRows(to).contains(full), s"[$label] heal failed")
          // history and MoR sidecars traveled
          val m = IceLite.readManifest(to)
          assert(m.snapshots.size == 3, s"[$label] history lost")
          assertResidueReclaimed(to, label)
          assert(readRows(to).contains(full), s"[$label] gc broke the table")
        } finally IceLite.io = prevIo
        k += 1
      }
      assert(k >= 5, s"rename sweep exercised only ${k - 1} ops")
    }

  renameFuzz("local", localIo)
  renameFuzz("objectstore", storeIo)
}
