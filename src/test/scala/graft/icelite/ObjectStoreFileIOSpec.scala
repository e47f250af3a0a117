package graft.icelite

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The 100 TB storage story, PROVED instead of documented: an
  * in-memory FileIO with OBJECT-STORE semantics only — atomic
  * conditional PUT for the claim (S3 `If-None-Match: *`), blind PUT
  * for replace, prefix LIST, no hard links, no renames, no
  * directories, no partial reads — run under the metadata commit
  * protocol end-to-end (CAS commits, concurrent appenders, manifest
  * sharding, MoR sidecars, branch/tag refs, expiry + graced segment
  * sweeps). If the protocol relied on any POSIX-ism outside the
  * seam's contract (`FileIO.scala:9-49`), these tests could not
  * pass: the fake store simply has no such operation to fall back
  * on.
  *
  * Deliberately OUT of seam scope (documented at FileIO.scala and
  * pinned in the last test): DATA file reads/writes (Spark's parquet
  * layer, which runs on Hadoop FileSystem connectors — s3a at
  * cluster scale). Data REGISTRATION (d63 add_files, table rename)
  * does route through the seam's `linkOrCopy` — server-side
  * CopyObject on a store, hard link locally. */
class ObjectStoreFileIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-memory object store scoped to one warehouse prefix. Paths
    * outside the scope delegate to the local impl so parallel suites
    * are unaffected. Objects appear atomically and whole (PUT
    * visibility), never partially — readers get the previous object
    * or the new one. */
  private class ObjectStoreFileIO(scope: String) extends FileIO {
    final case class Obj(content: String, mtime: Long)
    val objects = new ConcurrentHashMap[String, Obj]()
    private def inScope(p: Path): Boolean = p.toString.startsWith(scope)
    private def key(p: Path): String = p.toString

    override def readString(p: Path): String =
      if (!inScope(p)) LocalFileIO.readString(p)
      else Option(objects.get(key(p))).map(_.content).getOrElse(
        throw new java.nio.file.NoSuchFileException(p.toString))

    /** Blind PUT — atomic whole-object visibility. */
    override def writeString(p: Path, s: String): Unit =
      if (!inScope(p)) LocalFileIO.writeString(p, s)
      else { objects.put(key(p), Obj(s, System.currentTimeMillis())); () }

    /** Conditional PUT (`If-None-Match: *`): atomic create-if-absent
      * of the WHOLE object. The one primitive the commit protocol's
      * claim needs. */
    override def claim(target: Path, tmp: Path): Boolean =
      if (!inScope(target)) LocalFileIO.claim(target, tmp)
      else objects.putIfAbsent(key(target),
        Obj(readString(tmp), System.currentTimeMillis())) == null

    /** Plain PUT — object replace is atomic per key on every store. */
    override def replaceAtomic(target: Path, tmp: Path): Unit =
      if (!inScope(target)) LocalFileIO.replaceAtomic(target, tmp)
      else {
        objects.put(key(target), Obj(readString(tmp),
          System.currentTimeMillis()))
        objects.remove(key(tmp))
        ()
      }

    override def exists(p: Path): Boolean =
      if (!inScope(p)) LocalFileIO.exists(p)
      else objects.containsKey(key(p))

    override def delete(p: Path): Boolean =
      if (!inScope(p)) LocalFileIO.delete(p)
      else objects.remove(key(p)) != null

    /** LIST by prefix with '/' delimiter — one level, like S3. Also
      * merges the real directory underneath (data files live on the
      * Spark-owned layer, outside this seam). */
    override def list(dir: Path): Seq[Path] = {
      val disk = LocalFileIO.list(dir)
      if (!inScope(dir)) disk
      else {
        val prefix = key(dir) + "/"
        import scala.jdk.CollectionConverters._
        val mem = objects.keySet.asScala.toSeq
          .filter(k => k.startsWith(prefix) && !k.drop(prefix.length).contains('/'))
          .map(java.nio.file.Paths.get(_))
        (mem ++ disk).distinct
      }
    }

    /** Prefixes need no creation on an object store. */
    override def mkdirs(p: Path): Unit =
      if (!inScope(p)) LocalFileIO.mkdirs(p) else ()

    override def mtimeMs(p: Path): Long =
      if (!inScope(p)) LocalFileIO.mtimeMs(p)
      else Option(objects.get(key(p))).map(_.mtime).getOrElse(
        throw new java.nio.file.NoSuchFileException(p.toString))

    /** Server-side CopyObject on the DATA layer. Data bytes live on
      * the Spark-owned storage layer in this harness (Hadoop FS →
      * local disk), so the copy executes there — what matters to the
      * seam contract is that registration is one store-side op with
      * no client egress, which both impls honor. */
    override def linkOrCopy(dst: Path, src: Path): Unit =
      LocalFileIO.linkOrCopy(dst, src)
  }

  private def withStore[A](f: (ObjectStoreFileIO, String) => A): A = {
    val wh = graft.GraftTmp.dir("objstore_wh").toString
    IceLite.createNamespace(wh, "src")
    val store = new ObjectStoreFileIO(wh)
    val prev = IceLite.io
    IceLite.io = store
    try f(store, wh) finally IceLite.io = prev
  }

  test("the full commit protocol runs on conditional-PUT semantics alone") {
    withStore { (store, wh) =>
      val ref = TableRef(wh, "src", "t")
      IceLite.createOrReplace(ref, (1L to 40L).map(k => (k, k * 2.0)).toDF("k", "v"))
      (1 to 5).foreach(i => IceLite.append(ref,
        Seq((100L + i, i * 1.0)).toDF("k", "v")))
      assert(IceLite.read(spark, ref).count() == 45)
      // every metadata object lives in the STORE, not on disk
      assert(!Files.exists(ref.dir.resolve("meta")) ||
        IceLite.listDir(Files.list(ref.dir.resolve("meta")))(_.isEmpty),
        "segments must live in the object store, not on disk")
      import scala.jdk.CollectionConverters._
      assert(store.objects.keySet.asScala.exists(_.contains("manifest.v")))
      assert(store.objects.keySet.asScala.exists(_.contains("meta/seg-")))
      // history survives: time travel + rollback through the store
      val m = IceLite.readManifest(ref)
      assert(m.snapshots.size == 6)
      assert(IceLite.readAt(spark, ref, m.snapshots.head.id).count() == 40)
      IceLite.rollback(ref, m.snapshots(2).id)
      assert(IceLite.read(spark, ref).count() == 42)
    }
  }

  test("concurrent appenders race through atomic conditional PUTs — nothing lost") {
    withStore { (_, wh) =>
      val ref = TableRef(wh, "src", "race")
      IceLite.createOrReplace(ref, Seq((0L, "seed")).toDF("k", "s"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futures = (1 to 8).map { t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit =
              (0 until 3).foreach(i => IceLite.append(ref,
                Seq((t * 100L + i, s"w$t-$i")).toDF("k", "s")))
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      assert(IceLite.read(spark, ref).count() == 25, "24 appends + seed")
      val m = IceLite.readManifest(ref)
      assert(m.snapshots.size == 25 && m.current.rowCount == 25)
    }
  }

  test("compaction, MoR equality deletes, and changelog on the object store") {
    withStore { (_, wh) =>
      val ref = TableRef(wh, "src", "mor")
      IceLite.createOrReplace(ref, (1L to 20L).map(k => (k, s"r$k")).toDF("k", "s"))
      IceLite.deleteByKeysMoR(spark, ref, Seq(3L, 5L).toDF("k"), Seq("k"))
      assert(IceLite.read(spark, ref).count() == 18)
      IceLite.compact(spark, ref, targetFiles = 1)
      assert(IceLite.read(spark, ref).count() == 18)
      assert(IceLite.readManifest(ref).current.eqDeletes.isEmpty,
        "compact must materialize the sidecars")
      IceLite.deleteWhere(spark, ref, "`k` > 15")
      assert(IceLite.read(spark, ref).count() == 13)
    }
  }

  test("partitioned layout + overwrite modes on the object store") {
    withStore { (_, wh) =>
      val ref = TableRef(wh, "src", "p")
      IceLite.createOrReplacePartitioned(ref,
        (1L to 30L).map(k => (k, (k % 3).toString)).toDF("k", "p"), "p")
      IceLite.appendPartitioned(ref,
        Seq((100L, "1")).toDF("k", "p"), "p")
      assert(IceLite.readPartitionPruned(spark, ref, Set("1")).count() == 11)
      val m = IceLite.readManifest(ref)
      assert(m.current.partitionCols == Seq("p") &&
        m.current.files.forall(_.contains("p=")))
    }
  }

  test("expiry + graced segment sweep reclaim store objects, readers survive") {
    withStore { (store, wh) =>
      val ref = TableRef(wh, "src", "gc")
      IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
      (1 to 6).foreach(i => IceLite.append(ref, Seq((i + 1L, "b")).toDF("k", "s")))
      IceLite.compact(spark, ref, targetFiles = 1)
      IceLite.expireSnapshotsRetainLast(ref, 1)
      import scala.jdk.CollectionConverters._
      def segCount: Int =
        store.objects.keySet.asScala.count(_.contains("meta/seg-"))
      val before = segCount
      // the grace window protects fresh segments (another process's
      // in-flight commit) even on the object store
      IceLite.expireMetadata(ref, keepLast = 1)
      assert(segCount == before)
      IceLite.expireMetadata(ref, keepLast = 1, segGraceMs = 0L)
      assert(segCount < before, "unreachable segments must be reclaimed")
      assert(IceLite.read(spark, ref).count() == 7)
    }
  }

  test("randomized op mix: the model holds under object-store semantics") {
    withStore { (_, wh) =>
      val ref = TableRef(wh, "src", "model")
      val rnd = new scala.util.Random(42)
      var model = Map.empty[Long, Double]
      def put(n: Int): Seq[(Long, Double)] =
        (1 to n).map(_ => (rnd.nextLong(1000), rnd.nextDouble()))
      val seed = put(10).toMap.toSeq
      IceLite.createOrReplace(ref, seed.toDF("k", "v"))
      model = seed.toMap
      (1 to 25).foreach { i =>
        rnd.nextInt(5) match {
          case 0 | 1 =>
            val rows = put(3).toMap -- model.keySet
            if (rows.nonEmpty) {
              IceLite.append(ref, rows.toSeq.toDF("k", "v"))
              model ++= rows
            }
          case 2 if model.size > 2 =>
            val doomed = model.keySet.take(2).toSeq
            IceLite.deleteByKeysMoR(spark, ref, doomed.toDF("k"), Seq("k"))
            model --= doomed
          case 3 =>
            IceLite.compact(spark, ref, targetFiles = 1)
          case _ =>
            IceLite.expireMetadata(ref, keepLast = 3, segGraceMs = 0L)
        }
        val got = IceLite.read(spark, ref).as[(Long, Double)]
          .collect().toMap
        assert(got == model, s"op $i diverged: ${got.size} vs ${model.size}")
      }
    }
  }

  test("the REST catalog stack runs end-to-end on the object store") {
    withStore { (store, wh) =>
      val ref = TableRef(wh, "src", "t")
      IceLite.createOrReplace(ref, (1L to 20L).map(k => (k, s"r$k")).toDF("k", "s"))
      val srv = new graft.sources.rest.CatalogServer(wh).start()
      try {
        val cat = s"objcat_${java.util.UUID.randomUUID.toString.take(8)}"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.rest.IceLiteRestCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.uri)
        // reads: the server assembles the wire from STORE objects;
        // the sharded shape ships raw pointer bytes + segments read
        // through the seam
        assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 20)
        // writes: the full DML protocol commits through conditional
        // PUTs only
        spark.sql(s"INSERT INTO $cat.src.t VALUES (100, 'remote')")
        spark.sql(s"DELETE FROM $cat.src.t WHERE k <= 5")
        assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 16)
        import scala.jdk.CollectionConverters._
        assert(store.objects.keySet.asScala.count(_.contains("manifest.v")) >= 3,
          "every remote commit must land as a store object")
      } finally srv.stop()
    }
  }

  test("pinned scope: data reads/writes stay OUTSIDE the seam; registration routes through it") {
    withStore { (store, wh) =>
      val ref = TableRef(wh, "src", "scope")
      IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
      // data files are on the Spark-owned storage layer (Hadoop
      // FileSystem connectors at cluster scale), NOT in the metadata
      // store — exactly the split FileIO.scala documents
      import scala.jdk.CollectionConverters._
      assert(store.objects.keySet.asScala.forall(!_.contains("/data/")),
        "data files must never route through the metadata seam")
      assert(IceLite.listDir(Files.walk(ref.dataDir))(
        _.count(_.toString.endsWith(".parquet"))) >= 1)
      // d63 add_files registers external data through the seam's
      // linkOrCopy (hard link locally, server-side CopyObject on a
      // store — FileIO.scala's contract); its metadata commit goes
      // through the store like every other commit:
      val src = graft.GraftTmp.dir("objstore_ext")
      Seq((10L, "x")).toDF("k", "s").coalesce(1).write
        .mode("overwrite").parquet(src.resolve("ext").toString)
      val parquet = IceLite.listDir(Files.list(src.resolve("ext")))(
        _.filter(_.toString.endsWith(".parquet")).toSeq)
      IceLite.addFiles(ref, parquet)
      assert(IceLite.read(spark, ref).count() == 2)
      assert(store.objects.keySet.asScala.count(_.contains("manifest.v")) >= 2)
    }
  }
}
