package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Orphan-file GC: reclaims staged-but-never-committed residue without
  * touching any referenced file (Iceberg remove_orphan_files role). */
class IceLiteGcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(): TableRef = {
    val wh = graft.GraftTmp.dir("gc_spec").toString
    IceLite.createNamespace(wh, "src")
    TableRef(wh, "src", "t")
  }

  test("gcOrphans deletes unreferenced files, keeps every referenced one") {
    val ref = mk()
    IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    IceLite.append(ref, Seq(3).toDF("k"))
    // simulate a crashed writer: a staged token dir no manifest knows
    val orphanDir = ref.dataDir.resolve("deadbeef")
    Files.createDirectories(orphanDir)
    val orphan = orphanDir.resolve("part-00000-crashed.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    // backdate: with grace 0 a same-millisecond mtime ties the cutoff
    // and survives — the real-world orphan is always old
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))

    val deleted = IceLite.gcOrphans(ref, graceMs = 0L)
    assert(deleted == Seq("data/deadbeef/part-00000-crashed.parquet"))
    assert(!Files.exists(orphan) && !Files.exists(orphanDir),
      "orphan and its emptied dir should be gone")
    // table intact, including time travel to the first snapshot
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    val m = IceLite.readManifest(ref)
    assert(IceLite.readAt(spark, ref, m.snapshots.head.id).count() == 2)
  }

  test("grace window protects in-flight staged files") {
    val ref = mk()
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val freshDir = ref.dataDir.resolve("inflight1")
    Files.createDirectories(freshDir)
    Files.write(freshDir.resolve("part-00000-x.parquet"), Array[Byte](1))
    // default-like grace: the just-written file must survive
    val deleted = IceLite.gcOrphans(ref, graceMs = 60000L)
    assert(deleted.isEmpty, s"in-flight file was reclaimed: $deleted")
    assert(Files.exists(freshDir.resolve("part-00000-x.parquet")))
  }

  test("grace window protects a staged-but-EMPTY token dir") {
    // a concurrent writer creates its staging/token dir BEFORE any
    // file lands in it — the empty-dir sweep must treat a young empty
    // dir as in-flight, not garbage
    val ref = mk()
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val staged = ref.dataDir.resolve("freshtoken")
    Files.createDirectories(staged)
    val deleted = IceLite.gcOrphans(ref, graceMs = 60000L)
    assert(deleted.isEmpty)
    assert(Files.exists(staged), "young empty staging dir was swept")
    // ...while an OLD empty dir (crashed writer residue) is reclaimed
    val stale = ref.dataDir.resolve("staletoken")
    Files.createDirectories(stale)
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    // grace 5s: stale (10s old) is past the cutoff, staged (just
    // created) is inside it — no same-millisecond timing dependence
    IceLite.gcOrphans(ref, graceMs = 5000L)
    assert(!Files.exists(stale), "stale empty dir should be reclaimed")
    assert(Files.exists(staged), "young dir must still survive")
  }

  test("gcOrphans handles partitioned layout (shared value dirs)") {
    val ref = mk()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A"), (2, "B")).toDF("k", "flag"), "flag")
    // orphan inside a SHARED partition dir — the dir must survive
    val aDir = ref.dataDir.resolve("part").resolve("flag=A")
    val crashed = aDir.resolve("00000000-part-crashed.parquet")
    Files.write(crashed, Array[Byte](1))
    Files.setLastModifiedTime(crashed,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000))
    val deleted = IceLite.gcOrphans(ref, graceMs = 0L)
    assert(deleted == Seq("data/part/flag=A/00000000-part-crashed.parquet"))
    assert(Files.exists(aDir), "shared partition dir must not be swept")
    val got = IceLite.readPartitioned(spark, ref)
      .select($"k").as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2))
  }
}
