package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** d81: table RENAME as a zero-copy relocation (Iceberg performs it
  * as a catalog-pointer move; a path-addressed layout links the data
  * under the new dir instead — IceLite.renameTable's contract). What
  * must hold: the manifest travels byte-identical (history, refs,
  * MoR sidecars, layouts all survive), the data NEVER moves through
  * a byte copy, the destination claim is one-winner, and the source
  * name is gone afterward. */
class RenameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshWh(): String = {
    val wh = graft.GraftTmp.dir("rename_spec").toString
    IceLite.createNamespace(wh, "src")
    wh
  }

  test("rename: data, history, and stats travel; old name is gone") {
    val wh = freshWh()
    val a = TableRef(wh, "src", "a")
    IceLite.createOrReplace(a, (0L until 100L).map(k => (k, k * 2.0)).toDF("k", "v"),
      statsCols = Seq("k"))
    IceLite.append(a, (100L until 150L).map(k => (k, k * 2.0)).toDF("k", "v"))
    val manBefore = IceLite.readManifest(a)

    val b = TableRef(wh, "src", "b")
    IceLite.renameTable(a, b)

    assert(!IceLite.tableExists(a), "source name must be gone")
    assert(IceLite.tableExists(b))
    val manAfter = IceLite.readManifest(b)
    // the manifest travels byte-identical: same snapshots, same files,
    // same stats — nothing was recomputed
    assert(manAfter.snapshots.map(_.id) == manBefore.snapshots.map(_.id))
    assert(manAfter.current.files == manBefore.current.files)
    assert(manAfter.current.fileStats == manBefore.current.fileStats)
    val got = IceLite.read(spark, b).as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.size == 150 && got.head == ((0L, 0.0)) && got.last == ((149L, 298.0)))
    // time travel to the pre-append snapshot still answers
    val early = IceLite.readAt(spark, b, manAfter.snapshots.head.id).count()
    assert(early == 100L, s"history lost: snapshot 1 read $early rows")
    // the source dir is fully retired
    assert(!Files.exists(a.dir), "source dir must be removed")
  }

  test("rename moves ZERO data bytes: every data file is a hard link, not a copy") {
    val wh = freshWh()
    val a = TableRef(wh, "src", "a2")
    IceLite.createOrReplace(a, (0L until 50L).map(k => (k, s"s$k")).toDF("k", "s"))
    // capture the inode identity of each committed data file
    val before = IceLite.readManifest(a).current.files.map { rel =>
      rel -> Files.getAttribute(a.dir.resolve(rel), "unix:ino")
    }.toMap
    val b = TableRef(wh, "src", "b2")
    IceLite.renameTable(a, b)
    before.foreach { case (rel, ino) =>
      assert(Files.getAttribute(b.dir.resolve(rel), "unix:ino") == ino,
        s"$rel was rewritten, not linked")
    }
  }

  test("rename survives MoR equality-delete sidecars and a partitioned layout") {
    val wh = freshWh()
    // eq-live flat table
    val m = TableRef(wh, "src", "mor")
    IceLite.createOrReplace(m, (0L until 60L).map(k => (k, k * 1.0)).toDF("k", "v"))
    IceLite.deleteByKeysMoR(spark, m, Seq(5L, 6L).toDF("k"), Seq("k"))
    val m2 = TableRef(wh, "src", "mor_renamed")
    IceLite.renameTable(m, m2)
    assert(IceLite.readManifest(m2).current.eqDeletes.nonEmpty,
      "eq sidecar list must travel")
    val live = IceLite.read(spark, m2).as[(Long, Double)].collect().map(_._1).toSet
    assert(live.size == 58 && !live(5L) && !live(6L))

    // identity-partitioned table: layout + pruning survive
    val p = TableRef(wh, "src", "part")
    IceLite.createOrReplacePartitioned(p,
      (0L until 40L).map(k => (k, s"g${k % 4}")).toDF("k", "g"), Seq("g"), Nil)
    val p2 = TableRef(wh, "src", "part_renamed")
    IceLite.renameTable(p, p2)
    val snap = IceLite.readManifest(p2).current
    assert(snap.partitionCols == Seq("g"), "partition layout must travel")
    val one = IceLite.readPartitioned(spark, p2).filter($"g" === "g1").count()
    assert(one == 10L)
    // metadata-level pruning answers from the renamed layout too
    assert(IceLite.readPartitionPruned(spark, p2, Set("g2")).count() == 10L)
  }

  test("destination claim is one-winner; a lost race never damages the winner") {
    val wh = freshWh()
    val a = TableRef(wh, "src", "a3")
    IceLite.createOrReplace(a, Seq((1L, "x")).toDF("k", "s"))
    val b = TableRef(wh, "src", "b3")
    IceLite.createOrReplace(b, Seq((2L, "y")).toDF("k", "s"))
    // destination already exists → refuse before any staging
    val ex = intercept[IllegalStateException](IceLite.renameTable(a, b))
    assert(ex.getMessage.contains("already exists"))
    // the loser must not have touched the existing table
    assert(IceLite.read(spark, b).as[(Long, String)].collect().toSeq == Seq((2L, "y")))
    assert(IceLite.tableExists(a), "failed rename must leave the source intact")
  }

  test("SQL face: ALTER TABLE RENAME TO, old identifier unresolvable, occupied target refused") {
    val wh = freshWh()
    val a = TableRef(wh, "src", "sql_a")
    IceLite.createOrReplace(a, (0L until 30L).map(k => (k, k * 3.0)).toDF("k", "v"))
    val cat = s"rencat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"ALTER TABLE $cat.src.sql_a RENAME TO src.sql_b")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.sql_b").head.getLong(0) == 30L)
    assertThrows[Exception](spark.sql(s"SELECT * FROM $cat.src.sql_a").collect())
    // renaming onto an occupied name maps to TableAlreadyExists
    IceLite.createOrReplace(TableRef(wh, "src", "sql_c"), Seq((9L, 9.0)).toDF("k", "v"))
    assertThrows[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException](
      spark.sql(s"ALTER TABLE $cat.src.sql_b RENAME TO src.sql_c"))
    // and both survivors are intact
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.sql_b").head.getLong(0) == 30L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.sql_c").head.getLong(0) == 1L)
  }
}
