package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
import graft.TestSpark

/** The empty-state bug class (tf fuzz seed 6021): every engine-API
  * face that folds `snap.files` into a Spark read must survive a
  * table a prior DELETE emptied — an Iceberg table emptied by DELETE
  * remains a table with a schema (extract_load.py:94-110
  * createOrReplace implies schema survives emptiness). A GDPR sweep
  * that matches everything followed by any read/DML/maintenance call
  * is a perfectly reachable production sequence; none of these may
  * throw UNABLE_TO_INFER_SCHEMA or UNRESOLVED_COLUMN. */
class EmptyTableSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wh() = graft.GraftTmp.dir("empty_sweep").toString

  /** Flat table emptied by COW delete-all → zero-FILE current snapshot. */
  private def emptiedFlat(): TableRef = {
    val w = wh(); IceLite.createNamespace(w, "src")
    val ref = TableRef(w, "src", "t")
    IceLite.createOrReplace(ref,
      (0L until 40L).map(k => (k, s"g${k % 4}", k * 2.0)).toDF("k", "g", "v"),
      statsCols = Seq("k"))
    IceLite.deleteWhere(spark, ref, "k >= 0", statsCols = Seq("k"))
    ref
  }

  /** Sorted table emptied by MoR delete-all → files all tombstoned. */
  private def emptiedMoR(): TableRef = {
    val w = wh(); IceLite.createNamespace(w, "src")
    val ref = TableRef(w, "src", "t")
    IceLite.createOrReplaceSorted(ref,
      (0L until 40L).map(k => (k, s"g${k % 4}", k * 2.0)).toDF("k", "g", "v"),
      "k", numFiles = 2, statsCols = Seq("k"))
    IceLite.deleteWhereMoR(spark, ref, "k >= 0")
    ref
  }

  test("COW delete-all: read keeps schema, yields zero rows, filter analyzes") {
    val ref = emptiedFlat()
    val df = IceLite.read(spark, ref)
    assert(df.columns.toSeq == Seq("k", "g", "v"))
    assert(df.count() == 0L)
    assert(df.filter("k = 1 AND g = 'g1'").count() == 0L)
  }

  test("MoR delete-all: read keeps schema; stacked MoR DML no-ops (seed 6021 class)") {
    val ref = emptiedMoR()
    assert(IceLite.read(spark, ref).filter("k = 1").count() == 0L)
    val before = IceLite.readManifest(ref)
    // the exact seed-6021 shape: MoR position DML against an emptied view
    val s1 = IceLite.deleteWhereMoR(spark, ref, "k < 10")
    assert(s1.id == before.currentSnapshotId, "delete on empty view must no-op")
    val s2 = IceLite.updateWhereMoR(spark, ref, "k < 10", Map("v" -> "v + 1"))
    assert(s2.id == before.currentSnapshotId, "update on empty view must no-op")
    assert(IceLite.readManifest(ref).snapshots.size == before.snapshots.size)
  }

  test("zero-FILE snapshot: MoR DML, eq-delete, COW DML all no-op; upsert revives") {
    val ref = emptiedFlat() // current snapshot has files == Nil
    assert(IceLite.readManifest(ref).current.files.isEmpty,
      "fixture must produce a zero-file snapshot")
    val before = IceLite.readManifest(ref)
    assert(IceLite.deleteWhereMoR(spark, ref, "k < 10").id == before.currentSnapshotId)
    assert(IceLite.updateWhereMoR(spark, ref, "k < 10", Map("v" -> "v + 1"))
      .id == before.currentSnapshotId)
    assert(IceLite.deleteWhere(spark, ref, "k < 10").id == before.currentSnapshotId)
    assert(IceLite.updateWhere(spark, ref, "k < 10", Map("v" -> "v + 1"))
      .id == before.currentSnapshotId)
    val eq = IceLite.deleteByKeysMoR(spark, ref, Seq(1L).toDF("k"), Seq("k"))
    assert(eq.rowCount == 0L)
    // upsert into the emptied table takes the pure-insert path
    val up = IceLite.upsertByKeysMoR(spark, ref,
      Seq((100L, "g0", 1.0)).toDF("k", "g", "v"), Seq("k"))
    assert(up.rowCount == 1L)
    assert(IceLite.read(spark, ref).count() == 1L)
  }

  test("zero-FILE snapshot: compact, compactRange, zorder, analyze survive") {
    val ref = emptiedFlat()
    val c = IceLite.compact(spark, ref)
    assert(c.rowCount == 0L && IceLite.read(spark, ref).count() == 0L)
    val cr = IceLite.compactRange(spark, ref, "k", 0.0, 100.0)
    assert(cr.rowCount == 0L)
    val z = IceLite.rewriteZOrder(spark, ref, "k", "v")
    assert(z.rowCount == 0L)
    IceLite.analyze(spark, ref, Seq("k"))
    assert(IceLite.read(spark, ref).count() == 0L)
  }

  test("MoR-emptied table: compact materializes to an empty table that still reads") {
    val ref = emptiedMoR()
    val c = IceLite.compact(spark, ref)
    assert(c.rowCount == 0L && c.deleteFiles.isEmpty)
    assert(IceLite.read(spark, ref).filter("g = 'g1'").count() == 0L)
    // and the table revives on append
    IceLite.append(ref, Seq((500L, "g9", 0.5)).toDF("k", "g", "v"))
    assert(IceLite.read(spark, ref).count() == 1L)
  }

  test("changelog over the emptying delete and past it") {
    val ref = emptiedMoR()
    val m = IceLite.readManifest(ref)
    val ids = m.snapshots.map(_.id).sorted
    val ch = IceLite.changes(spark, ref, ids.head, ids.last)
    assert(ch.filter("_change_type = 'delete'").count() == 40L)
    // a further MoR no-op added no snapshot; empty-range changelog is empty
    val ch2 = IceLite.changes(spark, ref, ids.last, ids.last)
    assert(ch2.count() == 0L)
    assert(ch2.columns.contains("_change_type"))
  }

  test("incremental scan from the emptied snapshot is empty but schema-true") {
    val ref = emptiedFlat()
    val head = IceLite.readManifest(ref).currentSnapshotId
    val inc = IceLite.incrementalScan(spark, ref, head)
    assert(inc.columns.toSeq.sorted == Seq("g", "k", "v"))
    assert(inc.count() == 0L)
    IceLite.append(ref, Seq((7L, "g7", 7.0)).toDF("k", "g", "v"))
    assert(IceLite.incrementalScan(spark, ref, head).count() == 1L)
  }

  test("metadata faces on an emptied table: filesDf, partitionsDf, snapshotsDf") {
    val ref = emptiedFlat()
    assert(IceLite.filesDf(spark, ref).count() == 0L)
    assert(IceLite.snapshotsDf(spark, ref).count() >= 2L)
    // partitionsDf needs an identity layout — empty a partitioned one
    val w = wh(); IceLite.createNamespace(w, "src")
    val p = TableRef(w, "src", "p")
    IceLite.createOrReplacePartitioned(p,
      (0L until 8L).map(k => (k, s"g${k % 2}")).toDF("k", "g"), "g")
    IceLite.deleteWhere(spark, p, "k >= 0")
    assert(IceLite.filesDf(spark, p).count() == 0L)
    assert(IceLite.partitionsDf(spark, p).count() == 0L)
  }

  test("merge into an emptied table takes the insert path") {
    val ref = emptiedFlat()
    val snap = IceLite.merge(spark, ref,
      Seq((1L, "g1", 10.0), (2L, "g2", 20.0)).toDF("k", "g", "v"), Seq("k"))
    assert(snap.rowCount == 2L)
    assert(IceLite.read(spark, ref).count() == 2L)
  }

  test("shallow clone of an emptied table reads empty with schema") {
    val ref = emptiedFlat()
    val clone = TableRef(ref.warehouse, "src", "t_clone")
    IceLite.shallowClone(ref, clone)
    val df = IceLite.read(spark, clone)
    assert(df.columns.toSeq == Seq("k", "g", "v") && df.count() == 0L)
  }

  test("WAP on an emptied table: stage to branch, audit-read, publish") {
    val ref = emptiedFlat()
    IceLite.stageBranchAppend(ref, "audit", Seq((9L, "g9", 9.0)).toDF("k", "g", "v"))
    assert(IceLite.readBranch(spark, ref, "audit").count() == 1L)
    assert(IceLite.read(spark, ref).count() == 0L) // main untouched
    IceLite.publish(ref, "audit")
    assert(IceLite.read(spark, ref).count() == 1L)
  }

  test("time travel: back to full, forward to empty; rollback revives") {
    val ref = emptiedFlat()
    val m = IceLite.readManifest(ref)
    val pre = m.snapshots.map(_.id).min
    assert(IceLite.readAt(spark, ref, pre).count() == 40L)
    assert(IceLite.readAt(spark, ref, m.currentSnapshotId).count() == 0L)
    IceLite.rollback(ref, pre)
    assert(IceLite.read(spark, ref).count() == 40L)
  }

  test("partitioned table emptied by COW delete: read + append revive") {
    val w = wh(); IceLite.createNamespace(w, "src")
    val ref = TableRef(w, "src", "p")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 40L).map(k => (k, s"g${k % 4}", k * 2.0)).toDF("k", "g", "v"),
      "g", statsCols = Seq("k"))
    IceLite.deleteWhere(spark, ref, "k >= 0")
    val df = IceLite.read(spark, ref)
    assert(df.count() == 0L && df.columns.toSet == Set("k", "g", "v"))
    assert(IceLite.readPartitionPruned(spark, ref, Set("g1")).count() == 0L)
    IceLite.appendPartitioned(ref, Seq((1L, "g1", 2.0)).toDF("k", "g", "v"),
      Seq("g"), Seq("k"))
    assert(IceLite.readPartitionPruned(spark, ref, Set("g1")).count() == 1L)
  }

  test("transformed (hidden-partition) table emptied by MoR delete: d86 class") {
    val w = wh(); IceLite.createNamespace(w, "src")
    val ref = TableRef(w, "src", "h")
    IceLite.createOrReplaceTransformed(ref,
      (0L until 40L).map(k => (k, s"g${k % 4}", k * 2.0)).toDF("k", "g", "v"),
      Seq(PartitionField("k_bucket", "bucket", "k", 4)), statsCols = Seq("k"))
    IceLite.deleteWhereMoR(spark, ref, "k >= 0")
    assert(IceLite.read(spark, ref).filter("k = 3").count() == 0L)
    val before = IceLite.readManifest(ref).currentSnapshotId
    assert(IceLite.deleteWhereMoR(spark, ref, "k < 5").id == before)
    assert(IceLite.updateWhereMoR(spark, ref, "k < 5", Map("v" -> "0.0")).id == before)
    // compact away the tombstones, then revive under the declared spec
    IceLite.compact(spark, ref)
    IceLite.appendTransformed(ref, Seq((3L, "g3", 6.0)).toDF("k", "g", "v"))
    assert(IceLite.read(spark, ref).count() == 1L)
    assert(IceLite.readManifest(ref).current.partitionSpec.nonEmpty)
  }

  test("schema evolution AFTER emptying is visible on both catalog faces") {
    // REST fuzz seeds 1028/1046/1050: the zero-file donor-schema
    // fallback rebound the alter-ledger scope to the donor snapshot,
    // so an ADD/RENAME landed after the emptying DELETE vanished
    val w = wh(); IceLite.createNamespace(w, "src")
    val ref = TableRef(w, "src", "t")
    IceLite.createOrReplace(ref,
      (0L until 5L).map(k => (k, k * 0.5)).toDF("k", "v"))
    val srv = new graft.sources.rest.CatalogServer(w).start()
    try {
      val lcat = s"esw_l_${java.util.UUID.randomUUID.toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$lcat",
        classOf[graft.sources.IceLiteCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$lcat.warehouse", w)
      val rcat = s"esw_r_${java.util.UUID.randomUUID.toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$rcat",
        "graft.sources.rest.IceLiteRestCatalog")
      spark.conf.set(s"spark.sql.catalog.$rcat.uri", srv.uri)
      // empty through the REMOTE face (the commitReplace wire path —
      // it must pin the schema like the local rewrite does)
      spark.sql(s"DELETE FROM $rcat.src.t WHERE k >= 0")
      assert(IceLite.readManifest(ref).declaredSchemaDdl.nonEmpty,
        "emptying replace must pin the declared schema")
      spark.sql(s"ALTER TABLE $rcat.src.t ADD COLUMN c BIGINT")
      assert(spark.sql(s"SELECT * FROM $rcat.src.t").columns.toSeq ==
        Seq("k", "v", "c"))
      assert(spark.sql(s"SELECT * FROM $lcat.src.t").columns.toSeq ==
        Seq("k", "v", "c"))
      spark.sql(s"ALTER TABLE $rcat.src.t RENAME COLUMN c TO cc")
      assert(spark.sql(s"SELECT k, v, cc FROM $rcat.src.t").count() == 0L)
      assert(spark.sql(s"SELECT k, v, cc FROM $lcat.src.t").count() == 0L)
      // the evolved schema survives a revive INSERT
      spark.sql(s"INSERT INTO $rcat.src.t VALUES (9, 1.5, 7)")
      assert(spark.sql(s"SELECT cc FROM $lcat.src.t").as[Long].collect()
        .toSeq == Seq(7L))
    } finally srv.stop()
  }

  test("expire + gc on an emptied table keep it readable") {
    val ref = emptiedFlat()
    IceLite.expireSnapshotsRetainLast(ref, 1)
    IceLite.gcOrphans(ref)
    val df = IceLite.read(spark, ref)
    assert(df.count() == 0L && df.columns.toSeq == Seq("k", "g", "v"))
  }
}
