package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{count, lit}
import graft.TestSpark
import graft.sources.IceLiteSource

/** d47: merge-on-read position deletes (Iceberg v2 position deletes /
  * the deletion-vector role). Deletes write O(matches) sidecars and
  * rewrite NOTHING; reads apply them as an anti-join; compact()
  * materializes them away; COW rewrites and the positional connector
  * refuse MoR-live snapshots loudly. */
class IceLiteMorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(rows: Long = 400L, files: Int = 4): TableRef = {
    val wh = graft.GraftTmp.dir("mor_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplaceSorted(ref,
      (0L until rows).map(k => (k, k * 2.0)).toDF("k", "v"),
      "k", numFiles = files, statsCols = Seq("k"))
    ref
  }

  test("MoR delete: zero data rewrite, complement read, physical counts stay") {
    val ref = mk()
    val before = IceLite.readManifest(ref).current
    val snap = IceLite.deleteWhereMoR(spark, ref, "k >= 100 AND k < 150")
    assert(snap.operation == "delete-mor")
    // the DATA FILE LIST is byte-for-byte the same — nothing rewrote
    assert(snap.files == before.files)
    assert(snap.deleteFiles.nonEmpty)
    assert(snap.rowCount == 350L)
    // reads see the complement
    val got = IceLite.read(spark, ref).as[(Long, Double)].collect().toSeq
    assert(got.length == 350 && !got.exists(r => r._1 >= 100 && r._1 < 150))
    assert(got.find(_._1 == 99L).map(_._2).contains(198.0))
    // physical per-file metadata still counts the deleted rows
    assert(snap.fileRows.values.sum == 400L)
  }

  test("stacked MoR deletes: predicates see the view, dead rows not re-tombstoned") {
    val ref = mk()
    IceLite.deleteWhereMoR(spark, ref, "k < 100")
    // overlaps the first delete: only k in [100,200) is newly dead
    val snap2 = IceLite.deleteWhereMoR(spark, ref, "k < 200")
    assert(snap2.rowCount == 200L)
    // the second sidecar holds ONLY the newly-deleted positions
    val firstSidecars = IceLite.readManifest(ref).snapshots
      .find(_.operation == "delete-mor").get.deleteFiles.toSet
    val newSidecars = snap2.deleteFiles.filterNot(firstSidecars)
    val newTombstones = spark.read.parquet(
      newSidecars.map(f => ref.dir.resolve(f).toString): _*).count()
    assert(newTombstones == 100L,
      s"second delete must tombstone only live rows, got $newTombstones")
    assert(IceLite.read(spark, ref).count() == 200L)
  }

  test("no-op MoR delete commits nothing and leaves no sidecar") {
    val ref = mk()
    val before = IceLite.readManifest(ref)
    val snap = IceLite.deleteWhereMoR(spark, ref, "k < 0")
    assert(snap.id == before.currentSnapshotId)
    assert(IceLite.readManifest(ref).snapshots.size == before.snapshots.size)
    assert(!Files.exists(ref.deletesDir) ||
      IceLite.listDir(Files.walk(ref.deletesDir))(
        _.count(Files.isRegularFile(_))) == 0L)
  }

  test("time travel sees the pre-delete snapshot; appends keep sidecars live") {
    val ref = mk()
    val pre = IceLite.readManifest(ref).currentSnapshotId
    IceLite.deleteWhereMoR(spark, ref, "k < 50")
    assert(IceLite.readAt(spark, ref, pre).count() == 400L)
    IceLite.append(ref, Seq((1000L, 1.0), (1001L, 2.0)).toDF("k", "v"))
    val got = IceLite.read(spark, ref).as[(Long, Double)].collect().toSeq
    assert(got.length == 352)
    assert(!got.exists(_._1 < 50) && got.exists(_._1 == 1000L))
    assert(IceLite.readManifest(ref).current.deleteFiles.nonEmpty)
  }

  test("pruned reads apply the sidecars") {
    val ref = mk()
    IceLite.deleteWhereMoR(spark, ref, "k >= 100 AND k < 110")
    val pruned = IceLite.readPruned(spark, ref, "k", 90, 130)
      .as[(Long, Double)].collect().map(_._1).sorted.toSeq
    assert(pruned == ((90L to 99L) ++ (110L to 130L)))
  }

  test("compact materializes deletes: values keep, sidecars cleared, COW reopens") {
    val ref = mk()
    IceLite.deleteWhereMoR(spark, ref, "k % 7 = 3")
    val expect = (0L until 400L).filterNot(_ % 7 == 3)
    val snap = IceLite.compact(spark, ref, targetFiles = 2)
    assert(snap.deleteFiles.isEmpty)
    assert(snap.rowCount == expect.length.toLong)
    assert(IceLite.read(spark, ref).as[(Long, Double)].collect()
      .map(_._1).sorted.toSeq == expect)
    // COW and the connector both work again after materialization
    IceLite.deleteWhere(spark, ref, "k = 0")
    assert(spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString).count() == expect.length - 1L)
  }

  test("COW rewrites and merge refuse a MoR-live snapshot") {
    val ref = mk()
    IceLite.deleteWhereMoR(spark, ref, "k < 10")
    val e1 = intercept[IllegalArgumentException](
      IceLite.deleteWhere(spark, ref, "k = 20"))
    assert(e1.getMessage.contains("MoR"))
    val e2 = intercept[IllegalArgumentException](
      IceLite.merge(spark, ref, Seq((20L, 0.0)).toDF("k", "v"), Seq("k")))
    assert(e2.getMessage.contains("MoR"))
  }

  test("connector reads apply MoR sidecars (d50): row path, counts, pushdown, agg decline") {
    val ref = mk()
    IceLite.deleteWhereMoR(spark, ref, "k >= 100 AND k < 150")
    val df = spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString)
    // full read: the complement, exactly
    val got = df.as[(Long, Double)].collect().toSeq
    assert(got.length == 350 && !got.exists(r => r._1 >= 100 && r._1 < 150))
    // filter pushdown composes: pruned files + skipped positions
    assert(df.filter($"k" >= 90 && $"k" < 160).as[(Long, Double)]
      .collect().map(_._1).sorted.toSeq ==
      ((90L to 99L) ++ (150L until 160L)))
    // projection-only count: footer totals minus tombstones
    assert(df.count() == 350L)
    // aggregate pushdown DECLINED (manifest counts are physical):
    // the answer must come from a real scan and still be right
    IceLiteSource.lastScanMetadataOnly = true
    val n = df.agg(count(lit(1))).head.getLong(0)
    assert(n == 350L)
    assert(!graft.sources.IceLiteSource.lastScanMetadataOnly,
      "agg pushdown must decline on a MoR-live snapshot")
    // SQL catalog face sees the same complement
    val cat = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", ref.warehouse)
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 350L)
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.src.t WHERE k < 100").head.getDouble(0)
      == (0L until 100L).map(_ * 2.0).sum)
  }

  test("MoR update: tombstone + appended copies in one snapshot, count stable") {
    val ref = mk()
    val before = IceLite.readManifest(ref).current
    val snap = IceLite.updateWhereMoR(spark, ref,
      "k >= 100 AND k < 150", Map("v" -> "v + 1000"))
    assert(snap.operation == "update-mor")
    // original files untouched; matches re-appended as new files
    assert(before.files.forall(snap.files.contains))
    assert(snap.files.size > before.files.size)
    assert(snap.deleteFiles.nonEmpty)
    assert(snap.rowCount == 400L)
    val got = IceLite.read(spark, ref).as[(Long, Double)].collect().toSeq
    assert(got.length == 400)
    // no doubling, values transformed exactly in the matched range
    assert(got.map(_._1).sorted == (0L until 400L))
    assert(got.find(_._1 == 120L).map(_._2).contains(1240.0))
    assert(got.find(_._1 == 99L).map(_._2).contains(198.0))
  }

  test("MoR update then MoR delete stack; compact materializes both") {
    val ref = mk()
    IceLite.updateWhereMoR(spark, ref, "k < 50", Map("v" -> "-1.0"))
    IceLite.deleteWhereMoR(spark, ref, "v = -1.0")
    assert(IceLite.read(spark, ref).count() == 350L)
    val snap = IceLite.compact(spark, ref, targetFiles = 2)
    assert(snap.deleteFiles.isEmpty && snap.rowCount == 350L)
    assert(IceLite.read(spark, ref).as[(Long, Double)].collect()
      .map(_._1).sorted.toSeq == (50L until 400L))
  }

  test("no-op MoR update leaves the table untouched") {
    val ref = mk()
    val before = IceLite.readManifest(ref)
    val snap = IceLite.updateWhereMoR(spark, ref, "k < 0", Map("v" -> "0.0"))
    assert(snap.id == before.currentSnapshotId)
    assert(IceLite.readManifest(ref).snapshots.size == before.snapshots.size)
  }

  test("changelog scan: appends are inserts, MoR deletes carry the dead rows' values") {
    val ref = mk(rows = 100L, files = 2)
    val s1 = IceLite.readManifest(ref).currentSnapshotId
    IceLite.append(ref, Seq((500L, 5.0), (501L, 6.0)).toDF("k", "v"))
    IceLite.deleteWhereMoR(spark, ref, "k < 10")
    val s3 = IceLite.readManifest(ref).currentSnapshotId
    val ch = IceLite.changes(spark, ref, s1, s3)
      .as[(Long, Double, String, Long)].collect().toSeq
    val inserts = ch.filter(_._3 == "insert")
    val deletes = ch.filter(_._3 == "delete")
    assert(inserts.map(r => (r._1, r._2)).sorted ==
      Seq((500L, 5.0), (501L, 6.0)))
    // deletes carry the full pre-delete row values
    assert(deletes.map(r => (r._1, r._2)).sorted ==
      (0L until 10L).map(k => (k, k * 2.0)))
    assert(ch.forall(r => r._4 > s1 && r._4 <= s3))
  }

  test("changelog scan: MoR update emits pre/postimage pairs") {
    val ref = mk(rows = 100L, files = 2)
    val s1 = IceLite.readManifest(ref).currentSnapshotId
    IceLite.updateWhereMoR(spark, ref, "k = 7", Map("v" -> "99.0"))
    val s2 = IceLite.readManifest(ref).currentSnapshotId
    val ch = IceLite.changes(spark, ref, s1, s2)
      .as[(Long, Double, String, Long)].collect().toSeq
    assert(ch.sortBy(_._3) == Seq(
      (7L, 99.0, "update_postimage", s2),
      (7L, 14.0, "update_preimage", s2)))
  }

  test("changelog scan refuses rewriting commits in the range") {
    val ref = mk(rows = 100L, files = 2)
    val s1 = IceLite.readManifest(ref).currentSnapshotId
    IceLite.append(ref, Seq((500L, 5.0)).toDF("k", "v"))
    IceLite.compact(spark, ref)
    val s3 = IceLite.readManifest(ref).currentSnapshotId
    val e = intercept[IllegalArgumentException](
      IceLite.changes(spark, ref, s1, s3))
    assert(e.getMessage.contains("rewriting"))
  }

  test("partitioned MoR delete/update: zero rewrite, partition-col predicates, compact keeps the layout") {
    // round 12: identity-partitioned tables carry MoR sidecars too —
    // the day-partitioned bronze table is the CDC/GDPR landing shape
    val wh = graft.GraftTmp.dir("mor_part").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "p")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 300L).map(k => (k, k * 2.0, s"d${k % 3}")).toDF("k", "v", "day"),
      "day", statsCols = Seq("k"))
    val before = IceLite.readManifest(ref).current
    // the predicate references BOTH a data column and the PATH-BORNE
    // partition column — the MoR view must read through discovery
    val snap = IceLite.deleteWhereMoR(spark, ref, "day = 'd1' AND k < 100")
    assert(snap.files == before.files, "MoR delete must rewrite nothing")
    assert(snap.deleteFiles.nonEmpty)
    val expectGone = (0L until 300L).filter(k => k % 3 == 1 && k < 100)
    assert(snap.rowCount == 300L - expectGone.length)
    val got = IceLite.read(spark, ref).select($"k").as[Long].collect().toSet
    assert(got == (0L until 300L).toSet -- expectGone)
    // connector read folds the sidecars on the partitioned scan too
    assert(spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString).count() == 300L - expectGone.length)
    // the batch changelog carries the PATH-BORNE partition column —
    // a flat read would silently drop it (round-12 review finding)
    val base = IceLite.readManifest(ref).snapshots.head.id
    val ch = IceLite.changes(spark, ref, base, snap.id)
    assert(ch.columns.contains("day"), ch.columns.mkString(","))
    val chDel = ch.filter($"_change_type" === "delete")
    assert(chDel.count() == expectGone.length.toLong)
    assert(chDel.select($"day").distinct().as[String].collect().toSeq
      == Seq("d1"), "delete slice must carry its partition value")
    // the partition census refuses physical counts while sidecars live
    val censusErr = intercept[IllegalArgumentException](
      IceLite.partitionsDf(spark, ref))
    assert(censusErr.getMessage.contains("MoR"), censusErr.getMessage)
    // MoR update on the partitioned view: copies land in their dirs
    val up = IceLite.updateWhereMoR(spark, ref, "day = 'd2' AND k = 2",
      Map("v" -> "-1.0"))
    assert(up.rowCount == snap.rowCount, "update keeps the logical count")
    val newFiles = up.files.filterNot(snap.files.contains)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("day=d2")),
      s"updated copies must restage into their value dirs: $newFiles")
    assert(IceLite.read(spark, ref).filter($"k" === 2L)
      .select($"v").as[Double].head() == -1.0)
    // compact materializes both sidecar kinds WITHIN the layout
    val compacted = IceLite.compact(spark, ref)
    assert(compacted.deleteFiles.isEmpty && compacted.eqDeletes.isEmpty)
    assert(compacted.partitionCols == Seq("day"))
    assert(compacted.files.forall(_.contains("day=")),
      s"materialized files must keep the dirs: ${compacted.files}")
    assert(compacted.rowCount == snap.rowCount)
    assert(IceLite.read(spark, ref).filter($"k" === 2L)
      .select($"v").as[Double].head() == -1.0)
  }

  test("expiry reclaims sidecars of expired snapshots; gc leaves live ones") {
    val ref = mk()
    val snap = IceLite.deleteWhereMoR(spark, ref, "k < 10")
    val sidecarPaths = snap.deleteFiles.map(f => ref.dir.resolve(f))
    assert(sidecarPaths.forall(Files.exists(_)))
    // gc with zero grace must keep the LIVE sidecars
    IceLite.gcOrphans(ref, graceMs = 0)
    assert(sidecarPaths.forall(Files.exists(_)))
    // materialize, then expire history: the sidecars become dead
    IceLite.compact(spark, ref)
    IceLite.expireSnapshotsRetainLast(ref, 1)
    assert(sidecarPaths.forall(!Files.exists(_)),
      s"expired sidecars must be reclaimed: $sidecarPaths")
    assert(IceLite.read(spark, ref).count() == 390L)
  }
}
