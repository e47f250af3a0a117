package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** d72: equality-delete MoR (Iceberg v2 equality deletes) — delete by
  * KEY batch without positions, sequence-scoped so re-inserts survive;
  * compaction materializes; the connector refuses while live. */
class IceLiteEqDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(): TableRef = {
    val wh = graft.GraftTmp.dir("eqdel_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1L to 10L).map(k => (k, s"r$k")).toDF("k", "s"))
    ref
  }

  test("delete by key batch: zero data files touched, logical view folds") {
    val ref = mk()
    val before = IceLite.readManifest(ref).current
    val snap = IceLite.deleteByKeysMoR(spark, ref,
      Seq(3L, 7L, 99L).toDF("k"), Seq("k"))
    assert(snap.operation == "delete-eq")
    assert(snap.files == before.files, "data files must not move")
    assert(snap.rowCount == 8, "logical rowCount must fold matches (99 absent)")
    assert(snap.eqDeletes.size == 1 &&
      snap.eqDeletes.head.keyCols == Seq("k"))
    val got = IceLite.read(spark, ref).select("k").as[Long]
      .collect().sorted.toSeq
    assert(got == (1L to 10L).filterNot(Set(3L, 7L)))
  }

  test("sequence rule: a re-inserted key survives the earlier delete") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(5L).toDF("k"), Seq("k"))
    // CDC re-insert of the deleted key — a LATER file, must survive
    IceLite.append(ref, Seq((5L, "reborn")).toDF("k", "s"))
    val got = IceLite.read(spark, ref)
      .filter($"k" === 5L).select("s").as[String].collect().toSeq
    assert(got == Seq("reborn"),
      s"re-insert was wrongly folded by the older eq delete: $got")
    assert(IceLite.read(spark, ref).count() == 10)
  }

  test("compact materializes equality deletes and clears the sidecars") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(2L, 4L).toDF("k"), Seq("k"))
    val logical = IceLite.read(spark, ref).select("k").as[Long]
      .collect().sorted.toSeq
    val compacted = IceLite.compact(spark, ref, targetFiles = 2)
    assert(compacted.eqDeletes.isEmpty && compacted.deleteFiles.isEmpty)
    val after = IceLite.read(spark, ref).select("k").as[Long]
      .collect().sorted.toSeq
    assert(after == logical)
    assert(compacted.rowCount == 8)
  }

  private def catFor(ref: TableRef): String = {
    val cat = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", ref.warehouse)
    cat
  }

  test("d73: SQL reads an eq-live table mid-stream (before compact)") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(1L, 4L).toDF("k"), Seq("k"))
    val cat = catFor(ref)
    // full projection folds the sidecar
    val ks = spark.sql(s"SELECT k FROM $cat.src.t ORDER BY k")
      .as[Long].collect().toSeq
    assert(ks == (1L to 10L).filterNot(Set(1L, 4L)), s"$ks")
    // projection WITHOUT the key column: the scan over-reads k
    // honestly and still folds
    val ss = spark.sql(s"SELECT s FROM $cat.src.t").as[String]
      .collect().sorted.toSeq
    assert(ss == (1L to 10L).filterNot(Set(1L, 4L)).map(k => s"r$k")
      .sorted, s"$ss")
    // COUNT(*) must NOT answer from the manifest while eq-live
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t").head.getLong(0) == 8)
    // post-compact: identical logical view, sidecars gone
    IceLite.compact(spark, ref, targetFiles = 1)
    assert(spark.sql(s"SELECT k FROM $cat.src.t ORDER BY k")
      .as[Long].collect().toSeq == ks)
  }

  test("d73: sequence rule through SQL — re-inserted key survives") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(5L).toDF("k"), Seq("k"))
    IceLite.append(ref, Seq((5L, "reborn")).toDF("k", "s"))
    val cat = catFor(ref)
    val got = spark.sql(s"SELECT s FROM $cat.src.t WHERE k = 5")
      .as[String].collect().toSeq
    assert(got == Seq("reborn"), s"$got")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t").head.getLong(0) == 10)
  }

  test("d73: SQL reads the upsert stream's table mid-stream") {
    val ref = mk()
    IceLite.upsertByKeysMoR(spark, ref,
      Seq((3L, "v2"), (11L, "new")).toDF("k", "s"), Seq("k"))
    val cat = catFor(ref)
    val got = spark.sql(
        s"SELECT s FROM $cat.src.t WHERE k IN (3, 11) ORDER BY s")
      .as[String].collect().toSeq
    assert(got == Seq("new", "v2"), s"$got")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t").head.getLong(0) == 11)
  }

  test("d73: streaming source and row-level ops still refuse eq-live") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(1L).toDF("k"), Seq("k"))
    val cat = catFor(ref)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception](
      spark.sql(s"DELETE FROM $cat.src.t WHERE k = 2"))
    assert(msgs(e).exists(_.contains("equality-delete")), s"${e.getMessage}")
  }

  test("position-based MoR refuses while equality deletes are live") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(1L).toDF("k"), Seq("k"))
    val e = intercept[IllegalArgumentException](
      IceLite.deleteWhereMoR(spark, ref, "k = 2"))
    assert(e.getMessage.contains("EQUALITY"))
  }

  test("changelog emits the eq-deleted rows as deletes") {
    val ref = mk()
    val s1 = IceLite.readManifest(ref).currentSnapshotId
    val s2 = IceLite.deleteByKeysMoR(spark, ref, Seq(6L).toDF("k"), Seq("k")).id
    val changes = IceLite.changes(spark, ref, s1, s2)
      .select($"k", $"_change_type").as[(Long, String)].collect().toSeq
    assert(changes == Seq((6L, "delete")), s"changelog wrong: $changes")
  }

  test("upsertByKeysMoR: one atomic snapshot, old copies hidden, new visible") {
    val ref = mk()
    val before = IceLite.readManifest(ref).current
    val snap = IceLite.upsertByKeysMoR(spark, ref,
      Seq((3L, "v2"), (11L, "new")).toDF("k", "s"), Seq("k"))
    assert(snap.operation == "upsert-eq")
    assert(before.files.forall(snap.files.contains), "no base file rewritten")
    assert(snap.rowCount == 11, "10 - 1 hidden + 2 new")
    val got = IceLite.read(spark, ref)
      .filter($"k" === 3L || $"k" === 11L)
      .select("s").as[String].collect().sorted.toSeq
    assert(got == Seq("new", "v2"), s"upsert visibility wrong: $got")
    assert(IceLite.read(spark, ref).count() == 11)
    // replay of the SAME batch converges (CDC at-least-once)
    IceLite.upsertByKeysMoR(spark, ref,
      Seq((3L, "v2"), (11L, "new")).toDF("k", "s"), Seq("k"))
    assert(IceLite.read(spark, ref).count() == 11)
    assert(IceLite.read(spark, ref).filter($"k" === 3L)
      .select("s").as[String].collect().toSeq == Seq("v2"))
  }

  test("partitioned CDC: eq delete + upsert land in a day-partitioned table, zero rewrite") {
    // round 12: the single most common CDC landing shape — a
    // day-partitioned bronze table taking keyed upserts
    val wh = graft.GraftTmp.dir("eqdel_part").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "bronze")
    IceLite.createOrReplacePartitioned(ref,
      (1L to 90L).map(k => (k, s"r$k", s"d${k % 3}")).toDF("k", "s", "day"),
      "day")
    val before = IceLite.readManifest(ref).current
    // keyed delete: zero data files touched
    val del = IceLite.deleteByKeysMoR(spark, ref,
      Seq(5L, 6L).toDF("k"), Seq("k"))
    assert(del.files == before.files && del.eqDeletes.nonEmpty)
    assert(del.rowCount == 88L)
    assert(IceLite.read(spark, ref).count() == 88L)
    // keyed upsert: new copies land THROUGH the layout, old hidden
    val up = IceLite.upsertByKeysMoR(spark, ref,
      Seq((7L, "v2", "d1"), (91L, "new", "d1")).toDF("k", "s", "day"),
      Seq("k"))
    assert(before.files.forall(up.files.contains), "no base file rewritten")
    val newFiles = up.files.filterNot(before.files.contains)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("day=d1")),
      s"upsert batch must restage into its value dirs: $newFiles")
    assert(up.rowCount == 89L, "88 - 1 hidden + 2 new")
    val got = IceLite.read(spark, ref)
      .filter($"k" === 7L || $"k" === 91L)
      .select("s").as[String].collect().sorted.toSeq
    assert(got == Seq("new", "v2"))
    // the connector folds the eq sidecars on the partitioned scan
    assert(spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString).count() == 89L)
    // a key overlapping the partition columns refuses loudly (path-
    // borne values are not in the data pages the fold decodes)
    val e = intercept[IllegalArgumentException](
      IceLite.deleteByKeysMoR(spark, ref, Seq("d1").toDF("day"), Seq("day")))
    assert(e.getMessage.contains("partition columns"), e.getMessage)
    // compact materializes within the layout
    val compacted = IceLite.compact(spark, ref)
    assert(compacted.eqDeletes.isEmpty && compacted.rowCount == 89L)
    assert(compacted.files.forall(_.contains("day=")))
    assert(IceLite.read(spark, ref).filter($"k" === 7L)
      .select("s").as[String].head() == "v2")
  }

  test("eq fold survives ESCAPED partition dirs (space in the value)") {
    // `_metadata.file_path` renders an on-disk escaped dir
    // (`g=NOT%20SET`) double-encoded (`%2520`); the fold's added-at
    // lookup must resolve it like every other URI consumer
    // (matchStagedPath) or the sidecar silently stops applying under
    // escaped value dirs and deleted rows resurface — found round 12
    // by the partitioned d72 witness over real o_orderpriority values
    val wh = graft.GraftTmp.dir("eqdel_esc").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "esc")
    IceLite.createOrReplacePartitioned(ref,
      (1L to 60L).map(k =>
        (k, s"r$k", if (k % 2 == 0) "NOT SET" else "a:b")).toDF("k", "s", "g"),
      "g")
    IceLite.deleteByKeysMoR(spark, ref,
      (1L to 60L by 3).toDF("k"), Seq("k"))
    val expect = (1L to 60L).filterNot(k => (k - 1) % 3 == 0).toSet
    assert(IceLite.read(spark, ref).select($"k").as[Long].collect().toSet
      == expect, "eq deletes must apply under escaped dirs")
    // the connector fold too
    assert(spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString).count() == expect.size.toLong)
    val compacted = IceLite.compact(spark, ref)
    assert(compacted.rowCount == expect.size.toLong)
  }

  test("expiry retains sidecars referenced by live snapshots") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(8L).toDF("k"), Seq("k"))
    val sidecar = IceLite.readManifest(ref).current.eqDeletes.head.file
    // orphan gc must treat the sidecar as referenced
    IceLite.gcOrphans(ref, graceMs = 0L)
    assert(Files.exists(ref.dir.resolve(sidecar)),
      "gc reclaimed a referenced equality-delete sidecar")
    assert(IceLite.read(spark, ref).count() == 9)
  }

  test("mixed sidecars: eq deletes on top of live POSITION deletes") {
    val ref = mk()
    // position-delete k in {2,3} (deletion-vector sidecar, no rewrite)
    IceLite.deleteWhereMoR(spark, ref, "k = 2 OR k = 3")
    assert(IceLite.readManifest(ref).current.deleteFiles.nonEmpty)
    // eq-delete {3, 5}: 3 is ALREADY position-hidden, so only 5 counts
    val snap = IceLite.deleteByKeysMoR(spark, ref,
      Seq(3L, 5L).toDF("k"), Seq("k"))
    assert(snap.deleteFiles.nonEmpty && snap.eqDeletes.nonEmpty,
      "both sidecar kinds live at once")
    assert(snap.rowCount == 7, "10 - 2 pos - 1 eq (3 was already hidden)")
    // the combined read path: pos anti-join THEN eq fold after the join
    val got = IceLite.read(spark, ref).select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 4L, 6L, 7L, 8L, 9L, 10L), s"mixed fold wrong: $got")
    // sequence rule still holds with mixed sidecars: re-insert of an
    // eq-deleted key survives, the pos-deleted keys stay gone
    IceLite.append(ref, Seq((5L, "reborn")).toDF("k", "s"))
    assert(IceLite.read(spark, ref).filter($"k" === 5L)
      .select("s").as[String].collect().toSeq == Seq("reborn"))
    assert(IceLite.read(spark, ref).filter($"k" === 2L || $"k" === 3L).count() == 0)
    // upsert on the mixed table: update 4, insert 11
    IceLite.upsertByKeysMoR(spark, ref,
      Seq((4L, "v2"), (11L, "new")).toDF("k", "s"), Seq("k"))
    assert(IceLite.read(spark, ref).count() == 9)
    // compaction materializes BOTH kinds and clears them
    IceLite.compact(spark, ref, targetFiles = 2)
    val after = IceLite.readManifest(ref).current
    assert(after.deleteFiles.isEmpty && after.eqDeletes.isEmpty)
    val fin = IceLite.read(spark, ref).select("k", "s").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(fin.map(_._1) == Seq(1L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
    assert(fin.collect { case (4L, s) => s } == Seq("v2"))
    assert(fin.collect { case (5L, s) => s } == Seq("reborn"))
  }

  test("d73 fold cache: two scans of one eq-live snapshot pay ONE sidecar fold") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(2L, 4L).toDF("k"), Seq("k"))
    def scan(): Long = spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString).count()
    val c0 = graft.sources.IceLiteSource.eqFoldComputes.get
    assert(scan() == 8)
    val afterFirst = graft.sources.IceLiteSource.eqFoldComputes.get
    assert(afterFirst - c0 == 1, "first scan computes the fold")
    assert(scan() == 8)
    assert(scan() == 8)
    assert(graft.sources.IceLiteSource.eqFoldComputes.get == afterFirst,
      "repeat scans of the same sidecar set must hit the cached broadcast")
    // a NEW delete batch changes the sidecar set -> exactly one fresh fold
    IceLite.deleteByKeysMoR(spark, ref, Seq(6L).toDF("k"), Seq("k"))
    assert(scan() == 7)
    assert(scan() == 7)
    assert(graft.sources.IceLiteSource.eqFoldComputes.get == afterFirst + 1,
      "a changed sidecar set computes once, then caches")
    // compaction clears the sidecars -> no fold at all
    IceLite.compact(spark, ref, targetFiles = 1)
    val c1 = graft.sources.IceLiteSource.eqFoldComputes.get
    assert(scan() == 7)
    assert(graft.sources.IceLiteSource.eqFoldComputes.get == c1)
  }

  test("eq_live_depth procedure: the compact nudge signal") {
    val ref = mk()
    IceLite.deleteByKeysMoR(spark, ref, Seq(1L, 2L, 3L).toDF("k"), Seq("k"))
    IceLite.deleteByKeysMoR(spark, ref, Seq(5L).toDF("k"), Seq("k"))
    val (sidecars, keys) = IceLite.eqLiveDepth(ref)
    assert(sidecars == 2 && keys == 4)
    val cat = s"eqcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", ref.warehouse)
    val row = spark.sql(s"""CALL $cat.system.eq_live_depth(
        table => 'src.t', key_threshold => 3)""").head()
    assert(row.getLong(0) == 2 && row.getLong(1) == 4 && row.getBoolean(2))
    // under the threshold: no nudge
    val quiet = spark.sql(s"""CALL $cat.system.eq_live_depth(
        table => 'src.t', key_threshold => 1000)""").head()
    assert(!quiet.getBoolean(2))
    // compacted: zero depth
    IceLite.compact(spark, ref, targetFiles = 1)
    val after = spark.sql(s"CALL $cat.system.eq_live_depth(table => 'src.t')").head()
    assert(after.getLong(0) == 0 && after.getLong(1) == 0 && !after.getBoolean(2))
  }
}
