package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** d83: `ALTER TABLE … ADD/DROP PARTITION FIELD` — Iceberg's
  * partition-spec evolution as DDL. The flip is metadata-only (the
  * declared write layout changes; zero existing bytes move); the next
  * INSERT lands under the new layout while old files keep theirs, and
  * reads union the eras with path-borne values (missing on old files
  * ⇒ NULL, Iceberg's pre-evolution semantics). */
class PartitionFieldDdlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (String, String) = {
    val wh = graft.GraftTmp.dir("pfddl_wh").toString
    IceLite.createNamespace(wh, "src")
    val cat = s"pfcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("ADD PARTITION FIELD: metadata-only flip; next INSERT lands the evolved layout") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 20L).map(k => (k, s"g${k % 2}", s"h${k % 3}")).toDF("k", "g", "h"),
      Seq("g"), Nil)
    val filesBefore = IceLite.readManifest(ref).current.files

    spark.sql(s"ALTER TABLE $cat.src.t ADD PARTITION FIELD h")
    val m = IceLite.readManifest(ref)
    // zero data movement: same snapshot files, evolved declaration
    assert(m.current.files == filesBefore)
    assert(m.declaredPartitionCols.contains(Seq("g", "h")))

    // the next INSERT writes g=/h= value dirs; the old era is untouched
    Seq((100L, "g0", "h9")).toDF("k", "g", "h")
      .createOrReplaceTempView("pf_new")
    spark.sql(s"INSERT INTO $cat.src.t (k, g, h) SELECT k, g, h FROM pf_new")
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionCols == Seq("g", "h"), "landed layout must be evolved")
    assert(snap.files.exists(f => f.contains("g=g0") && f.contains("h=h9")),
      s"new file not under the evolved layout: ${snap.files}")
    assert(filesBefore.forall(snap.files.contains), "old era must survive")
  }

  test("reads union both eras: evolved field from data pages (old era) and the path (new era)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "t2")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 10L).map(k => (k, s"g${k % 2}", s"h${k % 3}", k * 1.0))
        .toDF("k", "g", "h", "v"),
      Seq("g"), Nil)
    spark.sql(s"ALTER TABLE $cat.src.t2 ADD PARTITION FIELD h")
    Seq((100L, "g0", "h7", 7.0)).toDF("k", "g", "h", "v")
      .createOrReplaceTempView("pf2_new")
    spark.sql(s"INSERT INTO $cat.src.t2 (k, g, h, v) SELECT k, g, h, v FROM pf2_new")
    val n = spark.sql(s"SELECT COUNT(*) FROM $cat.src.t2").head.getLong(0)
    assert(n == 11L, s"reads must union both eras, got $n")
    // old era: h decodes from the FILE's data pages (real values, not
    // NULL); new era: h comes from the value dir
    val hs = spark.sql(s"SELECT k, h FROM $cat.src.t2 ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 10L).foreach(k => assert(hs(k) == s"h${k % 3}",
      s"old-era h lost: $k -> ${hs(k)}"))
    assert(hs(100L) == "h7", "new-era h must come from the path")
    // and filtering on the evolved field stays exact across eras
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t2 WHERE h = 'h0'")
      .head.getLong(0) == (0L until 10L).count(_ % 3 == 0))
    // a NON-string column refuses the promotion loudly (typed identity
    // keys need field ids this format does not carry)
    val typed = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.src.t2 ADD PARTITION FIELD k"))
    assert(typed.getMessage.contains("not a STRING column"))
  }

  test("overwrites refuse while the evolution is pending; allowed after it lands") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "t3")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 8L).map(k => (k, s"g${k % 2}", s"h${k % 2}")).toDF("k", "g", "h"),
      Seq("g"), Nil)
    spark.sql(s"ALTER TABLE $cat.src.t3 ADD PARTITION FIELD h")
    Seq((50L, "g0", "h0")).toDF("k", "g", "h")
      .createOrReplaceTempView("pf3_rows")
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.src.t3 REPLACE WHERE true SELECT * FROM pf3_rows"))
    assert(e.getMessage != null && e.getMessage.contains("pending"),
      s"overwrite during pending evolution must refuse: ${e.getMessage}")
    // an append lands the new layout; overwrite is legal again
    spark.sql(s"INSERT INTO $cat.src.t3 (k, g, h) SELECT k, g, h FROM pf3_rows")
    spark.sql(s"INSERT INTO $cat.src.t3 REPLACE WHERE true SELECT * FROM pf3_rows")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t3").head.getLong(0) == 1L)
  }

  test("DROP PARTITION FIELD evolves back; refusals are loud and specific") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "t4")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 6L).map(k => (k, s"g${k % 2}", s"h${k % 2}")).toDF("k", "g", "h"),
      Seq("g"), Nil)
    spark.sql(s"ALTER TABLE $cat.src.t4 ADD PARTITION FIELD h")
    spark.sql(s"ALTER TABLE $cat.src.t4 DROP PARTITION FIELD h")
    assert(IceLite.readManifest(ref).writeLayoutCols == Seq("g"))
    // dropping the last field refuses
    val last = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.src.t4 DROP PARTITION FIELD g"))
    assert(last.getMessage.contains("last partition field"))
    // unknown column refuses at DDL time, not at the next INSERT
    val bad = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.src.t4 ADD PARTITION FIELD nope"))
    assert(bad.getMessage.contains("no column nope"))
  }

  test("flat → partitioned: Iceberg's canonical evolution (old era in pages, new era in dirs)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "f1")
    IceLite.createOrReplace(ref,
      (0L until 10L).map(k => (k, s"g${k % 2}", k * 1.0)).toDF("k", "g", "v"))
    val filesBefore = IceLite.readManifest(ref).current.files

    // the flip is metadata-only on a FLAT table too
    spark.sql(s"ALTER TABLE $cat.src.f1 ADD PARTITION FIELD g")
    val m = IceLite.readManifest(ref)
    assert(m.current.files == filesBefore)
    assert(m.current.partitionCols.isEmpty, "current snapshot stays flat")
    assert(m.declaredPartitionCols.contains(Seq("g")))

    // era-2 INSERT lands Hive value dirs; the flat era is untouched
    Seq((100L, "g0", 9.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("f1_new")
    spark.sql(s"INSERT INTO $cat.src.f1 (k, g, v) SELECT k, g, v FROM f1_new")
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionCols == Seq("g"), "landed layout must be declared")
    assert(snap.files.exists(_.contains("g=g0")),
      s"new file not under the evolved layout: ${snap.files}")
    assert(filesBefore.forall(snap.files.contains), "flat era must survive")

    // one SQL read crosses the eras: g from flat pages AND value dirs
    val gs = spark.sql(s"SELECT k, g FROM $cat.src.f1 ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 10L).foreach(k => assert(gs(k) == s"g${k % 2}",
      s"flat-era g lost: $k -> ${gs(k)}"))
    assert(gs(100L) == "g0", "new-era g must come from the path")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.f1 WHERE g = 'g0'")
      .head.getLong(0) == (0L until 10L).count(_ % 2 == 0) + 1)

    // targeted overwrite refuses toward compaction while flat files
    // remain; compact() materializes and legalizes it
    Seq((200L, "g0", 1.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("f1_ow")
    val ow = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE $cat.src.f1 PARTITION (g = 'g0') (k, v) " +
        "SELECT k, v FROM f1_ow"))
    assert(ow.getMessage.contains("compact"), ow.getMessage)
    val mat = IceLite.compact(spark, ref)
    assert(mat.partitionCols == Seq("g"))
    assert(mat.files.forall(_.contains("g=")),
      s"compact must land EVERY row in value dirs: ${mat.files}")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.f1").head.getLong(0) == 11L)
    spark.sql(s"INSERT OVERWRITE $cat.src.f1 PARTITION (g = 'g0') (k, v) " +
      "SELECT k, v FROM f1_ow")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.f1 WHERE g = 'g0'")
      .head.getLong(0) == 1L)
  }

  test("flat → partitioned: compact() alone materializes a pending declaration (no era-2 append)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "f2")
    IceLite.createOrReplace(ref,
      (0L until 8L).map(k => (k, s"g${k % 2}")).toDF("k", "g"))
    spark.sql(s"ALTER TABLE $cat.src.f2 ADD PARTITION FIELD g")
    val snap = IceLite.compact(spark, ref)
    assert(snap.partitionCols == Seq("g"))
    assert(snap.files.forall(_.contains("g=")))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.f2").head.getLong(0) == 8L)
  }

  test("flat → partitioned: sorted marker drops honestly; MoR sidecars refuse the flip") {
    val (cat, wh) = fresh()
    // sorted flat table: the era-2 append clusters by value dirs, so
    // the global sort marker cannot survive — it must DROP (rule 25),
    // not silently keep advertising pruning the files no longer honor
    val sref = TableRef(wh, "src", "fs")
    IceLite.createOrReplaceSorted(TableRef(wh, "src", "fs"),
      (0L until 10L).map(k => (k, s"g${k % 2}", k * 1.0)).toDF("k", "g", "v"),
      "k", numFiles = 2)
    spark.sql(s"ALTER TABLE $cat.src.fs ADD PARTITION FIELD g")
    Seq((100L, "g1", 2.0)).toDF("k", "g", "v")
      .createOrReplaceTempView("fs_new")
    spark.sql(s"INSERT INTO $cat.src.fs (k, g, v) SELECT k, g, v FROM fs_new")
    val snap = IceLite.readManifest(sref).current
    assert(snap.partitionCols == Seq("g"))
    assert(snap.sortedBy.isEmpty, "sort marker must drop with the layout flip")

    // MoR-live flat table: the DDL refuses toward compaction, and a
    // pending evolution refuses NEW MoR sidecars — the partitioned
    // era always starts (and stays) sidecar-free
    val mref = TableRef(wh, "src", "fm")
    IceLite.createOrReplace(mref,
      (0L until 6L).map(k => (k, s"g${k % 2}", k * 1.0)).toDF("k", "g", "v"))
    IceLite.deleteWhereMoR(spark, mref, "k = 0")
    val live = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.src.fm ADD PARTITION FIELD g"))
    assert(live.getMessage.contains("compact"), live.getMessage)
    IceLite.compact(spark, mref)
    spark.sql(s"ALTER TABLE $cat.src.fm ADD PARTITION FIELD g")
    val pend = intercept[Exception](
      IceLite.deleteWhereMoR(spark, mref, "k = 1"))
    assert(pend.getMessage.contains("pending"), pend.getMessage)
  }

  test("compact() materializes the declared layout and ends the mixed era") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "t6")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 12L).map(k => (k, s"g${k % 2}", s"h${k % 3}", k * 2.0))
        .toDF("k", "g", "h", "v"),
      Seq("g"), Nil)
    spark.sql(s"ALTER TABLE $cat.src.t6 ADD PARTITION FIELD h")
    Seq((100L, "g0", "h9", 1.0)).toDF("k", "g", "h", "v")
      .createOrReplaceTempView("pf6_new")
    spark.sql(s"INSERT INTO $cat.src.t6 (k, g, h, v) SELECT * FROM pf6_new")
    val logicalBefore = spark.sql(
      s"SELECT k, g, h, v FROM $cat.src.t6 ORDER BY k").collect().toSeq
    // the escape hatch the overwrite refusal points at:
    val snap = IceLite.compact(spark, ref)
    assert(snap.partitionCols == Seq("g", "h"))
    assert(snap.files.forall(f => f.contains("g=") && f.contains("h=")),
      s"compact must land EVERY row in the evolved layout: ${snap.files}")
    // logical content byte-identical through the rewrite
    val logicalAfter = spark.sql(
      s"SELECT k, g, h, v FROM $cat.src.t6 ORDER BY k").collect().toSeq
    assert(logicalAfter == logicalBefore)
    // old-era h values survived the materialization (they came from
    // data pages; now they live in the path)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t6 WHERE h = 'h0'")
      .head.getLong(0) == (0L until 12L).count(_ % 3 == 0))
    // targeted overwrites are legal again
    Seq((200L, "g0", "h9", 3.0)).toDF("k", "g", "h", "v")
      .createOrReplaceTempView("pf6_ow")
    spark.sql(s"INSERT OVERWRITE $cat.src.t6 PARTITION (g = 'g0', h = 'h9') " +
      "(k, v) SELECT k, v FROM pf6_ow")
    assert(spark.sql(
        s"SELECT k FROM $cat.src.t6 WHERE g = 'g0' AND h = 'h9'")
      .collect().map(_.getLong(0)).toSeq == Seq(200L))
  }

  test("evolution DDL works over the REST attachment (one POST)") {
    val wh = graft.GraftTmp.dir("pfddl_rest").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t5")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 6L).map(k => (k, s"g${k % 2}", s"h${k % 2}")).toDF("k", "g", "h"),
      Seq("g"), Nil)
    val srv = new rest.CatalogServer(wh).start()
    try {
      val cat = s"pfrest_${java.util.UUID.randomUUID.toString.take(8)}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[rest.IceLiteRestCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.uri)
      spark.sql(s"ALTER TABLE $cat.src.t5 ADD PARTITION FIELD h")
      assert(IceLite.readManifest(ref).declaredPartitionCols
        .contains(Seq("g", "h")), "owner must see the remote evolution")
      // the attachment's next INSERT writes the evolved layout
      Seq((60L, "g1", "h7")).toDF("k", "g", "h")
        .createOrReplaceTempView("pf5_new")
      spark.sql(s"INSERT INTO $cat.src.t5 (k, g, h) SELECT k, g, h FROM pf5_new")
      val snap = IceLite.readManifest(ref).current
      assert(snap.partitionCols == Seq("g", "h"))
      assert(snap.files.exists(f => f.contains("h=h7")))

      // flat → partitioned over the wire too: the spooled POINTER
      // carries the declaration, so the attachment's INSERT lands the
      // evolved layout on a table whose current snapshot is flat
      val fref = TableRef(wh, "src", "tf")
      IceLite.createOrReplace(fref,
        (0L until 4L).map(k => (k, s"g${k % 2}")).toDF("k", "g"))
      spark.sql(s"ALTER TABLE $cat.src.tf ADD PARTITION FIELD g")
      Seq((10L, "g0")).toDF("k", "g").createOrReplaceTempView("pf5_flat")
      spark.sql(s"INSERT INTO $cat.src.tf (k, g) SELECT k, g FROM pf5_flat")
      val fsnap = IceLite.readManifest(fref).current
      assert(fsnap.partitionCols == Seq("g"))
      assert(fsnap.files.exists(_.contains("g=g0")))
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.tf WHERE g = 'g0'")
        .head.getLong(0) == 3L)
    } finally srv.stop()
  }
}
