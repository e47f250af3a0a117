package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.icelite.{IceLite, PartitionField, TableRef}

/** r15 — SQL UPDATE / MERGE / non-pushable DELETE under
  * MERGE-ON-READ write modes (the SupportsDelta / WriteDelta seam,
  * Iceberg's `write.update.mode=merge-on-read` role —
  * reference: config/iceberg-template.properties:1-13).
  *
  * The contract pinned here:
  *  - mode resolution: `write.<op>.mode` TBLPROPERTIES drive the
  *    route; `spark.graft.icelite.<op>Mode` session conf overrides;
  *    default copy-on-write (today's behavior, untouched).
  *  - the MoR witness: a matched UPDATE leaves EVERY pre-statement
  *    data file live (zero rewrite), adds one position sidecar +
  *    O(matched) new rows, commits ONE snapshot, and the read view
  *    matches the CoW result exactly.
  *  - compact() materializes the sidecars away (the amortizer).
  */
class IceLiteDeltaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (String, String) = {
    val wh = graft.GraftTmp.dir("delta_wh").toString
    IceLite.createNamespace(wh, "src")
    val cat = s"dcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def df(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"g${i % 5}", i * 1.0)).toDF("id", "grp", "v")

  test("SQL UPDATE under write.update.mode=merge-on-read: zero data-file " +
      "rewrite, one sidecar + matched-row appends, exact view, compact pin") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "u")
    IceLite.createOrReplace(ref, df(1, 400).repartition(3), Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.update.mode" -> "merge-on-read"))

    val before = IceLite.readManifest(ref).current
    assert(before.deleteFiles.isEmpty)
    spark.sql(s"UPDATE $cat.src.u SET v = v + 1000 WHERE id % 10 = 3")
    val after = IceLite.readManifest(ref).current

    // zero data-file rewrite: every pre-statement file is still live
    assert(before.files.forall(after.files.contains),
      s"MoR UPDATE rewrote data files: ${before.files.diff(after.files)}")
    assert(after.operation == "update-mor", after.operation)
    assert(after.deleteFiles.nonEmpty, "no position sidecar committed")
    assert(after.files.size > before.files.size, "no appended rows")
    assert(after.rowCount == before.rowCount, "UPDATE changed the row count")

    // the view matches the CoW semantics exactly
    val got = IceLite.read(spark, ref)
      .select("id", "grp", "v").as[(Long, String, Double)].collect().toSet
    val want = (1L to 400L).map(i =>
      (i, s"g${i % 5}", if (i % 10 == 3) i + 1000.0 else i * 1.0)).toSet
    assert(got == want)

    // SQL face agrees (scan folds the sidecars)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.src.u").as[Double].head() ==
      want.toSeq.map(_._3).sum)

    // compact() materializes the sidecars away; view unchanged
    IceLite.compact(spark, ref)
    val compacted = IceLite.readManifest(ref).current
    assert(compacted.deleteFiles.isEmpty)
    assert(IceLite.read(spark, ref).select("id", "grp", "v")
      .as[(Long, String, Double)].collect().toSet == want)
  }

  test("session conf updateMode overrides the table property (both ways)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "o")
    IceLite.createOrReplace(ref, df(1, 100), Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.update.mode" -> "merge-on-read"))
    // conf says cow → the property is overridden → files ARE rewritten
    spark.conf.set("spark.graft.icelite.updateMode", "copy-on-write")
    try {
      val before = IceLite.readManifest(ref).current
      spark.sql(s"UPDATE $cat.src.o SET v = -1 WHERE id <= 50")
      val after = IceLite.readManifest(ref).current
      assert(after.deleteFiles.isEmpty, "cow override still wrote a sidecar")
      assert(!before.files.forall(after.files.contains),
        "cow override did not rewrite the touched files")
    } finally spark.conf.unset("spark.graft.icelite.updateMode")
    // and the other direction: property absent, conf says mor
    val ref2 = TableRef(wh, "src", "o2")
    IceLite.createOrReplace(ref2, df(1, 100), Seq("id"))
    spark.conf.set("spark.graft.icelite.updateMode", "mor")
    try {
      val before = IceLite.readManifest(ref2).current
      spark.sql(s"UPDATE $cat.src.o2 SET v = -1 WHERE id <= 50")
      val after = IceLite.readManifest(ref2).current
      assert(after.operation == "update-mor")
      assert(before.files.forall(after.files.contains))
    } finally spark.conf.unset("spark.graft.icelite.updateMode")
    // a bad mode value fails the statement loudly
    spark.conf.set("spark.graft.icelite.updateMode", "sideways")
    try {
      val e = intercept[Exception] {
        spark.sql(s"UPDATE $cat.src.o2 SET v = 0 WHERE id = 1")
      }
      assert(e.getMessage.contains("invalid write mode"), e.getMessage)
    } finally spark.conf.unset("spark.graft.icelite.updateMode")
  }

  test("identity-partitioned UPDATE under mor: appended copies land in " +
      "value dirs (a SET on the partition column moves them)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "p")
    IceLite.createOrReplacePartitioned(ref,
      df(1, 200).withColumn("part", concat(lit("p"), ($"id" % 4).cast("string")))
        .repartition(2), Seq("part"), Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.update.mode" -> "merge-on-read"))
    val before = IceLite.readManifest(ref).current
    // move every p3 row to p9 — MoR: p3 files stay live (tombstoned),
    // copies land under part=p9
    spark.sql(s"UPDATE $cat.src.p SET part = 'p9' WHERE part = 'p3'")
    val after = IceLite.readManifest(ref).current
    assert(after.operation == "update-mor")
    assert(before.files.forall(after.files.contains))
    val newFiles = after.files.filterNot(before.files.toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("part=p9")),
      s"copies landed outside part=p9: $newFiles")
    val cnt = spark.sql(
      s"SELECT part, count(*) c FROM $cat.src.p GROUP BY part ORDER BY part")
      .as[(String, Long)].collect().toMap
    assert(cnt.get("p3").isEmpty && cnt("p9") == 50L, cnt.toString)
  }

  test("SQL MERGE under write.merge.mode=merge-on-read: matched updates + " +
      "deletes + inserts in ONE merge-mor snapshot, zero rewrite") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "m")
    IceLite.createOrReplace(ref, df(1, 300).repartition(2), Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.merge.mode" -> "merge-on-read"))
    (250L to 350L).map(i => (i, s"g${i % 5}", -i * 1.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("m_src")
    val before = IceLite.readManifest(ref).current
    spark.sql(
      s"""MERGE INTO $cat.src.m t USING m_src s ON t.id = s.id
         |WHEN MATCHED AND s.id % 2 = 0 THEN UPDATE SET v = s.v
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = IceLite.readManifest(ref).current
    assert(after.operation == "merge-mor", after.operation)
    assert(before.files.forall(after.files.contains),
      "MoR MERGE rewrote data files")
    assert(after.deleteFiles.nonEmpty)
    val got = IceLite.read(spark, ref)
      .select("id", "v").as[(Long, Double)].collect().toMap
    // 1..249 untouched; 250..300 even → updated, odd → deleted;
    // 301..350 inserted
    (1L to 249L).foreach(i => assert(got(i) == i * 1.0))
    (250L to 300L).foreach { i =>
      if (i % 2 == 0) assert(got(i) == -i * 1.0, s"id $i not updated")
      else assert(!got.contains(i), s"id $i not deleted")
    }
    (301L to 350L).foreach(i => assert(got(i) == -i * 1.0, s"id $i missing"))
    // row count stays truthful through the mixed commit
    assert(after.rowCount == got.size.toLong)
    // a merge-mor commit is NOT changelog-decomposable — refused loudly
    val e = intercept[Exception] {
      IceLite.changes(spark, ref, before.id, after.id).collect()
    }
    assert(e.getMessage.contains("rewriting commit"), e.getMessage)
  }

  test("non-pushable DELETE (subquery) under deleteMode=mor takes the " +
      "delta path: delete-mor snapshot, zero rewrite, no appended files") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "d")
    IceLite.createOrReplace(ref, df(1, 200).repartition(2), Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.delete.mode" -> "merge-on-read"))
    Seq(3L, 5L, 7L).toDF("bad").createOrReplaceTempView("d_bad")
    val before = IceLite.readManifest(ref).current
    spark.sql(s"DELETE FROM $cat.src.d WHERE id IN (SELECT bad FROM d_bad)")
    val after = IceLite.readManifest(ref).current
    assert(after.operation == "delete-mor", after.operation)
    assert(after.files == before.files, "delta DELETE changed the file set")
    assert(after.deleteFiles.nonEmpty)
    assert(after.rowCount == before.rowCount - 3)
    assert(IceLite.read(spark, ref).count() == 197)
    assert(!IceLite.read(spark, ref).select("id").as[Long]
      .collect().toSet.exists(Set(3L, 5L, 7L)))
    // pushable DELETE on the same table keeps the existing
    // SupportsDelete seam, property-routed to MoR now (d47 economics)
    spark.sql(s"DELETE FROM $cat.src.d WHERE id = 10")
    val after2 = IceLite.readManifest(ref).current
    assert(after2.operation == "delete-mor")
    assert(after2.files == after.files)
  }

  test("_pos metadata column: physical in-file positions, tombstone-aware") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "pos")
    IceLite.createOrReplace(ref, df(1, 50).coalesce(1), Seq("id"))
    val rows = spark.sql(
      s"SELECT id, _pos FROM $cat.src.pos ORDER BY _pos")
      .as[(Long, Long)].collect()
    assert(rows.map(_._2).toSeq == (0L until 50L).toSeq)
    // after a MoR delete, surviving rows keep their PHYSICAL positions
    IceLite.deleteWhereMoR(spark, ref, "id <= 5")
    val survived = spark.sql(
      s"SELECT id, _pos FROM $cat.src.pos ORDER BY _pos")
      .as[(Long, Long)].collect()
    assert(survived.map(_._2).toSeq == (5L until 50L).toSeq,
      survived.take(8).mkString(","))
    assert(survived.map(_._1).toSet == (6L to 50L).toSet)
  }

  test("pending partition-spec evolution falls back to copy-on-write " +
      "(the statement still executes)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "ev")
    IceLite.createOrReplace(ref, df(1, 100), Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.update.mode" -> "merge-on-read"))
    spark.sql(s"ALTER TABLE $cat.src.ev ADD PARTITION FIELD grp")
    spark.sql(s"UPDATE $cat.src.ev SET v = 0 WHERE id <= 10")
    val after = IceLite.readManifest(ref).current
    assert(after.deleteFiles.isEmpty, "pending-evolution table got a sidecar")
    assert(IceLite.read(spark, ref).filter($"v" === 0).count() == 10)
  }
}
