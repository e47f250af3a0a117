package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** The SQL-addressable face (IceLiteCatalog): plain `spark.sql` over
  * IceLite tables — SELECT, CTAS, INSERT INTO, DROP — resolving
  * through the same connector tables as the DataFrame path. */
class IceLiteCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Each test registers its own uniquely-named catalog: Spark caches
    * catalog instances per session by name, so reusing one name with
    * a different warehouse would silently read the first one. */
  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("cat_wh").toString
    val name = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  test("SELECT over a catalog identifier equals the API read") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1L to 100L).map(k => (k, k * 2.0)).toDF("k", "v"))
    val got = spark.sql(s"SELECT k, v FROM $cat.src.t WHERE k <= 3 ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 100L)
  }

  test("SHOW namespaces and tables reflect the warehouse") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    IceLite.createOrReplace(TableRef(wh, "src", "t1"), Seq(1).toDF("k"))
    IceLite.createOrReplace(TableRef(wh, "src", "t2"), Seq(2).toDF("k"))
    val ns = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0))
    assert(ns.contains("src"))
    val tables = spark.sql(s"SHOW TABLES IN $cat.src")
      .collect().map(_.getString(1)).sorted
    assert(tables.toSeq == Seq("t1", "t2"))
  }

  test("CTAS creates a table whose first snapshot is the select result") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    IceLite.createOrReplace(TableRef(wh, "src", "t"),
      (1L to 50L).map(k => (k, k * 1.0)).toDF("k", "v"))
    spark.sql(
      s"CREATE TABLE $cat.src.big AS SELECT k, v FROM $cat.src.t WHERE k > 40")
    val ref = TableRef(wh, "src", "big")
    assert(IceLite.tableExists(ref))
    val m = IceLite.readManifest(ref)
    assert(m.snapshots.map(_.operation) == Seq("create"))
    assert(IceLite.read(spark, ref).as[(Long, Double)].collect()
      .map(_._1).sorted.toSeq == (41L to 50L))
    // and the new table is itself SQL-addressable
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.big").head.getLong(0) == 10L)
  }

  test("INSERT INTO appends one snapshot through the catalog") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
    spark.sql(s"INSERT INTO $cat.src.t VALUES (2, 'b'), (3, 'c')")
    val m = IceLite.readManifest(ref)
    assert(m.snapshots.map(_.operation) == Seq("create", "append"))
    assert(IceLite.read(spark, ref).as[(Long, String)].collect().toSeq.sortBy(_._1)
      == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("DROP TABLE removes the table; SELECT then fails to resolve") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "gone")
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    assert(spark.sql(s"DROP TABLE $cat.src.gone") != null)
    assert(!IceLite.tableExists(ref))
    assertThrows[Exception](spark.sql(s"SELECT * FROM $cat.src.gone").collect())
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF pin snapshots") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "tt")
    val s1 = IceLite.createOrReplace(ref,
      (1L to 10L).map(k => (k, "v1")).toDF("k", "s"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    IceLite.append(ref, (11L to 15L).map(k => (k, "v2")).toDF("k", "s"))
    // VERSION AS OF pins the first snapshot
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.tt VERSION AS OF ${s1.id}")
      .head.getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.tt").head.getLong(0) == 15L)
    // TIMESTAMP AS OF between the commits sees only the first
    val lit = java.time.Instant.ofEpochMilli(between).toString.replace("T", " ").replace("Z", "")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.src.tt TIMESTAMP AS OF '$lit'")
      .head.getLong(0) == 10L,
      "TIMESTAMP AS OF between commits must resolve the older snapshot")
    // an unknown version fails loudly
    assertThrows[Exception](
      spark.sql(s"SELECT * FROM $cat.src.tt VERSION AS OF 999").collect())
    // a pinned table refuses writes (history is immutable)
    assertThrows[Exception](spark.sql(
      s"INSERT INTO $cat.src.tt VERSION AS OF ${s1.id} VALUES (99, 'x')"))
  }

  test("DELETE FROM through SQL runs the layout-preserving copy-on-write delete") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplaceSorted(ref,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "s"),
      "k", numFiles = 4, statsCols = Seq("k"))
    val before = IceLite.readManifest(ref).current.files.toSet
    spark.sql(s"DELETE FROM $cat.src.t WHERE k >= 100 AND k < 150")
    val m = IceLite.readManifest(ref)
    assert(m.snapshots.map(_.operation) == Seq("create", "delete"))
    // touched-files-only: 3 of 4 files survive byte-identical
    assert(m.current.files.count(before) == 3)
    // sort layout survived the SQL statement (d32 through SQL)
    assert(m.current.sortedBy.contains("k"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 350L)
    // string predicates render too (escaping included)
    spark.sql(s"DELETE FROM $cat.src.t WHERE s = 'v200'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 349L)
    // a time-travel identifier refuses deletes
    assertThrows[Exception](spark.sql(
      s"DELETE FROM $cat.src.t VERSION AS OF 1 WHERE k = 0"))
  }

  test("metadata tables are SQL identifiers: t\\$snapshots and t\\$partitions") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "pt")
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "p"), "p",
      statsCols = Seq("k"))
    IceLite.appendPartitioned(ref, Seq((4L, "a")).toDF("k", "p"), "p")
    val snaps = spark.sql(
      s"SELECT snapshot_id, operation, n_rows, is_current FROM $cat.src.`pt$$snapshots` ORDER BY snapshot_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(snaps.toSeq == Seq((1L, "create", 3L, false), (2L, "append", 4L, true)))
    val parts = spark.sql(
      s"SELECT p, file_count, row_count FROM $cat.src.`pt$$partitions` ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.toSeq == Seq(("a", 2L, 3L), ("b", 1L, 1L)))
    // unknown suffix fails loudly
    assertThrows[Exception](
      spark.sql(s"SELECT * FROM $cat.src.`pt$$bogus`").collect())
  }

  test("catalog reads keep the connector's pruning and pushdown") {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "sorted")
    IceLite.createOrReplaceSorted(ref,
      (0L until 8000L).map(k => (k, k * 2)).toDF("k", "v"),
      "k", numFiles = 8, statsCols = Seq("k"))
    val rows = spark.sql(
      s"SELECT k, v FROM $cat.src.sorted WHERE k >= 1000 AND k < 2000")
      .as[(Long, Long)].collect()
    assert(rows.length == 1000)
    assert(IceLiteSource.lastPlannedFiles.size < 8,
      s"catalog read lost manifest pruning: ${IceLiteSource.lastPlannedFiles.size} files")
    // aggregate pushdown works through the SQL identifier too
    IceLiteSource.lastScanMetadataOnly = false
    assert(spark.sql(s"SELECT count(*) FROM $cat.src.sorted")
      .head.getLong(0) == 8000L)
    assert(IceLiteSource.lastScanMetadataOnly,
      "count(*) through the catalog must stay metadata-only")
  }
}
