package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** d67: partitioned writes through the SQL connector — INSERT INTO,
  * INSERT OVERWRITE (whole-table, static PARTITION clause, dynamic
  * mode). Partition overwrite must be file-granular: untouched
  * partitions keep their exact files, and history stays travelable. */
class IceLitePartitionedWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(): (String, TableRef) = {
    val wh = graft.GraftTmp.dir("pw_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("k", "flag"), "flag")
    val cat = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, ref)
  }

  private def rows(cat: String): Seq[(Long, String)] =
    spark.sql(s"SELECT k, flag FROM $cat.src.t ORDER BY k")
      .as[(Long, String)].collect().toSeq

  test("INSERT INTO a partitioned table routes rows to value dirs") {
    val (cat, ref) = mk()
    spark.sql(s"INSERT INTO $cat.src.t VALUES (4L, 'B'), (5L, 'C')")
    assert(rows(cat) ==
      Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"), (5L, "C")))
    val m = IceLite.readManifest(ref)
    assert(m.current.partitionCols == Seq("flag"), "layout marker survives")
    val newFiles = m.current.files.filterNot(
      m.snapshots.head.files.toSet)
    assert(newFiles.nonEmpty &&
      newFiles.forall(f => f.contains("flag=B") || f.contains("flag=C")),
      s"new files must land in their value dirs: $newFiles")
  }

  test("INSERT OVERWRITE without PARTITION clause replaces the table") {
    val (cat, ref) = mk()
    spark.sql(s"INSERT OVERWRITE $cat.src.t VALUES (9L, 'Z')")
    assert(rows(cat) == Seq((9L, "Z")))
    assert(IceLite.readManifest(ref).current.partitionCols == Seq("flag"))
  }

  test("static INSERT OVERWRITE PARTITION replaces only that partition") {
    val (cat, ref) = mk()
    val before = IceLite.readManifest(ref)
    val bFiles = before.current.files.filter(_.contains("flag=B"))
    spark.sql(
      s"INSERT OVERWRITE $cat.src.t PARTITION (flag='A') VALUES (10L), (11L)")
    assert(rows(cat) == Seq((3L, "B"), (10L, "A"), (11L, "A")))
    val m = IceLite.readManifest(ref)
    assert(m.current.files.filter(_.contains("flag=B")) == bFiles,
      "partition B's files must be untouched")
    assert(m.current.operation == "overwrite")
    // history: the pre-overwrite snapshot still reads the old A rows
    val old = spark.sql(
      s"SELECT k FROM $cat.src.t VERSION AS OF ${before.currentSnapshotId}")
      .as[Long].collect().sorted.toSeq
    assert(old == Seq(1L, 2L, 3L))
  }

  test("dynamic partitionOverwriteMode replaces only touched partitions") {
    val (cat, ref) = mk()
    val bFiles = IceLite.readManifest(ref).current.files
      .filter(_.contains("flag=B"))
    withDynamicMode {
      spark.sql(s"INSERT OVERWRITE $cat.src.t VALUES (20L, 'A'), (21L, 'C')")
    }
    assert(rows(cat) == Seq((3L, "B"), (20L, "A"), (21L, "C")))
    assert(IceLite.readManifest(ref).current.files
      .filter(_.contains("flag=B")) == bFiles)
  }

  test("partition pruning still works over connector-written files") {
    val (cat, _) = mk()
    spark.sql(s"INSERT INTO $cat.src.t VALUES (4L, 'C')")
    val got = spark.sql(s"SELECT k FROM $cat.src.t WHERE flag = 'C'")
    assert(got.as[Long].collect().toSeq == Seq(4L))
    // only the C partition's file is planned
    assert(IceLiteSource.lastPlannedFiles.forall(_.contains("flag=C")),
      s"scan read beyond the filtered partition: ${IceLiteSource.lastPlannedFiles}")
  }

  test("DELETE on a partition predicate is metadata-only (d69)") {
    val (cat, ref) = mk()
    val before = IceLite.readManifest(ref)
    val bFiles = before.current.files.filter(_.contains("flag=B"))
    spark.sql(s"DELETE FROM $cat.src.t WHERE flag = 'A'")
    val m = IceLite.readManifest(ref)
    assert(m.current.operation == "delete-partitions",
      s"expected metadata delete, got ${m.current.operation}")
    assert(m.current.files == bFiles,
      "kept files must be the untouched B files, byte-identical")
    assert(rows(cat) == Seq((3L, "B")))
    // history: pre-delete snapshot still reads everything
    val old = spark.sql(
      s"SELECT k FROM $cat.src.t VERSION AS OF ${before.currentSnapshotId}")
      .as[Long].collect().sorted.toSeq
    assert(old == Seq(1L, 2L, 3L))
  }

  test("DELETE with a non-partition predicate still rewrites (CoW)") {
    val (cat, ref) = mk()
    spark.sql(s"DELETE FROM $cat.src.t WHERE k = 1")
    assert(rows(cat) == Seq((2L, "A"), (3L, "B")))
    val m = IceLite.readManifest(ref)
    assert(m.current.operation != "delete-partitions")
    assert(m.current.partitionCols == Seq("flag"), "layout survives CoW")
  }

  test("SQL UPDATE moves rows across partitions, layout survives") {
    val (cat, ref) = mk()
    spark.sql(s"UPDATE $cat.src.t SET flag = 'C' WHERE k = 1")
    assert(rows(cat) == Seq((1L, "C"), (2L, "A"), (3L, "B")))
    val m = IceLite.readManifest(ref)
    assert(m.current.partitionCols == Seq("flag"), "layout marker survives")
    // the rewritten row landed in its NEW partition's value dir
    assert(m.current.files.exists(_.contains("flag=C")),
      s"moved row must live under flag=C: ${m.current.files}")
    // and pruning still works over the rewritten layout
    val got = spark.sql(s"SELECT k FROM $cat.src.t WHERE flag = 'C'")
      .as[Long].collect().toSeq
    assert(got == Seq(1L))
    assert(IceLiteSource.lastPlannedFiles.forall(_.contains("flag=C")),
      s"pruning failed after UPDATE: ${IceLiteSource.lastPlannedFiles}")
  }

  test("TRUNCATE TABLE empties a partitioned table, layout + history survive") {
    val (cat, ref) = mk()
    val before = IceLite.readManifest(ref)
    spark.sql(s"TRUNCATE TABLE $cat.src.t")
    assert(rows(cat).isEmpty)
    val m = IceLite.readManifest(ref)
    assert(m.current.partitionCols == Seq("flag"), "layout marker survives")
    val old = spark.sql(
      s"SELECT k FROM $cat.src.t VERSION AS OF ${before.currentSnapshotId}")
      .as[Long].collect().sorted.toSeq
    assert(old == Seq(1L, 2L, 3L), "pre-truncate snapshot must survive")
    // and the table accepts new inserts after
    spark.sql(s"INSERT INTO $cat.src.t VALUES (9L, 'C')")
    assert(rows(cat) == Seq((9L, "C")))
  }

  test("SHOW PARTITIONS lists the census; DROP PARTITION is metadata-only (d71)") {
    val (cat, ref) = mk()
    val parts = spark.sql(s"SHOW PARTITIONS $cat.src.t")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("flag=A", "flag=B"), s"census wrong: $parts")
    spark.sql(s"ALTER TABLE $cat.src.t DROP PARTITION (flag='A')")
    val m = IceLite.readManifest(ref)
    assert(m.current.operation == "delete-partitions")
    assert(rows(cat) == Seq((3L, "B")))
    val after = spark.sql(s"SHOW PARTITIONS $cat.src.t")
      .collect().map(_.getString(0)).toSeq
    assert(after == Seq("flag=B"))
    // ADD PARTITION refuses: partitions are data-implied
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.src.t ADD PARTITION (flag='Z')"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("data-implied")), s"got: ${e.getMessage}")
  }

  test("WAP: partitioned INSERT stages to the branch; publish lands it") {
    val (cat, ref) = mk()
    spark.conf.set("spark.wap.branch", "audit")
    try {
      spark.sql(s"INSERT INTO $cat.src.t VALUES (7L, 'C')")
      // main unmoved: readers see the pre-stage table
      assert(rows(cat) == Seq((1L, "A"), (2L, "A"), (3L, "B")))
      val m = IceLite.readManifest(ref)
      assert(m.branches.contains("audit"))
    } finally spark.conf.unset("spark.wap.branch")
    IceLite.publish(ref, "audit")
    assert(rows(cat) == Seq((1L, "A"), (2L, "A"), (3L, "B"), (7L, "C")))
    val m2 = IceLite.readManifest(ref)
    assert(m2.current.partitionCols == Seq("flag"),
      "published branch must keep the partition layout")
    assert(m2.current.files.exists(_.contains("flag=C")),
      s"staged file must live in its value dir: ${m2.current.files}")
    // pruning works over the published staged file
    val got = spark.sql(s"SELECT k FROM $cat.src.t WHERE flag = 'C'")
    assert(got.as[Long].collect().toSeq == Seq(7L))
  }

  private def withDynamicMode[T](body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
