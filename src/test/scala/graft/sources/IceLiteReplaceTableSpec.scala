package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** d70: atomic CREATE [OR REPLACE] / REPLACE TABLE AS SELECT through
  * the staging catalog — the SELECT's files land invisibly, one CAS
  * commit publishes them, and a failed statement never drops or
  * half-writes the target. */
class IceLiteReplaceTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = graft.GraftTmp.dir("rt_wh").toString
    val name = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    IceLite.createNamespace(wh, "src")
    (name, wh)
  }

  test("CREATE OR REPLACE TABLE AS SELECT swaps atomically, history survives") {
    val (cat, wh) = freshCatalog()
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((1L, "old")).toDF("k", "tag"))
    val before = IceLite.readManifest(ref)
    spark.sql(s"CREATE OR REPLACE TABLE $cat.src.t AS " +
      "SELECT * FROM VALUES (10L, 'new'), (11L, 'new') AS v(k, tag)")
    val got = spark.sql(s"SELECT k, tag FROM $cat.src.t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((10L, "new"), (11L, "new")))
    val m = IceLite.readManifest(ref)
    assert(m.current.operation == "replace")
    // pre-replace snapshot still travelable
    val old = spark.sql(
      s"SELECT tag FROM $cat.src.t VERSION AS OF ${before.currentSnapshotId}")
      .as[String].collect().toSeq
    assert(old == Seq("old"))
  }

  test("REPLACE TABLE refuses a missing target; CTAS refuses an existing one") {
    val (cat, wh) = freshCatalog()
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE $cat.src.missing AS SELECT 1L AS k")
    }
    IceLite.createOrReplace(TableRef(wh, "src", "have"),
      Seq(1L).toDF("k"))
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.src.have AS SELECT 2L AS k")
    }
    // target unchanged by the failed CTAS
    assert(spark.sql(s"SELECT k FROM $cat.src.have").as[Long].collect()
      .toSeq == Seq(1L))
  }

  test("CREATE OR REPLACE ... PARTITIONED BY lands the new layout") {
    val (cat, wh) = freshCatalog()
    val ref = TableRef(wh, "src", "p")
    IceLite.createOrReplace(ref, Seq((1L, "x")).toDF("k", "flag"))
    spark.sql(s"CREATE OR REPLACE TABLE $cat.src.p PARTITIONED BY (flag) AS " +
      "SELECT * FROM VALUES (1L, 'A'), (2L, 'B') AS v(k, flag)")
    val m = IceLite.readManifest(ref)
    assert(m.current.partitionCols == Seq("flag"))
    assert(m.current.files.forall(f =>
      f.contains("flag=A") || f.contains("flag=B")), s"${m.current.files}")
    val got = spark.sql(s"SELECT k FROM $cat.src.p WHERE flag = 'B'")
      .as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("a failed REPLACE leaves the old table intact (atomicity)") {
    val (cat, wh) = freshCatalog()
    val ref = TableRef(wh, "src", "t2")
    IceLite.createOrReplace(ref, Seq((1L, 1.0)).toDF("k", "v"))
    // the SELECT throws mid-write -> abortStagedChanges, no commit
    intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TABLE $cat.src.t2 AS " +
        "SELECT CAST(k AS BIGINT) AS k, assert_true(k < 0) AS v " +
        s"FROM $cat.src.t2")
    }
    val m = IceLite.readManifest(ref)
    assert(m.current.operation != "replace", "failed replace committed")
    assert(spark.sql(s"SELECT k FROM $cat.src.t2").as[Long].collect()
      .toSeq == Seq(1L))
    // no stray staged bytes beyond the manifest's files
    val dataFiles = IceLite.listDir(java.nio.file.Files.walk(ref.dataDir))(_
      .filter(p => p.toString.endsWith(".parquet")).toSeq)
    assert(dataFiles.size == m.current.files.size,
      s"staged bytes leaked: $dataFiles vs ${m.current.files}")
  }
}
