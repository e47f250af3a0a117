package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** d68: SQL-native partitioned table lifecycle — CREATE TABLE …
  * PARTITIONED BY, pre-insert SELECT (empty, declared schema), INSERT
  * INTO routing to value dirs, partition-pruned reads, overwrite. */
class IceLiteCreatePartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = graft.GraftTmp.dir("cpt_wh").toString
    val name = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    IceLite.createNamespace(wh, "src")
    (name, wh)
  }

  test("CREATE TABLE PARTITIONED BY -> empty SELECT -> INSERT -> pruned read") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src.t (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p)")
    // declared schema answers before any data lands; partition col last
    val empty = spark.sql(s"SELECT * FROM $cat.src.t")
    assert(empty.columns.toSeq == Seq("k", "v", "p"))
    assert(empty.count() == 0)
    spark.sql(s"INSERT INTO $cat.src.t VALUES " +
      "(1L, CAST(1.5 AS DOUBLE), 'A'), (2L, CAST(2.5 AS DOUBLE), 'B')")
    val ref = TableRef(wh, "src", "t")
    val m = IceLite.readManifest(ref)
    assert(m.current.partitionCols == Seq("p"))
    assert(m.current.files.forall(f =>
      f.contains("p=A") || f.contains("p=B")), s"${m.current.files}")
    val got = spark.sql(s"SELECT k FROM $cat.src.t WHERE p = 'B'")
      .as[Long].collect().toSeq
    assert(got == Seq(2L))
    assert(IceLiteSource.lastPlannedFiles.forall(_.contains("p=B")),
      s"pruning failed: ${IceLiteSource.lastPlannedFiles}")
  }

  test("static PARTITION overwrite works on a DDL-created table") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src.t2 (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $cat.src.t2 VALUES (1L, 'A'), (2L, 'B')")
    spark.sql(s"INSERT OVERWRITE $cat.src.t2 PARTITION (p='A') VALUES (7L)")
    val got = spark.sql(s"SELECT k, p FROM $cat.src.t2 ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "B"), (7L, "A")))
  }

  test("CTAS PARTITIONED BY lands partitioned") {
    val (cat, wh) = freshCatalog()
    Seq((1L, "X"), (2L, "Y"), (3L, "X")).toDF("k", "p")
      .createOrReplaceTempView("cpt_src")
    spark.sql(s"CREATE TABLE $cat.src.t3 PARTITIONED BY (p) AS " +
      "SELECT k, p FROM cpt_src")
    val m = IceLite.readManifest(TableRef(wh, "src", "t3"))
    assert(m.current.partitionCols == Seq("p"))
    val got = spark.sql(s"SELECT k FROM $cat.src.t3 WHERE p = 'X'")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("CTAS PARTITIONED BY with the partition column FIRST binds by name") {
    // regression: the staged writer used to bind rows POSITIONALLY to
    // the reordered declared schema (data cols first, partition col
    // last), so SELECT p, k landed k in p and p in k
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src.t5 PARTITIONED BY (p) AS " +
      "SELECT * FROM VALUES ('PA', 'ka'), ('PB', 'kb') v(p, k)")
    val got = spark.sql(s"SELECT k, p FROM $cat.src.t5 ORDER BY k")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("ka", "PA"), ("kb", "PB")))
    val pruned = spark.sql(s"SELECT k FROM $cat.src.t5 WHERE p = 'PB'")
      .as[String].collect().toSeq
    assert(pruned == Seq("kb"))
  }

  test("CTAS PARTITIONED BY with a non-string partition source column") {
    // the INT partition value is path-borne and surfaces as STRING
    // (Hive layout); the data column keeps its own type and values
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src.t6 PARTITIONED BY (p) AS " +
      "SELECT * FROM VALUES (10, 1L), (20, 2L) v(p, k)")
    val m = IceLite.readManifest(TableRef(wh, "src", "t6"))
    assert(m.current.partitionCols == Seq("p"))
    assert(m.current.files.forall(f => f.contains("p=10") || f.contains("p=20")),
      s"${m.current.files}")
    val got = spark.sql(s"SELECT k, p FROM $cat.src.t6 ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "10"), (2L, "20")))
  }

  test("REPLACE TABLE PARTITIONED BY, partition column mid-SELECT") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src.t7 AS SELECT 1L AS old")
    spark.sql(s"CREATE OR REPLACE TABLE $cat.src.t7 PARTITIONED BY (p) AS " +
      "SELECT * FROM VALUES (1L, 'A', 1.5D), (2L, 'B', 2.5D) v(k, p, v)")
    val got = spark.sql(s"SELECT k, p, v FROM $cat.src.t7 ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "A", 1.5), (2L, "B", 2.5)))
  }

  test("ALTER on a still-empty DDL table is visible in its schema") {
    // regression: schemaOf's declared-DDL early return used to bypass
    // the add/drop/rename/widen ledgers until the first file landed
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.src.t8 (k BIGINT, junk INT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql(s"ALTER TABLE $cat.src.t8 ADD COLUMN note STRING")
    spark.sql(s"ALTER TABLE $cat.src.t8 DROP COLUMN junk")
    val cols = spark.sql(s"SELECT * FROM $cat.src.t8").columns.toSeq
    assert(cols == Seq("k", "p", "note"), cols.toString)
  }

  test("transform DDL creates hidden-partition tables (d84); unsupported transforms refuse") {
    val (cat, _) = freshCatalog()
    // bucket/days/truncate now CREATE hidden-partition tables
    // (TransformedSqlWriteSpec covers the write path end-to-end)
    spark.sql(s"CREATE TABLE $cat.src.t4 (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t4").head.getLong(0) == 0L)
    // the full time family creates too (r10: years/months/hours —
    // PartitionTransformSpec covers their write/prune paths)
    spark.sql(s"CREATE TABLE $cat.src.t4y (k BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (years(ts), hours(ts))")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t4y").head.getLong(0) == 0L)
    // a transform outside the supported set still refuses loudly
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.src.t5 (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (foo(ts))")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("unsupported partition transform")),
      s"expected unsupported-transform refusal, got: ${e.getMessage}")
  }
}
