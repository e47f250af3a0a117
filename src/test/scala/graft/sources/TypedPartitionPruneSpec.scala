package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** r15 — typed (int/long) identity partition columns: pushed
  * equality/IN/range predicates prune value dirs by PARSED comparison
  * (lexicographic would order "10" < "9"), claim exact on uniformly
  * path-borne canonical dirs, and compose with the grouped metadata
  * fold — `COUNT(*) WHERE year >= 2023 GROUP BY year` on an
  * int-partitioned table reads ZERO parquet files (the verdict-r14
  * task-3 witness). String partition columns keep the r13/r14 paths;
  * non-canonical dirs decline everything typed. */
class TypedPartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (String, String) = {
    val wh = graft.GraftTmp.dir("typedpart_wh").toString
    IceLite.createNamespace(wh, "src")
    val cat = s"tpcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def mkYears(cat: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.src.t (k BIGINT, year INT) " +
      "PARTITIONED BY (year)")
    // 9 and 10 pin the lexicographic trap ("10" < "9" as strings)
    spark.sql(s"INSERT INTO $cat.src.t VALUES " +
      "(1L, 9), (2L, 10), (3L, 2022), (4L, 2023), (5L, 2024), (6L, 2024)")
  }

  test("typed RANGE on an int partition column prunes dirs by parsed " +
      "value (the 9-vs-10 lexicographic trap) and claims exact") {
    val (cat, _) = fresh()
    mkYears(cat)
    val got = spark.sql(s"SELECT k FROM $cat.src.t WHERE year >= 10 ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == Seq(2L, 3L, 4L, 5L, 6L), got.toString)
    assert(IceLiteSource.lastPlannedFiles.forall(f =>
      !f.contains("year=9/")), // "9" < "10" numerically fails the range
      s"lexicographic pruning leak: ${IceLiteSource.lastPlannedFiles}")
    assert(!IceLiteSource.lastPlannedFiles.exists(_.contains("year=9/")))
    val hi = spark.sql(s"SELECT k FROM $cat.src.t WHERE year >= 2023 ORDER BY k")
      .as[Long].collect().toSeq
    assert(hi == Seq(4L, 5L, 6L))
    assert(IceLiteSource.lastPlannedFiles.nonEmpty &&
      IceLiteSource.lastPlannedFiles.forall(f =>
        f.contains("year=2023") || f.contains("year=2024")),
      s"range did not prune: ${IceLiteSource.lastPlannedFiles}")
  }

  test("typed EQUALITY and IN prune and stay exact") {
    val (cat, _) = fresh()
    mkYears(cat)
    val eq = spark.sql(s"SELECT k FROM $cat.src.t WHERE year = 2024 ORDER BY k")
      .as[Long].collect().toSeq
    assert(eq == Seq(5L, 6L))
    assert(IceLiteSource.lastPlannedFiles.nonEmpty &&
      IceLiteSource.lastPlannedFiles.forall(_.contains("year=2024")))
    val in = spark.sql(
      s"SELECT k FROM $cat.src.t WHERE year IN (9, 2023) ORDER BY k")
      .as[Long].collect().toSeq
    assert(in == Seq(1L, 4L))
    assert(IceLiteSource.lastPlannedFiles.nonEmpty &&
      IceLiteSource.lastPlannedFiles.forall(f =>
        f.contains("year=9/") || f.contains("year=2023")))
  }

  test("the d37 typed witness: COUNT(*) WHERE year >= 2023 GROUP BY year " +
      "answers metadata-only (zero parquet reads), values exact") {
    val (cat, _) = fresh()
    mkYears(cat)
    val agg = spark.sql(s"SELECT year, COUNT(*) AS n FROM $cat.src.t " +
      "WHERE year >= 2023 GROUP BY year ORDER BY year")
      .as[(Int, Long)].collect().toSeq
    assert(agg == Seq((2023, 1L), (2024, 2L)), agg.toString)
    assert(IceLiteSource.lastScanMetadataOnly,
      "typed range + grouped fold did not compose metadata-only")
    // typed group keys parse to the declared INT type in the fold
    val plain = spark.sql(s"SELECT year, COUNT(*) AS n FROM $cat.src.t " +
      "GROUP BY year ORDER BY year").as[(Int, Long)].collect().toSeq
    assert(plain == Seq((9, 1L), (10, 1L), (2022, 1L), (2023, 1L),
      (2024, 2L)))
    assert(IceLiteSource.lastScanMetadataOnly)
  }

  test("LONG-typed partition column and null-sentinel dirs: ranges " +
      "exclude nulls (SQL semantics), IS NULL still folds") {
    val (cat, _) = fresh()
    spark.sql(s"CREATE TABLE $cat.src.l (k BIGINT, bucket BIGINT) " +
      "PARTITIONED BY (bucket)")
    spark.sql(s"INSERT INTO $cat.src.l VALUES " +
      "(1L, 7L), (2L, 70L), (3L, CAST(NULL AS BIGINT))")
    val got = spark.sql(
      s"SELECT k FROM $cat.src.l WHERE bucket >= 8 ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == Seq(2L), got.toString) // null fails; 7 < 8 numerically
    assert(IceLiteSource.lastPlannedFiles.nonEmpty &&
      IceLiteSource.lastPlannedFiles.forall(_.contains("bucket=70")))
    val nulls = spark.sql(
      s"SELECT COUNT(*) FROM $cat.src.l WHERE bucket IS NULL")
      .as[Long].head()
    assert(nulls == 1L)
  }

  test("ADD PARTITION FIELD on a typed column keeps its documented " +
      "loud refusal (evolution stays string-keyed); non-canonical " +
      "dirs can never claim (canonicalLong gate)") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "ev")
    IceLite.createOrReplace(ref,
      Seq((1L, 2022), (2L, 2024)).toDF("k", "year"))
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.src.ev ADD PARTITION FIELD year")
    }
    assert(e.getMessage.contains("STRING"), e.getMessage)
    // the typed-claim gate: only canonical integral renderings pass —
    // a migrated "02023"/"+10"/" 10" dir declines typed pruning and
    // claims entirely (filters fall to the generic residual path)
    assert(IceLiteSource.canonicalLong("2023").contains(2023L))
    assert(IceLiteSource.canonicalLong("-7").contains(-7L))
    assert(IceLiteSource.canonicalLong("02023").isEmpty)
    assert(IceLiteSource.canonicalLong("+10").isEmpty)
    assert(IceLiteSource.canonicalLong(" 10").isEmpty)
    assert(IceLiteSource.canonicalLong("ten").isEmpty)
    assert(IceLiteSource.canonicalLong("").isEmpty)
  }
}
