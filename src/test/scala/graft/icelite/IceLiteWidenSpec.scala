package graft.icelite

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.TestSpark

/** d66: ALTER COLUMN TYPE widening — Iceberg's lossless metadata-only
  * type promotions (int→bigint, float→double). Old files keep narrow
  * bytes; every read face (engine, connector columnar, connector row
  * fallback, SQL) upcasts at decode. */
class IceLiteWidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(): TableRef = {
    val wh = graft.GraftTmp.dir("widen_spec").toString
    IceLite.createNamespace(wh, "src")
    TableRef(wh, "src", "t")
  }

  private def freshCatalog(wh: String): String = {
    val name = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  test("int->bigint: metadata-only, mixed-era reads upcast, big values land") {
    val ref = mk()
    IceLite.createOrReplace(ref, Seq((1, "a"), (2, "b")).toDF("k", "s"))
    val filesBefore = IceLite.readManifest(ref).current.files
    IceLite.alterWidenColumn(ref, "k", "bigint")
    val m = IceLite.readManifest(ref)
    assert(m.current.files == filesBefore, "widen must not touch data files")
    assert(m.widenedCols.map(w => (w.name, w.fromType, w.toType)) ==
      Seq(("k", "int", "bigint")))
    // engine face: widened schema, narrow-era values intact
    val df = IceLite.read(spark, ref)
    assert(df.schema("k").dataType == LongType)
    assert(df.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // post-widen append may carry values beyond int range
    val big = Int.MaxValue.toLong + 7L
    IceLite.append(ref, Seq((big, "c")).toDF("k", "s"))
    val got = IceLite.read(spark, ref).select("k").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, big))
  }

  test("float->double widens through the connector (columnar path)") {
    val ref = mk()
    IceLite.createOrReplace(ref,
      Seq((1L, 1.5f), (2L, 2.5f)).toDF("k", "v"))
    IceLite.alterWidenColumn(ref, "v", "double")
    val cat = freshCatalog(ref.warehouse)
    val df = spark.sql(s"SELECT k, v FROM $cat.src.t ORDER BY k")
    assert(df.schema("v").dataType == DoubleType)
    assert(df.collect().map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    assert(spark.sql(s"SELECT sum(v) FROM $cat.src.t").head.getDouble(0) == 4.0)
  }

  test("SQL ALTER COLUMN TYPE through the catalog; SQL reads mix eras") {
    val ref = mk()
    IceLite.createOrReplace(ref, Seq((10, 100L)).toDF("k", "n"))
    val cat = freshCatalog(ref.warehouse)
    spark.sql(s"ALTER TABLE $cat.src.t ALTER COLUMN k TYPE BIGINT")
    val big = Int.MaxValue.toLong + 1L
    spark.sql(s"INSERT INTO $cat.src.t VALUES ($big, 200L)")
    val got = spark.sql(s"SELECT k FROM $cat.src.t ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == Seq(10L, big))
    assert(spark.sql(s"SELECT sum(k) FROM $cat.src.t").head.getLong(0)
      == 10L + big)
  }

  test("time travel to a pre-widen snapshot sees the narrow type") {
    val ref = mk()
    val s1 = IceLite.createOrReplace(ref, Seq((1, "a")).toDF("k", "s"))
    // the widen scopes to the snapshot CURRENT at alter time onward
    // (d51's convention) — commit s2 first so s1 predates the alter
    IceLite.append(ref, Seq((2, "b")).toDF("k", "s"))
    IceLite.alterWidenColumn(ref, "k", "bigint")
    val cat = freshCatalog(ref.warehouse)
    val old = spark.sql(s"SELECT * FROM $cat.src.t VERSION AS OF ${s1.id}")
    assert(old.schema("k").dataType == IntegerType)
    val cur = spark.sql(s"SELECT * FROM $cat.src.t")
    assert(cur.schema("k").dataType == LongType)
    assert(cur.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("row-fallback read path (MoR tombstones) upcasts narrow files") {
    val ref = mk()
    IceLite.createOrReplace(ref,
      (1 to 10).map(i => (i, s"r$i")).toDF("k", "s"))
    IceLite.alterWidenColumn(ref, "k", "bigint")
    // MoR delete forces the connector's row-based reader (tombstones)
    IceLite.deleteWhereMoR(spark, ref, "k = 3")
    val cat = freshCatalog(ref.warehouse)
    val got = spark.sql(s"SELECT k FROM $cat.src.t ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == (1 to 10).filter(_ != 3).map(_.toLong))
  }

  test("refusals: lossy changes, layout columns, renamed columns") {
    val ref = mk()
    IceLite.createOrReplace(ref, Seq((1L, 1.0, "x")).toDF("k", "v", "s"))
    intercept[IllegalArgumentException] { // long -> int is lossy
      IceLite.alterWidenColumn(ref, "k", "int")
    }
    intercept[IllegalArgumentException] { // string -> bigint is not a promotion
      IceLite.alterWidenColumn(ref, "s", "bigint")
    }
    val p = mk()
    IceLite.createOrReplacePartitioned(p,
      Seq((1, "A"), (2, "B")).toDF("k", "flag"), "flag")
    intercept[IllegalArgumentException] { // partition layout column
      IceLite.alterWidenColumn(p, "flag", "bigint")
    }
    val r = mk()
    IceLite.createOrReplace(r, Seq((1, "a")).toDF("k", "s"))
    IceLite.alterRenameColumn(r, "k", "kk")
    intercept[IllegalArgumentException] { // rename history
      IceLite.alterWidenColumn(r, "kk", "bigint")
    }
  }

  test("time travel to a pre-widen snapshot surfaces the NARROW type") {
    val ref = mk()
    IceLite.createOrReplace(ref, Seq((1, "a"), (2, "b")).toDF("k", "s"))
    val preWiden = IceLite.readManifest(ref).currentSnapshotId
    // widen scopes to the snapshot current AT ALTER TIME onward
    // (d51's convention) — commit once more so preWiden predates it
    IceLite.append(ref, Seq((3, "m")).toDF("k", "s"))
    IceLite.alterWidenColumn(ref, "k", "bigint")
    IceLite.append(ref, Seq((Int.MaxValue.toLong + 7L, "c")).toDF("k", "s"))
    // engine-face time travel scopes the widen ledger by snapshot id,
    // matching the connector's VERSION AS OF schema
    val old = IceLite.readAt(spark, ref, preWiden)
    assert(old.schema("k").dataType == IntegerType,
      s"pre-widen era must keep int, got ${old.schema("k").dataType}")
    assert(old.select("k").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(IceLite.read(spark, ref).schema("k").dataType == LongType)
  }
}
