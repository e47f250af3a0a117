package graft.icelite

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The r16 merged-schema REPLAY cache: repeated reads of the same
  * file set must replay the first read's merged schema (no distributed
  * footer-merge job) without changing what any read returns — and a
  * file REWRITTEN at the same path (the DROP + re-CREATE path-reuse
  * hazard) must invalidate the entry via the size/mtime identity key,
  * never serve the stale schema. */
class SchemaReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Stage `df` as exactly one parquet file at table-relative `rel`. */
  private def stageAt(ref: TableRef, rel: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = graft.GraftTmp.dir("schemareplay_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = IceLite.listDir(Files.list(tmp))(_
      .find(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith(".")).get)
    val dest = ref.dir.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
  }

  private def mkRef(): TableRef = {
    val wh = graft.GraftTmp.dir("schemareplay_wh").toString
    IceLite.createNamespace(wh, "src")
    TableRef(wh, "src", "t")
  }

  test("repeated evolved reads return identical schema and rows") {
    val ref = mkRef()
    IceLite.append(ref, (1L to 50L).map(k => (k, k * 2)).toDF("a", "b"))
    // evolved append: extra column -> the mergeSchema union path
    IceLite.append(ref,
      (51L to 80L).map(k => (k, k * 2, s"s$k")).toDF("a", "b", "c"))
    val first = IceLite.read(spark, ref)
    val firstRows = first.orderBy("a").collect().toSeq
    // second and third reads hit the replay path (same file identity)
    (1 to 2).foreach { _ =>
      val again = IceLite.read(spark, ref)
      assert(again.schema == first.schema)
      assert(again.orderBy("a").collect().toSeq == firstRows)
    }
    // old-era rows surface null for the later-added column, replayed
    // exactly as mergeSchema inferred it on the first read
    assert(IceLite.read(spark, ref)
      .filter("a <= 50 AND c IS NULL").count() == 50L)
  }

  test("a file rewritten at the same path is never served stale") {
    val ref = mkRef()
    val rel = "data/fixed.parquet"
    stageAt(ref, rel, (1L to 10L).map(k => Tuple1(k)).toDF("a"))
    val before = IceLite.readFiles(spark, ref, Seq(rel))
    assert(before.columns.toSeq == Seq("a"))
    assert(before.count() == 10L)
    // replay read (cache warm for this identity)
    assert(IceLite.readFiles(spark, ref, Seq(rel)).count() == 10L)
    // rewrite the SAME relative path with a different schema and size
    // (DROP + re-CREATE can reuse paths; version counters restart)
    stageAt(ref, rel,
      (1L to 25L).map(k => (k, s"v$k")).toDF("a", "b"))
    val after = IceLite.readFiles(spark, ref, Seq(rel))
    assert(after.columns.toSeq.sorted == Seq("a", "b"))
    assert(after.count() == 25L)
    assert(after.filter("b IS NULL").count() == 0L)
  }
}
