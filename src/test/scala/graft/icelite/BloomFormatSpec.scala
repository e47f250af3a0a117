package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The Bloom sidecar's two storage formats — driver-map JSON (small
  * tables) and parquet sidecar table (the scale path: build lands
  * distributed, pruning is one aggregation job) — must make
  * IDENTICAL pruning decisions. */
class BloomFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(): TableRef = {
    val wh = graft.GraftTmp.dir("bloomfmt_wh").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    // 8 files of disjoint key ranges so membership pruning has teeth
    (0 until 8).foreach { i =>
      val lo = i * 100L
      IceLite.append(ref, (lo until lo + 100L).map(k => (k, s"r$k")).toDF("k", "s"))
    }
    ref
  }

  test("json and parquet sidecars prune identically") {
    val ref = mk()
    val probes = Seq(5L, 150L, 420L, 799L, 5000L, -3L)
    BloomIndex.build(spark, ref, "k", format = "json")
    assert(Files.exists(ref.dir.resolve("bloom.k.json")))
    val jsonDecisions = probes.map(v =>
      v -> BloomIndex.prunedFiles(ref, "k", v).sorted)
    BloomIndex.build(spark, ref, "k", format = "parquet")
    assert(Files.exists(ref.dir.resolve("bloom.k.parquet")))
    assert(!Files.exists(ref.dir.resolve("bloom.k.json")),
      "rebuilding parquet must retire the json sidecar")
    val pqDecisions = probes.map(v =>
      v -> BloomIndex.prunedFiles(ref, "k", v).sorted)
    assert(jsonDecisions == pqDecisions,
      s"formats disagree:\n json=$jsonDecisions\n  pq=$pqDecisions")
    // present keys keep exactly their file; absent keys prune everything
    val hit = pqDecisions.toMap.apply(420L)
    assert(hit.size == 1, s"420 lives in one file, kept $hit")
    assert(pqDecisions.toMap.apply(5000L).isEmpty)
    // and the lookup answers agree with a full scan
    val viaBloom = BloomIndex.readPointLookup(spark, ref, "k", 420L)
      .select("s").as[String].collect().toSeq
    assert(viaBloom == Seq("r420"))
  }

  test("parquet sidecar: unindexed late files are conservatively kept") {
    val ref = mk()
    BloomIndex.build(spark, ref, "k", format = "parquet")
    IceLite.append(ref, Seq((9999L, "late")).toDF("k", "s"))
    val kept = BloomIndex.prunedFiles(ref, "k", 9999L)
    assert(kept.nonEmpty, "a file appended after the build must be kept")
    assert(BloomIndex.readPointLookup(spark, ref, "k", 9999L)
      .select("s").as[String].collect().toSeq == Seq("late"))
  }

  test("refreshAll rebuilds each format into itself") {
    val ref = mk()
    BloomIndex.build(spark, ref, "k", format = "parquet")
    IceLite.compact(spark, ref, targetFiles = 2) // triggers refreshAll
    assert(Files.exists(ref.dir.resolve("bloom.k.parquet")),
      "compaction must refresh the parquet sidecar in place")
    assert(!Files.exists(ref.dir.resolve("bloom.k.json")))
    // post-compact pruning still exact
    assert(BloomIndex.readPointLookup(spark, ref, "k", 420L)
      .select("s").as[String].collect().toSeq == Seq("r420"))
    assert(BloomIndex.prunedFiles(ref, "k", 123456L).isEmpty)
  }

  test("auto format switches on file count") {
    val ref = mk() // 8 files — stays json
    BloomIndex.build(spark, ref, "k", format = "auto")
    assert(Files.exists(ref.dir.resolve("bloom.k.json")))
    assert(!Files.exists(ref.dir.resolve("bloom.k.parquet")))
  }
}
