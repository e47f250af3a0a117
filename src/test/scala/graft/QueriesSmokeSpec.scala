package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator id must produce a non-empty, re-runnable
  * result on the smoke fixture — "green with no tests" is not a state
  * this repo returns to. The oracle VALUE check lives in the driver
  * gate (Verify + DuckDB) and tools/check.py. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // streaming + heavy pipeline ids are exercised by their own suites;
  // smoke here covers the pure-query ids cheaply
  private val skip = Set(
    "s01_stream_file_source", "s02_stream_tumbling_count",
    "s03_stream_sliding_agg", "s04_stream_session_window",
    "s05_stream_dedup", "s06_stream_late_data",
    "s07_stream_foreachbatch_sink", "s08_stream_custom_state")

  test("every declared id has an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the full list of legitimate omissions (sketches, hash-dependent,
    // catalog ops, watermark-dependent streaming)
    val allowed = Set("b04_catalog_tables", "b27_agg_approx_distinct",
      "c02_dedup_near_minhash", "s06_stream_late_data",
      "m02_feature_extract_stub", "c11_dedup_simhash")
    assert(noOracle == allowed,
      s"oracle coverage drifted: missing=${noOracle -- allowed}")
  }

  test("declared ids cover the full SURVEY §2 inventory") {
    val ids = SparkEntry.queries.keySet
    val a = (1 to 15).map(i => f"a$i%02d")
    val b = (1 to 63).map(i => f"b$i%02d")
    val c = (1 to 13).map(i => f"c$i%02d")
    val s = (1 to 9).map(i => f"s$i%02d")
    val m = (1 to 4).map(i => f"m$i%02d")
    val t = (1 to 5).map(i => f"t$i%02d")
    val d = (1 to 13).map(i => f"d$i%02d")
    val expectedPrefixes = a ++ b ++ c ++ s ++ m ++ t ++ d
    val declaredPrefixes = ids.map(_.take(3))
    val missing = expectedPrefixes.toSet -- declaredPrefixes
    assert(missing.isEmpty, s"undeclared SURVEY ids: ${missing.toSeq.sorted}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (id, _) => skip(id) }
    .foreach { case (id, fn) =>
      test(s"$id returns rows on ${TestSpark.sfDir}") {
        val n = fn(spark, TestSpark.sfDir).count()
        assert(n > 0, s"$id returned 0 rows")
      }
    }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
