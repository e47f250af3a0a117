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
    // the omission set is EMPTY since round 10: c11's hyperplanes
    // moved from xxhash64 to a Knuth multiplicative hash the oracle
    // engine computes identically (full value gate), and c02 emits
    // its quality contract (recall vs the exact c12 set, structural
    // precision) as witness columns per b27's tolerance precedent.
    assert(noOracle == Set.empty[String],
      s"oracle coverage drifted: missing=$noOracle")
  }

  test("SURVEY §2 inventory == declared queries (the coverage contract)") {
    // parse the inventory of record so SURVEY and SparkEntry can never
    // drift apart silently (round-5 verdict: d64/d65 were green but
    // ungraded because only SparkEntry knew about them)
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val idRe = "`([abcdmst][0-9]{2}_[a-z0-9_]+)`".r
    val surveyIds = idRe.findAllMatchIn(survey).map(_.group(1)).toSet
    val declared = SparkEntry.queries.keySet
    assert(surveyIds -- declared == Set.empty[String],
      s"SURVEY lists ids with no implementation: ${(surveyIds -- declared).toSeq.sorted}")
    assert(declared -- surveyIds == Set.empty[String],
      s"implemented ids missing from SURVEY §2: ${(declared -- surveyIds).toSeq.sorted}")
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
