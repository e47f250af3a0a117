package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** d90's transform functions: the split keys parsed from derived dirs
  * must equal the bound functions' outputs for every instant that
  * lands in the dir — including the DST fall-back hour the dir
  * COLLAPSES (two offsets, one "yyyy-MM-dd-HH" label). */
class GraftFunctionsSpec extends AnyFunSuite {
  private val ny = java.time.ZoneId.of("America/New_York")

  test("hours keys are dir LABELS: both DST fall-back offsets map to one key") {
    // 2025-11-02 01:30 exists twice in America/New_York (EDT then
    // EST); both land in dir 2025-11-02-01, so both must key there —
    // an epoch-hour key would route the second occurrence to a key
    // no split claims and a one-side-shuffle join would silently
    // drop its matches
    val edt = java.time.Instant.parse("2025-11-02T05:30:00Z") // 01:30 EDT
    val est = java.time.Instant.parse("2025-11-02T06:30:00Z") // 01:30 EST
    def key(i: java.time.Instant): Int = GraftFunctions.timeKey("hours",
      java.time.ZonedDateTime.ofInstant(i, ny))
    assert(key(edt) == key(est), "fall-back hour must collapse like its dir")
    assert(key(edt) == GraftFunctions.dirTimeKey("hours", "2025-11-02-01"),
      "function key must equal the dir label's key")
    // spring-forward: 03:30 EDT the day the 02 hour vanishes
    val sf = java.time.Instant.parse("2025-03-09T07:30:00Z")
    assert(GraftFunctions.timeKey("hours",
        java.time.ZonedDateTime.ofInstant(sf, ny)) ==
      GraftFunctions.dirTimeKey("hours", "2025-03-09-03"))
  }

  test("days/months/years function keys equal their dir labels") {
    val i = java.time.Instant.parse("2024-01-04T19:30:00Z") // Jan 5 Kolkata
    val kolkata = java.time.ZoneId.of("Asia/Kolkata")
    val zdt = java.time.ZonedDateTime.ofInstant(i, kolkata)
    assert(GraftFunctions.timeKey("days", zdt) ==
      GraftFunctions.dirTimeKey("days", "2024-01-05"))
    assert(GraftFunctions.timeKey("months", zdt) ==
      GraftFunctions.dirTimeKey("months", "2024-01"))
    assert(GraftFunctions.timeKey("years", zdt) ==
      GraftFunctions.dirTimeKey("years", "2024"))
    assert(GraftFunctions.dirTimeKey("days", "1970-01-01") == 0)
    assert(GraftFunctions.dirTimeKey("months", "1970-01") == 0)
    assert(GraftFunctions.dirTimeKey("years", "1970") == 0)
  }
}
