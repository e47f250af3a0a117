package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Plan-shape assertions for the scale-technique operators — the
  * point of d03 is WHICH plan runs, not just the answer. */
class ScalePackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d03 bucketed join plans with no hash-partition exchange") {
    val df = ScalePack.queries("d03_bucketed_join")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over bucketed tables:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(df.count() > 0)
  }

  test("d01 pruned scan reads fewer files than the manifest holds") {
    // content equivalence is the oracle's job; here: the single result
    // row reports that pruning really dropped files
    val row = ScalePack.queries("d01_manifest_pruned_scan")(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getAs[Long]("files_pruned_away") == 2L)
  }
}
