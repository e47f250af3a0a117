package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The custom as-of operator must agree with the declarative window
  * formulation (b19) everywhere, and its physical plan must be the
  * custom exec fed by framework-planned exchanges and sorts. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("hand cases: no-preceding-source null, inclusive tie, per-user isolation") {
    val tgt = Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 20L, ts(100)),
      (4L, 30L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val src = Seq(
      (10L, ts(100), 90L, 1.0),  // tie with target 1 → inclusive
      (10L, ts(150), 91L, 2.0),  // latest before target 2
      (20L, ts(300), 92L, 9.0))  // after target 3 → not visible
      .toDF("user_id", "ts", "event_id", "src_val")
    val got = AsOfJoin(spark, tgt, src)
      .select($"event_id", $"asof_val").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> None),
      s"got $got")
  }

  test("equal-timestamp sources: the highest event_id wins (deterministic tie)") {
    val tgt = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    val src = Seq((10L, ts(100), 90L, 1.0), (10L, ts(100), 95L, 5.0),
      (10L, ts(100), 92L, 2.0)).toDF("user_id", "ts", "event_id", "src_val")
    val got = AsOfJoin(spark, tgt, src).select($"asof_val").as[Double].head()
    assert(got == 5.0, s"tie must resolve by last event_id, got $got")
  }

  test("fixture: custom operator ≡ the b19 union+window formulation") {
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val tgt = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val src = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id", $"value".cast("double").as("src_val"))
    val custom = AsOfJoin(spark, tgt, src)
      .select($"event_id", $"asof_val")
      .as[(Long, Option[Double])].collect().toMap
    val window = graft.queries.JoinPack.queries("b19_join_asof")(
        spark, TestSpark.sfDir)
      .select($"event_id", $"asof_val")
      .as[(Long, Option[Double])].collect().toMap
    assert(custom == window, "custom exec diverges from the window formulation")
    assert(custom.nonEmpty)
  }

  test("plan: AsOfJoinExec present, fed by framework-planned exchange + sort") {
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val tgt = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val src = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id", $"value".cast("double").as("src_val"))
    val p = AsOfJoin(spark, tgt, src).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"custom exec missing:\n$p") // nodeName drops "Exec"
    assert(p.contains("Exchange hashpartitioning(user_id"),
      s"EnsureRequirements must co-cluster on user_id:\n$p")
    assert(p.contains("Sort [user_id"), s"merge inputs must be sorted:\n$p")
  }
}
