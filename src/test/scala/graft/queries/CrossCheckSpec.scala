package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Cross-validates the scale-first formulations against naive
  * reference implementations on the smoke fixture — the window-based
  * as-of join and windowed top-k must equal their quadratic /
  * collection-model equivalents row for row. */
class CrossCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir
  import spark.implicits._

  test("b19 as-of (single window pass) ≡ naive quadratic join + max") {
    val got = JoinPack.queries("b19_join_asof")(spark, sfDir)
      .select($"event_id", $"asof_val")
      .as[(Long, Option[Double])].collect().toMap

    // naive: for each purchase, the error row with max (ts, event_id)
    // among those at-or-before the purchase ts
    val ev = graft.Tables.load(spark, sfDir, "events")
    val tgt = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("t_id"), $"user_id".as("t_user"), $"ts".as("t_ts"))
    val src = ev.filter($"event_type" === "error")
      .select($"event_id".as("s_id"), $"user_id".as("s_user"),
        $"ts".as("s_ts"), $"value".as("s_val"))
    val naive = tgt.join(src, $"t_user" === $"s_user" && $"s_ts" <= $"t_ts", "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"t_id")
          .orderBy($"s_ts".desc_nulls_last, $"s_id".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"t_id", $"s_val")
      .as[(Long, Option[Double])].collect().toMap

    assert(got.keySet == naive.keySet)
    val diffs = got.keys.filter(k => got(k) != naive(k))
    assert(diffs.isEmpty,
      s"as-of mismatch for events ${diffs.take(5)}: " +
        diffs.take(3).map(k => s"$k: window=${got(k)} naive=${naive(k)}").mkString(", "))
  }

  test("b43 windowed top-k per group ≡ collection-model top-k") {
    val got = WindowPack.queries("b43_topk_per_group")(spark, sfDir)
      .select($"c_mktsegment", $"rn", $"o_orderkey")
      .as[(String, Long, Long)].collect().toSeq

    val rows = graft.Tables.load(spark, sfDir, "orders")
      .join(graft.Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
      .as[(String, Long, Double)].collect()
    val model = rows.groupBy(_._1).toSeq.flatMap { case (seg, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case (r, i) => (seg, (i + 1).toLong, r._2) }
    }.sortBy(r => (r._1, r._2))

    assert(got == model)
  }

  test("b37 running sum ≡ per-group prefix sums of the model") {
    val got = WindowPack.queries("b37_win_running_sum")(spark, sfDir)
      .as[(Long, Int, Long, Long, Double)].collect().toSeq
    val model = graft.Tables.load(spark, sfDir, "lineitem")
      .filter($"l_orderkey" < 2000)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        $"l_quantity")
      .as[(Long, Int, Long, Long, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (ok, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3, r._4))
        sorted.scanLeft(0.0)(_ + _._5).tail.zip(sorted)
          .map { case (run, r) => (ok, r._2, r._3, r._4, run) }
      }.sortBy(r => (r._1, r._2, r._3, r._4))
    assert(got == model)
  }
}
