package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import syntax._

/** SURVEY.md §2 B.5/B.6 — window functions b34-b40 and sort/top-k
  * b41-b43.
  *
  * The reference's named production workload is Binance spot-order
  * time-series (/root/reference/README.md:111) — lag/lead, moving
  * averages and per-key ranking are exactly this surface; it reaches
  * users via Trino/dbt SQL (README.md:66-98).
  *
  * Scale notes (100 TB): every window here partitions by a key
  * (user_id / l_orderkey / l_returnflag) — one hash shuffle, then
  * partition-local sort; no global sort anywhere except the bounded
  * exports. b42 compiles to TakeOrderedAndProject (partition-local
  * top-k + driver merge of k rows). Window ORDER BY always ends with a
  * unique tie-break column so results are deterministic on both
  * engines (NOTES.md).
  */
object WindowPack extends Pack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val decls: Seq[Decl] = Seq(

    Decl("b34_win_row_number",
      (s, dir) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        t(s, dir, "events").filter($"user_id" < 20)
          .withColumn("rn", row_number().over(w).cast("long"))
          .select($"event_id", $"user_id", $"rn")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
             FROM events WHERE user_id < 20 ORDER BY event_id""")),

    // rank family; ntile needs the unique (qty, orderkey, linenumber)
    // ordering or tie rows land in arbitrary tiles
    Decl("b35_win_rank_dense",
      (s, dir) => {
        val w = Window.partitionBy($"l_returnflag")
          .orderBy($"l_quantity".asc, $"l_orderkey".asc, $"l_linenumber".asc,
            $"l_partkey".asc, $"l_suppkey".asc)
        t(s, dir, "lineitem").filter($"l_orderkey" < 1000)
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("prnk", round(percent_rank().over(w), 6))
          .withColumn("tile", ntile(4).over(w).cast("long"))
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
            $"rnk", $"drnk", $"prnk", $"tile")
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             CAST(RANK() OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
             ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
             CAST(NTILE(4) OVER w AS BIGINT) AS tile
             FROM lineitem WHERE l_orderkey < 1000
             WINDOW w AS (PARTITION BY l_returnflag
                          ORDER BY l_quantity, l_orderkey, l_linenumber, l_partkey, l_suppkey)
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    // per-user tick deltas (raw IEEE subtraction — bitwise identical
    // across engines, no rounding per NOTES.md rule 1)
    Decl("b36_win_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        t(s, dir, "events").filter($"user_id" < 30)
          .withColumn("prev_val", lag($"value", 1).over(w))
          .withColumn("next_val", lead($"value", 1).over(w))
          .withColumn("delta", $"value" - lag($"value", 1).over(w))
          .select($"event_id", $"user_id", $"prev_val", $"next_val", $"delta")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             LAG(value, 1) OVER w AS prev_val,
             LEAD(value, 1) OVER w AS next_val,
             value - LAG(value, 1) OVER w AS delta
             FROM events WHERE user_id < 30
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             ORDER BY event_id""")),

    // cumulative sum; l_quantity is integral-valued so the running
    // double sum is exact at every prefix
    Decl("b37_win_running_sum",
      (s, dir) => {
        val w = Window.partitionBy($"l_orderkey")
          .orderBy($"l_linenumber".asc, $"l_partkey".asc, $"l_suppkey".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem").filter($"l_orderkey" < 2000)
          .withColumn("run_qty", sum($"l_quantity").over(w))
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"run_qty")
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             SUM(l_quantity) OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
             FROM lineitem WHERE l_orderkey < 2000
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    Decl("b38_win_moving_avg",
      (s, dir) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(-3, 0)
        t(s, dir, "events").filter($"user_id" < 30)
          .withColumn("mov_avg", round(avg($"value").over(w), 4))
          .select($"event_id", $"user_id", $"mov_avg")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
             FROM events WHERE user_id < 30 ORDER BY event_id""")),

    // value-range frame: the included row set depends only on the
    // ordering VALUE, so the sum is order-independent even with ties
    Decl("b39_win_range_frame",
      (s, dir) => {
        val w = Window.partitionBy($"l_returnflag").orderBy($"l_quantity".asc)
          .rangeBetween(-5, 0)
        t(s, dir, "lineitem").filter($"l_orderkey" < 500)
          .withColumn("range_qty", sum($"l_quantity").over(w))
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
            $"l_quantity", $"range_qty")
          .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS range_qty
             FROM lineitem WHERE l_orderkey < 500
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    // b72: TIME-INTERVAL range frame — the event-time sibling of b39's
    // numeric range frame: per event, aggregate the same user's
    // trailing hour (sessionized rate/rolling-exposure queries). The
    // frame is value-defined, not row-defined, so ties and order
    // nondeterminism cannot change it. Both engines order by the
    // EXACT integer microsecond epoch (unix_micros / epoch_us) — the
    // fixture's timestamps carry sub-second parts, and a
    // seconds-truncated cast would put boundary events in different
    // frames per engine. Keyed window: one hash shuffle on user_id,
    // frames evaluated per partition — the standard scalable shape.
    Decl("b72_win_time_range",
      (s, dir) => {
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts").asc)
          .rangeBetween(-3600000000L, 0)
        t(s, dir, "events").filter($"user_id" < 20)
          .withColumn("cnt_1h", count(lit(1)).over(w).cast("long"))
          .withColumn("sum_1h", round(sum($"value").over(w), 4))
          .select($"event_id", $"cnt_1h", $"sum_1h")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
             CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
             ROUND(SUM(value) OVER w, 4) AS sum_1h
             FROM events WHERE user_id < 20
             WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             ORDER BY event_id""")),

    // generalizes the reference's latest-file pick (extract_load.py:147):
    // first/last value over the full partition frame
    Decl("b40_win_first_last",
      (s, dir) => {
        val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "events").filter($"user_id" < 30)
          .withColumn("first_val", first($"value").over(w))
          .withColumn("last_val", last($"value").over(w))
          .select($"event_id", $"user_id", $"first_val", $"last_val")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             FIRST_VALUE(value) OVER w AS first_val,
             LAST_VALUE(value) OVER w AS last_val
             FROM events WHERE user_id < 30
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             ORDER BY event_id""")),

    // ------------------------------------------------- B.6 sorts/top-k
    // explicit NULLS FIRST both sides (defaults differ, NOTES.md rule 6)
    Decl("b41_sort_multi_key",
      (s, dir) => t(s, dir, "orders").filter($"o_orderkey" < 2000)
        .withColumn("prio", nullif($"o_orderpriority", lit("4-NOT SPECIFIED")))
        .select($"o_orderkey", $"prio", $"o_totalprice")
        .orderBy($"prio".asc_nulls_first, $"o_totalprice".desc, $"o_orderkey".asc),
      Some("""SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             o_totalprice
             FROM orders WHERE o_orderkey < 2000
             ORDER BY prio ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC""")),

    // full-scan top-k: TakeOrderedAndProject = partition-local top-k,
    // driver merges k rows — the plan that survives 100 TB
    Decl("b42_topk_global",
      (s, dir) => t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc,
          $"l_partkey".asc, $"l_suppkey".asc)
        .limit(15),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice FROM lineitem
             ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC, l_partkey ASC, l_suppkey ASC
             LIMIT 15""")),

    Decl("b43_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"c_mktsegment", $"rn", $"o_orderkey", $"o_totalprice")
          .orderBy($"c_mktsegment", $"rn")
      },
      Some("""SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
               SELECT c_mktsegment, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
               FROM orders JOIN customer ON o_custkey = c_custkey)
             WHERE rn <= 3
             ORDER BY c_mktsegment, rn""")),

    // IGNORE NULLS navigation — the gap-fill shape of sparse
    // time-series (sensor/price feeds where most ticks carry no
    // value): lag/lead skip null rows, last_value carries the most
    // recent observation forward. Same keyed-window scale shape as
    // b36/b40 (one hash shuffle, partition-local sort); nulls are
    // synthesized deterministically so both engines see the same
    // sparsity. Spark's ignoreNulls overloads ≡ DuckDB IGNORE NULLS.
    Decl("b66_win_ignore_nulls",
      (s, dir) => {
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey".asc)
        t(s, dir, "orders").filter($"o_orderkey" < 4000)
          .withColumn("v",
            when($"o_orderkey" % 3 === 0, lit(null)).otherwise($"o_totalprice"))
          .select($"o_orderkey", $"o_custkey", $"v",
            lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_v"),
            lead($"v", 1, null, ignoreNulls = true).over(w).as("next_v"),
            last($"v", ignoreNulls = true)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("filled"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, v,
             lag(v IGNORE NULLS) OVER w AS prev_v,
             lead(v IGNORE NULLS) OVER w AS next_v,
             last_value(v IGNORE NULLS) OVER (PARTITION BY o_custkey
               ORDER BY o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
             FROM (SELECT o_orderkey, o_custkey,
                     CASE WHEN o_orderkey % 3 = 0 THEN NULL
                          ELSE o_totalprice END AS v
                   FROM orders WHERE o_orderkey < 4000)
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)
             ORDER BY o_orderkey""")),

    // DISTRIBUTION ranking — ntile (equi-depth bucketing: the
    // quantile-cohort assignment behind decile reports and
    // stratified splits), percent_rank and cume_dist (empirical CDF
    // position). ntile assigns by ROW POSITION, so the window order
    // ends in the unique key (NOTES determinism rule — ties would
    // otherwise land in engine-dependent tiles). Same one-shuffle
    // keyed-window shape as the rest of B.5; the per-tile rollup
    // keeps the declared output bounded.
    Decl("b70_win_ntile",
      (s, dir) => {
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
        t(s, dir, "orders").filter($"o_orderkey" < 4000)
          .select($"o_orderpriority", $"o_totalprice",
            ntile(4).over(w).as("tile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .groupBy($"o_orderpriority", $"tile")
          .agg(count(lit(1)).cast("long").as("n"),
            round(max($"pr"), 6).as("max_pr"),
            round(max($"cd"), 6).as("max_cd"),
            dsum($"o_totalprice", 3).as("sum_price"))
          .orderBy($"o_orderpriority", $"tile")
      },
      Some("""SELECT o_orderpriority, tile, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(MAX(pr), 6) AS max_pr, ROUND(MAX(cd), 6) AS max_cd,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
             FROM (SELECT o_orderpriority, o_totalprice,
                     CAST(ntile(4) OVER w AS INT) AS tile,
                     percent_rank() OVER w AS pr,
                     cume_dist() OVER w AS cd
                   FROM orders WHERE o_orderkey < 4000
                   WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC))
             GROUP BY o_orderpriority, tile
             ORDER BY o_orderpriority, tile"""))
  )
}
