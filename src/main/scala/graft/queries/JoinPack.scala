package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import syntax._

/** SURVEY.md §2 B.3 — joins b10-b22.
  *
  * The reference exposes its join surface through Trino/Spark-SQL/dbt
  * (/root/reference/README.md:66-98); its own code contains one join
  * shape, the incremental-load anti-join
  * (/root/reference/scripts/extract_load.py:156) = b15 semantics.
  *
  * Scale notes (100 TB): every equi-join here shuffles on its key or
  * broadcasts the small side — Catalyst picks BroadcastHashJoin for
  * region/nation/customer-sized dims automatically (AQE re-plans on
  * runtime stats). The band join (b17) is a bounded-input
  * BroadcastNestedLoopJoin at test scale; at 100 TB it would be
  * re-expressed as an equi-join on a price-bucket key (bucket width =
  * band width) + residual filter. The as-of join (b19) deliberately
  * avoids the quadratic join+filter formulation: one shuffle by user,
  * one window pass — the 100 TB-safe plan.
  */
object JoinPack extends Pack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val decls: Seq[Decl] = Seq(

    Decl("b10_join_inner_equi",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey", "inner")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          dsum($"o_totalprice", 3).as("sum_price"))
        .orderBy($"c_mktsegment"),
      Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // right side filtered to "big" orders so some customers really do
    // have zero matches and the outer semantics are exercised
    Decl("b11_join_left_outer",
      (s, dir) => t(s, dir, "customer").filter($"c_custkey" < 100)
        .join(t(s, dir, "orders").filter($"o_totalprice" > 400000.0),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").cast("long").as("n_big_orders"))
        .orderBy($"c_custkey"),
      Some("""SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_big_orders
             FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
             ON c_custkey = o_custkey
             WHERE c_custkey < 100
             GROUP BY c_custkey ORDER BY c_custkey""")),

    // orders without any lineitem exist in the fixture (~1.7%), so the
    // preserved side genuinely contributes null-extended rows
    Decl("b12_join_right_outer",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter($"o_orderkey" < 2000),
          $"l_orderkey" === $"o_orderkey", "right")
        .groupBy($"o_orderkey")
        .agg(count($"l_linenumber").cast("long").as("n_lines"))
        .orderBy($"o_orderkey"),
      Some("""SELECT o_orderkey, CAST(COUNT(l_linenumber) AS BIGINT) AS n_lines
             FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
             WHERE o_orderkey < 2000
             GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // key ranges chosen so both sides have unmatched rows:
    // left = orders 0..149 (some have no lineitems), right = lineitem
    // keys 0..299 (150..299 unmatched on the left)
    Decl("b13_join_full_outer",
      (s, dir) => {
        val o = t(s, dir, "orders").filter($"o_orderkey" < 150)
          .select($"o_orderkey", $"o_totalprice")
        val l = t(s, dir, "lineitem").filter($"l_orderkey" < 300)
          .groupBy($"l_orderkey").agg(sum($"l_quantity").as("sum_qty"))
        o.join(l, $"o_orderkey" === $"l_orderkey", "full")
          .select(coalesce($"o_orderkey", $"l_orderkey").as("k"),
            $"o_totalprice", $"sum_qty")
          .orderBy($"k")
      },
      Some("""SELECT COALESCE(o_orderkey, l_orderkey) AS k, o_totalprice, sum_qty
             FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 150) o
             FULL JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
                        FROM lineitem WHERE l_orderkey < 300 GROUP BY l_orderkey) l
             ON o_orderkey = l_orderkey
             ORDER BY k""")),

    Decl("b14_join_left_semi",
      (s, dir) => t(s, dir, "orders").filter($"o_orderkey" < 3000)
        .join(t(s, dir, "lineitem").filter($"l_quantity" >= 48.0),
          $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             WHERE o_orderkey < 3000
               AND EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
             ORDER BY o_orderkey""")),

    // same shape as the reference's incremental-load file diff
    // (extract_load.py:156): customers who never placed a >300k order
    Decl("b15_join_left_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter($"o_totalprice" > 300000.0),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders
                               WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
             ORDER BY c_custkey""")),

    Decl("b16_join_cross",
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             ORDER BY r_name, n_name""")),

    // pure theta/band self-join (BroadcastNestedLoopJoin on the bounded
    // slice; at scale: equi-join on floor(price/band) buckets + filter)
    Decl("b17_join_theta_range",
      (s, dir) => {
        val p = t(s, dir, "part").filter($"p_partkey" < 300)
          .select($"p_partkey", $"p_retailprice")
        p.as("a").join(p.as("b"),
            col("a.p_partkey") < col("b.p_partkey") &&
              abs(col("a.p_retailprice") - col("b.p_retailprice")) < 2.5)
          .select(col("a.p_partkey").as("pa"), col("b.p_partkey").as("pb"))
          .orderBy($"pa", $"pb")
      },
      Some("""SELECT a.p_partkey AS pa, b.p_partkey AS pb
             FROM part a JOIN part b
               ON a.p_partkey < b.p_partkey
              AND ABS(a.p_retailprice - b.p_retailprice) < 2.5
             WHERE a.p_partkey < 300 AND b.p_partkey < 300
             ORDER BY pa, pb""")),

    // interval containment: events within 10 minutes after each error
    // event of the same user (equi on user + range residual)
    Decl("b18_join_interval",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = ev.filter($"event_type" === "error" && $"event_id" < 2000)
          .select($"event_id".as("w_id"), $"user_id".as("w_user"), $"ts".as("w_ts"))
        w.join(ev.select($"user_id", $"ts"),
            $"user_id" === $"w_user" &&
              $"ts" >= $"w_ts" && $"ts" <= $"w_ts" + expr("INTERVAL 10 MINUTES"))
          .groupBy($"w_id")
          .agg(count(lit(1)).cast("long").as("n_in_window"))
          .orderBy($"w_id")
      },
      Some("""SELECT w.event_id AS w_id, CAST(COUNT(*) AS BIGINT) AS n_in_window
             FROM events w JOIN events e
               ON e.user_id = w.user_id
              AND e.ts >= w.ts AND e.ts <= w.ts + INTERVAL 10 MINUTE
             WHERE w.event_type = 'error' AND w.event_id < 2000
             GROUP BY w.event_id ORDER BY w_id""")),

    // as-of: latest error value at-or-before each purchase, per user.
    // Implemented scale-first: union + single window pass (one shuffle
    // by user), not the quadratic join+max formulation. Sources sort
    // before targets at equal ts (is_tgt asc) = inclusive `>=` as-of.
    Decl("b19_join_asof",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val tgt = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts",
            lit(null).cast("double").as("src_val"), lit(1).as("is_tgt"))
        val src = ev.filter($"event_type" === "error")
          .select($"event_id", $"user_id", $"ts",
            $"value".as("src_val"), lit(0).as("is_tgt"))
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"is_tgt".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tgt.unionByName(src)
          .withColumn("asof_val", last($"src_val", ignoreNulls = true).over(w))
          .filter($"is_tgt" === 1)
          .select($"event_id", $"user_id", $"asof_val")
          .orderBy($"event_id")
      },
      Some("""SELECT t.event_id, t.user_id, s.value AS asof_val
             FROM (SELECT * FROM events WHERE event_type = 'purchase') t
             ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') s
               ON t.user_id = s.user_id AND t.ts >= s.ts
             ORDER BY t.event_id""")),

    // TPC-H Q5 shape: 5-table star, dims broadcast, fact shuffles once
    Decl("b20_join_multiway_star",
      (s, dir) => t(s, dir, "region").filter($"r_name" === "ASIA")
        .join(t(s, dir, "nation"), $"n_regionkey" === $"r_regionkey")
        .join(t(s, dir, "customer"), $"c_nationkey" === $"n_nationkey")
        .join(t(s, dir, "orders"), $"o_custkey" === $"c_custkey")
        .join(t(s, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("date") &&
          $"o_orderdate" < lit("1997-01-01").cast("date"))
        .groupBy($"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).cast("long").as("n_lines"))
        .orderBy($"n_name"),
      Some("""SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_lines
             FROM region
             JOIN nation ON n_regionkey = r_regionkey
             JOIN customer ON c_nationkey = n_nationkey
             JOIN orders ON o_custkey = c_custkey
             JOIN lineitem ON l_orderkey = o_orderkey
             WHERE r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             GROUP BY n_name ORDER BY n_name""")),

    // scalar subquery (Catalyst rewrites to a broadcast of the 1-row
    // aggregate); avg gap to nearest price is 0.05 so the predicate is
    // float-robust on both engines
    Decl("b21_subquery_scalar",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT p_partkey, p_retailprice FROM part
                 WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
                   AND p_partkey < 1000
                 ORDER BY p_partkey""")
      },
      Some("""SELECT p_partkey, p_retailprice FROM part
             WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
               AND p_partkey < 1000
             ORDER BY p_partkey""")),

    // IN subquery → RewritePredicateSubquery turns it into a semi-join
    Decl("b22_subquery_in",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey IN (SELECT c_custkey FROM customer
                                     WHERE c_mktsegment = 'BUILDING')
                   AND o_orderkey < 2000
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey IN (SELECT c_custkey FROM customer
                                 WHERE c_mktsegment = 'BUILDING')
               AND o_orderkey < 2000
             ORDER BY o_orderkey""")),

    // b67 (builder extension): CORRELATED EXISTS / NOT EXISTS —
    // Catalyst decorrelates both into existence joins on the
    // correlation key (plan-checked: two BroadcastHashJoin
    // ExistenceJoin nodes here; hash-partitioned on o_custkey when
    // the orders side outgrows the broadcast threshold), rather than
    // re-running the subquery per outer row — the decorrelation that
    // makes EXISTS usable at scale. Customers WITH an urgent order
    // and withOUT any order, counted by segment.
    Decl("b67_subquery_exists",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT c_mktsegment,
                 CAST(SUM(CASE WHEN EXISTS (
                   SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT')
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
                 CAST(SUM(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
                 FROM customer c
                 GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment,
             CAST(SUM(CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
             CAST(SUM(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
             FROM customer c
             GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // b68 (builder extension): LATERAL correlated subquery — each
    // nation row drives a dependent top-2-suppliers-by-balance
    // subquery (the per-row "top N related rows" shape). Catalyst
    // decorrelates the LATERAL into a ranked window join, so the
    // plan is one shuffle on the correlation key, not a re-executed
    // subquery per outer row.
    Decl("b68_join_lateral",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT n.n_name, t.s_name, t.s_acctbal
                 FROM nation n,
                 LATERAL (SELECT s_name, s_acctbal FROM supplier s
                          WHERE s.s_nationkey = n.n_nationkey
                          ORDER BY s_acctbal DESC, s_name LIMIT 2) t
                 ORDER BY n.n_name, t.s_acctbal DESC, t.s_name""")
      },
      Some("""SELECT n.n_name, t.s_name, t.s_acctbal
             FROM nation n,
             LATERAL (SELECT s_name, s_acctbal FROM supplier s
                      WHERE s.s_nationkey = n.n_nationkey
                      ORDER BY s_acctbal DESC, s_name LIMIT 2) t
             ORDER BY n.n_name, t.s_acctbal DESC, t.s_name"""))
  )
}
