package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import syntax._

/** SURVEY.md §2 B.4 — aggregation surface b25-b33 (b23/b24 live in
  * RelationalPack).
  *
  * The reference's users run these through Trino/dbt SQL models
  * (/root/reference/README.md:79-98); here each is a declared Spark
  * plan. All aggregates are 2-phase hash aggregates (partial before
  * the shuffle), so every query's shuffle volume is bounded by group
  * cardinality, not input rows — the property that makes them safe at
  * 100 TB. `l_quantity` is integral-valued in the fixture, so its
  * double sums are order-independent (NOTES.md); money sums go
  * through the exact-decimal `dsum` pattern.
  */
object AggPack extends Pack {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  val decls: Seq[Decl] = Seq(

    Decl("b25_agg_having",
      (s, dir) => li(s, dir)
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity").as("sum_qty"),
          count(lit(1)).cast("long").as("n"))
        .filter($"sum_qty" > 15000.0)
        .orderBy($"l_suppkey"),
      Some("""SELECT l_suppkey, SUM(l_quantity) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n
             FROM lineitem GROUP BY l_suppkey
             HAVING SUM(l_quantity) > 15000.0
             ORDER BY l_suppkey""")),

    // exact COUNT(DISTINCT) — Catalyst plans Expand + two-phase agg
    Decl("b26_agg_count_distinct",
      (s, dir) => li(s, dir)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").cast("long").as("n_parts"),
          countDistinct($"l_suppkey").cast("long").as("n_supps"),
          count(lit(1)).cast("long").as("n_rows"))
        .orderBy($"l_returnflag"),
      Some("""SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
             CAST(COUNT(*) AS BIGINT) AS n_rows
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HLL++ sketch — the raw estimate is engine-specific, so the
    // CONTRACT is what gets the oracle: |approx − exact| ≤ 10% · exact
    // (default rsd 0.05 ⇒ typical error 2-5%; deterministic per
    // fixture). Emitting the tolerance check + the exact count turns
    // the former rows-only omission into a full value gate — the
    // right way to grade a sketch.
    Decl("b27_agg_approx_distinct",
      (s, dir) => li(s, dir)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").cast("long").as("exact_parts"))
        .select($"l_returnflag", $"exact_parts",
          (abs($"approx_parts" - $"exact_parts") <=
            $"exact_parts".cast("double") * 0.1).as("within_10pct"))
        .orderBy($"l_returnflag"),
      Some("""SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             true AS within_10pct
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Decl("b28_agg_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT l_returnflag, l_linestatus,
                 CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                 CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                 CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS sum_qty
                 FROM lineitem
                 GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
                 ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(l_quantity) AS sum_qty
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
             ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // hierarchical subtotals over the region→nation dim chain; fixture
    // dims are never NULL, so NULL marks exactly the subtotal rows
    Decl("b29_agg_rollup",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
        .join(Tables.load(s, dir, "region"), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).cast("long").as("n_cust"),
          dsum($"c_acctbal", 2).as("sum_bal"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first),
      Some("""SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
             FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY ROLLUP (r_name, n_name)
             ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    Decl("b30_agg_cube",
      (s, dir) => li(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).cast("long").as("n"),
          sum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(l_quantity) AS sum_qty
             FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // pivot with an explicit value list (no extra distinct pass); count
    // never yields NULL, but coalesce pins the no-match cells to 0 to
    // match the oracle's conditional-count formulation exactly
    Decl("b31_agg_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.load(s, dir, "events").filter($"user_id" < 50)
          .groupBy($"user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(p)((df, ty) => df.withColumn(ty, coalesce(col(ty), lit(0L))))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id,
             CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
             FROM events WHERE user_id < 50
             GROUP BY user_id ORDER BY user_id""")),

    // ordered list collection, emitted as a joined string so the value
    // compare is dtype-stable across Spark/DuckDB/pandas (NOTES.md)
    Decl("b32_agg_collect",
      (s, dir) => li(s, dir).filter($"l_orderkey" < 100)
        .groupBy($"l_orderkey")
        .agg(
          expr("array_join(transform(sort_array(collect_list(l_linenumber)), x -> CAST(x AS STRING)), ',')")
            .as("lines"),
          size(collect_set($"l_suppkey")).cast("long").as("n_supps"))
        .orderBy($"l_orderkey"),
      Some("""SELECT l_orderkey,
             string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
             FROM lineitem WHERE l_orderkey < 100
             GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // stddev/variance rounded per NOTES rule 3; percentile is Spark's
    // EXACT percentile (not approx) = DuckDB quantile_cont, both linear
    // interpolation over integral quantities → exact halves
    Decl("b33_agg_stats",
      (s, dir) => li(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy($"l_returnflag"),
      Some("""SELECT l_returnflag,
             ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
             ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
             QUANTILE_CONT(l_quantity, 0.5) AS p50_qty,
             QUANTILE_CONT(l_quantity, 0.9) AS p90_qty
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // b73: fixed-bin histogram — the profiling aggregate behind every
    // "distribution of X" dashboard. Bucket index is computed with the
    // same closed-form floor arithmetic on both engines (width_bucket
    // exists in neither identically; floor((x-lo)/(hi-lo)*n) is one
    // IEEE expression, bitwise identical in Spark and DuckDB), clamped
    // to [0, n-1] so the hi endpoint lands in the last bin. One
    // 2-phase hash aggregate over ≤ n groups — histogramming 100 TB
    // shuffles n rows per partition, nothing else.
    Decl("b73_histogram",
      (s, dir) => {
        val lo = lit(900.0); val hi = lit(105000.0); val n = lit(16)
        val bucket = least(n - 1,
          floor((($"l_extendedprice" - lo) / (hi - lo)) * n)).cast("long")
        li(s, dir)
          .select(bucket.as("bucket"), $"l_extendedprice")
          .groupBy($"bucket")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            round(min($"l_extendedprice"), 2).as("lo_seen"),
            round(max($"l_extendedprice"), 2).as("hi_seen"))
          .orderBy($"bucket")
      },
      Some("""SELECT
               CAST(LEAST(15, FLOOR(((l_extendedprice - 900.0) / (105000.0 - 900.0)) * 16)) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(MIN(l_extendedprice), 2) AS lo_seen,
               ROUND(MAX(l_extendedprice), 2) AS hi_seen
             FROM lineitem GROUP BY 1 ORDER BY bucket"""))
  )
}
