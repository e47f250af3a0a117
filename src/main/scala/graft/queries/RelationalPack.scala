package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import syntax._

/** SURVEY.md §2 Part B — relational core (B.1-B.4).
  *
  * Query surface the reference provisions via Trino/Spark-SQL/dbt
  * (/root/reference/README.md:66-98, config/iceberg-template.properties:1-13),
  * declared here as concrete Spark plans over the fixture tables.
  * Determinism rules per SURVEY §7.5: total ORDER BY, ROUND on float
  * aggregates, explicit casts so Spark and DuckDB output types line up.
  */
object RelationalPack extends Pack {

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")

  val decls: Seq[Decl] = Seq(

    // ---------------------------------------------------------- B.1 scans
    // keyed slice (p_partkey is dense from 0) so the declared query is
    // a bounded ordered export at any scale factor — never a full-table
    // global sort (round-1 verdict perf note)
    Decl("b01_parquet_scan",
      (s, dir) => Tables.load(s, dir, "part")
        .filter($"p_partkey" < 1000)
        .select($"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_partkey"),
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
             WHERE p_partkey < 1000 ORDER BY p_partkey""")),

    // sink: write the query result as parquet, read it back (the
    // reference's write path, extract_load.py:96); oracle = the source
    Decl("b03_parquet_sink",
      (s, dir) => {
        val out = graft.GraftTmp.dir("graft_b03").toString
        Tables.load(s, dir, "nation").write.mode("overwrite").parquet(out)
        s.read.parquet(out).orderBy($"n_nationkey")
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // b62: CSV source/sink round-trip — schema-explicit read-back (no
    // inference job at scale), doubles survive via Spark's
    // shortest-representation rendering. Aggregation uses the
    // decimal-exact pattern so the oracle (computed from the parquet
    // source) matches bit-for-bit.
    // ORC roundtrip through Spark's built-in columnar ORC source —
    // the lakehouse's second columnar format (the reference bundles
    // ORC-capable engines; Trino/Iceberg read both). Write with a
    // (l_linenumber) sort so ORC row-group stats are tight, read back
    // with predicate pushdown active, aggregate; the oracle computes
    // the same numbers from the original parquet, proving the format
    // hop is lossless for longs, doubles, and decimals-as-doubles.
    Decl("b64_orc_roundtrip",
      (s, dir) => {
        val out = graft.GraftTmp.dir("graft_b64").toString
        val slice = li(s, dir).filter($"l_orderkey" < 1000)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        slice.sortWithinPartitions($"l_linenumber")
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .filter($"l_linenumber" <= 4)
          .groupBy($"l_linenumber".cast("long").as("l_linenumber"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum($"l_quantity"), 2).as("sum_qty"),
            dsum($"l_extendedprice", 2).as("sum_price"))
          .orderBy($"l_linenumber")
      },
      Some("""SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             FROM lineitem WHERE l_orderkey < 1000 AND l_linenumber <= 4
             GROUP BY 1 ORDER BY l_linenumber""")),

    // exact percentiles (linear interpolation — Spark `percentile` ≡
    // DuckDB `quantile_cont`) per group. Exact percentile is a sort
    // within the aggregation buffer — fine at per-group cardinality;
    // an unbounded-cardinality column at 100 TB switches to
    // percentile_approx (one bounded sketch per partition, merged),
    // same query shape, no oracle (b27's HLL precedent). Rounded to
    // 6dp: the interpolation arithmetic is the same IEEE op in both
    // engines but the group-sort order of equal doubles is not
    // observable, so the usual guard applies.
    Decl("b65_percentiles",
      // Exact percentiles WITHOUT per-row group buffers: pre-aggregate
      // to (group, value, frequency) — a two-phase hash agg that
      // map-side combines across all cores — then feed `percentile`'s
      // frequency argument, whose buffer is DISTINCT-VALUE-sized, not
      // row-sized. Mathematically identical to the row-fed form (the
      // weighted multiset interpolates exactly the same), but the only
      // shape that survives 100 TB: 3 groups x 2M rows per reducer
      // buffer became 3 groups x |distinct prices| map entries (the
      // sf1 shadow-bench caught the row-buffered form at 34x). The
      // array form still shares one buffer and sorts once.
      // project to the two needed columns BEFORE the spread (guide
      // §2.3 "project before the exchange"), then spread: the
      // (group, value) pre-aggregation otherwise runs in the single
      // scan task of the one-file fixture (guide §2.5; no-op at scale)
      (s, dir) => syntax.spread(
          li(s, dir).select($"l_returnflag", $"l_extendedprice"),
          $"l_extendedprice")
        .groupBy($"l_returnflag", $"l_extendedprice")
        .agg(count(lit(1)).as("freq"))
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D), freq)").as("ps"),
          sum($"freq").cast("long").as("n"))
        .select($"l_returnflag",
          round($"ps"(0), 6).as("p25"),
          round($"ps"(1), 6).as("p50"),
          round($"ps"(2), 6).as("p95"),
          $"n")
        .orderBy($"l_returnflag"),
      Some("""SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
             ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
             ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
             CAST(COUNT(*) AS BIGINT) AS n
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Decl("b62_csv_roundtrip",
      (s, dir) => {
        val out = graft.GraftTmp.dir("graft_b62").toString
        val slice = li(s, dir).filter($"l_orderkey" < 1000)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        slice.write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(slice.schema).option("header", "true").csv(out)
          .groupBy($"l_linenumber".cast("long").as("l_linenumber"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum($"l_quantity"), 2).as("sum_qty"),
            dsum($"l_extendedprice", 2).as("sum_price"))
          .orderBy($"l_linenumber")
      },
      Some("""SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             FROM lineitem WHERE l_orderkey < 1000
             GROUP BY 1 ORDER BY l_linenumber""")),

    // b63: JSON-lines source/sink round-trip (the Airbyte payload
    // format the reference ingests) — schema-explicit read-back
    Decl("b63_json_roundtrip",
      (s, dir) => {
        val out = graft.GraftTmp.dir("graft_b63").toString
        val slice = ord(s, dir).filter($"o_orderkey" < 2000)
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        slice.write.mode("overwrite").json(out)
        s.read.schema(slice.schema).json(out)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).cast("long").as("n"),
            dsum($"o_totalprice", 2).as("sum_price"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             FROM orders WHERE o_orderkey < 2000
             GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // catalog op (extract_load.py:87): list registered tables. The
    // listing is environment-determined, so the oracle is the golden
    // fixture-table set as a VALUES literal — a regression in
    // registerAll or SHOW TABLES now fails the value gate instead of
    // slipping through a rows-only check.
    Decl("b04_catalog_tables",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("SHOW TABLES").select($"tableName")
          .filter($"tableName".isin(Tables.all: _*)) // session may hold other views
          .orderBy($"tableName")
      },
      Some("""SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),
             ('events'),('lineitem'),('nation'),('orders'),('part'),
             ('region'),('supplier')) AS t(tableName)
             ORDER BY tableName""")),

    Decl("b02_scan_limit",
      (s, dir) => ord(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey").limit(10),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10")),

    // -------------------------------------------- B.2 projections/filters
    Decl("b05_project_rename",
      // no ROUND on per-row arithmetic: IEEE ops are bitwise identical
      // across engines, while round() semantics differ at .xx5 (NOTES.md).
      // Keyed slice bounds the ordered export at any scale factor.
      (s, dir) => li(s, dir)
        .filter($"l_orderkey" < 2500)
        .select(
          $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_extendedprice * (1.0 - l_discount) AS revenue
             FROM lineitem WHERE l_orderkey < 2500
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    Decl("b06_filter_comparison",
      (s, dir) => li(s, dir)
        .filter($"l_quantity" > 25.0 && $"l_discount" <= 0.05 && $"l_returnflag" =!= "N")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_discount
             FROM lineitem
             WHERE l_quantity > 25.0 AND l_discount <= 0.05 AND l_returnflag <> 'N'
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    Decl("b07_filter_in_between_like",
      (s, dir) => ord(s, dir)
        .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH")
          && $"o_totalprice".between(50000.0, 300000.0)
          && $"o_orderpriority".like("%-%"))
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .orderBy($"o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
             FROM orders
             WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
               AND o_totalprice BETWEEN 50000.0 AND 300000.0
               AND o_orderpriority LIKE '%-%'
             ORDER BY o_orderkey""")),

    Decl("b08_filter_null_handling",
      // fixture has no nulls: manufacture them with NULLIF, then test
      // IS NULL / null-safe equality (<=>, DuckDB IS NOT DISTINCT FROM)
      (s, dir) => li(s, dir)
        .withColumn("rf", nullif($"l_returnflag", lit("N")))
        .filter($"rf".isNull || $"rf" <=> "R")
        .groupBy($"rf")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy($"rf".asc_nulls_first),
      Some("""SELECT rf, CAST(COUNT(*) AS BIGINT) AS n FROM (
               SELECT NULLIF(l_returnflag, 'N') AS rf FROM lineitem)
             WHERE rf IS NULL OR rf IS NOT DISTINCT FROM 'R'
             GROUP BY rf ORDER BY rf ASC NULLS FIRST""")),

    Decl("b09_distinct",
      (s, dir) => li(s, dir)
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             ORDER BY l_returnflag, l_linestatus""")),

    // ---------------------------------------------------------- B.4 aggs
    Decl("b23_agg_global",
      (s, dir) => li(s, dir).agg(
        count(lit(1)).cast("long").as("n"),
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(avg($"l_extendedprice"), 2).as("avg_price"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(AVG(l_extendedprice), 2) AS avg_price,
             MIN(l_extendedprice) AS min_price,
             MAX(l_extendedprice) AS max_price
             FROM lineitem""")),

    // Flagship (SURVEY §7.2): TPC-H Q1-shaped pricing summary.
    Decl("b24_agg_groupby",
      // timestamp_ntz literal: comparison is timezone-independent, so
      // entry() gives the same rows in any driver session TZ (ADVICE r1)
      (s, dir) => li(s, dir)
        .filter($"l_shipdate" <= to_timestamp_ntz(lit("1998-09-02")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          // decimal-exact accumulation for the product sums: at sf0.1
          // the totals reach ~1e10 where double ULP (~2e-6) exceeds
          // the 6dp resolution ROUND needs — round-after-double-sum
          // flipped sum_charge's last digit between engines (NOTES.md)
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_extendedprice"), 2).as("avg_price"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).cast("long").as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             ROUND(SUM(l_quantity), 2) AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             ROUND(AVG(l_quantity), 2) AS avg_qty,
             ROUND(AVG(l_extendedprice), 2) AS avg_price,
             ROUND(AVG(l_discount), 4) AS avg_disc,
             CAST(COUNT(*) AS BIGINT) AS count_order
             FROM lineitem
             WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""))
  )
}
