package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import syntax._

/** SURVEY.md §2 B.7 (set ops b44-b47), B.8 (scalar families b48-b57)
  * and b58 (batch tumbling window).
  *
  * All provisioned by the reference's SQL surface
  * (/root/reference/README.md:66-98); b47's EXCEPT is the row-level
  * semantics of its incremental file diff
  * (/root/reference/scripts/extract_load.py:156). Airbyte payloads are
  * JSON strings, which b57 extracts from `events.props`.
  *
  * Scale notes: set ops shuffle once on the full row hash (Spark plans
  * union+distinct / left-anti under the hood); every scalar-function
  * query is a pure map over the scan with the filter pushed to
  * Parquet, inside one WholeStageCodegen span. b58's tumbling window
  * is groupBy(window(ts)) — partial aggregation before the shuffle, so
  * shuffle volume is bounded by bucket count.
  */
object FuncPack extends Pack {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val decls: Seq[Decl] = Seq(

    // ------------------------------------------------------ B.7 set ops
    Decl("b44_union_all",
      (s, dir) => {
        val a = t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey", $"o_totalprice")
        val b = t(s, dir, "orders")
          .filter($"o_orderkey" >= 500 && $"o_orderkey" < 1500)
          .select($"o_orderkey", $"o_totalprice")
        a.unionByName(b).orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM (
               SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
               UNION ALL
               SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_orderkey >= 500 AND o_orderkey < 1500)
             ORDER BY o_orderkey""")),

    Decl("b45_union_distinct",
      (s, dir) => {
        val a = t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey", $"o_totalprice")
        val b = t(s, dir, "orders")
          .filter($"o_orderkey" >= 500 && $"o_orderkey" < 1500)
          .select($"o_orderkey", $"o_totalprice")
        a.unionByName(b).distinct().orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
             UNION
             SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey >= 500 AND o_orderkey < 1500
             ORDER BY o_orderkey""")),

    Decl("b46_intersect",
      (s, dir) => {
        val a = t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey", $"o_orderstatus")
        val b = t(s, dir, "orders")
          .filter($"o_orderkey" >= 500 && $"o_orderkey" < 1500)
          .select($"o_orderkey", $"o_orderstatus")
        a.intersect(b).orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 1000
             INTERSECT
             SELECT o_orderkey, o_orderstatus FROM orders
             WHERE o_orderkey >= 500 AND o_orderkey < 1500
             ORDER BY o_orderkey""")),

    // row-level a04: listed − loaded (extract_load.py:156)
    Decl("b47_except",
      (s, dir) => {
        val a = t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .select($"o_orderkey", $"o_orderstatus")
        val b = t(s, dir, "orders")
          .filter($"o_orderkey" >= 500 && $"o_orderkey" < 1500)
          .select($"o_orderkey", $"o_orderstatus")
        a.except(b).orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 1000
             EXCEPT
             SELECT o_orderkey, o_orderstatus FROM orders
             WHERE o_orderkey >= 500 AND o_orderkey < 1500
             ORDER BY o_orderkey""")),

    // ------------------------------------------------ B.8 scalar families
    Decl("b48_str_basic",
      (s, dir) => t(s, dir, "customer").filter($"c_custkey" < 500)
        .select(
          $"c_custkey",
          upper($"c_name").as("up"),
          lower($"c_mktsegment").as("lo"),
          length($"c_name").cast("long").as("len"),
          trim(lit("  pad  ")).as("trimmed"),
          substring($"c_name", 1, 8).as("sub"),
          concat($"c_mktsegment", lit("/"), $"c_name").as("cat"),
          lpad($"c_custkey".cast("string"), 6, "0").as("padded"))
        .orderBy($"c_custkey"),
      Some("""SELECT c_custkey, UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
             CAST(LENGTH(c_name) AS BIGINT) AS len,
             TRIM('  pad  ') AS trimmed,
             SUBSTRING(c_name, 1, 8) AS sub,
             CONCAT(c_mktsegment, '/', c_name) AS cat,
             LPAD(CAST(c_custkey AS VARCHAR), 6, '0') AS padded
             FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""")),

    // regex flavors agree on this subset (digit classes, capture groups)
    Decl("b49_str_split_regex",
      (s, dir) => t(s, dir, "part").filter($"p_partkey" < 500)
        .select(
          $"p_partkey",
          split($"p_name", " ").getItem(0).as("first_tok"),
          regexp_extract($"p_brand", "Brand#(\\d+)", 1).as("brand_num"),
          regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
          instr($"p_name", " ").cast("long").as("space_at"))
        .orderBy($"p_partkey"),
      Some("""SELECT p_partkey,
             string_split(p_name, ' ')[1] AS first_tok,
             regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             CAST(instr(p_name, ' ') AS BIGINT) AS space_at
             FROM part WHERE p_partkey < 500 ORDER BY p_partkey""")),

    // ISO dow via weekday()+1 (Spark dayofweek is 1=Sunday, DuckDB dow
    // is 0=Sunday — SURVEY §7.4.2); everything cast to INT both sides
    Decl("b50_date_parts",
      (s, dir) => t(s, dir, "orders").filter($"o_orderkey" < 2000)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          (weekday($"o_orderdate") + lit(1)).as("isodow"),
          quarter($"o_orderdate").as("q"))
        .orderBy($"o_orderkey"),
      Some("""SELECT o_orderkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
             CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d,
             CAST(EXTRACT(ISODOW FROM o_orderdate) AS INTEGER) AS isodow,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q
             FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // timestamp outputs cast to DATE (NOTES.md rule 5); interval arith
    // mirrors the reference's retention windows (extract_load.py:169)
    Decl("b51_date_trunc_arith",
      (s, dir) => t(s, dir, "orders").filter($"o_orderkey" < 2000)
        .select(
          $"o_orderkey",
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
          date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("due_date"),
          date_format($"o_orderdate" - expr("INTERVAL 3 DAYS"), "yyyy-MM-dd").as("cutoff"),
          datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"))
        .orderBy($"o_orderkey"),
      Some("""SELECT o_orderkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
             strftime(o_orderdate - INTERVAL 3 DAY, '%Y-%m-%d') AS cutoff,
             CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
             FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // raw IEEE where exact (abs/floor/sqrt/x², NOTES.md rule 1); round
    // only the libm-dependent ln/exp (rule 3)
    Decl("b52_math",
      (s, dir) => t(s, dir, "lineitem").filter($"l_orderkey" < 500)
        .select(
          $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          abs($"l_discount" - lit(0.05)).as("abs_gap"),
          ceil($"l_extendedprice").as("ceil_price"),
          floor($"l_extendedprice").as("floor_price"),
          sqrt($"l_quantity").as("sqrt_qty"),
          round(log($"l_extendedprice"), 6).as("ln_price"),
          round(exp($"l_discount"), 6).as("exp_disc"),
          pow($"l_quantity", 2.0).as("qty_sq"),
          ($"l_partkey" % 7).as("key_mod"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             ABS(l_discount - 0.05) AS abs_gap,
             CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
             SQRT(l_quantity) AS sqrt_qty,
             ROUND(LN(l_extendedprice), 6) AS ln_price,
             ROUND(EXP(l_discount), 6) AS exp_disc,
             POW(l_quantity, 2.0) AS qty_sq,
             l_partkey % 7 AS key_mod
             FROM lineitem WHERE l_orderkey < 500
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    Decl("b53_conditional",
      (s, dir) => t(s, dir, "orders").filter($"o_orderkey" < 2000)
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 300000.0, "big")
            .when($"o_totalprice" > 100000.0, "mid")
            .otherwise("small").as("band"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("other")).as("status2"),
          greatest($"o_totalprice", lit(150000.0)).as("hi"),
          least($"o_totalprice", lit(150000.0)).as("lo"))
        .orderBy($"o_orderkey"),
      Some("""SELECT o_orderkey,
             CASE WHEN o_totalprice > 300000.0 THEN 'big'
                  WHEN o_totalprice > 100000.0 THEN 'mid'
                  ELSE 'small' END AS band,
             COALESCE(NULLIF(o_orderstatus, 'O'), 'other') AS status2,
             GREATEST(o_totalprice, 150000.0) AS hi,
             LEAST(o_totalprice, 150000.0) AS lo
             FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // float elements compare exactly: same parquet bits both sides
    Decl("b54_array_basic",
      (s, dir) => t(s, dir, "embeddings").filter($"vec_id" < 100)
        .select(
          $"vec_id",
          size($"embedding").cast("long").as("dim"),
          element_at($"embedding", 1).as("e1"),
          array_min($"embedding").as("mn"),
          array_max($"embedding").as("mx"))
        .orderBy($"vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
             embedding[1] AS e1,
             list_min(embedding) AS mn,
             list_max(embedding) AS mx
             FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""")),

    // higher-order functions — the vector-math substrate for Part C;
    // fold accumulates in DOUBLE, rounded (sum order differs across
    // engines only in the last ulps; values are irrational-ish)
    Decl("b55_array_hof",
      (s, dir) => t(s, dir, "embeddings").filter($"vec_id" < 100)
        .select(
          $"vec_id",
          expr("CAST(size(filter(embedding, x -> x > 0)) AS BIGINT)").as("n_pos"),
          expr("ROUND(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), CAST(0 AS DOUBLE), (a, x) -> a + x), 4)").as("sum_sq"),
          expr("ROUND(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (a, x) -> a + x), 4)").as("dot_self"))
        .orderBy($"vec_id"),
      Some("""SELECT vec_id,
             CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
             ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'), 4) AS sum_sq,
             ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x), 'sum'), 4) AS dot_self
             FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""")),

    // map round-trip checked against ground-truth columns (DuckDB map
    // accessors return lists — dialect too different, so the oracle
    // supplies the expected values directly, per SURVEY §7.4.2)
    Decl("b56_map_ops",
      (s, dir) => t(s, dir, "lineitem").filter($"l_orderkey" < 500)
        .withColumn("m", map_from_arrays(
          array(lit("qty"), lit("price")),
          array($"l_quantity", $"l_extendedprice")))
        .select(
          $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
          element_at($"m", "qty").as("qty_val"),
          element_at($"m", "price").as("price_val"),
          size(map_keys($"m")).cast("long").as("n_keys"),
          array_contains(map_keys($"m"), "qty").as("has_qty"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             l_quantity AS qty_val, l_extendedprice AS price_val,
             CAST(2 AS BIGINT) AS n_keys, TRUE AS has_qty
             FROM lineitem WHERE l_orderkey < 500
             ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    // Airbyte payloads are JSON strings (extract_load.py:138 prefix);
    // both the untyped (get_json_object) and schema'd (from_json) paths
    Decl("b57_json_extract",
      (s, dir) => t(s, dir, "events").filter($"event_id" < 3000)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"),
          from_json($"props", lit("k INT")).getField("k").cast("long").as("k_typed"))
        .orderBy($"event_id"),
      Some("""SELECT event_id,
             CAST(props->>'k' AS BIGINT) AS k,
             CAST(props->>'k' AS BIGINT) AS k_typed
             FROM events WHERE event_id < 3000 ORDER BY event_id""")),

    // batch tumbling window over event time; bucket start emitted as a
    // string so dtype/tz can't drift (NOTES.md rule 5)
    Decl("b58_window_tumbling_batch",
      (s, dir) => t(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum($"value"), 2).as("sum_val"))
        .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("bucket"),
          $"n", $"sum_val")
        .orderBy($"bucket"),
      Some("""SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(SUM(value), 2) AS sum_val
             FROM events GROUP BY 1 ORDER BY bucket""")),

    // b69 (builder extension): UNPIVOT — wide-to-long reshaping, the
    // inverse of b31's pivot (`Dataset.unpivot`, Spark's melt). The
    // unpivot itself is a pure per-row flatMap (each input row emits
    // one row per value column, no shuffle, no UDF); the only
    // exchange here is the upstream aggregate's. The oracle spells
    // the same reshape as a UNION ALL, which is exactly the plan
    // shape Spark's Expand operator fuses into one pass.
    Decl("b69_unpivot",
      (s, dir) => {
        val wide = Tables.load(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(dsum($"l_quantity", 2).as("sum_qty"),
            dsum($"l_extendedprice", 3).as("sum_price"),
            dsum($"l_discount", 2).as("sum_disc"))
        wide.unpivot(Array($"l_returnflag"),
            Array($"sum_qty", $"sum_price", $"sum_disc"),
            "metric", "value")
          .orderBy($"l_returnflag", $"metric")
      },
      Some("""SELECT l_returnflag, metric, value FROM (
               SELECT l_returnflag, 'sum_qty' AS metric,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
               FROM lineitem GROUP BY l_returnflag
               UNION ALL
               SELECT l_returnflag, 'sum_price' AS metric,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) AS value
               FROM lineitem GROUP BY l_returnflag
               UNION ALL
               SELECT l_returnflag, 'sum_disc' AS metric,
                 CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS value
               FROM lineitem GROUP BY l_returnflag)
             ORDER BY l_returnflag, metric""")),

    // b71: STRING-DISTANCE SIMILARITY JOIN — edit-distance pairing
    // (entity resolution / fuzzy matching over name columns). The
    // scale-critical move is BLOCKING: candidate pairs come from an
    // equi-join on a cheap block key (the name's first token), so
    // pair work is Σ block² instead of the all-pairs N² a naive
    // distance join would cost, and levenshtein() — a codegen'd
    // built-in, identical unit-cost edit distance in both engines —
    // runs only on candidates. The p_partkey < 500 slice keeps the
    // fixture bounded at every SF (same 500 parts regardless of
    // scale factor).
    Decl("b71_string_distance",
      (s, dir) => {
        val p = t(s, dir, "part").filter($"p_partkey" < 500)
          .select($"p_partkey", $"p_name",
            split($"p_name", " ").getItem(0).as("blk"))
        p.as("a").join(p.as("b"),
            col("a.blk") === col("b.blk") &&
              col("a.p_partkey") < col("b.p_partkey"))
          .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 4)
          .select(col("a.p_partkey").as("a_key"),
            col("b.p_partkey").as("b_key"),
            levenshtein(col("a.p_name"), col("b.p_name"))
              .cast("int").as("dist"))
          .orderBy($"a_key", $"b_key")
      },
      Some("""WITH p AS (SELECT p_partkey, p_name,
               string_split(p_name, ' ')[1] AS blk
               FROM part WHERE p_partkey < 500)
             SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
               CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
             FROM p a JOIN p b
               ON a.blk = b.blk AND a.p_partkey < b.p_partkey
             WHERE levenshtein(a.p_name, b.p_name) <= 4
             ORDER BY a_key, b_key"""))
  )
}
