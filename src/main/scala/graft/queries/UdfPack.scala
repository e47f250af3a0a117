package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables
import syntax._

/** SURVEY.md §2 B.10 — the extension surface b59-b61.
  *
  * The reference's extension story is "bring PySpark or dbt SQL"
  * (/root/reference/scripts/extract_load.py, README.md:79-98); the
  * idiomatic Spark trio is scalar UDF, typed Aggregator UDAF, and a
  * generator (flatMap/explode) as the UDTF.
  *
  * Scale notes: UDFs break WholeStageCodegen — acceptable here because
  * the ids exist to cover the extension surface; every same-semantics
  * built-in path elsewhere in the library uses codegen'd functions
  * (the b59 classifier is CASE WHEN-expressible, and the oracle
  * verifies exactly that equivalence). The Aggregator is a 2-phase
  * aggregate (partial merge before shuffle) so it scales like any
  * built-in agg.
  */
object UdfPack extends Pack {

  /** Geometric mean via sum-of-logs — numerically safe at any row
    * count (product would overflow); reduce/merge are associative, so
    * Spark can partial-aggregate map-side. */
  private case class GeoBuf(sumLn: Double, n: Long)
  private object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0.0, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf = GeoBuf(b.sumLn + math.log(x), b.n + 1)
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumLn + b.sumLn, a.n + b.n)
    def finish(b: GeoBuf): Double = if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val decls: Seq[Decl] = Seq(

    // band boundaries sit 0.05 off the fixture's 0.1-step price grid,
    // so double noise can't flip a classification
    Decl("b59_scalar_udf",
      (s, dir) => {
        val band = udf((p: Double) =>
          if (p < 925.05) "low" else if (p < 975.05) "mid" else "high")
        Tables.load(s, dir, "part").filter($"p_partkey" < 1000)
          .select($"p_partkey", band($"p_retailprice").as("band"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             CASE WHEN p_retailprice < 925.05 THEN 'low'
                  WHEN p_retailprice < 975.05 THEN 'mid'
                  ELSE 'high' END AS band
             FROM part WHERE p_partkey < 1000 ORDER BY p_partkey""")),

    Decl("b60_typed_udaf",
      (s, dir) => Tables.load(s, dir, "part")
        .groupBy($"p_brand")
        .agg(round(udaf(GeoMean).apply($"p_retailprice"), 4).as("geo_price"),
          count(lit(1)).cast("long").as("n"))
        .orderBy($"p_brand"),
      Some("""SELECT p_brand, ROUND(EXP(AVG(LN(p_retailprice))), 4) AS geo_price,
             CAST(COUNT(*) AS BIGINT) AS n
             FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // generator: one row per token (explode = Spark's UDTF surface)
    Decl("b61_udtf_explode",
      (s, dir) => Tables.load(s, dir, "documents").filter($"doc_id" < 20)
        .select($"doc_id", explode(split($"text", " ")).as("tok"))
        .groupBy($"doc_id", $"tok")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy($"doc_id", $"tok"),
      Some("""SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
               SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents WHERE doc_id < 20)
             GROUP BY doc_id, tok ORDER BY doc_id, tok"""))
  )
}
