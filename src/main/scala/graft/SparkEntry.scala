package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared operator pack (SURVEY §2 Parts A/B/C).
  * `queries` keys are the stable SURVEY ids; `oracleSql` carries the
  * DuckDB-equivalent SQL for each SQL-expressible query.
  */
object SparkEntry {

  private val packs: Seq[Pack] = Seq(
    RelationalPack, JoinPack, AggPack, WindowPack, FuncPack, UdfPack, LlmPack,
    PipelinePack, graft.streaming.StreamPack, MultimodalPack, TextPack,
    ScalePack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("b24_agg_groupby")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val ids = packs.flatMap(_.queries.keys)
    require(ids.distinct.size == ids.size,
      s"duplicate query ids across packs: ${ids.diff(ids.distinct).distinct.mkString(", ")}")
    packs.flatMap(_.queries).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
