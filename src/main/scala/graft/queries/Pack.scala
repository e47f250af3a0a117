package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator (SURVEY.md §2): a stable id, a Spark-first
  * query over the fixture tables in `sfDir`, and (where
  * SQL-expressible) a DuckDB oracle over the same parquet files.
  */
final case class Decl(
    id: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait Pack {
  def decls: Seq[Decl]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    decls.map(d => d.id -> d.fn).toMap
  final def oracleSql: Map[String, String] =
    decls.collect { case Decl(id, _, Some(sql)) => id -> sql }.toMap
}
