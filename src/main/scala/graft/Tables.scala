package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table registry: loads the driver-generated parquet tables
  * (TESTDATA.md) from a scale-factor dir and registers temp views so
  * both the DataFrame API and `spark.sql` paths resolve them.
  *
  * Mirrors the reference's catalog role (Iceberg REST catalog +
  * `iceberg.src` namespace, /root/reference/scripts/extract_load.py:42-46,79)
  * with Spark's built-in session catalog: schema-on-read from Parquet
  * footers, no DDL (extract_load.py:73 relies on the same inference).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read nanos as long and convert
      // to a micro-precision timestamp — integral `div` (not `/`) since
      // epoch-nanos exceed double's 2^53 exact-integer range. DuckDB
      // reads the same file as TIMESTAMP_NS natively (NOTES.md rule 7).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(sfDir, name))
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path(sfDir, name))

  /** Register every fixture table as a temp view named after the table.
    * Idempotent; cheap (no data read until an action). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
