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

  /** Inferred-schema cache: fixture files are immutable for a
    * process's lifetime, but every `spark.read.parquet(path)` call
    * re-infers the schema from the footer on the driver — and the
    * bench calls `load` thousands of times across its passes (~10 ms
    * each, guide §5 "the driver should do almost no data work").
    * Keyed on the owning SparkContext so a session restart in the
    * same JVM (the Bench/driver pattern) can never serve state of a
    * dead context. Caches METADATA only (a StructType) — the data is
    * re-read from parquet on every action. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String),
    org.apache.spark.sql.types.StructType]()

  /** Strong keys would pin every stopped context of a session-
    * restarting JVM for the process lifetime (r15 ADVICE): evict dead
    * contexts' entries whenever a new one is cached. */
  private def putSchema(key: (org.apache.spark.SparkContext, String),
      s: org.apache.spark.sql.types.StructType): Unit = {
    val it = schemaCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.isStopped) it.remove()
    schemaCache.put(key, s)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, path(sfDir, name))
    else {
      val p = path(sfDir, name)
      val key = (spark.sparkContext, p)
      val cached = schemaCache.get(key)
      if (cached != null) spark.read.schema(cached).parquet(p)
      else {
        val df = spark.read.parquet(p)
        putSchema(key, df.schema)
        df
      }
    }

  /** Schema-adaptive events load. The fixtures' `ts` footer type has
    * changed across regenerations (TIMESTAMP(NANOS) → timestamp[us]),
    * so adapt to what the footer actually carries instead of assuming:
    *  - plain read succeeds, `ts` is a timestamp → cast TIMESTAMP_NTZ
    *    to the session-TZ TimestampType (session TZ is UTC everywhere
    *    here) so downstream time arithmetic and the DuckDB oracle see
    *    the same wall-clock values as before;
    *  - plain read succeeds, `ts` is int64 → treat as epoch-nanos and
    *    convert (integral `div`, not `/`: epoch-nanos exceed double's
    *    2^53 exact range);
    *  - plain read REJECTS the footer (Spark 4 throws on
    *    TIMESTAMP(NANOS)) → only then set the session-wide
    *    `nanosAsLong` shim and convert. The conf must stay set for the
    *    lazy scan that executes later, so it is scoped to "footer
    *    actually carries nanos", not restored mid-plan.
    * Mirrors reference schema-on-read tolerance (extract_load.py:73).
    */
  private def loadEvents(spark: SparkSession, p: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    def nanosToTs(df: DataFrame): DataFrame =
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // same schema cache as `load`: the footer probe + branch decision
    // is deterministic for an immutable fixture file, so replay the
    // decided branch from the cached RAW schema on repeat calls
    val key = (spark.sparkContext, p)
    val cached = schemaCache.get(key)
    val plain =
      if (cached != null) Some(spark.read.schema(cached).parquet(p))
      else
        try {
          val df = spark.read.parquet(p)
          putSchema(key, df.schema)
          Some(df)
        } catch { case _: org.apache.spark.sql.AnalysisException => None }
    plain match {
      case Some(df) =>
        df.schema("ts").dataType match {
          case LongType           => nanosToTs(df)
          case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
          case _                  => df
        }
      case None =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        nanosToTs(spark.read.parquet(p))
    }
  }

  /** Register every fixture table as a temp view named after the table.
    * Idempotent; cheap (no data read until an action). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
