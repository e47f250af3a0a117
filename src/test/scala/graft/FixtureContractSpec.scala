package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Fixture contract: `Tables.load` must analyze and execute against
  * whatever footer encodings the driver-generated testdata carries.
  * Round 5 lost 32 queries because the loader assumed `events.ts` was
  * parquet TIMESTAMP(NANOS) after the fixtures had been regenerated as
  * timestamp[us] — this suite pins all three encodings (epoch-nanos
  * int64, timestamp[us]/NTZ, true TIMESTAMP(NANOS)) so a future
  * regeneration fails loudly in `sbt test` instead of silently zeroing
  * a third of the correctness dump.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  Tables.all.foreach { t =>
    test(s"$t loads, analyzes, and supports a one-row action") {
      val df = Tables.load(spark, TestSpark.sfDir, t)
      assert(df.schema.nonEmpty)
      assert(df.limit(1).collect().length == 1)
    }
  }

  test("documents.text is pure ASCII (m02's byte==codepoint oracle precondition)") {
    // m02's DuckDB oracle replays the stub's per-chunk BYTE means via
    // ord(substr(…)) CHARACTER folds — valid only while one char is
    // one byte. A fixture regeneration that introduces multi-byte
    // text must fail here, not silently skew the gate.
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val n = Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(n == 0, s"$n non-ASCII documents break m02's oracle assumption")
  }

  test("events.ts loads as a session-TZ timestamp from the live fixtures") {
    val df = Tables.load(spark, TestSpark.sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
  }

  // 2024-01-02T03:04:05.123456789Z as epoch-nanos; micros truncation
  // expected on conversion.
  private val refNanos = 1704164645123456789L
  private val refMicrosInstant =
    java.time.Instant.ofEpochSecond(1704164645L, 123456000L)

  test("int64 ts is interpreted as epoch-nanos and converted") {
    import spark.implicits._
    val dir = graft.GraftTmp.dir("graft-ts-long").toString
    Seq((1L, refNanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select("ts").head.getTimestamp(0).toInstant == refMicrosInstant)
  }

  test("timestamp[us] (NTZ) ts passes through as session-TZ timestamp") {
    val dir = graft.GraftTmp.dir("graft-ts-us").toString
    spark.sql(
      "SELECT 1L AS event_id, TIMESTAMP_NTZ'2024-01-02 03:04:05.123456' AS ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    // session TZ is UTC, so the NTZ wall-clock must survive the cast
    assert(got.select(col("ts").cast(StringType)).head.getString(0)
      == "2024-01-02 03:04:05.123456")
  }

  test("TIMESTAMP(NANOS) footer triggers the nanosAsLong shim and converts") {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.hadoop.fs.Path

    val dir = graft.GraftTmp.dir("graft-ts-nanos").toString
    new java.io.File(s"$dir/events.parquet").mkdirs()
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet/part-00000.parquet"))
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withType(schema)
      .build()
    val g = new SimpleGroupFactory(schema).newGroup()
    g.add("event_id", 1L)
    g.add("ts", refNanos)
    writer.write(g)
    writer.close()
    try {
      val got = Tables.load(spark, dir, "events")
      assert(got.schema("ts").dataType == TimestampType)
      assert(got.select("ts").head.getTimestamp(0).toInstant == refMicrosInstant)
    } finally {
      // the shim is session-wide by necessity (the lazy scan re-reads
      // it at execution); clear it here so no other suite inherits it
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }
}
