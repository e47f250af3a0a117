package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** s13 — streaming reads over IceLite tables (the MicroBatchStream
  * face of the DSv2 connector). Pins the contract the query relies
  * on: snapshot-delta batching, checkpoint resume, new-snapshot
  * discovery, and the append-only guard. */
class IceLiteStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fmt = "graft.sources.IceLiteSource"

  private def freshTable(prefix: String): TableRef = {
    val wh = java.nio.file.Files.createTempDirectory(prefix).toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    ref
  }

  private def ckpt(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("drains a multi-snapshot table one snapshot per trigger, content = batch read") {
    val ref = freshTable("st_src_wh")
    IceLite.createOrReplace(ref, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    IceLite.append(ref, Seq((3L, "c")).toDF("k", "s"))
    IceLite.append(ref, Seq((4L, "d"), (5L, "e")).toDF("k", "s"))
    val q = spark.readStream.format(Fmt)
      .option("snapshotsPerTrigger", 1).load(ref.dir.toString)
      .writeStream.format("memory").queryName("st_src_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt("st_src_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one micro-batch per snapshot: 3 snapshots → 3 committed batches
    assert(q.recentProgress.count(_.numInputRows > 0) == 3)
    val got = spark.table("st_src_sink").as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("checkpoint resume reads only snapshots appended after the last run") {
    val ref = freshTable("st_res_wh")
    val ck = ckpt("st_res_ck")
    val out = java.nio.file.Files.createTempDirectory("st_res_out").toString
    IceLite.createOrReplace(ref, Seq((1L, 10.0)).toDF("k", "v"))
    // memory sinks can't recover a checkpoint — the exactly-once
    // resume path needs a fault-tolerant sink (parquet)
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt).load(ref.dir.toString)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 1)
    // second run, SAME checkpoint, new snapshot in between: exactly
    // the delta lands (a rescan of snapshot 1 would make 3 rows)
    IceLite.append(ref, Seq((2L, 20.0)).toDF("k", "v"))
    drain()
    val got = spark.read.parquet(out).as[(Long, Double)].collect().toSeq.sorted
    assert(got == Seq((1L, 10.0), (2L, 20.0)),
      s"resume must read only the delta, got $got")
    // nothing new → the third run appends nothing
    drain()
    assert(spark.read.parquet(out).count() == 2)
  }

  test("a replace inside the consumed range fails loudly, never double-reads") {
    val ref = freshTable("st_rep_wh")
    val ck = ckpt("st_rep_ck")
    val out = java.nio.file.Files.createTempDirectory("st_rep_out").toString
    IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
    val q1 = spark.readStream.format(Fmt).load(ref.dir.toString)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    // compaction rewrites the consumed files → resuming the stream
    // must fail (re-reading rewritten files would duplicate rows)
    IceLite.append(ref, Seq((2L, "b")).toDF("k", "s"))
    IceLite.compact(spark, ref)
    val q2 = spark.readStream.format(Fmt).load(ref.dir.toString)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("non-append")),
      s"expected the append-only guard, got: ${msgs(err).mkString(" | ")}")
  }

  test("column projection applies on the stream read") {
    val ref = freshTable("st_prj_wh")
    IceLite.createOrReplace(ref, Seq((1L, 1.5, "a"), (2L, 2.5, "b"))
      .toDF("k", "v", "s"))
    val q = spark.readStream.format(Fmt).load(ref.dir.toString)
      .select($"k")
      .writeStream.format("memory").queryName("st_prj_sink")
      .outputMode("append").option("checkpointLocation", ckpt("st_prj_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("st_prj_sink").columns.toSeq == Seq("k"))
    assert(spark.table("st_prj_sink").as[Long].collect().toSeq.sorted == Seq(1L, 2L))
  }
}
