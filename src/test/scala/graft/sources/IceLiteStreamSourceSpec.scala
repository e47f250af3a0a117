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
    val wh = graft.GraftTmp.dir(prefix).toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    ref
  }

  private def ckpt(prefix: String): String =
    graft.GraftTmp.dir(prefix).toString

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

  test("streams a PARTITIONED table with path-borne values intact (s23)") {
    val ref = freshTable("st_src_part")
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    IceLite.appendPartitioned(ref, Seq((3L, "C")).toDF("k", "p"), "p")
    val q = spark.readStream.format(Fmt)
      .option("snapshotsPerTrigger", 1).load(ref.dir.toString)
      .writeStream.format("memory").queryName("st_src_part_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt("st_src_part_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == 2,
      "one micro-batch per partitioned commit")
    val got = spark.table("st_src_part_sink")
      .select("k", "p").as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "A"), (2L, "B"), (3L, "C")),
      s"partition values lost on the stream read: $got")
  }

  test("checkpoint resume reads only snapshots appended after the last run") {
    val ref = freshTable("st_res_wh")
    val ck = ckpt("st_res_ck")
    val out = graft.GraftTmp.dir("st_res_out").toString
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
    val out = graft.GraftTmp.dir("st_rep_out").toString
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

  test("a DROP + re-CREATE reaching the consumed snapshot id fails loudly (incarnation pin)") {
    val ref = freshTable("st_inc_wh")
    val ck = ckpt("st_inc_ck")
    val out = graft.GraftTmp.dir("st_inc_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt).load(ref.dir.toString)
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
    IceLite.append(ref, Seq((2L, "b")).toDF("k", "s"))
    drain() // checkpoint now holds snapshotId = 2
    // DROP + re-CREATE: the new incarnation's sequential ids pass the
    // consumed id again — id-only offsets would treat snapshots 1-2 of
    // the NEW table as already consumed and silently skip them
    IceLite.listDir(java.nio.file.Files.walk(ref.dir))(_.toSeq)
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    IceLite.createOrReplace(ref, Seq((10L, "x")).toDF("k", "s"))
    IceLite.append(ref, Seq((20L, "y")).toDF("k", "s"))
    IceLite.append(ref, Seq((30L, "z")).toDF("k", "s"))
    val q2 = spark.readStream.format(Fmt).load(ref.dir.toString)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("different incarnation")),
      s"expected the incarnation pin, got: ${msgs(err).mkString(" | ")}")
    // nothing of the new incarnation leaked through the old checkpoint
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSeq.sorted ==
      Seq((1L, "a"), (2L, "b")))
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

  // ---- s17: changelog (CDC) streaming ----

  test("changelog stream emits inserts, MoR deletes and update pre/post pairs") {
    val ref = freshTable("cdc_wh")
    IceLite.createOrReplaceSorted(ref,
      (0L until 100L).map(k => (k, k * 2.0)).toDF("k", "v"),
      "k", numFiles = 2, statsCols = Seq("k"))
    IceLite.append(ref, Seq((500L, 5.0)).toDF("k", "v"))
    IceLite.deleteWhereMoR(spark, ref, "k < 10")
    IceLite.updateWhereMoR(spark, ref, "k = 20", Map("v" -> "999.0"))
    val q = spark.readStream.format(Fmt)
      .option("changelog", "true").load(ref.dir.toString)
      .writeStream.format("memory").queryName("cdc_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt("cdc_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("cdc_sink")
      .as[(Long, Double, String, Long)].collect().toSeq
    val byType = got.groupBy(_._3)
    // baseline create (100) + append (1) = 101 inserts
    assert(byType("insert").length == 101)
    assert(byType("insert").exists(_._1 == 500L))
    // 10 deletes carrying the dead rows' values
    assert(byType("delete").map(r => (r._1, r._2)).sorted ==
      (0L until 10L).map(k => (k, k * 2.0)))
    // one pre/post pair for the update
    assert(byType("update_preimage").map(r => (r._1, r._2)) == Seq((20L, 40.0)))
    assert(byType("update_postimage").map(r => (r._1, r._2)) == Seq((20L, 999.0)))
    // commit ids are monotone and match snapshot order
    val ids = got.map(_._4).distinct.sorted
    assert(ids.size == 4)
  }

  test("changelog checkpoint resume delivers only the new changes") {
    val ref = freshTable("cdc_res_wh")
    val ck = ckpt("cdc_res_ck")
    val out = graft.GraftTmp.dir("cdc_res_out").toString
    IceLite.createOrReplace(ref, (0L until 50L).map(k => (k, k * 1.0)).toDF("k", "v"))
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("changelog", "true").load(ref.dir.toString)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    IceLite.deleteWhereMoR(spark, ref, "k >= 40")
    drain()
    val got = spark.read.parquet(out).as[(Long, Double, String, Long)]
      .collect().toSeq
    assert(got.count(_._3 == "insert") == 50)
    assert(got.filter(_._3 == "delete").map(_._1).sorted == (40L until 50L))
  }

  test("CDC replica follows the source across checkpoint restarts") {
    val ref = freshTable("cdc_rep_wh")
    val replica = graft.icelite.TableRef(
      ref.warehouse, ref.namespace, ref.name + "_replica")
    val ck = ckpt("cdc_rep_ck")
    IceLite.createOrReplace(ref, (0L until 50L).map(k => (k, k * 1.0)).toDF("k", "v"))
    def drain(): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("changelog", "true").load(ref.dir.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val changes = batch.select(col("k"),
            when(col("_change_type").isin("delete", "update_preimage"),
              lit(null)).otherwise(col("v")).as("v"))
          IceLite.merge(spark, replica, changes, Seq("k"),
            deleteWhere = Some("v IS NULL"))
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    // source evolves: a delete and an append land between runs
    IceLite.deleteWhereMoR(spark, ref, "k < 5")
    IceLite.append(ref, Seq((100L, 7.0)).toDF("k", "v"))
    drain()
    // replica ≡ source's current state (MoR-applied read)
    val want = IceLite.read(spark, ref).as[(Long, Double)].collect().toSeq.sorted
    val got = IceLite.read(spark, replica).as[(Long, Double)].collect().toSeq.sorted
    assert(got == want, s"replica diverged: ${got.size} vs ${want.size} rows")
    assert(got.size == 46 && !got.exists(_._1 < 5) && got.contains((100L, 7.0)))
  }

  test("changelog stream survives an ALTER ADD COLUMN between commits") {
    val ref = freshTable("cdc_alt_wh")
    IceLite.createOrReplace(ref, (0L until 10L).map(k => (k, k * 1.0)).toDF("k", "v"))
    // metadata-only commit mid-history: no snapshot, nothing to emit
    IceLite.alterAddColumn(ref, "tag", "string")
    IceLite.append(ref, Seq((10L, 10.0)).toDF("k", "v"))
    val q = spark.readStream.format(Fmt)
      .option("changelog", "true").load(ref.dir.toString)
      .select(col("k"), col("_change_type"))
      .writeStream.format("memory").queryName("cdc_alt_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt("cdc_alt_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("cdc_alt_sink").as[(Long, String)].collect().toSeq
    assert(got.size == 11 && got.forall(_._2 == "insert"),
      s"alter must be invisible to the changelog: $got")
  }

  test("changelog stream fails loudly on a rewriting commit in the range") {
    val ref = freshTable("cdc_rw_wh")
    IceLite.createOrReplace(ref, (0L until 20L).map(k => (k, k * 1.0)).toDF("k", "v"))
    IceLite.append(ref, Seq((100L, 1.0)).toDF("k", "v"))
    IceLite.compact(spark, ref)
    val q = spark.readStream.format(Fmt)
      .option("changelog", "true").load(ref.dir.toString)
      .writeStream.format("memory").queryName("cdc_rw_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt("cdc_rw_ck"))
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[Exception](q.awaitTermination())
    assert(e.getMessage.contains("non-derivable") ||
      (e.getCause != null && e.getCause.getMessage.contains("non-derivable")))
  }
}
