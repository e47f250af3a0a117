package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Hand-computed expectations for the watermark semantics the DuckDB
  * oracle cannot express (SURVEY §5.2 #5, §7.4.4). */
class StreamPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def writeBatch(dir: String, name: String, df: DataFrame): Unit = {
    val staging = graft.GraftTmp.dir("stream_spec_stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(staging).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(dir, name))
  }

  test("late rows behind the watermark are dropped from windowed counts") {
    val src = graft.GraftTmp.dir("stream_spec_src").toString
    val sink = "stream_spec_late_sink"

    // batch 1: 3 events in hour 0, 2 events in hour 2
    // → watermark after batch 1 = 02:30 - 1h = 01:30; hour-0 window
    //   [00:00,01:00) closes and is emitted
    val b1 = Seq((1L, ts(0)), (2L, ts(10)), (3L, ts(20)),
      (4L, ts(125)), (5L, ts(150))).toDF("event_id", "ts")
    writeBatch(src, "b_000.parquet", b1)

    val q = spark.readStream.schema(b1.schema).parquet(src)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation",
        graft.GraftTmp.dir("stream_spec_ckpt").toString)
      .start()
    q.processAllAvailable()

    // batch 2: one LATE row for hour 0 (behind watermark 01:30 → must
    // be dropped) and one on-time row in hour 3
    val b2 = Seq((6L, ts(30)), (7L, ts(190))).toDF("event_id", "ts")
    writeBatch(src, "b_001.parquet", b2)
    q.processAllAvailable()

    // batch 3: one row at 05:10 → watermark 04:10 closes hours 2 and 3
    writeBatch(src, "b_002.parquet", Seq((8L, ts(310))).toDF("event_id", "ts"))
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table(sink)
      .select(date_format($"w.start", "HH:mm").as("h"), $"n".cast("long"))
      .as[(String, Long)].collect().toMap

    // hour-0 window emitted with the 3 ON-TIME rows only — the late
    // event_id=6 did not reopen or grow it
    assert(emitted.get("00:00").contains(3L),
      s"hour-0 window should hold 3 on-time rows, got $emitted")
    // hours 2 and 3 closed once batch 3 advanced the watermark past 04:00
    assert(emitted.get("02:00").contains(2L), s"hour-2 missing: $emitted")
    assert(emitted.get("03:00").contains(1L), s"hour-3 missing: $emitted")
    // hour-5 window still open at shutdown → not emitted in append mode
    assert(!emitted.contains("05:00"), s"open window must not emit: $emitted")
  }

  test("foreachBatch sink is exactly-once: a replayed batchId appends once") {
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("s07_idem_wh").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")

    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b1 = Seq((3L, "c")).toDF("k", "v")
    assert(StreamPack.appendBatchOnce(ref, 0L, b0))
    assert(StreamPack.appendBatchOnce(ref, 1L, b1))
    // replay of batch 0 (Spark's at-least-once foreachBatch contract)
    assert(!StreamPack.appendBatchOnce(ref, 0L, b0),
      "replayed batchId must be skipped")
    val ks = IceLite.read(spark, ref).select($"k").as[Long].collect().sorted
    assert(ks.toSeq == Seq(1L, 2L, 3L), s"double-append on replay: ${ks.toSeq}")
    // the marker commits WITH the data: each snapshot carries its
    // batch id in the summary — no separate marker table, no crash
    // window between data commit and marker commit
    val ids = IceLite.readManifest(ref).snapshots
      .flatMap(_.summary.get(StreamPack.BatchIdKey))
    assert(ids == Seq("0", "1"), s"summary batch ids: $ids")
    // driver restart: the in-memory cache is gone, the manifest is
    // the durable record — a reseeded driver still skips the replay
    StreamPack.resetBatchIdCache()
    assert(!StreamPack.appendBatchOnce(ref, 1L, b1),
      "replay after restart must reseed from the manifest and skip")
    assert(IceLite.read(spark, ref).count() == 3)
  }

  test("MV delta merge: additive fold, zero-count eviction, replay skip") {
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("s18_mv_wh").toString
    IceLite.createNamespace(wh, "mart")
    val mv = TableRef(wh, "mart", "mv")

    def cdc(rows: (Long, Double, String)*): DataFrame =
      rows.toDF("o_custkey", "o_totalprice", "_change_type")

    // batch 0: inserts for two customers
    assert(StreamPack.mergeMvDeltaOnce(spark, mv, 0L,
      cdc((1L, 10.0, "insert"), (1L, 20.0, "insert"), (2L, 5.0, "insert"))))
    // batch 1: delete one of cust 1's orders; update cust 2's order
    assert(StreamPack.mergeMvDeltaOnce(spark, mv, 1L,
      cdc((1L, 10.0, "delete"),
        (2L, 5.0, "update_preimage"), (2L, 7.5, "update_postimage"))))
    val got = IceLite.read(spark, mv)
      .select($"o_custkey", $"n_orders".cast("long"),
        $"sum_price".cast("double"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 20.0), (2L, 1L, 7.5)), s"MV state: $got")
    // replay of batch 1 must NOT double-subtract (additive ≠ idempotent)
    assert(!StreamPack.mergeMvDeltaOnce(spark, mv, 1L,
      cdc((1L, 10.0, "delete"))))
    // batch 2: cust 1's last order deleted → key evicted from the MV
    assert(StreamPack.mergeMvDeltaOnce(spark, mv, 2L,
      cdc((1L, 20.0, "delete"))))
    val keys = IceLite.read(spark, mv).select($"o_custkey")
      .as[Long].collect().toSeq
    assert(keys == Seq(2L), s"zero-count key must evict: $keys")
    // restart: cache gone, manifest summary is durable → replay skipped
    StreamPack.resetBatchIdCache()
    assert(!StreamPack.mergeMvDeltaOnce(spark, mv, 2L,
      cdc((1L, 20.0, "delete"))))
    assert(IceLite.read(spark, mv).count() == 1)
  }

  test("MV maintenance property: random CDC sequences converge to the from-scratch aggregate") {
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("s18_prop_wh").toString
    IceLite.createNamespace(wh, "mart")
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val mv = TableRef(wh, "mart", s"mv_$trial")
      // reference model: the live multiset of prices per key
      // (integer-valued prices keep double sums exact)
      val live = scala.collection.mutable.Map.empty[Long, Vector[Double]]
        .withDefaultValue(Vector())
      for (batchId <- 0L until 6L) {
        val rows = scala.collection.mutable.Buffer[(Long, Double, String)]()
        for (_ <- 0 until rnd.nextInt(5) + 1) {
          val k = rnd.nextInt(4).toLong
          val p = (rnd.nextInt(1000) + 1).toDouble
          rows += ((k, p, "insert")); live(k) = live(k) :+ p
        }
        for (_ <- 0 until rnd.nextInt(3)) {
          val withRows = live.filter(_._2.nonEmpty).keys.toSeq.sorted
          if (withRows.nonEmpty) {
            val k = withRows(rnd.nextInt(withRows.size))
            val p = live(k).head
            rows += ((k, p, "delete")); live(k) = live(k).tail
          }
        }
        for (_ <- 0 until rnd.nextInt(2)) {
          val withRows = live.filter(_._2.nonEmpty).keys.toSeq.sorted
          if (withRows.nonEmpty) {
            val k = withRows(rnd.nextInt(withRows.size))
            val old = live(k).head
            val nv = (rnd.nextInt(1000) + 1).toDouble
            rows += ((k, old, "update_preimage"))
            rows += ((k, nv, "update_postimage"))
            live(k) = nv +: live(k).tail
          }
        }
        assert(StreamPack.mergeMvDeltaOnce(spark, mv, batchId,
          rows.toSeq.toDF("o_custkey", "o_totalprice", "_change_type")))
      }
      val want = live.filter(_._2.nonEmpty)
        .map { case (k, ps) => k -> ((ps.size.toLong, ps.sum)) }.toMap
      val got =
        if (!IceLite.tableExists(mv)) Map.empty[Long, (Long, Double)]
        else IceLite.read(spark, mv)
          .select($"o_custkey", $"n_orders".cast("long"),
            $"sum_price".cast("double"))
          .as[(Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want,
        s"trial $trial diverged:\n  mv    = $got\n  model = $want")
    }
  }

  test("streaming dedup emits each key once across micro-batches") {
    // mirrors s05: watermarked dedup — duplicates within the delay
    // horizon are removed exactly
    val src = graft.GraftTmp.dir("stream_spec_dedup").toString
    val sink = "stream_spec_dedup_sink"
    val b1 = Seq((1L, ts(0)), (2L, ts(1))).toDF("event_id", "ts")
    writeBatch(src, "b_000.parquet", b1)
    // batch 2 replays id=2 and adds id=3
    writeBatch(src, "b_001.parquet",
      Seq((2L, ts(2)), (3L, ts(3))).toDF("event_id", "ts"))

    val q = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation",
        graft.GraftTmp.dir("stream_spec_ckpt2").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val ids = spark.table(sink).select($"event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("append-mode session windows flush via a sentinel watermark advance") {
    // the s04 shape at tiny scale: sessions emit in append mode only
    // when the watermark passes their end+gap; a far-future sentinel
    // row closes every real session, and the sentinel's own
    // still-open session is never emitted. Pins the AvailableNow
    // extra-flush-batch behavior s04 relies on.
    val src = graft.GraftTmp.dir("stream_spec_sess").toString
    val sink = "stream_spec_sess_sink"
    // user 1: two sessions (gap > 30 min); user 2: one session
    val b0 = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(120)),
      (2L, ts(5))).toDF("user_id", "ts")
    writeBatch(src, "b_000.parquet", b0)
    val q = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "10 minutes")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).cast("long").as("n"))
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation",
        graft.GraftTmp.dir("stream_spec_ckpt4").toString)
      .start()
    q.processAllAvailable()
    // nothing can have closed yet (watermark = 02:00 - 10min < any end)
    // sentinel: far-future row for user -1 closes all real sessions
    writeBatch(src, "b_001.parquet",
      Seq((-1L, Timestamp.valueOf("2100-01-01 00:00:00")))
        .toDF("user_id", "ts"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table(sink)
      .select($"user_id", date_format($"w.start", "HH:mm").as("start"),
        $"n".cast("long"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, "00:00", 2L), (1L, "02:00", 1L), (2L, "00:05", 1L)),
      s"sessions mis-flushed: $got")
    // the sentinel's own session stays open → never emitted
    assert(!got.exists(_._1 == -1L), s"open sentinel session emitted: $got")
  }

  test("dedup state is watermark-bounded: evicted key re-emits, live key dedups") {
    // the s05 contract: state for a key lives until the watermark
    // passes (event time + delay); a duplicate inside that horizon is
    // dropped, a duplicate after eviction is re-emitted. This is what
    // makes the state store BOUNDED on an unbounded feed — plain
    // dropDuplicates would hold every key forever.
    val src = graft.GraftTmp.dir("stream_spec_evict").toString
    val sink = "stream_spec_evict_sink"
    val delay = "10 minutes"

    // batch 0: k1 @ 10:00 → state expiry 10:10
    val b0 = Seq((1L, ts(600))).toDF("event_id", "ts")
    writeBatch(src, "b_000.parquet", b0)
    val q = spark.readStream.schema(b0.schema).parquet(src)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation",
        graft.GraftTmp.dir("stream_spec_ckpt3").toString)
      .start()
    q.processAllAvailable()

    // batch 1: k2 @ 10:25 → after this batch the watermark is 10:15
    writeBatch(src, "b_001.parquet", Seq((2L, ts(625))).toDF("event_id", "ts"))
    q.processAllAvailable()

    // batch 2: k3 @ 10:26 — processed with watermark 10:15 > k1's
    // expiry 10:10 → k1's state is evicted; k2 (expiry 10:35) lives
    writeBatch(src, "b_002.parquet", Seq((3L, ts(626))).toDF("event_id", "ts"))
    q.processAllAvailable()

    // batch 3: k1 again @ 10:20 (above watermark 10:16, but its state
    // is gone → RE-EMITTED) and k2 again @ 10:25 (state live → deduped)
    writeBatch(src, "b_003.parquet",
      Seq((1L, ts(620)), (2L, ts(625))).toDF("event_id", "ts"))
    q.processAllAvailable()
    q.stop()

    val counts = spark.table(sink).groupBy($"event_id")
      .agg(count(lit(1)).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts.get(1L).contains(2L),
      s"evicted key must re-emit after the watermark horizon: $counts")
    assert(counts.get(2L).contains(1L),
      s"key within the horizon must stay deduped: $counts")
    assert(counts.get(3L).contains(1L), s"control key: $counts")
  }

  test("router restart from checkpoint: old batches not reprocessed, late files routed") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    import graft.icelite.{IceLite, TableRef}
    // uncached staging: file set GROWS between two runs sharing one
    // checkpoint — the restart must process only the new file, and
    // the merge sinks must keep the union exact (no dupes, no loss)
    val src = graft.GraftTmp.dir("router_restart_src")
    val ckpt = graft.GraftTmp.dir("router_restart_ckpt").toString
    val wh = graft.GraftTmp.dir("router_restart_wh").toString
    val accept = TableRef(wh, "ns", "acc")
    val reject = TableRef(wh, "ns", "rej")
    IceLite.createNamespace(wh, "ns")
    def writeFile(name: String, rows: Seq[(Long, Long)]): Unit = {
      val staging = graft.GraftTmp.dir("router_restart_stage")
      rows.toDF("doc_id", "n_tokens").coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = IceLite.listDir(java.nio.file.Files.list(staging))(_
        .find(p => p.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith(".")).get)
      java.nio.file.Files.move(part, src.resolve(s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val sch = spark.read.parquet(src.toString).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IceLite.merge(spark, accept,
            batch.filter(col("n_tokens") >= 40), Seq("doc_id"))
          IceLite.merge(spark, reject,
            batch.filter(col("n_tokens") < 40), Seq("doc_id"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeFile("f0", Seq((1L, 100L), (2L, 10L)))
    runOnce()
    val accV1 = IceLite.readManifest(accept).currentSnapshotId
    writeFile("f1", Seq((3L, 50L), (4L, 5L)))
    runOnce()
    // restart processed ONLY f1: accept gained exactly one commit
    val accOps = IceLite.readManifest(accept)
    assert(accOps.currentSnapshotId == accV1 + 1,
      s"restart must merge exactly one new batch into accept, " +
        s"got ${accOps.snapshots.map(_.operation)}")
    assert(IceLite.read(spark, accept).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(IceLite.read(spark, reject).select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    // a third run with nothing new is a no-op on both sinks
    val (a3, r3) = (IceLite.readManifest(accept).currentSnapshotId,
      IceLite.readManifest(reject).currentSnapshotId)
    runOnce()
    assert(IceLite.readManifest(accept).currentSnapshotId == a3 &&
      IceLite.readManifest(reject).currentSnapshotId == r3,
      "an empty restart must not commit")
  }

  test("s12 router: accept and reject exactly partition the corpus") {
    val row = StreamPack.queries("s12_stream_quality_router")(
      spark, TestSpark.sfDir).collect().head
    val total = graft.Tables.load(spark, TestSpark.sfDir, "documents").count()
    assert(row.getAs[Long]("n_accept") + row.getAs[Long]("n_reject") == total,
      s"router dropped or duplicated docs: $row vs $total docs")
    assert(row.getAs[Long]("n_accept") > 0 && row.getAs[Long]("n_reject") > 0,
      s"routing predicate must split the fixture non-trivially: $row")
  }
}
