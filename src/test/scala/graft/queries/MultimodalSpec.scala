package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the decode-stub semantics the DuckDB oracle cannot express
  * (byte-level folds over BLOBs): known payload → known features, and
  * the mapPartitions pipeline reproduces the local computation. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decodeStub: known payload yields hand-computed chunk means") {
    // 16 bytes, 8 chunks of 2: chunk c = bytes (10c, 10c+5) → mean 10c+2.5
    val payload = (0 until 8).flatMap(c => Seq(10 * c, 10 * c + 5))
      .map(_.toByte).toArray
    val feats = MultimodalPack.decodeStub(payload)
    assert(feats.toSeq == (0 until 8).map(c => 10 * c + 2.5))
  }

  test("decodeStub: empty and sub-chunk payloads are total") {
    assert(MultimodalPack.decodeStub(Array.emptyByteArray).toSeq ==
      Seq.fill(8)(0.0))
    // 3 bytes over 8 chunks: chunk size 1, chunks 3..7 empty → 0.0
    val f = MultimodalPack.decodeStub(Array[Byte](10, 20, 30))
    assert(f.take(3).toSeq == Seq(10.0, 20.0, 30.0) &&
      f.drop(3).forall(_ == 0.0))
  }

  test("m02 pipeline equals a local recomputation of the stub") {
    val got = MultimodalPack.queries("m02_feature_extract_stub")(
        spark, TestSpark.sfDir)
      .select($"media_id", $"chunk", $"mean_byte")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val expected = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter($"doc_id" < 100)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        id -> MultimodalPack.decodeStub(text.getBytes("UTF-8"))
          .map(v => math.rint(v * 1e6) / 1e6).toSeq
      }.toMap

    assert(got.keySet == expected.keySet)
    got.foreach { case (id, feats) =>
      assert(feats == expected(id), s"media $id features diverge")
    }
  }

  test("resizeStub: 2x downsample of a known grid keeps strided bytes") {
    // 4x4 grid of bytes 0..15, width 4, factor 2 → rows 0,2 cols 0,2
    val grid = (0 until 16).map(_.toByte).toArray
    val out = MultimodalPack.resizeStub(grid, width = 4, factor = 2)
    assert(out.toSeq == Seq[Byte](0, 2, 8, 10))
    // ragged tail: 10 bytes, width 4 → rows 0,2; row 2 has cols 8,(10 absent)
    val ragged = (0 until 10).map(_.toByte).toArray
    assert(MultimodalPack.resizeStub(ragged, 4, 2).toSeq == Seq[Byte](0, 2, 8))
    assert(MultimodalPack.resizeStub(Array.emptyByteArray, 4, 2).isEmpty)
  }

  test("m03 frame sampling keeps every 3rd frame and full frame lengths") {
    val rows = MultimodalPack.queries("m03_frame_sample")(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, frames) =>
      val idx = frames.map(_._3).sorted.toSeq
      assert(idx == idx.indices.map(_ * 3L), "sampled indices are 0,3,6,…")
      // all but possibly the last sampled frame are full 64 bytes
      frames.sortBy(_._3).dropRight(1).foreach(f => assert(f._4 == 64L))
    }
  }

  test("m05 collapses planted byte-identical payloads to the min id") {
    import org.apache.spark.sql.functions._
    // the fixture corpus has no byte-identical texts, so plant them:
    // docs 1000/1001/1002 share one payload, 1003 is unique
    val df = Seq((1000L, "same bytes"), (1001L, "same bytes"),
      (1002L, "same bytes"), (1003L, "other"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = graft.GraftTmp.dir("mediadup_spec").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = MultimodalPack.queries("m05_media_dedup")(spark, tmp)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1000L, 3L, 10L), (1003L, 1L, 5L)),
      s"dedup must keep min id with copy count: $got")
  }

  test("m06: zlib roundtrip is exact and the codec slots into m02's plumbing") {
    val texts = Seq("hello media world", "", "a" * 500, "\u00e9\u00e8\u00ea unicode")
    texts.foreach { t =>
      val b = t.getBytes("UTF-8")
      assert(MultimodalPack.inflateBytes(MultimodalPack.deflateBytes(b)).toSeq
        == b.toSeq, s"zlib roundtrip broke for '$t'")
    }
    // identical features from the zlib path and the identity path —
    // the decode stage is the SAME function with a different codec
    val rows = (1L to 40L).map(i =>
      MultimodalPack.MediaRow(i, "image", s"payload-$i-${"x" * (i % 7).toInt}".getBytes("UTF-8")))
    val viaIdentity = MultimodalPack.decodeWith(MultimodalPack.IdentityCodec)(
      rows.iterator).toSeq
    val viaZlib = MultimodalPack.decodeWith(MultimodalPack.ZlibCodec)(
      rows.map(m => MultimodalPack.MediaRow(m.media_id, m.kind,
        MultimodalPack.deflateBytes(m.payload))).iterator).toSeq
    assert(viaZlib.map(f => (f.media_id, f.n_bytes, f.features.toSeq)) ==
      viaIdentity.map(f => (f.media_id, f.n_bytes, f.features.toSeq)))
  }

  test("m06: codec init runs once per partition (the native-codec amortization slot)") {
    MultimodalSpec.codecInits.set(0)
    implicit val enc = org.apache.spark.sql.Encoders.product[MultimodalPack.MediaFeatures]
    implicit val encR = org.apache.spark.sql.Encoders.product[MultimodalPack.MediaRow]
    val n = spark.createDataset((1L to 100L).map(i =>
        MultimodalPack.MediaRow(i, "image", Array[Byte](1, 2, 3))))
      .repartition(4)
      .mapPartitions(MultimodalPack.decodeWith(MultimodalSpec.CountingCodec))
      .count()
    assert(n == 100)
    assert(MultimodalSpec.codecInits.get == 4,
      s"init must run once per partition, ran ${MultimodalSpec.codecInits.get}")
  }
}

object MultimodalSpec {
  /** Static so executor-side (same-JVM local mode) init calls are
    * visible to the driver-side assertion. */
  val codecInits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Companion-level so the lambda closes over nothing but the
    * serializable codec object. */
  object CountingCodec extends MultimodalPack.MediaCodec {
    override def init(): Unit = { codecInits.incrementAndGet(); () }
    override def decode(p: Array[Byte]): Array[Byte] = p
  }
}
