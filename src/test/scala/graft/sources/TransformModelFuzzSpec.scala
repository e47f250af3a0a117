package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}
import graft.icelite.IceLite.SourceIn
import graft.sources.rest.CatalogServer

/** Model fuzz for the TRANSFORM-LAYOUT cross-product the scenario
  * specs visit one edge at a time: random interleavings of
  * {hidden-partition SQL INSERT, CoW DELETE/UPDATE, MoR position /
  * equality sidecars, transform-spec evolution, compact, expiry,
  * whole-table INSERT OVERWRITE} against one `bucket(4, k)` table —
  * with every SQL op (and every check read) flipping a coin between
  * the OWNING catalog and the REST attachment, so transform DML over
  * the wire fuzzes in the same interleavings.
  * Transform layouts keep `partitionCols` EMPTY (the source column
  * stays in the data pages; only pruning consults the dirs), so the
  * MoR family runs on them — sidecars over hidden dirs is exactly the
  * interaction nothing else exercises. Two invariants after EVERY op:
  *
  *  1. full SQL read ≡ an in-memory serial-replay model;
  *  2. PRUNE-EXACTNESS: `readTransformPruned` on a random key probe ≡
  *     the model's filter — the 100 TB-critical property, because a
  *     pruning bug only drops rows when pruning is ON (a full-scan
  *     check would stay green through it).
  *
  * Ops attempted against states that refuse (CoW over live sidecars,
  * spec evolution over live sidecars, overwrite over pre-evolution
  * files) must refuse with the documented compact()-remedy message
  * and leave table AND model untouched — the checks still run.
  * Fixed seeds; failures reproduce exactly. */
class TransformModelFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = graft.GraftTmp.dir(s"tf_fuzz_$seed").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val cat = s"tfcat_${seed}_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    // the REMOTE face: every SQL op below flips a coin between the
    // owning catalog and the REST attachment, so transform DML over
    // the wire (d84/d76 × d56) fuzzes in the same interleavings
    val srv = new CatalogServer(wh).start()
    val rcat = s"tfrest_${seed}_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$rcat",
      "graft.sources.rest.IceLiteRestCatalog")
    spark.conf.set(s"spark.sql.catalog.$rcat.uri", srv.uri)
    def tblFace(): String =
      if (rnd.nextBoolean()) s"$cat.src.t" else s"$rcat.src.t"
    val tbl = s"$cat.src.t"
    spark.sql(s"""CREATE TABLE $tbl (k BIGINT, g STRING, v DOUBLE)
                  PARTITIONED BY (bucket(4, k))""")
    try {

    // model: key -> (g, v)
    var model = Map.empty[Long, (String, Double)]
    var nextKey = 0L
    def fresh(n: Int): Seq[(Long, String, Double)] = {
      val rows = (nextKey until nextKey + n).map(k =>
        (k, s"g${k % 3}", k * 0.5))
      nextKey += n
      rows
    }
    def insert(rows: Seq[(Long, String, Double)]): Unit = {
      rows.toDF("k", "g", "v").createOrReplaceTempView(s"tf_b_$seed")
      spark.sql(
        s"INSERT INTO ${tblFace()} (k, g, v) SELECT k, g, v FROM tf_b_$seed")
      model ++= rows.map(r => r._1 -> (r._2, r._3))
    }
    insert(fresh(6))

    /** Documented refusals all name the remedy: compact() first. */
    def refusalOk(e: Throwable): Boolean = {
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      msgs(e).exists(m => m.contains("compact") || m.contains("MoR") ||
        m.contains("pending"))
    }

    def declared: Seq[String] =
      IceLite.readManifest(ref).writeLayoutSpec.map(_.name)

    def check(label: String): Unit = {
      // read through a random face too — both must serve the model
      val got = spark.sql(
          s"SELECT k, g, v FROM ${tblFace()} ORDER BY k").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(got == model,
        s"[seed=$seed $label] table diverged from model\n" +
          s"got:   ${got.toSeq.sortBy(_._1).take(12)}\n" +
          s"model: ${model.toSeq.sortBy(_._1).take(12)}")
      // prune-exactness: a random live-key probe (plus one dead key,
      // so empty buckets prune too) through every era on file
      val probe = (rnd.shuffle(model.keys.toSeq.sorted).take(2) :+
        (nextKey + 1000L)).distinct
      val pruned = IceLite.readTransformPruned(spark, ref,
          Seq(SourceIn("k", probe)), col("k").isin(probe: _*))
        .select("k", "g", "v").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      val expect = model.filter(kv => probe.contains(kv._1))
      assert(pruned == expect,
        s"[seed=$seed $label] transform-pruned read diverged " +
          s"(probe=$probe)\ngot:    ${pruned.toSeq.sortBy(_._1)}\n" +
          s"expect: ${expect.toSeq.sortBy(_._1)}")
    }

    check("seed")
    val trace = sys.env.contains("GRAFT_FUZZ_TRACE")
    (1 to ops).foreach { i =>
      val op = rnd.nextInt(11)
      if (trace) println(s"[tf fuzz seed=$seed] op$i case$op " +
        s"declared=$declared modelSize=${model.size}")
      op match {
        case 0 | 1 => // hidden-partition SQL INSERT
          insert(fresh(1 + rnd.nextInt(3)))
        case 2 => // CoW SQL DELETE (refuses over live sidecars)
          val r0 = rnd.nextInt(5)
          try {
            spark.sql(s"DELETE FROM ${tblFace()} WHERE k % 5 = $r0")
            model = model.filterNot(_._1 % 5 == r0)
          } catch { case e: Exception =>
            assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
        case 3 => // MoR position-delete sidecar over hidden dirs
          val r0 = rnd.nextInt(7)
          try {
            IceLite.deleteWhereMoR(spark, ref, s"k % 7 = $r0")
            model = model.filterNot(_._1 % 7 == r0)
          } catch { case e: Exception =>
            assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
        case 4 => // MoR update over hidden dirs
          val r0 = rnd.nextInt(6)
          try {
            IceLite.updateWhereMoR(spark, ref, s"k % 6 = $r0",
              Map("v" -> "v + 10"))
            model = model.map { case (k, (g, v)) =>
              if (k % 6 == r0) k -> (g, v + 10) else k -> (g, v) }
          } catch { case e: Exception =>
            assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
        case 5 => // CoW SQL UPDATE (refuses over live sidecars)
          val r0 = rnd.nextInt(4)
          try {
            spark.sql(
              s"UPDATE ${tblFace()} SET v = v + 100 WHERE k % 4 = $r0")
            model = model.map { case (k, (g, v)) =>
              if (k % 4 == r0) k -> (g, v + 100) else k -> (g, v) }
          } catch { case e: Exception =>
            assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
        case 6 => // compact: materializes the declared transform spec
          val snap = IceLite.compact(spark, ref)
          val names = declared
          assert(snap.files.forall(f => names.forall(n =>
              f.contains(s"$n="))),
            s"[seed=$seed op$i] compact left files outside the " +
              s"declared layout $names: ${snap.files}")
        case 7 => // expiry (metadata-only; history shrinks, data holds)
          IceLite.expireSnapshotsRetainLast(ref, 3)
        case 8 => // transform-spec evolution (refuses over live
          // sidecars, NOTES #42): truncate(1, g), then bucket(2, k)
          val next =
            if (!declared.contains("g_trunc")) Some("truncate(1, g)")
            else None
          next.foreach { t =>
            try spark.sql(s"ALTER TABLE $tbl ADD PARTITION FIELD $t")
            catch { case e: Exception =>
              assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
          }
        case 9 => // whole-table INSERT OVERWRITE (replace path under
          // a transform layout; may refuse over sidecars or mixed eras)
          val rows = fresh(2 + rnd.nextInt(2))
          rows.toDF("k", "g", "v").createOrReplaceTempView(s"tf_ow_$seed")
          try {
            spark.sql(
              s"INSERT OVERWRITE ${tblFace()} SELECT k, g, v FROM tf_ow_$seed")
            model = rows.map(r => r._1 -> (r._2, r._3)).toMap
          } catch { case e: Exception =>
            assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
        case 10 => // EMPTY the table (the seed-6021 bug class): a
          // DELETE matching everything, via CoW SQL or a MoR sidecar
          // — every later op then runs against an emptied table
          try {
            if (rnd.nextBoolean())
              spark.sql(s"DELETE FROM ${tblFace()} WHERE k >= 0")
            else IceLite.deleteWhereMoR(spark, ref, "k >= 0")
            model = Map.empty
          } catch { case e: Exception =>
            assert(refusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
      }
      check(s"op$i(case$op)")
    }
    } finally srv.stop()
  }

  test("random transform-layout interleavings match the model (seed 5)") { run(5L, 20) }
  test("random transform-layout interleavings match the model (seed 23)") { run(23L, 20) }
  test("random transform-layout interleavings match the model (seed 71)") { run(71L, 20) }
  // wide-sweep find (r9): a DELETE emptying every file left a
  // zero-column read — the emptied table now keeps its declared
  // schema. The exact sequence is pinned deterministically in
  // EmptyTableSweepSpec (the op-space grew since, so this seed now
  // replays a different — equally valid — interleaving).
  test("random transform-layout interleavings match the model (seed 6021)") { run(6021L, 16) }

  // offline wide sweep (not part of the CI suite):
  //   GRAFT_TF_FUZZ_SEEDS=50 [GRAFT_TF_FUZZ_BASE=3000] \
  //     sbt "testOnly graft.sources.TransformModelFuzzSpec"
  sys.env.get("GRAFT_TF_FUZZ_SEEDS").map(_.trim.toInt).foreach { n =>
    val base = sys.env.get("GRAFT_TF_FUZZ_BASE").map(_.trim.toLong).getOrElse(3000L)
    (1 to n).foreach { s =>
      test(s"tf sweep seed ${base + s}") { run(base + s, 16) }
    }
  }
}
