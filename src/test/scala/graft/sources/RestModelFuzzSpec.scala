package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}
import graft.sources.rest.CatalogServer

/** Randomized model fuzz for the REST ATTACHMENT (round-8 verdict
  * task #3, the treatment EvolutionModelSpec earned by finding a real
  * mixed-era bug on its first seed): random interleavings of
  * {remote SQL DML, local API DML (CoW + MoR), remote/local
  * maintenance, schema evolution} against ONE table served to two
  * engine faces by one catalog service — the reference's topology
  * (docker-compose.yml:3-29: one REST catalog serving Spark and Trino
  * concurrently). After EVERY op, the remote face must equal an
  * in-memory serial-replay model; the local face is cross-checked
  * periodically and at the end, so the two faces can never diverge
  * silently. CoW ops attempted against live MoR sidecars may refuse
  * with their documented message — then the table must be UNTOUCHED
  * (the check still runs). Concurrency op: parallel remote INSERTs
  * must all land (every lost CAS race rebases; a permanently-failing
  * 409 would drop a batch and diverge the model). Fixed seeds —
  * failures reproduce exactly. */
class RestModelFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = graft.GraftTmp.dir(s"rest_fuzz_$seed").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val srv = new CatalogServer(wh).start()
    val cat = s"fuzzcat_${seed}_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.rest.IceLiteRestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.uri)
    // the OWNING engine's face: a direct catalog on the same warehouse
    // (the reference topology: Spark attaches over REST, Trino owns —
    // here both run in one session under two catalog names)
    val lcat = s"fuzzown_${seed}_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$lcat",
      classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$lcat.warehouse", wh)
    val tbl = s"$cat.src.t"
    try {
      // model: key -> (v, c); c exists only after the ADD COLUMN op
      var model = Map.empty[Long, (Double, Option[Long])]
      var hasC = false
      // current name of the ADDED column (remote RENAME op). The raw
      // IceLite API face deliberately has no rename ledger (d58: name
      // chains resolve in the CONNECTOR), so the fuzz renames a column
      // its API-level DML never references — reads through both
      // catalog faces still cross the rename era on every check.
      var cName = "c"
      var renamed = false
      var nextKey = 0L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = (nextKey until nextKey + n).toSeq
        nextKey += n
        ks
      }

      IceLite.createOrReplace(ref,
        freshKeys(5).map(k => (k, k * 0.5)).toDF("k", "v"))
      model ++= (0L until 5L).map(k => k -> (k * 0.5, None))

      def checkRemote(label: String): Unit = {
        val cSel = if (hasC) s", $cName" else ""
        val got = spark.sql(
            s"SELECT k, v$cSel FROM $tbl ORDER BY k").collect()
          .map(r => r.getLong(0) -> (r.getDouble(1),
            if (hasC && !r.isNullAt(2)) Some(r.getLong(2)) else None)).toMap
        assert(got == model,
          s"[seed=$seed $label] REMOTE face diverged from model\n" +
            s"got:   ${got.toSeq.sortBy(_._1).take(12)}\n" +
            s"model: ${model.toSeq.sortBy(_._1).take(12)}")
      }
      def checkLocal(label: String): Unit = {
        val cSel = if (hasC) s", $cName" else ""
        val got = spark.sql(
            s"SELECT k, v$cSel FROM $lcat.src.t ORDER BY k").collect()
          .map(r => r.getLong(0) -> (r.getDouble(1),
            if (hasC && !r.isNullAt(2)) Some(r.getLong(2)) else None)).toMap
        assert(got == model,
          s"[seed=$seed $label] LOCAL face diverged from model\n" +
            s"got:   ${got.toSeq.sortBy(_._1).take(12)}\n" +
            s"model: ${model.toSeq.sortBy(_._1).take(12)}")
      }

      /** A CoW op against live MoR sidecars may refuse; the refusal
        * must name the documented remedy and leave state alone. */
      def cowRefusalOk(e: Throwable): Boolean = {
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        msgs(e).exists(m => m.contains("compact") || m.contains("MoR"))
      }

      checkRemote("seed")
      val trace = sys.env.contains("GRAFT_FUZZ_TRACE")
      (1 to ops).foreach { i =>
        val op = rnd.nextInt(12)
        if (trace) println(s"[fuzz seed=$seed] op$i case$op " +
          s"hasC=$hasC cName=$cName modelSize=${model.size}")
        op match {
          case 0 => // remote SQL INSERT
            val ks = freshKeys(1 + rnd.nextInt(3))
            if (hasC) {
              ks.map(k => (k, k * 0.5, k % 7)).toDF("k", "v", cName)
                .createOrReplaceTempView(s"fz_b_$seed")
              spark.sql(s"INSERT INTO $tbl (k, v, $cName) " +
                s"SELECT k, v, $cName FROM fz_b_$seed")
              model ++= ks.map(k => k -> (k * 0.5, Some(k % 7)))
            } else {
              ks.map(k => (k, k * 0.5)).toDF("k", "v")
                .createOrReplaceTempView(s"fz_b_$seed")
              spark.sql(s"INSERT INTO $tbl (k, v) " +
                s"SELECT k, v FROM fz_b_$seed")
              model ++= ks.map(k => k -> (k * 0.5, None))
            }
          case 1 => // local API append (the owning engine writes)
            val ks = freshKeys(1 + rnd.nextInt(3))
            if (hasC) {
              IceLite.append(ref,
                ks.map(k => (k, k * 0.5, k % 7)).toDF("k", "v", cName))
              model ++= ks.map(k => k -> (k * 0.5, Some(k % 7)))
            } else {
              IceLite.append(ref, ks.map(k => (k, k * 0.5)).toDF("k", "v"))
              model ++= ks.map(k => k -> (k * 0.5, None))
            }
          case 2 => // remote SQL DELETE (CoW — may refuse on live MoR)
            val r0 = rnd.nextInt(5)
            try {
              spark.sql(s"DELETE FROM $tbl WHERE k % 5 = $r0")
              model = model.filterNot(_._1 % 5 == r0)
            } catch { case e: Exception =>
              assert(cowRefusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
          case 3 => // local MoR delete (sidecars, no rewrite)
            val r0 = rnd.nextInt(7)
            IceLite.deleteWhereMoR(spark, ref, s"k % 7 = $r0")
            model = model.filterNot(_._1 % 7 == r0)
          case 4 => // remote SQL UPDATE (CoW — may refuse on live MoR)
            val r0 = rnd.nextInt(4)
            try {
              spark.sql(
                s"UPDATE $tbl SET v = v + 100 WHERE k % 4 = $r0")
              model = model.map { case (k, (v, c)) =>
                if (k % 4 == r0) k -> (v + 100, c) else k -> (v, c) }
            } catch { case e: Exception =>
              assert(cowRefusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
          case 5 => // local MoR update
            val r0 = rnd.nextInt(6)
            IceLite.updateWhereMoR(spark, ref, s"k % 6 = $r0",
              Map("v" -> "v + 10"))
            model = model.map { case (k, (v, c)) =>
              if (k % 6 == r0) k -> (v + 10, c) else k -> (v, c) }
          case 6 => // maintenance: compact (remote or local face)
            if (rnd.nextBoolean())
              spark.sql(s"CALL $cat.system.compact('src.t')")
            else IceLite.compact(spark, ref)
          case 7 => // maintenance: expiry (remote or local face)
            if (rnd.nextBoolean())
              spark.sql(s"CALL $cat.system.expire_retain_last('src.t', 3)")
            else IceLite.expireSnapshotsRetainLast(ref, 3)
          case 8 => // schema evolution (once each): remote ADD / RENAME
            if (!hasC) {
              spark.sql(s"ALTER TABLE $tbl ADD COLUMN c BIGINT")
              hasC = true
            } else if (!renamed) {
              spark.sql(s"ALTER TABLE $tbl RENAME COLUMN $cName TO cc")
              cName = "cc"
              renamed = true
            }
          case 9 => // concurrency: parallel remote INSERTs — every
            // lost CAS race must rebase (409 = retryable), no batch
            // may vanish
            val batches = Seq(freshKeys(2), freshKeys(2))
            val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
            try {
              batches.zipWithIndex.map { case (ks, j) =>
                pool.submit(new Runnable { override def run(): Unit = {
                  val vals = ks.map(k =>
                    if (hasC) s"($k, ${k * 0.5}, ${k % 7})"
                    else s"($k, ${k * 0.5})").mkString(", ")
                  val cols = if (hasC) s"(k, v, $cName)" else "(k, v)"
                  spark.sql(s"INSERT INTO $tbl $cols VALUES $vals")
                }})
              }.foreach(_.get())
            } finally pool.shutdown()
            model ++= batches.flatten.map(k =>
              k -> (k * 0.5, if (hasC) Some(k % 7) else None))
          case 10 => // remote SQL MERGE (upsert: half existing keys
            // updated, fresh keys inserted — CoW family, may refuse)
            val existing = model.keys.toSeq.sorted.take(2)
            val fresh = freshKeys(2)
            val src = (existing ++ fresh).map(k =>
              if (hasC) (k, k * 0.25, k % 5) else (k, k * 0.25, 0L))
            val srcCols = if (hasC) Seq("k", "v", cName) else Seq("k", "v", "_z")
            src.toDF(srcCols: _*).createOrReplaceTempView(s"fz_m_$seed")
            val setC = if (hasC) s", t.$cName = s.$cName" else ""
            val insCols = if (hasC) s"(k, v, $cName)" else "(k, v)"
            val insVals = if (hasC) s"(s.k, s.v, s.$cName)" else "(s.k, s.v)"
            try {
              spark.sql(
                s"""MERGE INTO $tbl t USING fz_m_$seed s ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET t.v = s.v$setC
                   |WHEN NOT MATCHED THEN INSERT $insCols VALUES $insVals
                   |""".stripMargin)
              model ++= (existing ++ fresh).map(k =>
                k -> (k * 0.25, if (hasC) Some(k % 5) else None))
            } catch { case e: Exception =>
              assert(cowRefusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
          case 11 => // EMPTY the table (seed-6021 bug class): a DELETE
            // matching everything through either face — every later
            // op then runs against an emptied table
            try {
              if (rnd.nextBoolean())
                spark.sql(s"DELETE FROM $tbl WHERE k >= 0")
              else IceLite.deleteWhereMoR(spark, ref, "k >= 0")
              model = Map.empty
            } catch { case e: Exception =>
              assert(cowRefusalOk(e), s"[seed=$seed op$i] unexpected: $e") }
        }
        checkRemote(s"op$i(case$op)")
        if (i % 4 == 0) checkLocal(s"op$i(case$op)")
      }
      checkLocal("final")
    } finally srv.stop()
  }

  test("random REST/local interleavings match the serial model (seed 7)") { run(7L, 20) }
  test("random REST/local interleavings match the serial model (seed 41)") { run(41L, 20) }
  test("random REST/local interleavings match the serial model (seed 97)") { run(97L, 20) }
  // wide-sweep finds, pinned: a CoW rewrite made a REQUIRED-schema
  // append the head file and every pre-ADD-COLUMN null read as 0
  // (schemaOf now forces nullable; IceLiteSourceSpec pins the unit).
  // NOTE: the op space grew (empty-table op, r10), so these seeds now
  // replay different — equally valid — interleavings; the original
  // finds stay pinned as units in IceLiteSourceSpec.
  test("random REST/local interleavings match the serial model (seed 1022)") { run(1022L, 16) }
  test("random REST/local interleavings match the serial model (seed 1039)") { run(1039L, 16) }
  // wide-sweep finds, pinned: a sidecar touching only SOME files mixed
  // columnar and row-based splits once the open-cost packer made >1
  // bin — sidecar-live scans now read row-based uniformly
  test("random REST/local interleavings match the serial model (seed 5010)") { run(5010L, 16) }
  test("random REST/local interleavings match the serial model (seed 5038)") { run(5038L, 16) }
  // wide-sweep finds (r10, the empty-table op's first haul): a schema
  // evolution landed AFTER a table-emptying DELETE vanished from the
  // connector schema — the zero-file donor fallback rebound the
  // alter-ledger scope to the donor snapshot, and the REST replace
  // commit didn't pin the declared schema (EmptyTableSweepSpec pins
  // the deterministic unit)
  test("random REST/local interleavings match the serial model (seed 1028)") { run(1028L, 16) }
  test("random REST/local interleavings match the serial model (seed 1046)") { run(1046L, 16) }
  test("random REST/local interleavings match the serial model (seed 1050)") { run(1050L, 16) }

  // offline wide sweep (not part of the CI suite):
  //   GRAFT_FUZZ_SEEDS=50 [GRAFT_FUZZ_BASE=2000] \
  //     sbt "testOnly graft.sources.RestModelFuzzSpec"
  // runs seeds BASE+1..BASE+N (default base 1000) at 16 ops each; any
  // failure reproduces exactly under its printed seed and should be
  // pinned as a fixed test above once diagnosed.
  sys.env.get("GRAFT_FUZZ_SEEDS").map(_.trim.toInt).foreach { n =>
    val base = sys.env.get("GRAFT_FUZZ_BASE").map(_.trim.toLong).getOrElse(1000L)
    (1 to n).foreach { s =>
      test(s"sweep seed ${base + s}") { run(base + s, 16) }
    }
  }
}
