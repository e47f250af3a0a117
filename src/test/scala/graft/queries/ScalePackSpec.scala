package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Plan-shape assertions for the scale-technique operators — the
  * point of d03 is WHICH plan runs, not just the answer. */
class ScalePackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d03 bucketed join plans with no hash-partition exchange") {
    val df = ScalePack.queries("d03_bucketed_join")(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over bucketed tables:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(df.count() > 0)
  }

  test("d01 pruned scan reads fewer files than the manifest holds") {
    // content equivalence is the oracle's job; here: the single result
    // row reports that pruning really dropped files
    val row = ScalePack.queries("d01_manifest_pruned_scan")(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getAs[Long]("files_pruned_away") == 2L)
  }

  test("d16 zorder2 matches a bit-interleave reference; locality holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)) }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L),
      (5L, 9L), (65535L, 65535L), (12345L, 678L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ScalePack.zorder2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y), s"zorder2($x,$y)=$z, want ${ref(x, y)}") }
    // spot-pin the interleave itself, not just self-consistency:
    // x=3 (bits at 0,1) → z bits at 0,2 = 5; y=3 → z bits at 1,3 = 10
    assert(ref(3, 0) == 5L && ref(0, 3) == 10L && ref(65535, 65535) == 0xFFFFFFFFL)
  }

  test("d17 bloom index: prunes to the key's file, misses nothing, stale index stays safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.icelite.{BloomIndex, IceLite, IngestJob}
    val wh = graft.GraftTmp.dir("bloom_wh").toString
    val ref = IngestJob.tableRef(wh, "kv")
    IceLite.createNamespace(wh, "src")
    // 4 files of disjoint key ranges via hash-scatter on k
    val df = (0L until 4000L).map(k => (k, k * 10)).toDF("k", "v")
    IceLite.createOrReplace(ref, df.repartition(4, col("k")))
    BloomIndex.build(spark, ref, "k")
    val total = IceLite.readManifest(ref).current.files.size
    assert(total == 4)

    // present key: found, and ≥1 file was skipped (fp rate ≪ 3/4)
    val hit = BloomIndex.readPointLookup(spark, ref, "k", 1234L)
      .as[(Long, Long)].collect().toSeq
    assert(hit == Seq((1234L, 12340L)))
    assert(BloomIndex.prunedFiles(ref, "k", 1234L).size < total)

    // absent key: no rows, whatever files survive the probe
    assert(BloomIndex.readPointLookup(spark, ref, "k", 999999L).count() == 0)

    // stale sidecar: an append after build has no bloom entries —
    // its file must be conservatively KEPT and the lookup still works
    IceLite.append(ref, Seq((777777L, 42L)).toDF("k", "v"))
    val lateHit = BloomIndex.readPointLookup(spark, ref, "k", 777777L)
      .as[(Long, Long)].collect().toSeq
    assert(lateHit == Seq((777777L, 42L)), "stale index must not hide new files")

    // rebuilding restores pruning over all 5 files, and probe/build
    // hash parity still finds the appended key through the pruned list
    BloomIndex.build(spark, ref, "k")
    assert(BloomIndex.prunedFiles(ref, "k", 777777L).size < 5)
    assert(BloomIndex.readPointLookup(spark, ref, "k", 777777L)
      .as[(Long, Long)].collect().toSeq == Seq((777777L, 42L)))
  }

  test("d17+d07: compaction and MERGE auto-rebuild the bloom sidecar") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.icelite.{BloomIndex, IceLite, IngestJob}
    val wh = graft.GraftTmp.dir("bloom_cmp_wh").toString
    val ref = IngestJob.tableRef(wh, "kv")
    IceLite.createNamespace(wh, "src")
    IceLite.createOrReplace(ref,
      (0L until 4000L).map(k => (k, k * 10)).toDF("k", "v").repartition(4, col("k")))
    BloomIndex.build(spark, ref, "k")
    // compaction rewrites every file — the sidecar must follow the
    // rewrite: rebuilt against the NEW snapshot, pruning restored
    IceLite.compact(spark, ref, targetFiles = 4)
    val snapAfterCompact = IceLite.readManifest(ref).currentSnapshotId
    val sc = BloomIndex.readSidecar(ref, "k").get
    assert(IceLite.readManifest(ref).snapshots
      .find(_.id == snapAfterCompact).get.files.forall(sc.files.contains),
      "compaction must re-index the rewritten files")
    assert(BloomIndex.prunedFiles(ref, "k", 1234L).size < 4)
    assert(BloomIndex.readPointLookup(spark, ref, "k", 1234L)
      .as[(Long, Long)].collect().toSeq == Seq((1234L, 12340L)))
    // MERGE rewrites too: same rebuild, lookup sees the new value
    IceLite.merge(spark, ref, Seq((1234L, -1L)).toDF("k", "v"), Seq("k"))
    val sc2 = BloomIndex.readSidecar(ref, "k").get
    assert(sc2.snapshot == IceLite.readManifest(ref).currentSnapshotId,
      "merge must re-key the sidecar to its snapshot")
    assert(BloomIndex.readPointLookup(spark, ref, "k", 1234L)
      .as[(Long, Long)].collect().toSeq == Seq((1234L, -1L)))
    // tables without a sidecar pay nothing (refreshAll no-ops)
    val ref2 = IngestJob.tableRef(wh, "plain")
    IceLite.createOrReplace(ref2, Seq((1L, 2L)).toDF("k", "v"))
    assert(BloomIndex.refreshAll(spark, ref2).isEmpty)
  }

  test("d16 multi-column pruning skips files on the SECOND dimension too") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.icelite.{IceLite, IngestJob}
    // 64×64 grid z-ordered into 16 files: each file is a 2-D tile, so
    // a box predicate prunes on both axes; with a single-column sort
    // the y predicate alone could prune (almost) nothing
    val wh = graft.GraftTmp.dir("zspec_wh").toString
    val ref = IngestJob.tableRef(wh, "grid_z")
    IceLite.createNamespace(wh, "src")
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y").withColumn("zval", ScalePack.zorder2(col("x"), col("y")))
    IceLite.createOrReplaceSorted(ref, grid, "zval", numFiles = 16,
      statsCols = Seq("x", "y"))
    val total = IceLite.readManifest(ref).current.files.size
    val both = IceLite.prunedFilesMulti(ref,
      Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0))).size
    val xOnly = IceLite.prunedFilesMulti(ref, Seq(("x", 0.0, 15.0))).size
    assert(total == 16)
    // a 16×16 corner box hits exactly one 2-D tile of the z-curve
    assert(both == 1, s"corner box should hit 1 of $total files, hit $both")
    assert(both < xOnly, "the y predicate must prune beyond x alone")
    val rows = IceLite.readPrunedMulti(spark, ref,
      Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0))).count()
    assert(rows == 256L, s"residual filter must return the exact box, got $rows")
  }

  test("d55 compactRange merges only in-range files; statless files join conservatively") {
    import spark.implicits._
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("d55_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    // three stat-carrying files with disjoint key ranges...
    IceLite.createOrReplace(ref,
      (0L until 100L).map(k => (k, k)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    IceLite.append(ref,
      (100L until 200L).map(k => (k, k)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    IceLite.append(ref,
      (200L until 300L).map(k => (k, k)).toDF("k", "v").coalesce(1),
      statsCols = Seq("k"))
    // ...and one WITHOUT stats on k (must be conservatively included)
    IceLite.append(ref,
      (300L until 320L).map(k => (k, k)).toDF("k", "v").coalesce(1))
    val before = IceLite.readManifest(ref).current
    assert(before.files.size == 4)
    val untouched = before.files.filter(f =>
      before.fileStats.get(f).exists(_.exists(s => s.col == "k" && s.max < 100)))
    assert(untouched.size == 1)

    val snap = IceLite.compactRange(spark, ref, "k", 100.0, 300.0)
    assert(snap.operation == "compact-range")
    // file 1 (out of range) is byte-identical — same path in the new
    // snapshot; files 2-4 (two in-range + the statless one) merged
    assert(snap.files.size == 2, s"files after: ${snap.files}")
    assert(untouched.forall(snap.files.contains),
      "out-of-range file must survive untouched")
    // no row lost or duplicated
    val got = IceLite.read(spark, ref).as[(Long, Long)].collect().map(_._1).sorted
    assert(got.toSeq == (0L until 320L))
    // the merged file regains k stats from its footer → pruning works
    val merged = snap.files.filterNot(untouched.contains).head
    assert(snap.fileStats.get(merged).exists(_.exists(_.col == "k")),
      "merged file must carry footer-derived k stats")
    // a second call in the same range is a no-op (single file in range)
    assert(IceLite.compactRange(spark, ref, "k", 100.0, 300.0).id == snap.id)
  }

  test("d55 compactRange: partitioned single-file dirs no-op; MoR-live refuses") {
    import spark.implicits._
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("d55_refuse").toString
    IceLite.createNamespace(wh, "src")
    // partitioned tables now compact per dir (round 7) — with one file
    // per dir there is nothing to merge, so the call is a no-op commit
    val part = TableRef(wh, "src", "p")
    IceLite.createOrReplacePartitioned(part,
      Seq((1L, "a"), (2L, "b")).toDF("k", "p"), "p")
    val before = IceLite.readManifest(part).current.files
    IceLite.compactRange(spark, part, "k", 0.0, 10.0)
    assert(IceLite.readManifest(part).current.files == before,
      "single-file partition dirs must not be rewritten")
    val mor = TableRef(wh, "src", "m")
    IceLite.createOrReplace(mor, (0L until 50L).map(k => (k, k)).toDF("k", "v"))
    IceLite.deleteWhereMoR(spark, mor, "k < 5")
    intercept[IllegalArgumentException](
      IceLite.compactRange(spark, mor, "k", 0.0, 10.0))
  }

  test("d28 appendSorted: new files cluster tightly, old files are untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.icelite.{IceLite, IngestJob}
    val wh = graft.GraftTmp.dir("d28_spec").toString
    val ref = IngestJob.tableRef(wh, "evolve_z")
    IceLite.createNamespace(wh, "src")
    // era 1: 256 scattered rows across 4 hash files (full-range stats)
    val grid = (0 until 1024).map { i =>
      (i.toLong, (i * 17 % 64).toLong, (i * 29 % 64).toLong)
    }.toDF("id", "x", "y").withColumn("zval", ScalePack.zorder2(col("x"), col("y")))
    IceLite.createOrReplace(ref, grid.filter($"id" < 256).repartition(4, $"id"),
      statsCols = Seq("x", "y"))
    val era1Files = IceLite.readManifest(ref).current.files.toSet
    val era1Bytes = era1Files.map(f =>
      f -> java.nio.file.Files.size(ref.dir.resolve(f))).toMap
    // era 2: z-clustered append
    IceLite.appendSorted(ref, grid.filter($"id" >= 256), "zval",
      numFiles = 8, statsCols = Seq("x", "y"))
    val snap = IceLite.readManifest(ref).current
    // old files survive in the snapshot, byte-identical on disk
    assert(era1Files.subsetOf(snap.files.toSet), "era-1 files must remain")
    era1Bytes.foreach { case (f, sz) =>
      assert(java.nio.file.Files.size(ref.dir.resolve(f)) == sz,
        s"era-1 file $f was rewritten") }
    // era-2 files have pairwise NON-overlapping zval ranges (the
    // clustering appendSorted promises), era-1 files all overlap
    val era2 = snap.files.filterNot(era1Files)
    assert(era2.size == 8, s"expected 8 era-2 files, got ${era2.size}")
    val zRanges = era2.map { f =>
      val cs = snap.fileStats(f).find(_.col == "zval").get
      (cs.min, cs.max)
    }.sortBy(_._1)
    zRanges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"era-2 zval ranges overlap: $zRanges")
      case _ =>
    }
    // a corner box prunes era-2 files but keeps all era-1 files
    val preds = Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0))
    val kept = IceLite.prunedFilesMulti(ref, preds).toSet
    assert(era1Files.subsetOf(kept), "era-1 files are conservatively kept")
    assert(!era2.toSet.subsetOf(kept), "some era-2 file must prune away")
    // and the read is still exact
    val n = IceLite.readPrunedMulti(spark, ref, preds).count()
    val expected = grid.filter($"x" <= 15 && $"y" <= 15).count()
    assert(n == expected, s"pruned read returned $n, expected $expected")
  }

  test("d59 rewriteZOrder: restores 2-dim pruning, preserves rows, keeps history") {
    import spark.implicits._
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("d59_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "grid")
    // a 32×32 grid hash-scattered over 8 files: every file spans the
    // full (x, y) rectangle, so multi-column stats prune nothing
    val grid = (for { x <- 0 until 32; y <- 0 until 32 }
      yield (x.toLong, y.toLong, (x * 32 + y).toLong)).toDF("x", "y", "v")
    val first = IceLite.createOrReplace(ref,
      grid.repartition(8, $"v"), statsCols = Seq("x", "y"))
    val preds = Seq(("x", 0.0, 7.0), ("y", 0.0, 7.0))
    assert(IceLite.prunedFilesMulti(ref, preds).size == 8,
      "hash layout must defeat pruning (precondition)")

    val snap = IceLite.rewriteZOrder(spark, ref, "x", "y", targetFiles = 8)
    assert(snap.operation == "replace")
    assert(snap.files.size == 8)
    // z-clustering makes the predicate rectangle intersect few files
    val kept = IceLite.prunedFilesMulti(ref, preds).size
    assert(kept < 8, s"z-rewrite must restore pruning, kept $kept/8")
    // content identical
    val got = IceLite.read(spark, ref).as[(Long, Long, Long)]
      .collect().map(_._3).sorted
    assert(got.toSeq == (0L until 1024L))
    // pruned read exact
    val n = IceLite.readPrunedMulti(spark, ref, preds).count()
    assert(n == 64, s"pruned read returned $n, expected 64")
    // the scattered layout is still time-travelable
    assert(IceLite.readAt(spark, ref, first.id).count() == 1024)
  }

  test("d59 rewriteZOrder refuses sorted, partitioned, and MoR-live tables") {
    import spark.implicits._
    import graft.icelite.{IceLite, TableRef}
    val wh = graft.GraftTmp.dir("d59_refuse").toString
    IceLite.createNamespace(wh, "src")
    val df = (0L until 100L).map(k => (k, k % 10)).toDF("k", "g")

    val sorted = TableRef(wh, "src", "sorted_t")
    IceLite.createOrReplaceSorted(sorted, df, "k", numFiles = 2)
    val e1 = intercept[IllegalArgumentException] {
      IceLite.rewriteZOrder(spark, sorted, "k", "g")
    }
    assert(e1.getMessage.contains("sorted"))

    val parted = TableRef(wh, "src", "parted_t")
    IceLite.createOrReplacePartitioned(parted, df, "g")
    val e2 = intercept[IllegalArgumentException] {
      IceLite.rewriteZOrder(spark, parted, "k", "g")
    }
    assert(e2.getMessage.contains("partitioned"))
  }
}
