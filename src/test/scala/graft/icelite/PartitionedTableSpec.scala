package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Partitioned writes + manifest-level partition pruning (the Iceberg
  * identity-partition role; ROADMAP round-3 item). */
class PartitionedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(): (String, TableRef) = {
    val wh = graft.GraftTmp.dir("part_spec").toString
    IceLite.createNamespace(wh, "src")
    (wh, TableRef(wh, "src", "t"))
  }

  test("partitioned write lays out col=value dirs; read reconstructs the column") {
    val (_, ref) = mk()
    val df = Seq((1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0), (4, "C", 5.0))
      .toDF("k", "flag", "x")
    IceLite.createOrReplacePartitioned(ref, df, "flag")
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionCols == Seq("flag"))
    assert(snap.files.size == 3, s"expected one file per value: ${snap.files}")
    assert(snap.files.forall(_.matches("data/part/flag=[ABC]/[0-9a-f]{8}-.+\\.parquet")),
      s"unexpected layout: ${snap.files}")
    val got = IceLite.readPartitioned(spark, ref)
      .select($"k", $"flag", $"x").as[(Int, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0), (4, "C", 5.0)))
  }

  test("partition pruning selects only matching files; pruned read ≡ full read + filter") {
    val (_, ref) = mk()
    val df = (1 to 100).map(i => (i, if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C", i * 1.5))
      .toDF("k", "flag", "x")
    IceLite.createOrReplacePartitioned(ref, df, "flag")
    val kept = IceLite.partitionPrunedFiles(ref, Set("A"))
    assert(kept.size == 1 && kept.head.contains("flag=A"))
    val pruned = IceLite.readPartitionPruned(spark, ref, Set("A"))
      .select($"k").as[Int].collect().sorted.toSeq
    val full = IceLite.readPartitioned(spark, ref)
      .filter($"flag" === "A").select($"k").as[Int].collect().sorted.toSeq
    assert(pruned == full && pruned == (3 to 99 by 3).toSeq)
  }

  test("partition-spec evolution: new-spec appends coexist with old-layout files") {
    val (_, ref) = mk()
    // era 1: partitioned by p only; q rides inside the data files
    IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A", "X", 10.0), (2, "B", "Y", 20.0)).toDF("k", "p", "q", "v"), "p")
    // era 2: spec evolves to (p, q) — no rewrite of era-1 files
    IceLite.appendPartitionedEvolving(ref,
      Seq((3, "A", "X", 30.0), (4, "A", "Y", 40.0)).toDF("k", "p", "q", "v"),
      Seq("p", "q"))
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionCols == Seq("p", "q"), "current spec must be the new one")
    assert(snap.files.exists(_.matches("data/part/p=[AB]/[0-9a-f]{8}-.+")),
      s"era-1 layout must survive: ${snap.files}")
    assert(snap.files.exists(_.contains("/q=")), s"era-2 layout: ${snap.files}")

    // read unions both eras, q populated everywhere (path- or data-borne)
    val got = IceLite.readPartitioned(spark, ref)
      .select($"k", $"p", $"q", $"v").as[(Int, String, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "A", "X", 10.0), (2, "B", "Y", 20.0),
      (3, "A", "X", 30.0), (4, "A", "Y", 40.0)))
  }

  test("pruning on an evolved column keeps old-layout files conservatively, rows exact") {
    val (_, ref) = mk()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A", "X", 10.0), (2, "A", "Y", 20.0)).toDF("k", "p", "q", "v"), "p")
    IceLite.appendPartitionedEvolving(ref,
      Seq((3, "A", "X", 30.0), (4, "A", "Y", 40.0)).toDF("k", "p", "q", "v"),
      Seq("p", "q"))
    val kept = IceLite.partitionPrunedFiles(ref, Map("q" -> Set("X")))
    // the era-1 file cannot be path-pruned on q (kept), the era-2 q=Y
    // file is pruned away
    assert(kept.exists(f => !f.contains("/q=")), s"era-1 file must be kept: $kept")
    assert(!kept.exists(_.contains("q=Y")), s"q=Y must be pruned: $kept")
    // ...but the ROWS are exact thanks to the residual filter
    val rows = IceLite.readPartitionPruned(spark, ref, Map("q" -> Set("X")))
      .select($"k").as[Int].collect().sorted.toSeq
    assert(rows == Seq(1, 3), s"residual filter must make rows exact: $rows")
  }

  test("non-evolving append still rejects a spec change") {
    val (_, ref) = mk()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A", "X")).toDF("k", "p", "q"), "p")
    val e = intercept[IllegalArgumentException] {
      IceLite.appendPartitioned(ref,
        Seq((2, "A", "Y")).toDF("k", "p", "q"), Seq("p", "q"), Nil)
    }
    assert(e.getMessage.contains("partition-spec mismatch"))
  }

  test("partitioned append accumulates partitions across tokens; spec mismatch rejected") {
    val (_, ref) = mk()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A"), (2, "B")).toDF("k", "flag"), "flag")
    IceLite.appendPartitioned(ref,
      Seq((3, "A"), (4, "C")).toDF("k", "flag"), "flag")
    val got = IceLite.readPartitioned(spark, ref)
      .select($"k", $"flag").as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "A"), (2, "B"), (3, "A"), (4, "C")))
    // pruning spans both tokens
    val a = IceLite.readPartitionPruned(spark, ref, Set("A"))
      .select($"k").as[Int].collect().sorted.toSeq
    assert(a == Seq(1, 3))
    intercept[IllegalArgumentException] {
      IceLite.appendPartitioned(ref, Seq((5, "A")).toDF("k", "other"), "other")
    }
  }

  test("special characters in partition values round-trip through escaping") {
    val (_, ref) = mk()
    val df = Seq((1, "a/b"), (2, "c:d"), (3, "plain")).toDF("k", "flag")
    IceLite.createOrReplacePartitioned(ref, df, "flag")
    val got = IceLite.readPartitionPruned(spark, ref, Set("a/b"))
      .select($"k", $"flag".cast("string")).as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "a/b")))
  }

  test("partitioned incremental ingest ≡ full content; pruning works on ingested table") {
    val spark2 = spark
    import java.nio.file.Paths
    // two source files with mixed flags
    val src = graft.GraftTmp.dir("part_ingest_src").toString
    Seq(Seq((1, "A"), (2, "B")), Seq((3, "A"), (4, "C"))).zipWithIndex.foreach {
      case (rows, i) =>
        val staging = graft.GraftTmp.dir("part_ingest_stage")
        rows.toDF("k", "flag").coalesce(1).write.mode("overwrite").parquet(staging.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(staging).iterator().asScala
          .find(_.toString.endsWith(".parquet")).get
        Files.move(part, Paths.get(src, f"f_$i%03d.parquet"))
    }
    val wh = graft.GraftTmp.dir("part_ingest_wh").toString
    IngestJob.run(spark2, wh, "t", src, "incremental", retentionMs = -1,
      partitionCol = Some("flag"))
    val ref = IngestJob.tableRef(wh, "t")
    assert(IceLite.readManifest(ref).current.partitionCols == Seq("flag"))
    val all = IceLite.readPartitioned(spark2, ref)
      .select($"k", $"flag").as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(all == Seq((1, "A"), (2, "B"), (3, "A"), (4, "C")))
    val a = IceLite.readPartitionPruned(spark2, ref, Set("A"))
      .select($"k").as[Int].collect().sorted.toSeq
    assert(a == Seq(1, 3))
  }

  test("compact rewrites many small files into one; content and stats survive") {
    val (_, ref) = mk()
    val spark2 = spark
    (0 until 4).foreach { i =>
      val df = ((i * 25) until ((i + 1) * 25)).map(k => (k, k * 1.5)).toDF("k", "x")
      if (i == 0) IceLite.createOrReplace(ref, df.repartition(3), statsCols = Seq("k"))
      else IceLite.append(ref, df.repartition(3), statsCols = Seq("k"))
    }
    val before = IceLite.readManifest(ref).current
    assert(before.files.size >= 8, s"setup should create many files: ${before.files.size}")
    val snap = IceLite.compact(spark2, ref)
    assert(snap.files.size == 1, s"expected 1 compacted file: ${snap.files}")
    assert(snap.rowCount == 100 && snap.operation == "replace")
    val got = IceLite.read(spark2, ref).select($"k").as[Int].collect().sorted.toSeq
    assert(got == (0 until 100).toSeq, "compaction changed table content")
    // stats re-derived: pruning still skips nothing incorrectly
    assert(snap.fileStats.nonEmpty, "compaction dropped pruning stats")
    val pruned = IceLite.readPruned(spark2, ref, "k", 10, 20)
      .select($"k").as[Int].collect().sorted.toSeq
    assert(pruned == (10 to 20).toSeq)
    // previous snapshots still time-travelable until expiry
    assert(IceLite.readAt(spark2, ref, before.id).count() == 100)
  }

  test("compact on a partitioned table keeps layout and pruning") {
    val (_, ref) = mk()
    val spark2 = spark
    IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A"), (2, "B")).toDF("k", "flag"), "flag")
    IceLite.appendPartitioned(ref, Seq((3, "A"), (4, "B")).toDF("k", "flag"), "flag")
    assert(IceLite.readManifest(ref).current.files.size == 4)
    val snap = IceLite.compact(spark2, ref)
    assert(snap.files.size == 2, s"one file per value expected: ${snap.files}")
    assert(snap.partitionCols == Seq("flag"))
    val a = IceLite.readPartitionPruned(spark2, ref, Set("A"))
      .select($"k").as[Int].collect().sorted.toSeq
    assert(a == Seq(1, 3))
  }

  test("multi-column partitioning: nested layout, conjunctive pruning") {
    val (_, ref) = mk()
    val df = (for {
      st <- Seq("F", "O"); pr <- Seq("HI", "LO"); i <- 1 to 3
    } yield (s"$st-$pr-$i", st, pr)).toDF("id", "status", "prio")
    IceLite.createOrReplacePartitioned(ref, df, Seq("status", "prio"), Nil)
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionCols == Seq("status", "prio"))
    assert(snap.files.size == 4, s"one file per (status,prio): ${snap.files}")
    assert(snap.files.forall(
      _.matches("data/part/status=[FO]/prio=(HI|LO)/[0-9a-f]{8}-.+\\.parquet")),
      s"unexpected layout: ${snap.files}")
    // conjunctive pruning: status=F AND prio IN (HI) → exactly 1 file
    val kept = IceLite.partitionPrunedFiles(ref,
      Map("status" -> Set("F"), "prio" -> Set("HI")))
    assert(kept.size == 1 && kept.head.contains("status=F/prio=HI"))
    val got = IceLite.readPartitionPruned(spark, ref,
        Map("status" -> Set("F"), "prio" -> Set("HI")))
      .select($"id").as[String].collect().sorted.toSeq
    assert(got == Seq("F-HI-1", "F-HI-2", "F-HI-3"))
    // partial filter (only second column) leaves the first unconstrained
    val hi = IceLite.readPartitionPruned(spark, ref, Map("prio" -> Set("HI")))
      .select($"id").as[String].collect().sorted.toSeq
    assert(hi == Seq("F-HI-1", "F-HI-2", "F-HI-3", "O-HI-1", "O-HI-2", "O-HI-3"))
    // unknown filter column rejected
    intercept[IllegalArgumentException] {
      IceLite.partitionPrunedFiles(ref, Map("nope" -> Set("x")))
    }
  }

  test("sorted writes: non-overlapping file ranges, precise pruning, compact preserves order") {
    val (_, ref) = mk()
    val spark2 = spark
    val df = (0 until 1000).map(k => (k, k * 2.0)).toDF("k", "x")
    IceLite.createOrReplaceSorted(ref, df, "k", numFiles = 4)
    val snap = IceLite.readManifest(ref).current
    assert(snap.sortedBy.contains("k") && snap.files.size == 4)
    // ranges must not overlap (that's what range partitioning buys)
    val ranges = snap.files.map(f =>
      snap.fileStats(f).find(_.col == "k").get).sortBy(_.min)
    ranges.sliding(2).foreach { case Seq(a, b) =>
      assert(a.max < b.min, s"overlapping file ranges: $a vs $b")
    }
    // a point lookup resolves to exactly one file
    assert(IceLite.prunedFiles(ref, "k", 500, 500).size == 1)
    val got = IceLite.readPruned(spark2, ref, "k", 100, 200)
      .select($"k").as[Int].collect().sorted.toSeq
    assert(got == (100 to 200).toSeq)
    // compaction down to 2 files keeps the order and the metadata
    val c = IceLite.compact(spark2, ref, targetFiles = 2)
    assert(c.sortedBy.contains("k") && c.files.size == 2)
    val cr = c.files.map(f => c.fileStats(f).find(_.col == "k").get).sortBy(_.min)
    assert(cr(0).max < cr(1).min, "compaction destroyed the sort layout")
    assert(IceLite.read(spark2, ref).count() == 1000)
  }

  test("time travel works on partitioned snapshots") {
    val (_, ref) = mk()
    val s1 = IceLite.createOrReplacePartitioned(ref,
      Seq((1, "A")).toDF("k", "flag"), "flag")
    IceLite.appendPartitioned(ref, Seq((2, "B")).toDF("k", "flag"), "flag")
    // readAt uses the plain file reader (no partition col); count is
    // still snapshot-accurate
    assert(IceLite.readAt(spark, ref, s1.id).count() == 1)
    assert(IceLite.readPartitioned(spark, ref).count() == 2)
  }

  test("compactRange on a partitioned table merges only hot dirs") {
    val wh = graft.GraftTmp.dir("pcr_wh").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val df = (1L to 90L).map(k => (k, (k % 3).toString)).toDF("k", "p")
    IceLite.createOrReplacePartitioned(ref, df.filter($"p" =!= "1"), "p")
    val cold = IceLite.readManifest(ref).current.files.toSet
    // three sprayed files, all landing in hot partition p=1
    (0 until 3).foreach(i => IceLite.appendPartitioned(ref,
      df.filter($"p" === "1" && $"k" % 9 === (3 * i + 1)), "p"))
    assert(IceLite.readManifest(ref).current.files.count(_.contains("p=1")) == 3)
    IceLite.compactRange(spark, ref, "p", 1.0, 1.0)
    val after = IceLite.readManifest(ref).current
    assert(cold.subsetOf(after.files.toSet), "cold partitions must not move")
    assert(after.files.count(_.contains("p=1")) == 1, "hot dir merges to one file")
    assert(after.partitionCols == Seq("p"), "layout marker survives")
    assert(IceLite.readPartitioned(spark, ref).count() == 90)
    // partition pruning still works post-merge
    assert(IceLite.readPartitioned(spark, ref).filter($"p" === "1").count() == 30)
  }

  test("compactRange with a STATS column merges within dirs; non-numeric partition values are left alone") {
    val wh = graft.GraftTmp.dir("pcr2_wh").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val df = (1L to 60L).map(k => (k, if (k % 2 == 0) "even" else "odd")).toDF("k", "p")
    // two sprayed appends per partition value
    IceLite.appendPartitioned(ref, df.filter($"k" <= 30), "p", statsCols = Seq("k"))
    IceLite.appendPartitioned(ref, df.filter($"k" > 30), "p", statsCols = Seq("k"))
    val before = IceLite.readManifest(ref).current.files
    // non-numeric partition values: a range on the PARTITION column
    // selects nothing (conservative no-op)
    val same = IceLite.compactRange(spark, ref, "p", 0.0, 9.0)
    assert(same.files == before, "non-numeric partition values must not be selected")
    // a range on the DATA column selects by per-file stats and merges
    // within each dir
    IceLite.compactRange(spark, ref, "k", 1.0, 60.0)
    val after = IceLite.readManifest(ref).current
    assert(after.files.count(_.contains("p=even")) == 1)
    assert(after.files.count(_.contains("p=odd")) == 1)
    assert(IceLite.readPartitioned(spark, ref).count() == 60)
  }

  test("spec evolution under live MoR sidecars is refused; compact materializes, then evolution proceeds") {
    // round-9 fuzz-analysis find: evolving flat→partitioned while a
    // position/equality sidecar is live used to build the partitioned
    // snapshot WITHOUT the sidecars, silently resurrecting every
    // deleted row. The guard demands compact() first.
    val (_, ref) = mk()
    IceLite.createOrReplace(ref,
      Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("k", "s"))
    IceLite.deleteByKeysMoR(spark, ref, Seq(2L).toDF("k"), Seq("k"))
    val refusal = intercept[IllegalArgumentException] {
      IceLite.appendPartitionedEvolving(ref,
        Seq((4L, "B")).toDF("k", "s"), Seq("s"))
    }
    assert(refusal.getMessage.contains("compact"),
      s"refusal must point at compact(): ${refusal.getMessage}")
    // compaction folds the sidecar into data files; evolution then works
    IceLite.compact(spark, ref)
    IceLite.appendPartitionedEvolving(ref,
      Seq((4L, "B")).toDF("k", "s"), Seq("s"))
    val ks = IceLite.readPartitioned(spark, ref)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == Set(1L, 3L, 4L), s"deleted row must stay deleted: $ks")
  }

}
