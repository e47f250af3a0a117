// (gcOrphans coverage lives in IceLiteGcSpec)
package graft.icelite

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IceLiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRef(): TableRef = {
    val wh = graft.GraftTmp.dir("icelite_spec").toString
    IceLite.createNamespace(wh, "src")
    TableRef(wh, "src", "t")
  }

  test("createOrReplace then read round-trips the data") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val got = IceLite.read(spark, ref).as[(Int, String)].collect().sorted
    assert(got.toSeq == Seq((1, "a"), (2, "b")))
  }

  test("replace is atomic-by-swap: second write fully supersedes the first") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq((1, "old")).toDF("k", "v"))
    IceLite.createOrReplace(ref, Seq((2, "new"), (3, "new")).toDF("k", "v"))
    assert(IceLite.read(spark, ref).as[(Int, String)].collect().map(_._1).sorted
      .toSeq == Seq(2, 3))
    // both snapshots retained until expiry
    assert(IceLite.readManifest(ref).snapshots.map(_.operation) ==
      Seq("create", "replace"))
  }

  test("tags pin snapshots (and their files) through expiry; dropTag releases them") {
    val ref = freshRef()
    val s1 = IceLite.createOrReplace(ref, Seq((1, "era1"), (2, "era1")).toDF("k", "v"))
    IceLite.createTag(ref, "baseline", s1.id)
    // replace → era-1 files are referenced ONLY by the tagged snapshot
    IceLite.createOrReplace(ref, Seq((9, "era2")).toDF("k", "v"))
    val expired = IceLite.expireSnapshotsRetainLast(ref, 1)
    assert(!expired.contains(s1.id), "tagged snapshot must survive retention")
    // still readable, files intact
    assert(IceLite.readTag(spark, ref, "baseline")
      .as[(Int, String)].collect().map(_._1).sorted.toSeq == Seq(1, 2))
    // dropping the tag is the only way the snapshot ages out
    IceLite.dropTag(ref, "baseline")
    val expired2 = IceLite.expireSnapshotsRetainLast(ref, 1)
    assert(expired2.contains(s1.id))
    assertThrows[IllegalArgumentException](IceLite.readTag(spark, ref, "baseline"))
    // tagging an unknown snapshot refuses
    assertThrows[IllegalArgumentException](IceLite.createTag(ref, "ghost", 999L))
  }

  test("append accumulates files and rowCount") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    IceLite.append(ref, Seq(3).toDF("k"))
    val snap = IceLite.append(ref, Seq(4, 5).toDF("k"))
    assert(snap.rowCount == 5)
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("time travel reads any retained snapshot") {
    val ref = freshRef()
    val s1 = IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val s2 = IceLite.append(ref, Seq(2).toDF("k"))
    val s3 = IceLite.createOrReplace(ref, Seq(9).toDF("k"))
    assert(IceLite.readAt(spark, ref, s1.id).as[Int].collect().toSeq == Seq(1))
    assert(IceLite.readAt(spark, ref, s2.id).as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(IceLite.readAt(spark, ref, s3.id).as[Int].collect().toSeq == Seq(9))
  }

  test("timestamp time travel resolves the newest snapshot at-or-before the cutoff") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    IceLite.append(ref, Seq(2).toDF("k"))
    // between the two commits → only the first snapshot is visible
    assert(IceLite.readAsOf(spark, ref, between).as[Int].collect().toSeq == Seq(1))
    // at/after the last commit → current state
    assert(IceLite.readAsOf(spark, ref, System.currentTimeMillis())
      .as[Int].collect().sorted.toSeq == Seq(1, 2))
    // exactly ON a commit's timestamp, that commit is included (<=)
    val firstTs = IceLite.readManifest(ref).snapshots.head.timestampMs
    assert(IceLite.readAsOf(spark, ref, firstTs).as[Int].collect().toSeq == Seq(1))
  }

  test("timestamp time travel before the first snapshot throws") {
    val ref = freshRef()
    val before = System.currentTimeMillis() - 60000
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val e = intercept[IllegalArgumentException] {
      IceLite.readAsOf(spark, ref, before)
    }
    assert(e.getMessage.contains("no snapshot"))
  }

  test("tableExists flips on first write") {
    val ref = freshRef()
    assert(!IceLite.tableExists(ref))
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    assert(IceLite.tableExists(ref))
  }

  test("expiry drops old snapshots but never the current one") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    IceLite.append(ref, Seq(2).toDF("k"))
    val expired = IceLite.expireSnapshots(ref, System.currentTimeMillis() + 60000)
    assert(expired.size == 1)
    val m = IceLite.readManifest(ref)
    assert(m.snapshots.size == 1 && m.snapshots.head.id == m.currentSnapshotId)
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("expiry safety: never deletes files referenced by a surviving snapshot") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    // append snapshots share the create snapshot's files
    IceLite.append(ref, Seq(2).toDF("k"))
    IceLite.append(ref, Seq(3).toDF("k"))
    IceLite.expireSnapshots(ref, System.currentTimeMillis() + 60000)
    val current = IceLite.readManifest(ref).current
    // every file of the surviving snapshot must still exist on disk —
    // including those first staged by now-expired snapshots
    current.files.foreach { f =>
      assert(Files.exists(ref.dir.resolve(f)), s"expiry deleted live file $f")
    }
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("manifest min/max stats prune files; pruned read ≡ full read + filter") {
    val ref = freshRef()
    // three appends with disjoint key ranges → three prunable files
    IceLite.createOrReplace(ref, Seq(1, 5).toDF("k"), statsCols = Seq("k"))
    IceLite.append(ref, Seq(10, 15).toDF("k"), statsCols = Seq("k"))
    IceLite.append(ref, Seq(20, 25).toDF("k"), statsCols = Seq("k"))
    val all = IceLite.readManifest(ref).current.files
    assert(all.size >= 3)

    // range [8,16] intersects only the middle append's range
    val pruned = IceLite.prunedFiles(ref, "k", 8, 16)
    assert(pruned.size < all.size, s"no pruning happened: $pruned")

    val got = IceLite.readPruned(spark, ref, "k", 8, 16)
      .as[Int].collect().sorted.toSeq
    val full = IceLite.read(spark, ref).filter($"k" >= 8 && $"k" <= 16)
      .as[Int].collect().sorted.toSeq
    assert(got == full && got == Seq(10, 15))

    // disjoint range prunes everything yet keeps the schema
    assert(IceLite.readPruned(spark, ref, "k", 100, 200).count() == 0)
  }

  test("files without stats are conservatively kept by pruning") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq(1).toDF("k")) // no statsCols
    IceLite.append(ref, Seq(50).toDF("k"), statsCols = Seq("k"))
    // range matches neither recorded range, but the stat-less file stays
    val kept = IceLite.prunedFiles(ref, "k", 0, 2)
    val got = IceLite.readPruned(spark, ref, "k", 0, 2).as[Int].collect().toSeq
    assert(got == Seq(1), s"stat-less file was wrongly pruned (kept=$kept)")
  }

  test("merge upserts: update wins, inserts added, untouched rows preserved") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    val pre = IceLite.readManifest(ref).currentSnapshotId
    IceLite.merge(spark, ref,
      Seq((2, "B"), (4, "d")).toDF("k", "v"), Seq("k"))
    val got = IceLite.read(spark, ref).as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "a"), (2, "B"), (3, "c"), (4, "d")))
    // pre-merge state still time-travelable
    val old = IceLite.readAt(spark, ref, pre).as[(Int, String)].collect()
      .sortBy(_._1).toSeq
    assert(old == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("merge on a missing table creates it") {
    val ref = freshRef()
    IceLite.merge(spark, ref, Seq((1, "a")).toDF("k", "v"), Seq("k"))
    assert(IceLite.read(spark, ref).as[(Int, String)].collect().toSeq == Seq((1, "a")))
  }

  test("expiry with a past cutoff (7d retention) is a no-op on fresh snapshots") {
    val ref = freshRef()
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    IceLite.append(ref, Seq(2).toDF("k"))
    val expired = IceLite.expireSnapshots(ref,
      System.currentTimeMillis() - 7L * 24 * 3600 * 1000)
    assert(expired.isEmpty)
    assert(IceLite.readManifest(ref).snapshots.size == 2)
  }

  test("rollback reverts content as a new snapshot; the bad load stays travelable") {
    val wh = graft.GraftTmp.dir("icelite_rb").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    val first = IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    val bad = IceLite.append(ref, Seq(99).toDF("k"))
    val rb = IceLite.rollback(ref, first.id)
    // current content is the first load again
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2))
    // the rollback is a NEW snapshot — history is append-only
    val m = IceLite.readManifest(ref)
    assert(m.snapshots.map(_.operation) == Seq("create", "append", "rollback"))
    assert(m.currentSnapshotId == rb.id && rb.id > bad.id)
    // the bad snapshot is still time-travelable until expiry
    assert(IceLite.readAt(spark, ref, bad.id).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 99))
    // rolling back to an unknown id fails loudly
    intercept[IllegalArgumentException](IceLite.rollback(ref, 12345L))
  }

  test("expireMetadata reclaims superseded manifest versions; history and CAS survive") {
    val wh = graft.GraftTmp.dir("icelite_meta").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    val first = IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    (3 to 6).foreach(k => IceLite.append(ref, Seq(k).toDF("k")))
    def manifests(): Seq[String] = IceLite.listDir(
      java.nio.file.Files.list(ref.dir))(_
      .map(_.getFileName.toString)
      .filter(_.startsWith("manifest.v")).toSeq)
    assert(manifests().size == 5)
    // nothing to do when keepLast covers everything
    assert(IceLite.expireMetadata(ref, keepLast = 10).isEmpty)
    val deleted = IceLite.expireMetadata(ref, keepLast = 1)
    assert(deleted.size == 4)
    assert(manifests().size == 1)
    // reads, time travel, and snapshot history are untouched
    assert(IceLite.read(spark, ref).count() == 6)
    assert(IceLite.readAt(spark, ref, first.id).count() == 2)
    assert(IceLite.readManifest(ref).snapshots.size == 5)
    // CAS continues: the next commit claims the next version number
    IceLite.append(ref, Seq(7).toDF("k"))
    assert(IceLite.read(spark, ref).count() == 7)
    assert(manifests().size == 2)
  }

  test("analyze commits NDV into a metadata-only snapshot over the same files") {
    val wh = graft.GraftTmp.dir("icelite_analyze").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, (1L to 100L).map(k => (k, k % 7)).toDF("k", "g"))
    val base = IceLite.readManifest(ref).current
    val snap = IceLite.analyze(spark, ref, Seq("k", "g"))
    assert(snap.operation == "analyze")
    // metadata-only: same files, same rows, nothing rewritten
    assert(snap.files == base.files)
    assert(IceLite.read(spark, ref).count() == 100L)
    // HLL++ at default rsd: within 5% on k, exact on tiny g
    val ndvK = snap.summary("ndv.k").toLong
    assert(math.abs(ndvK - 100L) <= 5, s"ndv.k = $ndvK")
    assert(snap.summary("ndv.g").toLong == 7L)
    // a later append keeps the recorded NDVs in its summary lineage
    // only via the analyze snapshot — the append's own summary is
    // fresh (re-analyze after significant growth, like any engine)
    IceLite.append(ref, Seq((101L, 1L)).toDF("k", "g"))
    assert(IceLite.readManifest(ref).snapshots
      .exists(_.summary.contains("ndv.k")))
  }

  test("branch staging chains on the branch head; the publish gate stays the original base") {
    val wh = graft.GraftTmp.dir("icelite_wap_chain").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    IceLite.stageBranchAppend(ref, "b", Seq(3).toDF("k"))
    IceLite.stageBranchAppend(ref, "b", Seq(4).toDF("k"))
    // second stage accumulated on the candidate, main untouched
    assert(IceLite.readBranch(spark, ref, "b")
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2))
    // main advances AFTER staging began: publish must still refuse —
    // the gate is the candidate's ORIGINAL staging base, not the
    // branch head's commit time
    IceLite.append(ref, Seq(9).toDF("k"))
    intercept[IllegalStateException](IceLite.publish(ref, "b"))
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 9), "failed publish must leave main intact")
    // REAL lineage: snapshots are create(1), stage(2), stage(3),
    // append(4). The second stage chains on the BRANCH head, and the
    // main-line append chains on the PUBLISHED base — not on the
    // staged snapshot that happens to precede it in the id sequence
    val snaps = IceLite.readManifest(ref).snapshots.sortBy(_.id)
    assert(snaps.map(_.parentId) ==
      Seq(None, Some(1L), Some(2L), Some(1L)),
      snaps.map(s => s.id -> s.parentId).mkString(", "))
    // ancestry via $history: staged commits sit off the main lineage
    val anc = IceLite.historyRows(ref).map(r => r._2 -> r._4).toMap
    assert(anc == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  // ---- d65: cherry-pick (the non-fast-forward publish) ----

  test("cherrypick re-applies the branch delta onto an advanced main") {
    val wh = graft.GraftTmp.dir("icelite_cherry").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    IceLite.stageBranchAppend(ref, "audit", Seq(3, 4).toDF("k"))
    IceLite.stageBranchAppend(ref, "audit", Seq(5).toDF("k")) // chained
    // main advances while the audit runs — publish refuses this
    IceLite.append(ref, Seq(9).toDF("k"))
    intercept[IllegalStateException](IceLite.publish(ref, "audit"))
    // cherry-pick keeps BOTH the concurrent append and the delta
    val snap = IceLite.cherrypick(ref, "audit")
    assert(snap.operation == "cherrypick")
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3, 4, 5, 9))
    val m = IceLite.readManifest(ref)
    assert(m.branches.isEmpty, "cherry-pick must consume the branch")
    assert(m.current.rowCount == 6L)
    assert(m.current.fileRows.values.sum == 6L,
      "delta fileRows must carry over")
    // metadata stays answerable: the delta files' stats came along
    assert(snap.files.forall(m.current.fileRows.contains))
  }

  test("cherrypick on an unmoved main degenerates to fast-forward") {
    val wh = graft.GraftTmp.dir("icelite_cherry_ff").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val staged = IceLite.stageBranchAppend(ref, "audit", Seq(2).toDF("k"))
    IceLite.cherrypick(ref, "audit")
    val m = IceLite.readManifest(ref)
    // no extra snapshot minted: main fast-forwarded to the candidate
    assert(m.currentSnapshotId == staged.id)
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("cherrypick refuses when the staging base expired or layout changed") {
    val wh = graft.GraftTmp.dir("icelite_cherry_ref").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    IceLite.stageBranchAppend(ref, "audit", Seq(2).toDF("k"))
    IceLite.append(ref, Seq(3).toDF("k"))
    IceLite.append(ref, Seq(4).toDF("k"))
    // retain-last keeps the branch-pinned candidate but reaps its
    // staging base (snapshot 1) → the delta is no longer computable
    IceLite.expireSnapshotsRetainLast(ref, 1)
    val e = intercept[IllegalStateException](IceLite.cherrypick(ref, "audit"))
    assert(e.getMessage.contains("base"))
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
      == Seq(1, 3, 4), "failed cherry-pick must leave main intact")
  }

  test("WAP branches: staged invisible on main, publish fast-forwards, drop abandons") {
    val wh = graft.GraftTmp.dir("icelite_wap").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    val staged = IceLite.stageBranchAppend(ref, "audit", Seq(3, 4).toDF("k"))
    // main readers cannot see the candidate
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2))
    // the audit query reads base + batch on the branch
    assert(IceLite.readBranch(spark, ref, "audit")
      .as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    // retention cannot reap a branch-referenced candidate
    val expired = IceLite.expireSnapshots(ref, System.currentTimeMillis() + 3600000)
    assert(!expired.contains(staged.id), "staged snapshot must survive expiry")
    // publish: metadata-only fast-forward, branch consumed
    IceLite.publish(ref, "audit")
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(IceLite.readManifest(ref).branches.isEmpty)

    // a second candidate fails its audit: drop leaves main untouched
    IceLite.stageBranchAppend(ref, "audit", Seq(-1).toDF("k"))
    IceLite.dropBranch(ref, "audit")
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    intercept[IllegalArgumentException](IceLite.readBranch(spark, ref, "audit"))
    intercept[IllegalArgumentException](IceLite.publish(ref, "audit"))

    // publish is fast-forward ONLY: main advancing after staging must
    // fail the publish (fast-forwarding would drop the appended 5)
    IceLite.stageBranchAppend(ref, "audit", Seq(6).toDF("k"))
    IceLite.append(ref, Seq(5).toDF("k"))
    intercept[IllegalStateException](IceLite.publish(ref, "audit"))
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3, 4, 5), "failed publish must leave main intact")
    // re-staging on the new base publishes cleanly with nothing lost
    IceLite.dropBranch(ref, "audit")
    IceLite.stageBranchAppend(ref, "audit", Seq(6).toDF("k"))
    IceLite.publish(ref, "audit")
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3, 4, 5, 6))
  }

  test("concurrent branch staging: racing writers never lose a branch pointer") {
    // the bug class behind NOTES rule 21: a commit path that rebuilds
    // the manifest positionally erases other writers' branches
    val wh = graft.GraftTmp.dir("icelite_race").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(ref, Seq(0).toDF("k"))
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        IceLite.stageBranchAppend(ref, s"b$i", Seq(i * 100).toDF("k")); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val m = IceLite.readManifest(ref)
    assert(m.branches.keySet == Set("b1", "b2", "b3", "b4"),
      s"lost branch pointers under concurrency: ${m.branches.keySet}")
    // every staged candidate is readable and holds base + its batch
    (1 to 4).foreach { i =>
      assert(IceLite.readBranch(spark, ref, s"b$i")
        .as[Int].collect().sorted.toSeq == Seq(0, i * 100)) }
  }

  test("shallow clone: zero-copy, reads equal, clone append leaves source untouched") {
    val wh = graft.GraftTmp.dir("icelite_clone").toString
    val src = TableRef(wh, "ns", "src")
    val dst = TableRef(wh, "ns", "dev")
    IceLite.createNamespace(wh, "ns")
    IceLite.createOrReplace(src, Seq(1, 2, 3).toDF("k"))
    IceLite.shallowClone(src, dst)
    assert(IceLite.read(spark, dst).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // zero bytes under the clone's own data dir
    assert(IceLite.listDir(java.nio.file.Files.walk(dst.dataDir))(_
      .count(_.toString.endsWith(".parquet"))) == 0)
    IceLite.append(dst, Seq(4).toDF("k"))
    assert(IceLite.read(spark, dst).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(IceLite.read(spark, src).as[Int].collect().sorted.toSeq == Seq(1, 2, 3),
      "clone append must not leak into the source")
    // cloning onto an existing table refuses
    intercept[IllegalArgumentException](IceLite.shallowClone(src, dst))
  }

  test("incremental scan reads only the appended delta; refuses non-append ranges") {
    val wh = graft.GraftTmp.dir("icelite_inc").toString
    val ref = TableRef(wh, "ns", "t")
    IceLite.createNamespace(wh, "ns")
    val cp = IceLite.createOrReplace(ref, Seq(1, 2).toDF("k"))
    IceLite.append(ref, Seq(3).toDF("k"))
    IceLite.append(ref, Seq(4).toDF("k"))
    assert(IceLite.incrementalScan(spark, ref, cp.id)
      .as[Int].collect().sorted.toSeq == Seq(3, 4))
    // from == current → empty delta, schema preserved
    val cur = IceLite.readManifest(ref).currentSnapshotId
    assert(IceLite.incrementalScan(spark, ref, cur).count() == 0)
    // a replace inside the range breaks append-only: refuse loudly
    IceLite.createOrReplace(ref, Seq(9).toDF("k"))
    intercept[IllegalArgumentException](IceLite.incrementalScan(spark, ref, cp.id))
  }

  test("filesDf reports per-file rows, partition values and stats from metadata") {
    val ref = freshRef()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "a"), (2L, "a"), (9L, "b")).toDF("k", "p"),
      "p", statsCols = Seq("k"))
    val files = IceLite.filesDf(spark, ref)
      .select($"partition"("p"), $"row_count",
        $"stats_min"("k"), $"stats_max"("k"))
      .as[(String, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(files == Seq(("a", 2L, 1.0, 2.0), ("b", 1L, 9.0, 9.0)))
    // unpartitioned tables: empty partition map, still per-file rows
    val ref2 = freshRef()
    IceLite.createOrReplace(ref2, Seq(1, 2, 3).toDF("k"))
    val total = IceLite.filesDf(spark, ref2)
      .agg(org.apache.spark.sql.functions.sum($"row_count"))
      .as[Long].head()
    assert(total == 3)
    assert(IceLite.filesDf(spark, ref2)
      .select(org.apache.spark.sql.functions.size($"partition"))
      .as[Int].collect().forall(_ == 0))
  }

  test("deleteWhere rewrites only touched files; no-match is a no-op") {
    val ref = freshRef()
    // 4 sorted files with tight key ranges: a range delete must touch
    // only the files holding matches
    IceLite.createOrReplaceSorted(ref,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      "k", numFiles = 4, statsCols = Seq("k"))
    val before = IceLite.readManifest(ref).current
    val snap = IceLite.deleteWhere(spark, ref, "k >= 100 AND k < 150")
    assert(snap.operation == "delete")
    assert(snap.rowCount == 350)
    val untouched = snap.files.count(before.files.toSet)
    assert(untouched == 3, s"expected 3 untouched files, got $untouched")
    val got = IceLite.read(spark, ref).as[(Long, String)].collect()
    assert(got.length == 350 && got.forall(r => r._1 < 100 || r._1 >= 150))
    // matching nothing commits nothing: same snapshot comes back
    val noop = IceLite.deleteWhere(spark, ref, "k = 99999")
    assert(noop.id == snap.id &&
      IceLite.readManifest(ref).snapshots.size == 2)
  }

  test("updateWhere transforms only matching rows; untouched files identical") {
    val ref = freshRef()
    IceLite.createOrReplaceSorted(ref,
      (0L until 400L).map(k => (k, k.toDouble)).toDF("k", "v"),
      "k", numFiles = 4, statsCols = Seq("k"))
    val before = IceLite.readManifest(ref).current
    val snap = IceLite.updateWhere(spark, ref, "k >= 100 AND k < 150",
      Map("v" -> "v + 1000.0"))
    assert(snap.operation == "update" && snap.rowCount == 400)
    assert(snap.files.count(before.files.toSet) == 3)
    val got = IceLite.read(spark, ref).as[(Long, Double)].collect().toMap
    assert(got(99L) == 99.0 && got(100L) == 1100.0 &&
      got(149L) == 1149.0 && got(150L) == 150.0)
    // non-matching rows inside the touched file carried unchanged
    assert(got(101L) == 1101.0 && got.size == 400)
  }

  test("expireSnapshotsRetainLast keeps the N newest and reclaims unreferenced files") {
    val ref = freshRef()
    val s1 = IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val s2 = IceLite.createOrReplace(ref, Seq(2).toDF("k")) // s1's file now exclusive
    val s3 = IceLite.append(ref, Seq(3).toDF("k"))
    val expired = IceLite.expireSnapshotsRetainLast(ref, 2)
    assert(expired == Seq(s1.id))
    assert(IceLite.readManifest(ref).snapshots.map(_.id) == Seq(s2.id, s3.id))
    // the replaced-away file is reclaimed; survivors read fine
    assert(s1.files.forall(f => !Files.exists(ref.dir.resolve(f))))
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(2, 3))
    // retaining more than exist is a no-op; current always survives n=1
    assert(IceLite.expireSnapshotsRetainLast(ref, 10).isEmpty)
    assert(IceLite.expireSnapshotsRetainLast(ref, 1) == Seq(s2.id))
    assert(IceLite.read(spark, ref).as[Int].collect().sorted.toSeq == Seq(2, 3))
  }

  test("partitionsDf reports the per-partition census from the manifest") {
    val ref = freshRef()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "p"),
      "p", statsCols = Seq("k"))
    IceLite.appendPartitioned(ref, Seq((4L, "a")).toDF("k", "p"), "p")
    val got = IceLite.partitionsDf(spark, ref)
      .select($"p", $"file_count", $"row_count")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // a: create(1 file, 2 rows) + append(1 file, 1 row); b: 1 file
    assert(got == Seq(("a", 2L, 3L), ("b", 1L, 1L)))
    // size_bytes present and positive for live partitions
    assert(IceLite.partitionsDf(spark, ref)
      .select($"size_bytes").as[Long].collect().forall(_ > 0))
    // unpartitioned tables refuse (Iceberg's table$partitions contract)
    val ref2 = freshRef()
    IceLite.createOrReplace(ref2, Seq(1).toDF("k"))
    assertThrows[IllegalArgumentException](IceLite.partitionsDf(spark, ref2))
  }

  test("deleteWhere on a sorted table keeps the sort layout and tight file ranges") {
    val ref = freshRef()
    IceLite.createOrReplaceSorted(ref,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      "k", numFiles = 4, statsCols = Seq("k"))
    val snap = IceLite.deleteWhere(spark, ref, "k >= 100 AND k < 150")
    // layout metadata survives the rewrite …
    assert(snap.sortedBy.contains("k"))
    // … and so do per-file stats: every file still carries a k range,
    // and the ranges stay pairwise non-overlapping (sorted layout)
    val ranges = snap.files.map { f =>
      val cs = snap.fileStats(f).find(_.col == "k").get
      (cs.min, cs.max)
    }.sortBy(_._1)
    assert(ranges.size == snap.files.size)
    assert(ranges.zip(ranges.tail).forall { case ((_, hi), (lo, _)) => hi < lo })
    // a range scan after the delete still prunes to one file
    assert(IceLite.prunedFiles(ref, "k", 350.0, 360.0).size == 1)
  }

  test("deleteWhere on a partitioned table preserves the layout and partition-col predicates work") {
    val ref = freshRef()
    IceLite.createOrReplacePartitioned(ref,
      (0L until 300L).map(k => (k, if (k % 3 == 0) "a" else if (k % 3 == 1) "b" else "c"))
        .toDF("k", "p"),
      "p", statsCols = Seq("k"))
    val before = IceLite.readManifest(ref).current
    // predicate on the PATH-BORNE partition column — only possible
    // because the detection scan reads through partition discovery
    val snap = IceLite.deleteWhere(spark, ref, "p = 'b' AND k < 100")
    assert(snap.partitionCols == Seq("p"))
    // untouched partitions' files survive byte-identical (same paths)
    val untouched = before.files.filter(f => !f.contains("p=b"))
    assert(untouched.forall(snap.files.contains))
    // rewritten rows landed back under their Hive partition dir
    val newFiles = snap.files.filterNot(before.files.toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("p=b")))
    // partition pruning still works post-delete, and the data is right
    val b = IceLite.readPartitionPruned(spark, ref, Set("b"))
      .select("k").as[Long].collect().sorted
    assert(b.toSeq == (0L until 300L).filter(_ % 3 == 1).filter(_ >= 100))
    assert(IceLite.read(spark, ref).count() == 300 - 33)
  }

  test("merge on a partitioned table keeps the partition layout") {
    val ref = freshRef()
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "x", "a"), (2L, "y", "a"), (3L, "z", "b")).toDF("k", "v", "p"),
      "p", statsCols = Seq("k"))
    val snap = IceLite.merge(spark, ref,
      Seq((2L, "Y2", "a"), (4L, "w", "b")).toDF("k", "v", "p"), Seq("k"))
    assert(snap.partitionCols == Seq("p"))
    assert(snap.files.nonEmpty && snap.files.forall(_.startsWith("data/part/p=")))
    val got = IceLite.readPartitioned(spark, ref)
      .select("k", "v", "p").as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "x", "a"), (2L, "Y2", "a"),
      (3L, "z", "b"), (4L, "w", "b")))
    // partition pruning still answers from the new snapshot
    assert(IceLite.readPartitionPruned(spark, ref, Set("b"))
      .select("k").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("merge on a sorted table keeps the sort layout") {
    val ref = freshRef()
    IceLite.createOrReplaceSorted(ref,
      (0L until 200L).map(k => (k, k.toDouble)).toDF("k", "v"),
      "k", numFiles = 4, statsCols = Seq("k"))
    val snap = IceLite.merge(spark, ref,
      Seq((50L, -1.0), (500L, 500.0)).toDF("k", "v"), Seq("k"))
    assert(snap.sortedBy.contains("k"))
    val ranges = snap.files.map { f =>
      val cs = snap.fileStats(f).find(_.col == "k").get
      (cs.min, cs.max)
    }.sortBy(_._1)
    assert(ranges.zip(ranges.tail).forall { case ((_, hi), (lo, _)) => hi < lo })
    val got = IceLite.read(spark, ref).as[(Long, Double)].collect().toMap
    assert(got.size == 201 && got(50L) == -1.0 && got(500L) == 500.0)
  }

  test("addFiles registers external parquet zero-copy; schema/layout gates refuse") {
    val ref = freshRef()
    val ext = graft.GraftTmp.dir("addfiles_ext")
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(ext.toString)
    val sources = IceLite.listDir(Files.list(ext))(_
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      .sortBy(_.getFileName.toString))
    val snap = IceLite.addFiles(ref, sources)
    assert(snap.rowCount == 3 && snap.files.size == sources.size)
    // zero-copy: every registered file shares its source's inode
    snap.files.zip(sources).foreach { case (f, _) =>
      assert(sources.exists(srcP => Files.isSameFile(ref.dir.resolve(f), srcP)),
        s"$f is not a hard link of any source")
    }
    assert(IceLite.read(spark, ref).as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    // footer-derived metadata is complete (record counts per file)
    assert(snap.fileRows.values.sum == 3)

    // second registration appends (new snapshot, rows accumulate)
    val ext2 = graft.GraftTmp.dir("addfiles_ext2")
    Seq((4, "d")).toDF("k", "v").write.mode("overwrite").parquet(ext2.toString)
    val src2 = IceLite.listDir(Files.list(ext2))(_
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
    val snap2 = IceLite.addFiles(ref, src2)
    assert(snap2.operation == "append" && snap2.rowCount == 4)

    // schema mismatch refuses (against the table)
    val bad = graft.GraftTmp.dir("addfiles_bad")
    Seq((1, 2.0)).toDF("k", "other").write.mode("overwrite").parquet(bad.toString)
    val badSrc = IceLite.listDir(Files.list(bad))(_
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
    intercept[IllegalArgumentException] { IceLite.addFiles(ref, badSrc) }

    // partitioned target refuses (a flat file can't carry path values)
    val pRef = freshRef()
    IceLite.createOrReplacePartitioned(pRef,
      Seq((1, "x", "p1"), (2, "y", "p2")).toDF("k", "v", "p"), "p")
    intercept[IllegalArgumentException] { IceLite.addFiles(pRef, sources) }
  }
}
