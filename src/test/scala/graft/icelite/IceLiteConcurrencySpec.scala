package graft.icelite

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Races the optimistic CAS commit protocol: concurrent appenders must
  * never lose a snapshot (the failure mode of the old rename-swap
  * commit, where the last writer silently overwrote the other's
  * manifest). */
class IceLiteConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("concurrent appends all land: no lost updates under CAS races") {
    val wh = graft.GraftTmp.dir("cas_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")

    val writers = 4
    val appendsEach = 3
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try (0 until appendsEach).foreach { i =>
            IceLite.append(ref, Seq(w * 100 + i).toDF("k"))
          } catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")

    val m = IceLite.readManifest(ref)
    // every one of the 12 appends produced a snapshot; none were lost
    assert(m.snapshots.size == writers * appendsEach,
      s"lost snapshots: ${m.snapshots.size} of ${writers * appendsEach}")
    val rows = IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
    val expected = (for (w <- 0 until writers; i <- 0 until appendsEach)
      yield w * 100 + i).sorted
    assert(rows == expected, "rows lost or duplicated under concurrency")
    assert(m.current.rowCount == writers * appendsEach)
  }

  test("concurrent property SETs of distinct keys all land (CAS rebase, d82)") {
    val wh = graft.GraftTmp.dir("props_race").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    val writers = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.alterSetProperties(ref, Map(s"key.$w" -> s"v$w"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"SET failed: ${failures.peek()}")
    val props = IceLite.readManifest(ref).properties
    (0 until writers).foreach { w =>
      assert(props.get(s"key.$w").contains(s"v$w"),
        s"property key.$w lost in the CAS race: $props")
    }
  }

  test("concurrent merges on disjoint keys both apply (conflict-validated)") {
    val wh = graft.GraftTmp.dir("cas_merge_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // writer A updates keys 1,2; writer B updates 3 and inserts 5 —
    // with stale-base commits one merge would silently erase the other
    val batches = Seq(
      Seq((1, "A"), (2, "B")),
      Seq((3, "C"), (5, "e")))
    batches.foreach { b =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.merge(spark, ref, b.toDF("k", "v"), Seq("k"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "merges timed out")
    assert(failures.isEmpty, s"merge failed: ${failures.peek()}")

    val got = IceLite.read(spark, ref).as[(Int, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "A"), (2, "B"), (3, "C"), (4, "d"), (5, "e")),
      s"a concurrent merge was lost: $got")
  }

  test("concurrent merges into a MISSING table both apply (create race)") {
    // The old fallback delegated to createOrReplace, whose build
    // closure commits "replace" with only its own rows if another
    // writer created the table after the None check — losing that
    // writer's data. The fix claims v1 create-only and falls back to
    // the normal merge path on a lost race.
    val wh = graft.GraftTmp.dir("cas_merge_create_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val batches = Seq(Seq((1, "a"), (2, "b")), Seq((3, "c"), (4, "d")))
    batches.foreach { b =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.merge(spark, ref, b.toDF("k", "v"), Seq("k"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "merges timed out")
    assert(failures.isEmpty, s"merge failed: ${failures.peek()}")
    val got = IceLite.read(spark, ref).as[(Int, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")),
      s"a concurrent create-merge was lost: $got")
  }

  test("concurrent delete-merges on disjoint keys: both tombstone sets apply") {
    // the d13 branch under race: each merge carries WHEN MATCHED AND
    // cond THEN DELETE tombstones. With stale-base commits, the loser's
    // rebase could resurrect the winner's deleted keys (they are
    // "unmatched" in the loser's recomputation only if the rebase reads
    // the winner's state) or drop rows neither writer touched.
    val wh = graft.GraftTmp.dir("cas_delete_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1 to 8).map(k => (k, s"v$k")).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // A tombstones {1,2}; B tombstones {3,4} and upserts 5
    val batches = Seq(
      Seq((1, "DEL"), (2, "DEL")),
      Seq((3, "DEL"), (4, "DEL"), (5, "V5")))
    batches.foreach { b =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.merge(spark, ref, b.toDF("k", "v"), Seq("k"),
            deleteWhere = Some("v = 'DEL'"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "merges timed out")
    assert(failures.isEmpty, s"delete-merge failed: ${failures.peek()}")

    val got = IceLite.read(spark, ref).as[(Int, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((5, "V5"), (6, "v6"), (7, "v7"), (8, "v8")),
      s"tombstone resurrected or unrelated row vanished: $got")
  }

  test("concurrent delete-merges with OVERLAPPING tombstones stay idempotent") {
    // both writers erase key 3 (the GDPR double-submit shape); the
    // loser's recomputed merge finds 3 already gone — deleting an
    // absent key is a no-op, not an error, and nothing else is touched
    val wh = graft.GraftTmp.dir("cas_delete_overlap_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1 to 6).map(k => (k, s"v$k")).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val batches = Seq(
      Seq((1, "DEL"), (2, "DEL"), (3, "DEL")),
      Seq((3, "DEL"), (4, "DEL")))
    batches.foreach { b =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.merge(spark, ref, b.toDF("k", "v"), Seq("k"),
            deleteWhere = Some("v = 'DEL'"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "merges timed out")
    assert(failures.isEmpty, s"overlapping delete-merge failed: ${failures.peek()}")

    val got = IceLite.read(spark, ref).as[(Int, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((5, "v5"), (6, "v6")),
      s"overlapping tombstones mishandled: $got")
  }

  test("delete-merge racing an upsert-merge: deletes land, upserts survive") {
    // mixed race: A erases {1,2}; B re-prices 5 and inserts 9. A lost
    // CAS on either side must rebase onto the other's state — B's
    // upsert must not resurrect A's deleted keys, A's delete must not
    // drop B's insert.
    val wh = graft.GraftTmp.dir("cas_delete_upsert_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1 to 8).map(k => (k, s"v$k")).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try IceLite.merge(spark, ref,
          Seq((1, "DEL"), (2, "DEL")).toDF("k", "v"), Seq("k"),
          deleteWhere = Some("v = 'DEL'"))
        catch { case t: Throwable => failures.add(t) }
      }
    })
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try IceLite.merge(spark, ref,
          Seq((5, "V5"), (9, "v9")).toDF("k", "v"), Seq("k"))
        catch { case t: Throwable => failures.add(t) }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "merges timed out")
    assert(failures.isEmpty, s"mixed merge race failed: ${failures.peek()}")

    val got = IceLite.read(spark, ref).as[(Int, String)].collect()
      .sortBy(_._1).toSeq
    assert(got == Seq((3, "v3"), (4, "v4"), (5, "V5"), (6, "v6"),
      (7, "v7"), (8, "v8"), (9, "v9")),
      s"delete/upsert race lost a change: $got")
  }

  test("compact racing concurrent appends loses nothing") {
    // compact claims the version it compacted against; when an append
    // wins the race, compact must recompute on the winner's file list
    // so the appended rows survive into the compacted snapshot
    val wh = graft.GraftTmp.dir("cas_compact_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, (0 until 20).toDF("k").repartition(4))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // two appenders race one compactor
    Seq(20 until 30, 30 until 40).foreach { range =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.append(ref, range.toDF("k"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try IceLite.compact(spark, ref)
        catch { case t: Throwable => failures.add(t) }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")

    val rows = IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
    assert(rows == (0 until 40).toSeq,
      s"rows lost under compact/append race: ${rows.size} of 40")
  }

  test("concurrent standalone deletes on disjoint predicates both apply") {
    val wh = graft.GraftTmp.dir("cas_delwhere_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, (0 until 40).map(k => (k, k * 2)).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    Seq("k < 5", "k >= 35").foreach { pred =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.deleteWhere(spark, ref, pred)
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "deletes timed out")
    assert(failures.isEmpty, s"delete failed: ${failures.peek()}")
    // the losing delete recomputed against the winner's table: both
    // predicates applied, no survivor lost, no row resurrected
    val rows = IceLite.read(spark, ref).as[(Int, Int)].collect().map(_._1).sorted
    assert(rows.toSeq == (5 until 35).toSeq,
      s"concurrent deletes lost rows or resurrected deletions: ${rows.length}")
  }

  test("a standalone delete racing an append loses neither") {
    val wh = graft.GraftTmp.dir("cas_delapp_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, (0 until 20).map(k => (k, "base")).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try IceLite.deleteWhere(spark, ref, "k < 10")
        catch { case t: Throwable => failures.add(t) }
      }
    })
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        // appended keys sit outside the delete predicate, so both
        // serializable orders agree on the final content
        try IceLite.append(ref, (100 until 110).map(k => (k, "new")).toDF("k", "v"))
        catch { case t: Throwable => failures.add(t) }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    val keys = IceLite.read(spark, ref).as[(Int, String)].collect().map(_._1).sorted
    assert(keys.toSeq == (10 until 20) ++ (100 until 110),
      s"delete/append race lost rows: ${keys.toSeq}")
  }

  test("concurrent merges on a PARTITIONED table: both land, shared part dirs intact") {
    // the unstage-on-lost-race path: partition-staged files live in
    // SHARED data/part/<col>=<v>/ dirs, so the loser's cleanup must
    // delete exactly its own staged files, never the dir (a token-dir
    // style unstage here would wipe the winner's committed files too)
    val wh = graft.GraftTmp.dir("cas_part_merge_spec").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplacePartitioned(ref,
      (0L until 40L).map(k => (k, s"v$k", if (k % 2 == 0) "even" else "odd"))
        .toDF("k", "v", "p"),
      "p", statsCols = Seq("k"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val batches = Seq(
      (0L until 5L).map(k => (k, "A", if (k % 2 == 0) "even" else "odd")),
      (100L until 105L).map(k => (k, "B", if (k % 2 == 0) "even" else "odd")))
    batches.foreach { b =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.merge(spark, ref, b.toDF("k", "v", "p"), Seq("k"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "merges timed out")
    assert(failures.isEmpty, s"partitioned merge failed: ${failures.peek()}")

    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionCols == Seq("p"), "layout metadata lost under race")
    val got = IceLite.readPartitioned(spark, ref)
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got.size == 45, s"rows lost under partitioned merge race: ${got.size}")
    assert((0L until 5L).forall(got(_) == "A") &&
      (100L until 105L).forall(got(_) == "B") &&
      (5L until 40L).forall(k => got(k) == s"v$k"),
      s"a partitioned concurrent merge was lost")
  }

  test("ALTER ADD COLUMN racing appends: ledger and all snapshots survive") {
    val wh = graft.GraftTmp.dir("alter_race").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((0, 0.0)).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // 3 appenders × 2 appends race 1 altering writer
    (0 until 3).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try (0 until 2).foreach { i =>
            IceLite.append(ref, Seq((w * 10 + i + 1, 1.0)).toDF("k", "v"))
          } catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try IceLite.alterAddColumn(ref, "tag", "string")
        catch { case t: Throwable => failures.add(t) }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")

    val m = IceLite.readManifest(ref)
    // no append lost to the alter, no alter lost to an append
    assert(m.snapshots.size == 7, s"lost snapshots: ${m.snapshots.size} of 7")
    assert(m.current.rowCount == 7)
    assert(m.addedCols.map(_.name) == Seq("tag"),
      s"alter lost to a racing commit: ${m.addedCols}")
  }

  test("two ALTERs racing on the same column name: exactly one wins") {
    val wh = graft.GraftTmp.dir("alter_dup_race").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq((0, 0.0)).toDF("k", "v"))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    (0 until 2).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try { IceLite.alterAddColumn(ref, "tag", "string"); outcomes.add(true) }
          catch { case _: IllegalArgumentException => outcomes.add(false) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    // the loser rebased inside commitCAS and hit the duplicate check
    import scala.jdk.CollectionConverters._
    assert(outcomes.asScala.toSeq.sorted == Seq(false, true),
      s"duplicate-column race outcomes: ${outcomes.asScala.toSeq}")
    assert(IceLite.readManifest(ref).addedCols.map(_.name) == Seq("tag"))
  }

  test("cherrypick racing concurrent appends loses neither side") {
    // the exact scenario cherry-pick exists for: main keeps moving
    // while the audited candidate lands. CAS rebase must keep every
    // append AND apply the delta exactly once.
    val wh = graft.GraftTmp.dir("cas_cherry").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq(0).toDF("k"))
    IceLite.stageBranchAppend(ref, "audit", Seq(1000, 1001).toDF("k"))
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 3).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try IceLite.append(ref, Seq(w).toDF("k"))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try IceLite.cherrypick(ref, "audit")
        catch { case t: Throwable => failures.add(t) }
      }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    val rows = IceLite.read(spark, ref).as[Int].collect().sorted.toSeq
    assert(rows == Seq(0, 1, 2, 3, 1000, 1001),
      "cherry-pick delta or a concurrent append was lost/duplicated")
    val m = IceLite.readManifest(ref)
    assert(m.branches.isEmpty, "branch must be consumed exactly once")
    assert(m.current.rowCount == 6L)
  }

  test("manifest versions are dense and monotonic after races") {
    val wh = graft.GraftTmp.dir("cas_spec2").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref, Seq(1).toDF("k"))
    IceLite.append(ref, Seq(2).toDF("k"))
    IceLite.append(ref, Seq(3).toDF("k"))
    import scala.jdk.CollectionConverters._
    val versions = IceLite.listDir(Files.list(ref.dir))(_
      .map(_.getFileName.toString)
      .filter(_.matches("manifest\\.v\\d{8}\\.json")).toSeq.sorted)
    assert(versions == Seq("manifest.v00000001.json",
      "manifest.v00000002.json", "manifest.v00000003.json"))
  }

  // ---- d67/d69: partitioned DSv2 write races ----

  private def partitionedSqlTable(): (String, TableRef) = {
    val wh = graft.GraftTmp.dir("cas_part").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplacePartitioned(ref,
      Seq((1L, "A"), (2L, "B")).toDF("k", "flag"), "flag")
    val cat = s"graftcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, ref)
  }

  test("concurrent partitioned SQL INSERTs all land (CAS rebase)") {
    val (cat, ref) = partitionedSqlTable()
    val writers = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try spark.sql(
            s"INSERT INTO $cat.src.t VALUES (${100L + w}, 'P$w')")
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    val got = spark.sql(s"SELECT k FROM $cat.src.t ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L) ++ (0 until writers).map(100L + _),
      s"rows lost under concurrent partitioned inserts: $got")
    assert(IceLite.readManifest(ref).current.partitionCols == Seq("flag"))
  }

  test("partition overwrite racing an append to ANOTHER partition keeps both") {
    val (cat, ref) = partitionedSqlTable()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    pool.submit(new Runnable { def run(): Unit = {
      start.await()
      try spark.sql(
        s"INSERT OVERWRITE $cat.src.t PARTITION (flag='A') VALUES (7L)")
      catch { case t: Throwable => failures.add(t) }
    }})
    pool.submit(new Runnable { def run(): Unit = {
      start.await()
      try spark.sql(s"INSERT INTO $cat.src.t VALUES (9L, 'B')")
      catch { case t: Throwable => failures.add(t) }
    }})
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    // whichever order the CAS resolved: A was replaced (1 gone, 7 in),
    // B kept its old row AND gained the appended one
    val got = spark.sql(s"SELECT k, flag FROM $cat.src.t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "B"), (7L, "A"), (9L, "B")),
      s"overwrite/append race lost an effect: $got")
  }

  test("r15: MoR SQL UPDATE (delta write) racing a compact fails LOUDLY; " +
      "racing an append rebases and both land") {
    val wh = graft.GraftTmp.dir("delta_race").toString
    IceLite.createNamespace(wh, "src")
    val cat = s"drace_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1L to 500L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(3),
      Seq("id"))
    IceLite.alterSetProperties(ref, Map("write.update.mode" -> "merge-on-read"))
    // the plan→commit window is not hookable without a fault
    // injector, so pin the CONFLICT RULE at the commit seam: a delta
    // computed against the pre-compact snapshot must refuse once
    // compact() rewrote the files its positions reference —
    // resurrecting rows through stale positions would be silent
    // corruption. (This is the same stale-snapshot state a true
    // mid-statement race produces.)
    val stale = IceLite.readManifest(ref).current
    IceLite.compact(spark, ref)
    val e = intercept[java.util.ConcurrentModificationException] {
      IceLite.commitDelta(spark, ref, stale, Nil, Nil, "update-mor")
    }
    assert(e.getMessage.contains("changed concurrently"), e.getMessage)
    // and the rebase half: an APPEND between plan and commit is
    // harmless (scanned files all still live) — the UPDATE lands
    spark.sql(s"UPDATE $cat.src.t SET v = -1 WHERE id = 7")
    val mid = IceLite.readManifest(ref).current
    assert(mid.operation == "update-mor")
    IceLite.append(ref, Seq((501L, 501.0)).toDF("id", "v"))
    assert(IceLite.read(spark, ref).count() == 501)
    assert(IceLite.read(spark, ref).filter($"id" === 7L)
      .select("v").as[Double].head() == -1.0)
  }
}
