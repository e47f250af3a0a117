package graft.sources

import java.nio.file.Files
import java.util.concurrent.Executors
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}
import graft.sources.rest.CatalogServer

/** Cross-client REST commit races — the reference's actual
  * multi-engine write topology (docker-compose.yml: Spark AND Trino
  * writing through one catalog service). TWO independent HTTP
  * attachments plus the OWNING engine race commits against one table:
  *
  *  - append/append/append: every lost CAS race rebases server-side —
  *    all three batches land, none vanishes, snapshot ids stay
  *    distinct and monotone;
  *  - append vs INSERT OVERWRITE: both serialize through CAS; the
  *    final state must equal ONE legal serialization (overwrite-last
  *    = only the overwrite batch; overwrite-first = overwrite batch +
  *    append batch);
  *  - DML vs DML (CoW rewrites of the same files): at most one loses,
  *    and the loser surfaces the RETRYABLE taxonomy (409 → typed
  *    ConcurrentModificationException, never a 400/500), with the
  *    final state equal to a serial order of the winners.
  *
  * Each shape runs across a seed sweep; every outcome is checked
  * against the model of legal serializations, so a lost batch, a
  * duplicated batch, or a mis-taxonomized error fails loudly.
  */
class RestRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One warehouse + server, TWO attachments (distinct catalog
    * instances over the same uri — two engines' worth of spools). */
  private def withTwoAttachments(
      f: (String, String, String) => Unit): Unit = {
    val wh = graft.GraftTmp.dir("race_wh").toString
    IceLite.createNamespace(wh, "src")
    val srv = new CatalogServer(wh).start()
    val cats = (1 to 2).map { i =>
      val c = s"race${i}_${java.util.UUID.randomUUID.toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$c",
        "graft.sources.rest.IceLiteRestCatalog")
      spark.conf.set(s"spark.sql.catalog.$c.uri", srv.uri)
      c
    }
    try f(wh, cats(0), cats(1)) finally srv.stop()
  }

  private def inParallel(tasks: Seq[() => Unit]): Seq[Option[Throwable]] = {
    val pool = Executors.newFixedThreadPool(tasks.size)
    try tasks.map(t => pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
      override def call(): Option[Throwable] =
        try { t(); None } catch { case e: Throwable => Some(e) }
    })).map(_.get())
    finally pool.shutdown()
  }

  private def isRetryable(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.isInstanceOf[java.util.ConcurrentModificationException]) return true
      c = c.getCause
    }
    false
  }

  test("append/append/append: two attachments + the owner all land, none lost") {
    (1 to 3).foreach { seed =>
      withTwoAttachments { (wh, c1, c2) =>
        val ref = TableRef(wh, "src", "t")
        IceLite.createOrReplace(ref,
          (1L to 10L).map(k => (k, k * 2.0)).toDF("k", "v"))
        val base = 100L * seed
        val errs = inParallel(Seq(
          () => spark.sql(s"INSERT INTO $c1.src.t VALUES (${base + 1}, 1.0), (${base + 2}, 2.0)"),
          () => spark.sql(s"INSERT INTO $c2.src.t VALUES (${base + 11}, 3.0), (${base + 12}, 4.0)"),
          () => { IceLite.append(ref,
            Seq((base + 21, 5.0), (base + 22, 6.0)).toDF("k", "v")); () }
        ))
        // appends rebase — NOBODY may fail
        assert(errs.flatten.isEmpty, s"[seed=$seed] append lost: ${errs.flatten}")
        val got = IceLite.read(spark, ref).select("k").as[Long].collect().toSet
        val want = (1L to 10L).toSet ++
          Set(base + 1, base + 2, base + 11, base + 12, base + 21, base + 22)
        assert(got == want, s"[seed=$seed] batch vanished or duplicated")
        // snapshot ids stay distinct + monotone (one CAS winner per id)
        val ids = IceLite.readManifest(ref).snapshots.map(_.id)
        assert(ids == ids.distinct.sorted, s"[seed=$seed] ids: $ids")
      }
    }
  }

  test("append vs INSERT OVERWRITE: the final state is one legal serialization") {
    (1 to 3).foreach { seed =>
      withTwoAttachments { (wh, c1, c2) =>
        val ref = TableRef(wh, "src", "t")
        IceLite.createOrReplace(ref,
          (1L to 10L).map(k => (k, k * 2.0)).toDF("k", "v"))
        val errs = inParallel(Seq(
          () => spark.sql(s"INSERT INTO $c1.src.t VALUES (201, 1.0), (202, 2.0)"),
          () => spark.sql(s"INSERT OVERWRITE $c2.src.t VALUES (301, 3.0)")
        ))
        assert(errs.flatten.isEmpty,
          s"[seed=$seed] append/overwrite must both serialize: ${errs.flatten}")
        val got = IceLite.read(spark, ref).select("k").as[Long].collect().toSet
        val overwriteLast = Set(301L)
        val overwriteFirst = Set(301L, 201L, 202L)
        assert(got == overwriteLast || got == overwriteFirst,
          s"[seed=$seed] not a legal serialization: $got")
      }
    }
  }

  test("DML vs DML on the same files: losers surface the retryable taxonomy") {
    (1 to 3).foreach { seed =>
      withTwoAttachments { (wh, c1, c2) =>
        val ref = TableRef(wh, "src", "t")
        IceLite.createOrReplace(ref,
          (1L to 100L).map(k => (k, 0.0)).toDF("k", "v"))
        val errs = inParallel(Seq(
          () => spark.sql(s"UPDATE $c1.src.t SET v = v + 1000 WHERE k <= 50"),
          () => spark.sql(s"UPDATE $c2.src.t SET v = v + 2000 WHERE k <= 50")
        ))
        val failed = errs.flatten
        // at most one may lose, and ONLY with the retryable taxonomy
        assert(failed.size <= 1, s"[seed=$seed] both DMLs lost: $failed")
        failed.foreach(e => assert(isRetryable(e),
          s"[seed=$seed] loser must be 409/CME-typed, got: $e"))
        // the final state equals a serial order of the WINNERS
        val sums = IceLite.read(spark, ref)
          .where($"k" <= 50).select("v").as[Double].collect()
        val delta = sums.distinct.toSet
        val legal: Set[Set[Double]] =
          if (failed.isEmpty) Set(Set(3000.0))
          else Set(Set(1000.0), Set(2000.0))
        assert(legal.contains(delta),
          s"[seed=$seed] per-key deltas not a serial order: $delta " +
            s"(failed=${failed.size})")
        // untouched keys stay untouched either way
        assert(IceLite.read(spark, ref).where($"k" > 50)
          .select("v").as[Double].collect().forall(_ == 0.0))
      }
    }
  }
}
