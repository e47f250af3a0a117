package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}
import graft.sources.rest.CatalogServer

/** The multi-engine catalog face (d75): a CatalogServer serving
  * metadata over HTTP + IceLiteRestCatalog attaching with nothing but
  * the uri — the reference's REST-catalog architecture (one catalog
  * service, engines share storage). Reads must be byte-identical to
  * the direct path, every scan feature intact; writes refuse. */
class RestCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withServer(f: (String, String, CatalogServer) => Unit): Unit = {
    val wh = Files.createTempDirectory("restspec_wh").toString
    IceLite.createNamespace(wh, "src")
    val srv = new CatalogServer(wh).start()
    val cat = s"restcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.rest.IceLiteRestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.uri", srv.uri)
    try f(wh, cat, srv) finally srv.stop()
  }

  test("REST reads equal direct reads; metadata travels over HTTP") {
    withServer { (wh, cat, srv) =>
      val ref = TableRef(wh, "src", "t")
      IceLite.createOrReplace(ref,
        (1L to 100L).map(k => (k, k * 2.0)).toDF("k", "v"), statsCols = Seq("k"))
      val before = srv.requests.get
      val got = spark.sql(s"SELECT k, v FROM $cat.src.t WHERE k <= 3 ORDER BY k")
        .as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)))
      assert(srv.requests.get > before, "metadata must travel over HTTP")
      // manifest stats pruning survives the wire: the spooled manifest
      // carries fileStats, so the scan prunes exactly like the direct path
      val plan = spark.sql(s"SELECT k FROM $cat.src.t WHERE k = 42")
        .queryExecution.executedPlan.toString
      assert(plan.contains("prunedOn=k"), s"stats pruning lost over REST: $plan")
      assert(spark.sql(s"SHOW TABLES IN $cat.src").collect()
        .map(_.getString(1)).toSeq == Seq("t"))
      assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
        .map(_.getString(0)).toSeq.contains("src"))
    }
  }

  test("partitioned tables and live MoR sidecars read intact over REST") {
    withServer { (wh, cat, _) =>
      IceLite.createOrReplacePartitioned(TableRef(wh, "src", "p"),
        (1L to 90L).map(k => (k, (k % 3).toString)).toDF("k", "p"), "p")
      assert(spark.sql(s"SELECT count(*) FROM $cat.src.p").head.getLong(0) == 90)
      assert(spark.sql(s"SELECT count(*) FROM $cat.src.p WHERE p = '1'")
        .head.getLong(0) == 30)
      // eq-delete-live CDC table: the wire manifest carries the sidecar
      // refs; the spool's deletes/ mount resolves them
      val m = TableRef(wh, "src", "m")
      IceLite.createOrReplace(m, (1L to 10L).map(k => (k, s"r$k")).toDF("k", "s"))
      IceLite.deleteByKeysMoR(spark, m, Seq(3L, 5L).toDF("k"), Seq("k"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.src.m").head.getLong(0) == 8)
      assert(spark.sql(s"SELECT s FROM $cat.src.m WHERE k = 4").head.getString(0) == "r4")
    }
  }

  test("a new commit is visible on the next query (version-keyed spool)") {
    withServer { (wh, cat, _) =>
      val ref = TableRef(wh, "src", "t")
      IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 1)
      IceLite.append(ref, Seq((2L, "b")).toDF("k", "s"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 2,
        "the REST face must re-resolve the current version per query")
    }
  }

  test("INSERT INTO commits through the REST protocol; both faces see it") {
    withServer { (wh, cat, srv) =>
      val ref = TableRef(wh, "src", "t")
      IceLite.createOrReplace(ref, Seq((1L, "a")).toDF("k", "s"))
      val req0 = srv.requests.get
      spark.sql(s"INSERT INTO $cat.src.t VALUES (2, 'remote')")
      assert(srv.requests.get > req0, "the commit must cross HTTP")
      // the OWNING engine sees the remote append (one shared history)
      assert(IceLite.read(spark, ref).as[(Long, String)].collect().toMap ==
        Map(1L -> "a", 2L -> "remote"))
      // and a subsequent LOCAL append is seen back through REST —
      // concurrent writers share one CAS lineage
      IceLite.append(ref, Seq((3L, "local")).toDF("k", "s"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.src.t").head.getLong(0) == 3)
      val m = IceLite.readManifest(ref)
      assert(m.snapshots.map(_.operation).count(_ == "append") == 2)
    }
  }

  test("history rewrites refuse with a pointer at the owning catalog") {
    withServer { (wh, cat, _) =>
      IceLite.createOrReplace(TableRef(wh, "src", "t"),
        Seq((1L, "a")).toDF("k", "s"))
      def refused(sql: String): Unit = {
        val e = intercept[Exception](spark.sql(sql).collect())
        val msg = e.getMessage.toLowerCase
        // either our explicit refusal or Spark's own capability check
        // (no truncate/overwrite support advertised, so the analyzer
        // rejects natively — equally loud, equally safe)
        assert(msg.contains("read-only") || msg.contains("refused") ||
          msg.contains("owning catalog") || msg.contains("does not support"),
          s"'$sql' should refuse, got: ${e.getMessage.take(150)}")
      }
      refused(s"INSERT OVERWRITE $cat.src.t VALUES (9, 'x')")
      refused(s"DELETE FROM $cat.src.t WHERE k = 1")
      refused(s"UPDATE $cat.src.t SET s = 'y' WHERE k = 1")
      refused(s"DROP TABLE $cat.src.t")
      refused(s"CREATE TABLE $cat.src.t2 (k BIGINT)")
      refused(s"ALTER TABLE $cat.src.t ADD COLUMN c INT")
      // and the data is untouched
      assert(IceLite.read(spark, TableRef(wh, "src", "t")).count() == 1)
    }
  }

  test("missing tables and namespaces map to the standard errors") {
    withServer { (_, cat, _) =>
      val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.src.nope"))
      assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
      val e2 = intercept[Exception](spark.sql(s"SHOW TABLES IN $cat.missing"))
      assert(e2.getMessage.contains("SCHEMA_NOT_FOUND") ||
        e2.getMessage.toLowerCase.contains("namespace"))
    }
  }

  test("views defined by the owning engine are queryable through REST") {
    withServer { (wh, cat, _) =>
      val ref = TableRef(wh, "src", "t")
      IceLite.createOrReplace(ref,
        (1L to 100L).map(k => (k, (k % 5).toString)).toDF("k", "g"))
      // the OWNING catalog (a different alias) defines the dbt models
      val owner = s"owner_${java.util.UUID.randomUUID.toString.take(8)}"
      spark.conf.set(s"spark.sql.catalog.$owner",
        classOf[IceLiteCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$owner.warehouse", wh)
      // body uses RELATIVE names: the attachment must re-qualify them
      // through ITS OWN alias (the stored catalog name is not
      // registered on a real second engine)
      spark.sql(s"USE $owner.src")
      try {
        spark.sql("CREATE VIEW g_stats AS SELECT g, count(*) AS n FROM t GROUP BY g")
        spark.sql("CREATE VIEW busy AS SELECT g, n FROM g_stats WHERE n >= 20")
      } finally spark.sql("USE spark_catalog.default")
      // drop the owner alias entirely — the attachment is on its own
      spark.conf.unset(s"spark.sql.catalog.$owner")
      val got = spark.sql(s"SELECT g, n FROM $cat.src.busy ORDER BY g")
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("0", 20L), ("1", 20L), ("2", 20L), ("3", 20L), ("4", 20L)))
      assert(spark.sql(s"SHOW VIEWS IN $cat.src").collect()
        .map(_.getString(1)).sorted.toSeq == Seq("busy", "g_stats"))
      // a dbt re-run (CREATE OR REPLACE via the warehouse) flows through
      IceLiteViews.write(wh, "src", "busy", IceLiteViews.load(wh, "src", "busy")
        .get.copy(sql = "SELECT g, n FROM g_stats WHERE n > 1000"), replace = true)
      assert(spark.sql(s"SELECT * FROM $cat.src.busy").count() == 0)
      // view DDL refuses on the attachment
      val e = intercept[Exception](
        spark.sql(s"CREATE VIEW $cat.src.v2 AS SELECT 1 AS one"))
      assert(e.getMessage.toLowerCase.contains("read-only") ||
        e.getMessage.toLowerCase.contains("owning catalog") ||
        e.getMessage.toLowerCase.contains("does not support"),
        s"view DDL must refuse on the REST face: ${e.getMessage.take(150)}")
    }
  }
}
