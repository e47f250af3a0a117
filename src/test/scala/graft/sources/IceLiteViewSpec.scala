package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.icelite.{IceLite, TableRef}

/** d74: SQL views — CREATE/REPLACE/DROP/SHOW through the parser
  * intercept, reads through the substitution rule, the ViewCatalog
  * API face, and the honesty contract: a view re-resolves its SQL at
  * every read, so underlying evolution flows through and a view over
  * a dropped column fails at read time. */
class IceLiteViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(): (String, String) = {
    val wh = graft.GraftTmp.dir("view_wh").toString
    val name = s"viewcat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  private def withTable(f: (String, String, TableRef) => Unit): Unit = {
    val (cat, wh) = freshCatalog()
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    IceLite.createOrReplace(ref,
      (1L to 100L).map(k => (k, k * 2.0, s"g${k % 3}")).toDF("k", "v", "g"))
    f(cat, wh, ref)
  }

  test("CREATE VIEW / SELECT / DROP round-trip") {
    withTable { (cat, _, _) =>
      spark.sql(s"CREATE VIEW $cat.src.v AS " +
        s"SELECT g, count(*) AS n FROM $cat.src.t GROUP BY g")
      val got = spark.sql(s"SELECT * FROM $cat.src.v ORDER BY g")
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("g0", 33L), ("g1", 34L), ("g2", 33L)))
      spark.sql(s"DROP VIEW $cat.src.v")
      val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.src.v"))
      assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    }
  }

  test("view re-resolves: underlying evolution flows through") {
    withTable { (cat, _, ref) =>
      spark.sql(s"CREATE VIEW $cat.src.stars AS SELECT * FROM $cat.src.t")
      assert(spark.sql(s"SELECT * FROM $cat.src.stars").columns.toSeq ==
        Seq("k", "v", "g"))
      // evolve the base table AFTER the view exists
      spark.sql(s"ALTER TABLE $cat.src.t ADD COLUMN extra INT")
      assert(spark.sql(s"SELECT * FROM $cat.src.stars").columns.toSeq ==
        Seq("k", "v", "g", "extra"),
        "SELECT * view must surface a column added after CREATE VIEW")
      // a view pinned to a column that then disappears fails honestly
      spark.sql(s"CREATE VIEW $cat.src.vg AS SELECT g FROM $cat.src.t")
      spark.sql(s"ALTER TABLE $cat.src.t DROP COLUMN g")
      val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.src.vg").collect())
      assert(e.getMessage.contains("g"),
        s"read of a view over a dropped column must name the column: ${e.getMessage}")
      spark.sql(s"DROP VIEW $cat.src.vg")
      spark.sql(s"DROP VIEW $cat.src.stars")
    }
  }

  test("CREATE OR REPLACE swaps atomically; IF NOT EXISTS is a no-op") {
    withTable { (cat, _, _) =>
      spark.sql(s"CREATE VIEW $cat.src.v AS SELECT 1 AS one")
      intercept[Exception](
        spark.sql(s"CREATE VIEW $cat.src.v AS SELECT 2 AS two"))
      spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.src.v AS SELECT 2 AS two")
      assert(spark.sql(s"SELECT * FROM $cat.src.v").columns.toSeq == Seq("one"))
      spark.sql(s"CREATE OR REPLACE VIEW $cat.src.v AS SELECT 2 AS two")
      assert(spark.sql(s"SELECT * FROM $cat.src.v").columns.toSeq == Seq("two"))
      spark.sql(s"DROP VIEW $cat.src.v")
    }
  }

  test("nested views expand; cycles refuse; inserts refuse") {
    withTable { (cat, _, _) =>
      spark.sql(s"CREATE VIEW $cat.src.v1 AS SELECT k FROM $cat.src.t WHERE k > 90")
      spark.sql(s"CREATE VIEW $cat.src.v2 AS SELECT count(*) AS n FROM $cat.src.v1")
      assert(spark.sql(s"SELECT n FROM $cat.src.v2").head.getLong(0) == 10L)
      // redefinition creating a cycle is caught at read
      spark.sql(s"CREATE OR REPLACE VIEW $cat.src.v1 AS SELECT n AS k FROM $cat.src.v2")
      val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.src.v1").collect())
      assert(e.getMessage.contains("RECURSIVE_VIEW"))
      val e2 = intercept[Exception](
        spark.sql(s"INSERT INTO $cat.src.v2 VALUES (1)"))
      assert(e2.getMessage.contains("view"))
      spark.sql(s"DROP VIEW $cat.src.v1")
      spark.sql(s"DROP VIEW $cat.src.v2")
    }
  }

  test("column aliases, SHOW VIEWS, DESCRIBE, SHOW CREATE TABLE") {
    withTable { (cat, _, _) =>
      spark.sql(s"CREATE VIEW $cat.src.va (kk, vv) AS " +
        s"SELECT k, v FROM $cat.src.t WHERE k <= 2")
      assert(spark.sql(s"SELECT kk, vv FROM $cat.src.va ORDER BY kk")
        .as[(Long, Double)].collect().toSeq == Seq((1L, 2.0), (2L, 4.0)))
      val shown = spark.sql(s"SHOW VIEWS IN $cat.src").collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
      assert(shown == Seq(("src", "va", false)))
      assert(spark.sql(s"SHOW VIEWS IN $cat.src LIKE 'nope*'").count() == 0)
      val desc = spark.sql(s"DESCRIBE $cat.src.va").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(desc == Seq(("kk", "bigint"), ("vv", "double")))
      val ddl = spark.sql(s"SHOW CREATE TABLE $cat.src.va").head.getString(0)
      assert(ddl.startsWith(s"CREATE VIEW $cat.src.va (kk, vv) AS"))
      assert(ddl.contains("SELECT k, v FROM"))
      spark.sql(s"DROP VIEW $cat.src.va")
    }
  }

  test("short names resolve through USE; relative names in the body re-qualify") {
    withTable { (cat, _, _) =>
      spark.sql(s"USE $cat.src")
      try {
        // body uses the bare table name; stored context re-qualifies it
        spark.sql("CREATE VIEW vshort AS SELECT max(k) AS mx FROM t")
        assert(spark.sql("SELECT mx FROM vshort").head.getLong(0) == 100L)
        // read from a DIFFERENT context still works (stored context wins)
        spark.sql("USE spark_catalog.default")
        assert(spark.sql(s"SELECT mx FROM $cat.src.vshort").head.getLong(0) == 100L)
        spark.sql(s"DROP VIEW $cat.src.vshort")
      } finally spark.sql("USE spark_catalog.default")
    }
  }

  test("CTE names inside a view body are not mis-qualified") {
    withTable { (cat, _, _) =>
      spark.sql(s"CREATE VIEW $cat.src.vcte AS " +
        s"WITH t AS (SELECT 42 AS k) SELECT k FROM t")
      // `t` in the body is the CTE, NOT $cat.src.t
      assert(spark.sql(s"SELECT k FROM $cat.src.vcte").head.getInt(0) == 42)
      spark.sql(s"DROP VIEW $cat.src.vcte")
    }
  }

  test("ALTER VIEW AS and SET/UNSET TBLPROPERTIES") {
    withTable { (cat, wh, _) =>
      spark.sql(s"CREATE VIEW $cat.src.v AS SELECT 1 AS a")
      spark.sql(s"ALTER VIEW $cat.src.v SET TBLPROPERTIES ('x'='1','y'='2')")
      spark.sql(s"ALTER VIEW $cat.src.v UNSET TBLPROPERTIES ('y')")
      val stored = IceLiteViews.load(wh, "src", "v").get
      assert(stored.properties == Map("x" -> "1"))
      spark.sql(s"ALTER VIEW $cat.src.v AS SELECT 2 AS b")
      assert(spark.sql(s"SELECT * FROM $cat.src.v").columns.toSeq == Seq("b"))
      // ALTER AS keeps properties (Spark's contract)
      assert(IceLiteViews.load(wh, "src", "v").get.properties == Map("x" -> "1"))
      spark.sql(s"DROP VIEW $cat.src.v")
    }
  }

  test("ViewCatalog API face: list/exists/rename; name collisions refuse") {
    withTable { (cat, wh, _) =>
      import org.apache.spark.sql.connector.catalog.Identifier
      val plugin = org.apache.spark.sql.graft.Bridge
        .catalogPlugin(spark, cat).asInstanceOf[IceLiteCatalog]
      spark.sql(s"CREATE VIEW $cat.src.v AS SELECT 1 AS a")
      assert(plugin.viewExists(Identifier.of(Array("src"), "v")))
      assert(plugin.listViews("src").map(_.name).toSeq == Seq("v"))
      // a view may not shadow a table, nor rename onto one
      intercept[Exception](
        spark.sql(s"CREATE VIEW $cat.src.t AS SELECT 1 AS a"))
      plugin.renameView(Identifier.of(Array("src"), "v"),
        Identifier.of(Array("src"), "w"))
      assert(plugin.listViews("src").map(_.name).toSeq == Seq("w"))
      assert(spark.sql(s"SELECT a FROM $cat.src.w").head.getInt(0) == 1)
      assert(plugin.dropView(Identifier.of(Array("src"), "w")))
      // the _views sidecar dir never surfaces as a table
      assert(!spark.sql(s"SHOW TABLES IN $cat.src").collect()
        .exists(_.getString(1) == "_views"))
    }
  }

  test("concurrent CREATE VIEW: exactly one winner") {
    withTable { (cat, wh, _) =>
      import java.util.concurrent.{CountDownLatch, Executors}
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val tasks = (1 to 4).map { i =>
        pool.submit(new Runnable { override def run(): Unit = {
          start.await()
          try {
            spark.sql(s"CREATE VIEW $cat.src.race AS SELECT $i AS winner")
            wins.incrementAndGet()
          } catch { case _: Exception => () }
        }})
      }
      start.countDown(); tasks.foreach(_.get()); pool.shutdown()
      assert(wins.get() == 1, s"expected exactly 1 CREATE winner, got ${wins.get()}")
      val w = spark.sql(s"SELECT winner FROM $cat.src.race").head.getInt(0)
      assert((1 to 4).contains(w))
      spark.sql(s"DROP VIEW $cat.src.race")
    }
  }

  test("check_views: a table rename surfaces broken views at CALL time, not at 2am") {
    withTable { (cat, wh, _) =>
      IceLite.createNamespace(wh, "other")
      spark.sql(s"CREATE VIEW $cat.src.healthy AS " +
        s"SELECT count(*) AS n FROM $cat.src.t")
      spark.sql(s"CREATE VIEW $cat.src.doomed AS " +
        s"SELECT k FROM $cat.src.t WHERE k > 90")
      spark.sql(s"CREATE VIEW $cat.other.remote AS " +
        s"SELECT max(k) AS mx FROM $cat.src.t")
      def check(ns: String = ""): Seq[(String, String, Boolean, String)] = {
        val arg = if (ns.isEmpty) "" else s"namespace => '$ns'"
        spark.sql(s"CALL $cat.system.check_views($arg)").collect()
          .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
            Option(r.getString(3)).getOrElse(""))).toSeq.sortBy(t => (t._1, t._2))
      }
      // all healthy before the rename; default arg scans every namespace
      assert(check().map(t => (t._1, t._2, t._3)) == Seq(
        ("other", "remote", true), ("src", "doomed", true),
        ("src", "healthy", true)))
      // d81: rename does NOT rewrite stored view SQL (Hive/Iceberg
      // admin-op semantics) — every view naming the old table breaks
      spark.sql(s"ALTER TABLE $cat.src.t RENAME TO src.t2")
      val after = check()
      assert(after.map(t => (t._1, t._2, t._3)) == Seq(
        ("other", "remote", false), ("src", "doomed", false),
        ("src", "healthy", false)))
      assert(after.filterNot(_._3).forall(_._4.nonEmpty),
        s"broken views must carry the analyzer error: $after")
      // namespace-scoped call sees only that namespace
      assert(check("other").map(_._2) == Seq("remote"))
      // the operator repoints ONE view; only it recovers
      spark.sql(s"CREATE OR REPLACE VIEW $cat.src.healthy AS " +
        s"SELECT count(*) AS n FROM $cat.src.t2")
      assert(check("src").map(t => (t._2, t._3)) == Seq(
        ("doomed", false), ("healthy", true)))
      Seq(s"$cat.src.healthy", s"$cat.src.doomed", s"$cat.other.remote")
        .foreach(v => spark.sql(s"DROP VIEW $v"))
    }
  }

  test("plan audit: filters and projection push through a view into the scan") {
    withTable { (cat, _, _) =>
      spark.sql(s"CREATE VIEW $cat.src.vplan AS SELECT k, v, g FROM $cat.src.t")
      val plan = spark.sql(s"SELECT k FROM $cat.src.vplan WHERE k = 42")
        .queryExecution.executedPlan.toString
      // the view is pure metadata at plan time: the physical plan ends
      // in the SAME pruned IceLite scan a direct query gets — only the
      // projected column in the read schema, manifest pruning engaged
      val scanLine = plan.linesIterator.find(_.contains("BatchScan"))
        .getOrElse(fail(s"no BatchScan in plan:\n$plan"))
      assert(scanLine.contains("prunedOn=k"),
        s"manifest pruning must engage through the view: $scanLine")
      assert(!scanLine.contains("v#") && !scanLine.contains("g#"),
        s"projection must prune unread view columns: $scanLine")
      spark.sql(s"DROP VIEW $cat.src.vplan")
    }
  }
}
