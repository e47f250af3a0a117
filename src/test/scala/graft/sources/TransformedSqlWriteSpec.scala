package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.icelite.{IceLite, PartitionField, TableRef}

/** d84 — SQL writes into HIDDEN-PARTITION (d56 transform) tables.
  *
  * The invariant that makes the SQL face safe: the per-row writer
  * derives value dirs with the SAME functions the engine API stages
  * through, so both paths land byte-compatible layouts and the shared
  * prune-side literal mapping keeps working. Asserted by appending
  * identical rows through BOTH faces into twin tables and comparing
  * the landed dir sets exactly — including nulls (days/truncate null
  * → the Hive default dir; bucket null → murmur3-of-null's REAL
  * bucket, the same one functions.hash assigns). */
class TransformedSqlWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): (String, String) = {
    val wh = graft.GraftTmp.dir("tsql_wh").toString
    IceLite.createNamespace(wh, "src")
    val cat = s"tscat_${java.util.UUID.randomUUID.toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def sampleDf(lo: Long, hi: Long) = (lo to hi).map { i =>
    (i, s"user_${i % 7}", f"2024-01-${(i % 9 + 1)}%02d 10:00:00")
  }.toDF("id", "who", "ts_s")
    .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")

  private val spec = Seq(
    PartitionField("id_bucket", "bucket", "id", 4),
    PartitionField("day", "days", "ts"),
    PartitionField("who_t", "truncate", "who", 6))

  /** value dirs (the derived layout) of a file path */
  private def dirsOf(f: String): String =
    f.split('/').dropRight(1).filter(_.contains('=')).mkString("/")

  test("SQL INSERT INTO lands the same derived dirs as the engine API (all three transforms)") {
    val (cat, wh) = fresh()
    val sqlRef = TableRef(wh, "src", "tsql")
    val apiRef = TableRef(wh, "src", "tapi")
    IceLite.createOrReplaceTransformed(sqlRef, sampleDf(1, 40), spec)
    IceLite.createOrReplaceTransformed(apiRef, sampleDf(1, 40), spec)

    // identical new rows through both faces — including null source
    // values for every transform kind
    val batch = sampleDf(41, 80)
      .union(Seq((900L, null: String, null: String)).toDF("id", "who", "ts_s")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
        .select("id", "who", "ts"))
    batch.createOrReplaceTempView("tsql_batch")
    spark.sql(s"INSERT INTO $cat.src.tsql SELECT id, who, ts FROM tsql_batch")
    IceLite.appendTransformed(apiRef, batch)

    val sqlDirs = IceLite.readManifest(sqlRef).current.files.map(dirsOf).toSet
    val apiDirs = IceLite.readManifest(apiRef).current.files.map(dirsOf).toSet
    assert(sqlDirs == apiDirs,
      s"SQL and engine-API layouts diverged:\nsql-only: ${sqlDirs -- apiDirs}" +
        s"\napi-only: ${apiDirs -- sqlDirs}")
    assert(sqlDirs.exists(_.contains("day=__HIVE_DEFAULT_PARTITION__")),
      "null days source must land in the Hive default dir")

    // logical content identical through both faces
    val got = spark.sql(
      s"SELECT id, who, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS t " +
        s"FROM $cat.src.tsql ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = IceLite.read(spark, apiRef)
      .select($"id", $"who", date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("t"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == want)

    // source columns STAY in the data pages; derived names never enter
    val cols = spark.sql(s"SELECT * FROM $cat.src.tsql").columns.toSet
    assert(cols == Set("id", "who", "ts"), cols)
  }

  test("prune-through-transforms stays exact after a SQL append") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "tp")
    IceLite.createOrReplaceTransformed(ref, sampleDf(1, 60), spec)
    sampleDf(61, 120).createOrReplaceTempView("tp_new")
    spark.sql(s"INSERT INTO $cat.src.tp SELECT id, who, ts FROM tp_new")
    import graft.icelite.IceLite.SourceIn
    (1L to 12L).foreach { k =>
      val pruned = IceLite.readTransformPruned(spark, ref,
        Seq(SourceIn("id", Seq(k))), $"id" === k)
        .select("id").as[Long].collect().sorted.toSeq
      val full = IceLite.read(spark, ref).filter($"id" === k)
        .select("id").as[Long].collect().sorted.toSeq
      assert(pruned == full, s"key $k diverged after the SQL append")
      val kept = IceLite.transformPrunedFiles(ref, Seq(SourceIn("id", Seq(k))))
      assert(kept.size < IceLite.readManifest(ref).current.files.size,
        s"key $k pruned nothing")
    }
  }

  test("INSERT OVERWRITE truncates; PARTITION clauses and streaming refuse") {
    val (cat, wh) = fresh()
    val ref = TableRef(wh, "src", "tow")
    IceLite.createOrReplaceTransformed(ref, sampleDf(1, 30), spec)
    sampleDf(200, 205).createOrReplaceTempView("tow_new")
    spark.sql(s"INSERT OVERWRITE $cat.src.tow SELECT id, who, ts FROM tow_new")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.tow").head.getLong(0) == 6L)
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionSpec == spec, "spec marker must survive overwrite")
    assert(snap.files.forall(f =>
      f.contains("id_bucket=") && f.contains("day=") && f.contains("who_t=")))

    // a PARTITION clause names derived values — refuse loudly
    val e = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE $cat.src.tow PARTITION (id_bucket = '1') " +
        "SELECT id, who, ts FROM tow_new"))
    assert(e.getMessage != null &&
      (e.getMessage.contains("hidden-partition") ||
        e.getMessage.contains("PARTITION")), e.getMessage)

    // maintenance composes: compaction re-derives the layout on the
    // SQL-written files too
    val compacted = IceLite.compact(spark, ref)
    assert(compacted.partitionSpec == spec)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.tow").head.getLong(0) == 6L)
  }

  test("CREATE TABLE PARTITIONED BY transforms + CTAS: the full SQL lifecycle") {
    val (cat, wh) = fresh()
    // DDL-born hidden-partition table: empty read, then INSERT lands
    // the derived layout under Iceberg-convention names
    spark.sql(s"""CREATE TABLE $cat.src.ddl_t (
      id BIGINT, who STRING, ts TIMESTAMP)
      PARTITIONED BY (bucket(4, id), days(ts), truncate(6, who))""")
    val ref = TableRef(wh, "src", "ddl_t")
    assert(IceLite.readManifest(ref).current.partitionSpec ==
      Seq(PartitionField("id_bucket", "bucket", "id", 4),
        PartitionField("ts_day", "days", "ts", 0),
        PartitionField("who_trunc", "truncate", "who", 6)))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.ddl_t").head.getLong(0) == 0L)
    // schema is EXACTLY as declared — no derived names, no reorder
    assert(spark.table(s"$cat.src.ddl_t").columns.toSeq ==
      Seq("id", "who", "ts"))
    sampleDf(1, 25).createOrReplaceTempView("ddl_src")
    spark.sql(s"INSERT INTO $cat.src.ddl_t SELECT id, who, ts FROM ddl_src")
    val snap = IceLite.readManifest(ref).current
    assert(snap.files.nonEmpty && snap.files.forall(f =>
      f.contains("id_bucket=") && f.contains("ts_day=") &&
        f.contains("who_trunc=")), snap.files)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.ddl_t").head.getLong(0) == 25L)

    // CTAS with a transform spec: atomic create, derived layout landed
    spark.sql(s"""CREATE TABLE $cat.src.ctas_t
      PARTITIONED BY (bucket(4, id)) AS
      SELECT id, who, ts FROM ddl_src WHERE id <= 10""")
    val cref = TableRef(wh, "src", "ctas_t")
    val csnap = IceLite.readManifest(cref).current
    assert(csnap.partitionSpec ==
      Seq(PartitionField("id_bucket", "bucket", "id", 4)))
    assert(csnap.files.nonEmpty && csnap.files.forall(_.contains("id_bucket=")))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.ctas_t").head.getLong(0) == 10L)
    // CTAS dirs agree with the INSERT path's derivation for the same rows
    val fromDdl = IceLite.readManifest(ref).current.files
      .filter(_.contains("id_bucket=")).map(f =>
        f.split('/').find(_.startsWith("id_bucket=")).get).toSet
    val fromCtas = csnap.files.map(f =>
      f.split('/').find(_.startsWith("id_bucket=")).get).toSet
    assert(fromCtas.subsetOf(fromDdl))

    // mixed identity+transform refuses loudly
    val mixed = intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.src.mix_t (id BIGINT, who STRING)
          PARTITIONED BY (who, bucket(4, id))"""))
    assert(mixed.getMessage.contains("mix"), mixed.getMessage)
  }

  test("SQL DELETE/UPDATE/MERGE on a hidden-partition table preserve spec + layout") {
    // the row-level (ReplaceData) path on a transform table: rewritten
    // rows must re-derive their value dirs and the committed snapshot
    // must CARRY partitionSpec — dropping either silently ends
    // transform pruning (found by TransformModelFuzzSpec seed 5)
    val (cat, wh) = fresh()
    spark.sql(s"""CREATE TABLE $cat.src.rl_t (id BIGINT, who STRING, v DOUBLE)
                  PARTITIONED BY (bucket(4, id))""")
    (0L to 19L).map(i => (i, s"u${i % 3}", i * 1.0)).toDF("id", "who", "v")
      .createOrReplaceTempView("rl_src")
    spark.sql(s"INSERT INTO $cat.src.rl_t SELECT id, who, v FROM rl_src")
    val ref = TableRef(wh, "src", "rl_t")
    val specNames = Seq("id_bucket")

    def assertLayout(label: String): Unit = {
      val snap = IceLite.readManifest(ref).current
      assert(snap.partitionSpec.map(_.name) == specNames,
        s"$label: snapshot lost the transform spec (${snap.partitionSpec})")
      assert(snap.files.forall(f => f.contains("id_bucket=")),
        s"$label: rewrite landed files outside the layout: ${snap.files}")
    }

    // DELETE with a non-pushable predicate → row-level ReplaceData
    spark.sql(s"DELETE FROM $cat.src.rl_t WHERE id % 5 = 0")
    assertLayout("delete")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.rl_t").head.getLong(0) == 16L)

    // UPDATE → row-level ReplaceData
    spark.sql(s"UPDATE $cat.src.rl_t SET v = v + 100 WHERE id % 2 = 1")
    assertLayout("update")
    assert(spark.sql(
        s"SELECT SUM(v) FROM $cat.src.rl_t WHERE id % 2 = 1").head.getDouble(0)
      == (0L to 19L).filter(i => i % 5 != 0 && i % 2 == 1)
        .map(_ * 1.0 + 100).sum)

    // MERGE → row-level ReplaceData (upsert: update one, insert one)
    Seq((1L, "u9", 0.5), (100L, "u9", 9.9)).toDF("id", "who", "v")
      .createOrReplaceTempView("rl_upd")
    spark.sql(s"""MERGE INTO $cat.src.rl_t t USING rl_upd s ON t.id = s.id
                  WHEN MATCHED THEN UPDATE SET t.v = s.v, t.who = s.who
                  WHEN NOT MATCHED THEN INSERT (id, who, v) VALUES (s.id, s.who, s.v)""")
    assertLayout("merge")
    val got = spark.sql(
        s"SELECT who, v FROM $cat.src.rl_t WHERE id IN (1, 100) ORDER BY id")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("u9", 0.5), ("u9", 9.9)), got)

    // transform pruning still exact after all three rewrites
    import graft.icelite.IceLite.SourceIn
    val probe = Seq(3L, 100L)
    val pruned = IceLite.readTransformPruned(spark, ref,
        Seq(SourceIn("id", probe)), col("id").isin(probe: _*)).count()
    val full = spark.sql(
      s"SELECT COUNT(*) FROM $cat.src.rl_t WHERE id IN (3, 100)").head.getLong(0)
    assert(pruned == full && full == 2L, s"pruned=$pruned full=$full")
  }

  test("an EMPTIED table keeps its schema: filters and pruned reads still analyze") {
    // tf fuzz seed 6021: deleting every row left a files-empty
    // snapshot and IceLite.read answered a ZERO-COLUMN emptyDataFrame
    // — `WHERE k = 1` became an analysis error. DDL-born tables now
    // answer their declared schema when empty.
    import graft.icelite.IceLite.SourceIn
    val (cat, wh) = fresh()
    spark.sql(s"""CREATE TABLE $cat.src.em (k BIGINT, v DOUBLE)
                  PARTITIONED BY (bucket(4, k))""")
    spark.sql(s"INSERT INTO $cat.src.em VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"DELETE FROM $cat.src.em WHERE k > 0")
    val ref = TableRef(wh, "src", "em")
    val df = IceLite.read(spark, ref)
    assert(df.schema.fieldNames.toSeq == Seq("k", "v"),
      s"emptied table lost its schema: ${df.schema}")
    assert(df.filter(col("k") === 1L).count() == 0L)
    assert(IceLite.readTransformPruned(spark, ref,
      Seq(SourceIn("k", Seq(1L))), col("k") === 1L).count() == 0L)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.src.em WHERE k = 1").head.getLong(0) == 0L)
  }
}
