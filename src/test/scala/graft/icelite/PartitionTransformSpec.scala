package graft.icelite

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.icelite.IceLite.{SourceDayRange, SourceIn}

/** d56 — hidden partitioning (Iceberg partition transforms).
  *
  * The invariants that make "hidden" partitioning safe:
  *  - write-side layout and prune-side literal mapping share ONE
  *    bucket function (a mismatch silently loses rows, the worst
  *    failure mode a pruner can have) — asserted by comparing every
  *    pruned read against the plain full-scan filter;
  *  - the data files keep the source columns and never gain the
  *    derived ones;
  *  - rewrites (merge) and compaction re-derive the layout and keep
  *    the spec marker; flat appends/WAP refuse instead of stranding
  *    files outside the layout.
  */
class PartitionTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRef(name: String): TableRef = {
    val wh = graft.GraftTmp.dir("pt_spec").toString
    IceLite.createNamespace(wh, "src")
    TableRef(wh, "src", name)
  }

  private def sampleDf = (1L to 400L).map { i =>
    (i, s"user_${i % 7}", f"2024-01-${(i % 9 + 1)}%02d 10:00:00")
  }.toDF("id", "who", "ts_s")
    .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")

  test("bucket pruning returns exactly the full-scan filter result for every key") {
    val ref = freshRef("bkt")
    val spec = Seq(PartitionField("id_bucket", "bucket", "id", 4))
    IceLite.createOrReplaceTransformed(ref, sampleDf, spec)
    val all = IceLite.readManifest(ref).current.files
    assert(all.forall(_.contains("id_bucket=")))
    (1L to 20L).foreach { k =>
      val pruned = IceLite.readTransformPruned(spark, ref,
        Seq(SourceIn("id", Seq(k))), $"id" === k)
      val expect = IceLite.read(spark, ref).filter($"id" === k)
      assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
        expect.select("id").as[Long].collect().sorted.toSeq, s"key $k")
      // and it actually pruned: one bucket of four
      val kept = IceLite.transformPrunedFiles(ref, Seq(SourceIn("id", Seq(k))))
      assert(kept.size < all.size, s"key $k kept ${kept.size}/${all.size}")
    }
  }

  test("days range pruning is inclusive on both boundary days and exact") {
    val ref = freshRef("days")
    val spec = Seq(PartitionField("ts_day", "days", "ts", 0))
    IceLite.createOrReplaceTransformed(ref, sampleDf, spec)
    val all = IceLite.readManifest(ref).current.files
    val kept = IceLite.transformPrunedFiles(ref,
      Seq(SourceDayRange("ts", "2024-01-03", "2024-01-05")))
    assert(kept.nonEmpty && kept.size < all.size)
    assert(kept.forall { f =>
      val day = f.split('/').find(_.startsWith("ts_day=")).get.drop(7)
      day >= "2024-01-03" && day <= "2024-01-05"
    })
    val pruned = IceLite.readTransformPruned(spark, ref,
      Seq(SourceDayRange("ts", "2024-01-03", "2024-01-05")),
      $"ts" >= "2024-01-03" && $"ts" < "2024-01-06")
    val expect = IceLite.read(spark, ref)
      .filter($"ts" >= "2024-01-03" && $"ts" < "2024-01-06")
    assert(pruned.count() == expect.count() && pruned.count() > 0)
  }

  test("truncate transform prunes string prefixes; multi-field specs intersect") {
    val ref = freshRef("multi")
    val spec = Seq(
      PartitionField("who_pfx", "truncate", "who", 6), // "user_0".."user_6"
      PartitionField("ts_day", "days", "ts", 0))
    IceLite.createOrReplaceTransformed(ref, sampleDf, spec)
    val all = IceLite.readManifest(ref).current.files
    val kept = IceLite.transformPrunedFiles(ref, Seq(
      SourceIn("who", Seq("user_3xyz")), // truncates to user_3
      SourceDayRange("ts", "2024-01-02", "2024-01-03")))
    assert(kept.nonEmpty && kept.size < all.size)
    assert(kept.forall(f => f.contains("who_pfx=user_3") &&
      (f.contains("ts_day=2024-01-02") || f.contains("ts_day=2024-01-03"))))
  }

  test("hidden: reads surface only source columns; files carry no derived column") {
    val ref = freshRef("hidden")
    IceLite.createOrReplaceTransformed(ref, sampleDf,
      Seq(PartitionField("id_bucket", "bucket", "id", 4)))
    val cols = IceLite.read(spark, ref).columns.toSet
    assert(cols == Set("id", "who", "ts"))
    // a predicate on a column no transform derives from refuses loudly
    val e = intercept[IllegalArgumentException] {
      IceLite.transformPrunedFiles(ref, Seq(SourceIn("who", Seq("user_1"))))
    }
    assert(e.getMessage.contains("no transform"))
  }

  test("appendTransformed lands in the same layout; flat append and WAP refuse") {
    val ref = freshRef("app")
    val spec = Seq(PartitionField("id_bucket", "bucket", "id", 4))
    IceLite.createOrReplaceTransformed(ref,
      sampleDf.filter($"id" <= 200), spec)
    IceLite.appendTransformed(ref, sampleDf.filter($"id" > 200))
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionSpec == spec)
    assert(snap.files.forall(_.contains("id_bucket=")))
    assert(IceLite.read(spark, ref).count() == 400)
    // pruning still exact across both eras
    val pruned = IceLite.readTransformPruned(spark, ref,
      Seq(SourceIn("id", Seq(150L, 350L))), $"id".isin(150L, 350L))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq == Seq(150L, 350L))
    assert(intercept[IllegalArgumentException] {
      IceLite.append(ref, sampleDf.limit(1))
    }.getMessage.contains("appendTransformed"))
    assert(intercept[IllegalArgumentException] {
      IceLite.stageBranchAppend(ref, "audit", sampleDf.limit(1))
    }.getMessage.contains("hidden-partition"))
  }

  test("merge re-derives the layout and keeps the spec marker") {
    val ref = freshRef("mrg")
    val spec = Seq(PartitionField("id_bucket", "bucket", "id", 4))
    IceLite.createOrReplaceTransformed(ref, sampleDf, spec)
    val updates = Seq((5L, "UPDATED", "2024-02-01 00:00:00"))
      .toDF("id", "who", "ts_s")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    IceLite.merge(spark, ref, updates, Seq("id"))
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionSpec == spec)
    assert(snap.files.forall(_.contains("id_bucket=")))
    val got = IceLite.readTransformPruned(spark, ref,
      Seq(SourceIn("id", Seq(5L))), $"id" === 5L)
      .select("who").as[String].collect().toSeq
    assert(got == Seq("UPDATED"))
    assert(IceLite.read(spark, ref).count() == 400)
  }

  // multi-year timestamps for the coarse time transforms: 18 months
  // across 2023-07 .. 2024-12, several hours per day
  private def spanDf = (0L until 540L).map { i =>
    val month = 7 + (i % 18)                       // 7..24 → 2023-07..2024-12
    val (y, m) = (2023 + (month - 1) / 12, (month - 1) % 12 + 1)
    (i, f"$y%04d-$m%02d-${i % 27 + 1}%02d ${i % 23}%02d:30:00")
  }.toDF("id", "ts_s")
    .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")

  test("years/months/hours transforms: Iceberg dir shapes, exact pruning") {
    // months
    val rm = freshRef("months")
    IceLite.createOrReplaceTransformed(rm, spanDf,
      Seq(PartitionField("ts_month", "months", "ts", 0)))
    val mFiles = IceLite.readManifest(rm).current.files
    assert(mFiles.forall(_.matches(".*ts_month=\\d{4}-\\d{2}/.*")), s"$mFiles")
    val mKept = IceLite.transformPrunedFiles(rm,
      Seq(SourceIn("ts", Seq("2024-03-15 10:30:00"))))
    assert(mKept.nonEmpty && mKept.size < mFiles.size)
    assert(mKept.forall(_.contains("ts_month=2024-03")))
    val mPruned = IceLite.readTransformPruned(spark, rm,
      Seq(SourceIn("ts", Seq("2024-03-15 10:30:00"))),
      $"ts" >= "2024-03-01" && $"ts" < "2024-04-01")
    val mExpect = IceLite.read(spark, rm)
      .filter($"ts" >= "2024-03-01" && $"ts" < "2024-04-01")
    assert(mPruned.count() == mExpect.count() && mPruned.count() > 0)

    // years
    val ry = freshRef("years")
    IceLite.createOrReplaceTransformed(ry, spanDf,
      Seq(PartitionField("ts_year", "years", "ts", 0)))
    val yFiles = IceLite.readManifest(ry).current.files
    assert(yFiles.exists(_.contains("ts_year=2023/")) &&
      yFiles.exists(_.contains("ts_year=2024/")))
    val yKept = IceLite.transformPrunedFiles(ry,
      Seq(SourceIn("ts", Seq("2023-08-01 00:00:00"))))
    assert(yKept.forall(_.contains("ts_year=2023")) && yKept.size < yFiles.size)

    // hours (Iceberg's yyyy-MM-dd-HH dir)
    val rh = freshRef("hours")
    IceLite.createOrReplaceTransformed(rh, spanDf.filter($"ts" < "2023-08-01"),
      Seq(PartitionField("ts_hour", "hours", "ts", 0)))
    val hFiles = IceLite.readManifest(rh).current.files
    assert(hFiles.forall(_.matches(".*ts_hour=\\d{4}-\\d{2}-\\d{2}-\\d{2}/.*")),
      s"$hFiles")
    val probeTs = spanDf.filter($"ts" < "2023-08-01")
      .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss")).as[String].head()
    val hKept = IceLite.transformPrunedFiles(rh, Seq(SourceIn("ts", Seq(probeTs))))
    assert(hKept.nonEmpty && hKept.size < hFiles.size)
    assert(hKept.forall(_.contains(
      s"ts_hour=${probeTs.take(13).replace(' ', '-')}")))
    // engine-API pruning REFUSES an unmappable literal loudly (this
    // path SELECTS the file set — a silent mis-map would drop rows)
    val bad = intercept[IllegalArgumentException] {
      IceLite.transformPrunedFiles(rh, Seq(SourceIn("ts", Seq("hello"))))
    }
    assert(bad.getMessage.contains("cannot map"))
    // a DATE-shaped literal reaches the hour dir zero-filled
    val day = probeTs.take(10)
    val hMid = IceLite.transformPrunedFiles(rh,
      Seq(SourceIn("ts", Seq(day))))
    assert(hMid.forall(_.contains(s"ts_hour=$day-00")), s"$hMid")
  }

  test("day ranges prune years/months/hours dirs through their prefixes") {
    // months: a quarter probe keeps exactly its three month dirs
    val rm = freshRef("mrange")
    IceLite.createOrReplaceTransformed(rm, spanDf,
      Seq(PartitionField("ts_month", "months", "ts", 0)))
    val mAll = IceLite.readManifest(rm).current.files
    val mKept = IceLite.transformPrunedFiles(rm,
      Seq(SourceDayRange("ts", "2024-01-01", "2024-03-31")))
    assert(mKept.nonEmpty && mKept.size < mAll.size)
    assert(mKept.forall(f => Seq("2024-01", "2024-02", "2024-03")
      .exists(m => f.contains(s"ts_month=$m"))), s"$mKept")
    // exactness against the full-scan filter
    val mPruned = IceLite.readTransformPruned(spark, rm,
      Seq(SourceDayRange("ts", "2024-01-01", "2024-03-31")),
      $"ts" >= "2024-01-01" && $"ts" < "2024-04-01")
    val mExpect = IceLite.read(spark, rm)
      .filter($"ts" >= "2024-01-01" && $"ts" < "2024-04-01")
    assert(mPruned.count() == mExpect.count() && mPruned.count() > 0)

    // years: a range inside one year keeps only that year's dir
    val ry = freshRef("yrange")
    IceLite.createOrReplaceTransformed(ry, spanDf,
      Seq(PartitionField("ts_year", "years", "ts", 0)))
    val yKept = IceLite.transformPrunedFiles(ry,
      Seq(SourceDayRange("ts", "2023-08-01", "2023-10-31")))
    assert(yKept.nonEmpty && yKept.forall(_.contains("ts_year=2023")))

    // hours: a one-day range keeps only that day's hour dirs,
    // inclusive of hour 23 (the prefix-compare boundary case)
    val rh = freshRef("hrange")
    IceLite.createOrReplaceTransformed(rh, spanDf.filter($"ts" < "2023-09-01"),
      Seq(PartitionField("ts_hour", "hours", "ts", 0)))
    val hAll = IceLite.readManifest(rh).current.files
    val days = hAll.map(_.split('/').find(_.startsWith("ts_hour=")).get
      .drop(8).take(10)).distinct.sorted
    val probeDay = days.head
    val hKept = IceLite.transformPrunedFiles(rh,
      Seq(SourceDayRange("ts", probeDay, probeDay)))
    assert(hKept.nonEmpty && hKept.size < hAll.size)
    assert(hKept.forall(_.contains(s"ts_hour=$probeDay")), s"$hKept")
    val hPruned = IceLite.readTransformPruned(spark, rh,
      Seq(SourceDayRange("ts", probeDay, probeDay)),
      date_format($"ts", "yyyy-MM-dd") === probeDay)
    val hExpect = IceLite.read(spark, rh)
      .filter(date_format($"ts", "yyyy-MM-dd") === probeDay)
    assert(hPruned.count() == hExpect.count() && hPruned.count() > 0)
  }

  test("SQL face: CREATE PARTITIONED BY months(ts), evolve with hours(ts)") {
    val wh = graft.GraftTmp.dir("pt_sql_mh").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val cat = s"ptmh_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"""CREATE TABLE $cat.src.t (id BIGINT, ts TIMESTAMP)
                  PARTITIONED BY (months(ts))""")
    spanDf.createOrReplaceTempView("pt_mh_batch")
    spark.sql(s"INSERT INTO $cat.src.t SELECT id, ts FROM pt_mh_batch")
    val m1 = IceLite.readManifest(ref)
    assert(m1.current.partitionSpec.map(_.name) == Seq("ts_month"))
    assert(m1.current.files.forall(_.contains("ts_month=")))
    // evolve: + hours(ts); next insert derives both dirs
    spark.sql(s"ALTER TABLE $cat.src.t ADD PARTITION FIELD hours(ts)")
    assert(IceLite.readManifest(ref).writeLayoutSpec.map(_.name) ==
      Seq("ts_month", "ts_hour"))
    spark.sql(s"INSERT INTO $cat.src.t VALUES (9999, TIMESTAMP '2025-02-03 07:30:00')")
    val era2 = IceLite.readManifest(ref).current.files
      .filterNot(m1.current.files.toSet)
    assert(era2.nonEmpty && era2.forall(f =>
      f.contains("ts_month=2025-02") && f.contains("ts_hour=2025-02-03-07")))
    // the full SQL read is era-complete and the count matches
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.src.t").head.getLong(0) == 541L)
    // partitioning() reports the declared transforms
    val parts = spark.sessionState.catalogManager
      .catalog(cat).asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("src"), "t")).partitioning().map(_.describe).toSeq
    assert(parts.exists(_.contains("months")) && parts.exists(_.contains("hours")),
      s"partitioning: $parts")
  }

  test("SQL pushdown prunes hidden-partition dirs (bucket point lookup, month probe)") {
    // before round 10 the CONNECTOR scanned every bucket for
    // `WHERE user_id = k` while the engine-API read pruned — the scan
    // now maps pushed equality/IN through the transforms
    val wh = graft.GraftTmp.dir("pt_sql_push").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "t")
    val cat = s"ptpush_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    IceLite.createOrReplaceTransformed(ref,
      (1L to 400L).map(i => (i, s"n$i")).toDF("id", "name"),
      Seq(PartitionField("id_bucket", "bucket", "id", 4)))
    val all = IceLite.readManifest(ref).current.files.size
    val got = spark.sql(s"SELECT id, name FROM $cat.src.t WHERE id = 42")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((42L, "n42")))
    val planned = graft.sources.IceLiteSource.lastPlannedFiles.size
    assert(planned < all, s"bucket lookup planned $planned/$all files")
    // IN over two keys plans at most two buckets' worth
    spark.sql(s"SELECT COUNT(*) FROM $cat.src.t WHERE id IN (42, 43)")
      .collect()
    assert(graft.sources.IceLiteSource.lastPlannedFiles.size < all)

    // months(ts): a timestamp equality plans only its month dir
    val rm = TableRef(wh, "src", "m")
    IceLite.createOrReplaceTransformed(rm, spanDf.withColumnRenamed("id", "k"),
      Seq(PartitionField("ts_month", "months", "ts", 0)))
    val mAll = IceLite.readManifest(rm).current.files.size
    val probe = spark.sql(
      s"""SELECT COUNT(*) FROM $cat.src.m
          WHERE ts = TIMESTAMP '2024-03-02 05:30:00'""").head.getLong(0)
    val mPlanned = graft.sources.IceLiteSource.lastPlannedFiles
    assert(mPlanned.size < mAll, s"month probe planned ${mPlanned.size}/$mAll")
    assert(mPlanned.forall(_.contains("ts_month=2024-03")), s"$mPlanned")
    val expect = IceLite.read(spark, rm)
      .filter($"ts" === "2024-03-02 05:30:00").count()
    assert(probe == expect)

    // era-mixed: pre-spec (flat) files are kept conservatively
    val rf = TableRef(wh, "src", "f")
    IceLite.createOrReplace(rf, (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v"))
    spark.sql(s"ALTER TABLE $cat.src.f ADD PARTITION FIELD bucket(4, id)")
    spark.sql(s"INSERT INTO $cat.src.f VALUES (1000, 9.0)")
    val n = spark.sql(s"SELECT COUNT(*) FROM $cat.src.f WHERE id = 7").head.getLong(0)
    assert(n == 1L, "pre-spec rows must survive transform pruning")
    assert(graft.sources.IceLiteSource.lastPlannedFiles.exists(
      !_.contains("id_bucket=")), "flat-era file must stay planned")
  }

  test("SQL pushdown prunes time-transform dirs from range predicates") {
    val wh = graft.GraftTmp.dir("pt_sql_rng").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "q")
    val cat = s"ptrng_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    IceLite.createOrReplaceTransformed(ref,
      spanDf.withColumnRenamed("id", "k"),
      Seq(PartitionField("ts_month", "months", "ts", 0)))
    val all = IceLite.readManifest(ref).current.files.size
    // the "last quarter" shape: a BETWEEN keeps only its month dirs
    val n = spark.sql(
      s"""SELECT COUNT(*) FROM $cat.src.q
          WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
            AND ts <  TIMESTAMP '2024-04-01 00:00:00'""").head.getLong(0)
    val planned = graft.sources.IceLiteSource.lastPlannedFiles
    assert(planned.size < all, s"quarter probe planned ${planned.size}/$all")
    assert(planned.forall(f => Seq("2024-01", "2024-02", "2024-03", "2024-04")
      .exists(m => f.contains(s"ts_month=$m"))), s"$planned")
    val expect = IceLite.read(spark, ref)
      .filter($"ts" >= "2024-01-01" && $"ts" < "2024-04-01").count()
    assert(n == expect && n > 0)
  }

  test("runtime DPP prunes bucket dirs through a join on the source column") {
    // the d45 physics on a HIDDEN layout: a fact⋈dim join on the
    // bucketed key collects the dim's key set at execution time and
    // skips whole buckets of the fact table
    val wh = graft.GraftTmp.dir("pt_dpp").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "fact")
    IceLite.createOrReplaceTransformed(ref,
      (1L to 4000L).map(i => (i % 40, i, i * 0.5)).toDF("key", "seq", "v"),
      Seq(PartitionField("key_bucket", "bucket", "key", 8)))
    val all = IceLite.readManifest(ref).current.files.size
    // scan-backed dim (a LocalRelation constant-folds and leaves DPP
    // nothing to reuse — the d45 lesson)
    val dimDir = graft.GraftTmp.dir("pt_dpp_dim").toString
    spark.range(0, 40).selectExpr("id AS dkey",
      "CASE WHEN id = 7 THEN 'keep' ELSE 'drop' END AS grp")
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString)
    val dim = spark.read.parquet(dimDir).filter($"grp" === "keep")
    val n = fact.join(dim, fact("key") === dim("dkey")).count()
    assert(n == 100L, s"join rows: $n") // key 7 appears 4000/40 times
    val planned = graft.sources.IceLiteSource.lastPlannedFiles
    assert(planned.nonEmpty && planned.size < all,
      s"DPP planned ${planned.size}/$all files")
    // every planned file is key 7's bucket
    val b7 = IceLite.bucketOf(7L, 8)
    assert(planned.forall(_.contains(s"key_bucket=$b7")), s"$planned")
  }

  test("runtime DPP prunes time-transform dirs through a date-keyed join") {
    // the star-join shape Trino's Iceberg connector runtime-filters:
    // fact partitioned days(ts), dim filtered to one day — the DPP
    // subquery's TIMESTAMP values (epoch micros on the wire) must map
    // through the session-zone day dirs and skip every other day
    val wh = graft.GraftTmp.dir("pt_tdpp").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "fact")
    val factDf = (1L to 4000L).map { i =>
      (f"2024-01-${i % 8 + 1}%02d 10:00:00", i, i * 0.5)
    }.toDF("ts_s", "seq", "v")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    IceLite.createOrReplaceTransformed(ref, factDf,
      Seq(PartitionField("ts_day", "days", "ts", 0)))
    val all = IceLite.readManifest(ref).current.files.size
    val dimDir = graft.GraftTmp.dir("pt_tdpp_dim").toString
    factDf.select($"ts".as("dts")).distinct()
      .withColumn("grp", when(date_format($"dts", "yyyy-MM-dd") ===
        "2024-01-03", lit("keep")).otherwise(lit("drop")))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.format("graft.sources.IceLiteSource")
      .load(ref.dir.toString)
    val dim = spark.read.parquet(dimDir).filter($"grp" === "keep")
    val n = fact.join(dim, fact("ts") === dim("dts")).count()
    assert(n == 500L, s"join rows: $n") // day 3 holds 4000/8 rows
    val planned = graft.sources.IceLiteSource.lastPlannedFiles
    assert(planned.nonEmpty && planned.size < all,
      s"time DPP planned ${planned.size}/$all files")
    assert(planned.forall(_.contains("ts_day=2024-01-03")), s"$planned")

    // DATE-typed key (epoch-days literals on the wire), months() dirs
    val rd = TableRef(wh, "src", "dfact")
    val dDf = (1L to 2000L).map { i =>
      (f"2024-${i % 6 + 1}%02d-10", i)
    }.toDF("d_s", "seq")
      .withColumn("d", $"d_s".cast("date")).drop("d_s")
    IceLite.createOrReplaceTransformed(rd, dDf,
      Seq(PartitionField("d_month", "months", "d", 0)))
    val dAll = IceLite.readManifest(rd).current.files.size
    val dDimDir = graft.GraftTmp.dir("pt_tdpp_ddim").toString
    dDf.select($"d".as("dd")).distinct()
      .withColumn("grp", when(month($"dd") === 4, lit("keep"))
        .otherwise(lit("drop")))
      .write.mode("overwrite").parquet(dDimDir)
    val dFact = spark.read.format("graft.sources.IceLiteSource")
      .load(rd.dir.toString)
    val dDim = spark.read.parquet(dDimDir).filter($"grp" === "keep")
    val dn = dFact.join(dDim, dFact("d") === dDim("dd")).count()
    val dExpect = IceLite.read(spark, rd).filter(month($"d") === 4).count()
    assert(dn == dExpect && dn > 0, s"date join rows: $dn vs $dExpect")
    val dPlanned = graft.sources.IceLiteSource.lastPlannedFiles
    assert(dPlanned.nonEmpty && dPlanned.size < dAll,
      s"date DPP planned ${dPlanned.size}/$dAll files")
    assert(dPlanned.forall(_.contains("d_month=2024-04")), s"$dPlanned")
  }

  test("transform pruning maps timestamp literals in the SESSION zone, not the JVM zone") {
    // dirs are derived by date_format in the session zone; with the
    // session zone set apart from the JVM default, a pushed
    // java.sql.Timestamp rendered via toString would land on the
    // WRONG day dir and silently prune matching rows (ADVICE r10 #1)
    val jvmZone = java.util.TimeZone.getDefault.getID
    val zone = if (jvmZone == "Asia/Kolkata") "Pacific/Kiritimati"
               else "Asia/Kolkata"
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try {
      val wh = graft.GraftTmp.dir("pt_zone").toString
      IceLite.createNamespace(wh, "src")
      val ref = TableRef(wh, "src", "z")
      val cat = s"ptzone_${java.util.UUID.randomUUID.toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.IceLiteCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      // 01:00 LOCAL is the previous day in UTC for Kolkata (+05:30) —
      // exactly the literal the old toString shortcut mis-mapped
      val df = (1L to 200L).map { i =>
        (f"2024-01-${i % 8 + 1}%02d 01:00:00", i)
      }.toDF("ts_s", "seq")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      IceLite.createOrReplaceTransformed(ref, df,
        Seq(PartitionField("ts_day", "days", "ts", 0)))
      val all = IceLite.readManifest(ref).current.files.size
      // equality probe: must find its rows AND prune to the local day
      val n = spark.sql(
        s"""SELECT COUNT(*) FROM $cat.src.z
            WHERE ts = TIMESTAMP '2024-01-05 01:00:00'""").head.getLong(0)
      assert(n == 25L, s"zone equality probe found $n rows")
      val planned = graft.sources.IceLiteSource.lastPlannedFiles
      assert(planned.nonEmpty && planned.size < all &&
        planned.forall(_.contains("ts_day=2024-01-05")),
        s"planned ${planned.mkString(",")}")
      // range probe drives dayOf (the other mis-rendering site)
      val r = spark.sql(
        s"""SELECT COUNT(*) FROM $cat.src.z
            WHERE ts >= TIMESTAMP '2024-01-05 00:30:00'
              AND ts <  TIMESTAMP '2024-01-05 23:00:00'""").head.getLong(0)
      assert(r == 25L, s"zone range probe found $r rows")
      val rPlanned = graft.sources.IceLiteSource.lastPlannedFiles
      assert(rPlanned.forall(_.contains("ts_day=2024-01-05")),
        s"range planned ${rPlanned.mkString(",")}")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("truncate over a timestamp maps literals through the session-zone canon") {
    // the write side derives truncate dirs by substring over a
    // SESSION-zone string cast; an Instant literal's toString is UTC
    // ISO ('T' separator, and a different DAY when the zones straddle
    // midnight) — the old v.toString path selected the WRONG day's
    // dir, silently dropping every matching row (same class as
    // NOTES #49 for days/months/years/hours)
    val jvmZone = java.util.TimeZone.getDefault.getID
    val zone = if (jvmZone == "Asia/Kolkata") "Pacific/Kiritimati"
               else "Asia/Kolkata"
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try {
      val wh = graft.GraftTmp.dir("pt_trunc_zone").toString
      IceLite.createNamespace(wh, "src")
      val ref = TableRef(wh, "src", "tz")
      val df = (1L to 160L).map { i =>
        (f"2024-01-${i % 8 + 1}%02d 01:00:00", i)
      }.toDF("ts_s", "seq")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      IceLite.createOrReplaceTransformed(ref, df,
        Seq(PartitionField("ts_pfx", "truncate", "ts", 10)))
      val all = IceLite.readManifest(ref).current.files
      // the instant the stored "2024-01-05 01:00:00" rows denote —
      // 01:00 local is the PREVIOUS day in UTC for Kolkata (+05:30)
      val inst = java.time.LocalDateTime.parse("2024-01-05T01:00:00")
        .atZone(java.time.ZoneId.of(zone)).toInstant
      for (lit <- Seq[Any](inst, java.sql.Timestamp.from(inst))) {
        val files = IceLite.transformPrunedFiles(ref,
          Seq(SourceIn("ts", Seq(lit))))
        assert(files.nonEmpty && files.size < all.size &&
          files.forall(_.contains("ts_pfx=2024-01-05")),
          s"$lit pruned to ${files.mkString(",")}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("bucket-transform SPJ: co-bucketed tables join with zero exchanges (d90)") {
    val wh = graft.GraftTmp.dir("pt_spj").toString
    IceLite.createNamespace(wh, "src")
    val aRef = TableRef(wh, "src", "fa")
    val bRef = TableRef(wh, "src", "fb")
    IceLite.createOrReplaceTransformed(aRef,
      (0L until 4000L).map(k => (k, k * 2.0)).toDF("k", "va")
        .repartition(4),
      Seq(PartitionField("k_bucket", "bucket", "k", 8)))
    IceLite.createOrReplaceTransformed(bRef,
      (0L until 4000L by 2).map(k => (k, k + 1.0)).toDF("bk", "vb"),
      Seq(PartitionField("bk_bucket", "bucket", "bk", 8)))
    val cat = s"ptspj_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = spark.sql(
        s"""SELECT CAST(SUM(va * vb) AS DOUBLE) AS s,
            COUNT(*) AS n
            FROM $cat.src.fa JOIN $cat.src.fb ON k = bk""")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // no exchange below the join: both scans report
      // KeyGroupedPartitioning over bucket(8, key), resolved through
      // the catalog's bucket function
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucket SPJ must not shuffle its inputs:\n$plan")
      val r = q.head()
      val expect = (0L until 4000L by 2).map(k => k * 2.0 * (k + 1.0)).sum
      assert(r.getDouble(0) == expect && r.getLong(1) == 2000L)

      // composes with static pruning: a pushed key-equality narrows
      // both sides to one bucket and the join stays exchange-free
      val p = spark.sql(
        s"""SELECT COUNT(*) AS n FROM $cat.src.fa JOIN $cat.src.fb
            ON k = bk WHERE k = 42""")
      val pPlan = p.queryExecution.executedPlan.toString
      assert(!pPlan.split("SortMergeJoin").last
        .contains("Exchange hashpartitioning"), pPlan)
      assert(p.head().getLong(0) == 1L)
      // the last-planned scan (either side) read one bucket dir only
      val planned = graft.sources.IceLiteSource.lastPlannedFiles
      val dirs = planned.flatMap(_.split('/')
        .find(_.matches("(k|bk)_bucket=\\d+"))).distinct
      assert(planned.nonEmpty && dirs.size == 1,
        s"pruned SPJ still planned: ${planned.mkString(",")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    }
  }

  test("hidden layouts census through SHOW PARTITIONS and $partitions (derived dirs)") {
    val wh = graft.GraftTmp.dir("pt_census").toString
    IceLite.createNamespace(wh, "src")
    val ref = TableRef(wh, "src", "ev")
    val df = (1L to 200L).map { i =>
      (i, f"2024-02-${i % 4 + 1}%02d 09:00:00")
    }.toDF("id", "ts_s").withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    IceLite.createOrReplaceTransformed(ref, df,
      Seq(PartitionField("ts_day", "days", "ts", 0)))
    // engine face
    val (cols, census) = IceLite.partitionsRows(ref)
    assert(cols == Seq("ts_day") && census.size == 4)
    assert(census.map(_._3).sum == 200L, "census row_counts must sum")
    assert(census.map(_._1.head).sorted ==
      (1 to 4).map(d => f"2024-02-$d%02d"))
    // SQL faces
    val cat = s"ptc_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val shown = spark.sql(s"SHOW PARTITIONS $cat.src.ev")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(shown == (1 to 4).map(d => f"ts_day=2024-02-$d%02d"))
    val meta = spark.sql(s"SELECT * FROM $cat.src.`ev$$partitions`").collect()
    assert(meta.length == 4 && meta.map(_.getLong(2)).sum == 200L)
    // derived dirs are not droppable identities — refuse loudly
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.src.ev DROP PARTITION (ts_day='2024-02-01')"))
    assert(e.getMessage.contains("hidden-partition") ||
      e.getMessage.contains("derived"), e.getMessage)
  }

  test("one-side-shuffle SPJ: an unbucketed side shuffles INTO the bucket layout") {
    // spark.sql.sources.v2.bucketing.shuffle.enabled: when only ONE
    // side is bucket-laid-out, Spark may shuffle the other side BY
    // THE CATALOG'S bucket function instead of exchanging both — this
    // executes GraftFunctions.BucketBound.produceResult row-by-row,
    // so the function must equal the write layout's hash EXACTLY or
    // co-located rows miss each other (silent wrong join). The value
    // check below is the end-to-end proof of that equality.
    val wh = graft.GraftTmp.dir("pt_spj1").toString
    IceLite.createNamespace(wh, "src")
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "big"),
      (0L until 3000L).map(k => (k, k * 2.0)).toDF("k", "va"),
      Seq(PartitionField("k_bucket", "bucket", "k", 8)))
    val plainDir = graft.GraftTmp.dir("pt_spj1_plain").toString
    (0L until 3000L by 3).map(k => (k, k + 1.0)).toDF("pk", "vb")
      .write.mode("overwrite").parquet(plainDir)
    val cat = s"ptspj1_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(plainDir).createOrReplaceTempView("pt_spj1_dim")
      val q = spark.sql(
        s"""SELECT COUNT(*) AS n, CAST(SUM(va * vb) AS DOUBLE) AS s
            FROM $cat.src.big JOIN pt_spj1_dim ON k = pk""")
      val plan = q.queryExecution.executedPlan.toString
      // exactly ONE exchange below the join (the plain side's), and
      // the bucketed side scans exchange-free
      val joinPart = plan.split("SortMergeJoin").last
      val exchanges = "Exchange".r.findAllIn(joinPart).size
      assert(plan.contains("SortMergeJoin") && exchanges == 1,
        s"expected one-side shuffle ($exchanges exchanges):\n$plan")
      val r = q.head()
      val expect = (0L until 3000L by 3).map(k => k * 2.0 * (k + 1.0)).sum
      assert(r.getLong(0) == 1000L && r.getDouble(1) == expect,
        s"one-side-shuffle SPJ joined wrong rows: ${r.getLong(0)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    }
  }

  test("time-transform SPJ: days() layouts and the d84 bucket+days mix join with zero exchanges") {
    // the full transform family is SPJ-capable: the catalog serves
    // days/months/years/hours functions, split keys parse from the
    // dirs (session-zone-anchored for hours), and the MIXED layout
    // d84 actually writes — (bucket(user), days(ts)) — co-schedules
    // when the join carries both sources
    val wh = graft.GraftTmp.dir("pt_tspj").toString
    IceLite.createNamespace(wh, "src")
    def evs(seed: Long) = (0L until 2000L).map { i =>
      (i % 16, f"2024-03-${i % 4 + 1}%02d 0${(i + seed) % 8}:30:00", i + seed)
    }.toDF("uid", "ts_s", "seq")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "da"), evs(0),
      Seq(PartitionField("ts_day", "days", "ts", 0)))
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "db"), evs(0)
      .withColumnRenamed("ts", "bts").withColumnRenamed("uid", "buid")
      .withColumnRenamed("seq", "bseq"),
      Seq(PartitionField("bts_day", "days", "bts", 0)))
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "ma"), evs(0),
      Seq(PartitionField("uid_bucket", "bucket", "uid", 4),
        PartitionField("ts_day", "days", "ts", 0)))
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "mb"), evs(0)
      .withColumnRenamed("ts", "bts").withColumnRenamed("uid", "buid")
      .withColumnRenamed("seq", "bseq"),
      Seq(PartitionField("buid_bucket", "bucket", "buid", 4),
        PartitionField("bts_day", "days", "bts", 0)))
    val cat = s"pttspj_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // days ⋈ days on the timestamp key
      val q1 = spark.sql(
        s"""SELECT COUNT(*) AS n FROM $cat.src.da JOIN $cat.src.db
            ON ts = bts""")
      val p1 = q1.queryExecution.executedPlan.toString
      assert(p1.contains("SortMergeJoin") &&
        !p1.split("SortMergeJoin").last.contains("Exchange hashpartitioning"),
        s"days SPJ must not shuffle:\n$p1")
      // self-join shape: every row matches the rows sharing its ts —
      // ts repeats every lcm-cycle; count equals the pair count of
      // equal-ts groups, computed independently below
      val tsCounts = (0L until 2000L).groupBy(i => (i % 4, i % 8))
        .values.map(g => g.size.toLong * g.size).sum
      assert(q1.head().getLong(0) == tsCounts)

      // the d84 mix: bucket(uid) + days(ts), join on BOTH sources
      val q2 = spark.sql(
        s"""SELECT COUNT(*) AS n FROM $cat.src.ma JOIN $cat.src.mb
            ON uid = buid AND ts = bts""")
      val p2 = q2.queryExecution.executedPlan.toString
      assert(p2.contains("SortMergeJoin") &&
        !p2.split("SortMergeJoin").last.contains("Exchange hashpartitioning"),
        s"mixed bucket+days SPJ must not shuffle:\n$p2")
      val pairCounts = (0L until 2000L).groupBy(i => (i % 16, i % 4, i % 8))
        .values.map(g => g.size.toLong * g.size).sum
      assert(q2.head().getLong(0) == pairCounts)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    }
  }

  test("truncate-transform SPJ: prefix layouts join with zero exchanges, " +
    "one-side shuffle is value-exact, non-string keys decline") {
    // truncate(w, s) IS a co-location shape for equi-joins: equal
    // join keys imply equal prefixes, so two truncate-laid-out
    // tables co-schedule per prefix — the same seam d90 built for
    // bucket, served by GraftFunctions.truncate (the write layout's
    // substring). String keys only: the layout prefixes a string
    // CAST for other types, which has no exact typed function twin.
    val wh = graft.GraftTmp.dir("pt_trspj").toString
    IceLite.createNamespace(wh, "src")
    val keys = (0L until 3000L).map(i => f"g${i % 25}%03d-item$i")
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "ta"),
      keys.zipWithIndex.map { case (k, i) => (k, i * 2.0) }.toDF("s", "va")
        .repartition(4),
      Seq(PartitionField("s_pfx", "truncate", "s", 4)))
    IceLite.createOrReplaceTransformed(TableRef(wh, "src", "tb"),
      keys.zipWithIndex.collect { case (k, i) if i % 3 == 0 => (k, i + 1.0) }
        .toDF("bs", "vb"),
      Seq(PartitionField("bs_pfx", "truncate", "bs", 4)))
    val cat = s"pttr_${java.util.UUID.randomUUID.toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.IceLiteCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val broadcastWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // zero-exchange join of two truncate(4) layouts
      val q = spark.sql(
        s"""SELECT COUNT(*) AS n, CAST(SUM(va * vb) AS DOUBLE) AS s
            FROM $cat.src.ta JOIN $cat.src.tb ON s = bs""")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") &&
        !plan.split("SortMergeJoin").last.contains("Exchange hashpartitioning"),
        s"truncate SPJ must not shuffle:\n$plan")
      val r = q.head()
      val expect = (0L until 3000L by 3).map(i => i * 2.0 * (i + 1.0)).sum
      assert(r.getLong(0) == 1000L && r.getDouble(1) == expect,
        s"truncate SPJ joined wrong rows: n=${r.getLong(0)}")

      // composes with static pruning: a pushed key equality narrows
      // both sides to one prefix dir and stays exchange-free
      val p = spark.sql(
        s"""SELECT COUNT(*) AS n FROM $cat.src.ta JOIN $cat.src.tb
            ON s = bs WHERE s = 'g000-item0'""")
      assert(!p.queryExecution.executedPlan.toString
        .split("SortMergeJoin").last.contains("Exchange hashpartitioning"))
      assert(p.head().getLong(0) == 1L)
      val planned = graft.sources.IceLiteSource.lastPlannedFiles
      val dirs = planned.flatMap(_.split('/')
        .find(_.matches("(s|bs)_pfx=.*"))).distinct
      assert(planned.nonEmpty && dirs.size == 1,
        s"pruned truncate SPJ still planned: ${planned.mkString(",")}")

      // one-side shuffle INTO the prefix layout executes
      // GraftFunctions.TruncateBound per row — the value check is
      // the end-to-end proof it equals the write-side substring
      val plainDir = graft.GraftTmp.dir("pt_trspj_plain").toString
      keys.zipWithIndex.collect { case (k, i) if i % 5 == 0 => (k, i - 1.0) }
        .toDF("ps", "pv").write.mode("overwrite").parquet(plainDir)
      spark.read.parquet(plainDir).createOrReplaceTempView("pt_trspj_dim")
      val q1 = spark.sql(
        s"""SELECT COUNT(*) AS n, CAST(SUM(va * pv) AS DOUBLE) AS s
            FROM $cat.src.ta JOIN pt_trspj_dim ON s = ps""")
      val p1 = q1.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(p1.split("SortMergeJoin").last).size
      assert(p1.contains("SortMergeJoin") && exchanges == 1,
        s"expected one-side shuffle ($exchanges exchanges):\n$p1")
      val r1 = q1.head()
      val expect1 = (0L until 3000L by 5).map(i => i * 2.0 * (i - 1.0)).sum
      assert(r1.getLong(0) == 600L && r1.getDouble(1) == expect1,
        s"one-side-shuffle truncate SPJ joined wrong rows: ${r1.getLong(0)}")

      // r14: TYPED truncate keys co-locate too — the typed function
      // twin evaluates the write layout's exact
      // substring(CAST(col AS STRING)) for int/long/decimal, so a
      // numeric prefix layout is a zero-exchange join shape
      IceLite.createOrReplaceTransformed(TableRef(wh, "src", "na"),
        (0L until 400L).map(k => (k, k * 2.0)).toDF("k", "va"),
        Seq(PartitionField("k_pfx", "truncate", "k", 2)))
      IceLite.createOrReplaceTransformed(TableRef(wh, "src", "nb"),
        (0L until 400L by 2).map(k => (k, k + 1.0)).toDF("bk", "vb"),
        Seq(PartitionField("bk_pfx", "truncate", "bk", 2)))
      val qn = spark.sql(
        s"""SELECT COUNT(*) AS n, CAST(SUM(va * vb) AS DOUBLE) AS s
            FROM $cat.src.na JOIN $cat.src.nb ON k = bk""")
      val pn = qn.queryExecution.executedPlan.toString
      assert(pn.contains("SortMergeJoin") &&
        !pn.split("SortMergeJoin").last.contains("Exchange hashpartitioning"),
        s"long-key truncate SPJ must not shuffle:\n$pn")
      val rn = qn.head()
      val expectN = (0L until 400L by 2).map(k => k * 2.0 * (k + 1.0)).sum
      assert(rn.getLong(0) == 200L && rn.getDouble(1) == expectN,
        s"long-key truncate SPJ joined wrong rows: n=${rn.getLong(0)}")

      // one-side shuffle INTO the long prefix layout executes the
      // TYPED twin per row — value-exactness is the end-to-end proof
      // it equals the write-side substring(cast) (verdict r13 #4)
      val plainDirN = graft.GraftTmp.dir("pt_trspj_plainN").toString
      (0L until 400L by 5).map(k => (k, k - 1.0)).toDF("pk", "pv")
        .write.mode("overwrite").parquet(plainDirN)
      spark.read.parquet(plainDirN).createOrReplaceTempView("pt_trspj_dimn")
      val qn1 = spark.sql(
        s"""SELECT COUNT(*) AS n, CAST(SUM(va * pv) AS DOUBLE) AS s
            FROM $cat.src.na JOIN pt_trspj_dimn ON k = pk""")
      val pn1 = qn1.queryExecution.executedPlan.toString
      val exchangesN = "Exchange".r.findAllIn(pn1.split("SortMergeJoin").last).size
      assert(pn1.contains("SortMergeJoin") && exchangesN == 1,
        s"expected one-side shuffle ($exchangesN exchanges):\n$pn1")
      val rn1 = qn1.head()
      val expectN1 = (0L until 400L by 5).map(k => k * 2.0 * (k - 1.0)).sum
      assert(rn1.getLong(0) == 80L && rn1.getDouble(1) == expectN1,
        s"typed one-side-shuffle truncate SPJ wrong: n=${rn1.getLong(0)}")

      // TEMPORAL truncate keys still DECLINE: the cast renders in the
      // session zone, which an executor-bound twin cannot see
      val tsRows = (0L until 96L).map(h =>
        (java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(h * 3600)), h * 1.0))
      IceLite.createOrReplaceTransformed(TableRef(wh, "src", "tsa"),
        tsRows.toDF("ts", "va"),
        Seq(PartitionField("ts_pfx", "truncate", "ts", 10)))
      IceLite.createOrReplaceTransformed(TableRef(wh, "src", "tsb"),
        tsRows.filter(_._2 % 2 == 0).toDF("bts", "vb"),
        Seq(PartitionField("bts_pfx", "truncate", "bts", 10)))
      val qt = spark.sql(
        s"""SELECT COUNT(*) AS n FROM $cat.src.tsa JOIN $cat.src.tsb
            ON ts = bts""")
      assert(qt.queryExecution.executedPlan.toString
        .split("SortMergeJoin").last.contains("Exchange hashpartitioning"),
        "temporal truncate layout must pay the exchange, not mis-co-locate")
      assert(qt.head().getLong(0) == 48L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastWas)
    }
  }

  test("transformAllowedSegs: literal canonicalization and the decline contract") {
    val fDays = PartitionField("ts_day", "days", "ts", 0)
    val fHours = PartitionField("ts_hour", "hours", "ts", 0)
    // java.sql.Timestamp renders in the REQUESTED zone (19:30Z is
    // already Jan 5 in Kolkata)
    val t = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-04T19:30:00Z"))
    assert(IceLite.transformAllowedSegs(fDays, Set[Any](t), "Asia/Kolkata")
      == Some(Set("ts_day=2024-01-05")))
    assert(IceLite.transformAllowedSegs(fDays, Set[Any](t), "UTC")
      == Some(Set("ts_day=2024-01-04")))
    // a DATE-shaped literal against an hours dir zero-fills to -00
    // (the take(13) shortcut produced a 10-char segment that could
    // never match a real dir — ADVICE r10 #2)
    assert(IceLite.transformAllowedSegs(fHours,
      Set[Any](java.time.LocalDate.parse("2024-01-05")), "UTC")
      == Some(Set("ts_hour=2024-01-05-00")))
    assert(IceLite.transformAllowedSegs(fHours, Set[Any]("2024-01-05"), "UTC")
      == Some(Set("ts_hour=2024-01-05-00")))
    // T-separated strings canonicalize to the dir shape
    assert(IceLite.transformAllowedSegs(fHours,
      Set[Any]("2024-01-05T07:15:00"), "UTC")
      == Some(Set("ts_hour=2024-01-05-07")))
    // an unmappable literal DECLINES (None = keep-all) instead of
    // emitting a segment that matches nothing
    assert(IceLite.transformAllowedSegs(fHours, Set[Any]("hello"), "UTC").isEmpty)
    assert(IceLite.transformAllowedSegs(fDays, Set[Any](42L), "UTC").isEmpty)
    // one bad literal poisons the whole set (conjunction would
    // otherwise under-keep)
    assert(IceLite.transformAllowedSegs(fDays,
      Set[Any]("2024-01-05", "nope"), "UTC").isEmpty)
  }

  test("compact merges small files within dirs and keeps the spec") {
    val ref = freshRef("cmp")
    val spec = Seq(PartitionField("id_bucket", "bucket", "id", 2))
    IceLite.createOrReplaceTransformed(ref, sampleDf.filter($"id" <= 100), spec)
    IceLite.appendTransformed(ref, sampleDf.filter($"id" > 100 && $"id" <= 200))
    IceLite.appendTransformed(ref, sampleDf.filter($"id" > 200))
    val before = IceLite.readManifest(ref).current.files.size
    IceLite.compact(spark, ref)
    val snap = IceLite.readManifest(ref).current
    assert(snap.partitionSpec == spec)
    assert(snap.files.size < before)
    assert(snap.files.forall(_.contains("id_bucket=")))
    assert(IceLite.read(spark, ref).count() == 400)
    // pruning still exact after compaction
    val pruned = IceLite.readTransformPruned(spark, ref,
      Seq(SourceIn("id", Seq(42L))), $"id" === 42L)
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(42L))
  }
}
