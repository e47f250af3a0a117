package graft.icelite

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Sidecar Bloom-filter index — the Iceberg puffin-blob role
  * (reference: extract_load.py relies on Iceberg file skipping;
  * blooms are the axis min/max stats can't cover). Range stats prune
  * range predicates, but a POINT lookup on a high-cardinality key in
  * an unsorted table matches every file's [min,max]; a per-file Bloom
  * filter prunes by membership instead: probe k bit positions, skip
  * any file missing one. False positives only cost a wasted read —
  * never correctness — and files without an index entry are
  * conservatively kept, so the sidecar can lag the table (it is a
  * DERIVED index keyed by snapshot id, rebuilt after compaction, not
  * part of the CAS commit).
  *
  * Word layout: the m-bit filter is a sparse map word-index → 64-bit
  * word; a missing word is all-zero. Build is ONE Spark job over the
  * snapshot (explode k probe positions, groupBy (file, word),
  * bit_or).
  *
  * TWO storage formats, chosen by file count ("auto"):
  *  - `bloom.<key>.json` — the small-table format: all words folded
  *    driver-side into one JSON (8 KB/file worst case). Fine to ~10⁵
  *    files; past that the driver fold and the single JSON are the
  *    bottleneck.
  *  - `bloom.<key>.parquet/` — the scale format: the build job's
  *    (file, word, bits_word) rows land DIRECTLY as a parquet sidecar
  *    table — no driver fold at any file count — and pruning reads it
  *    back as one aggregation job probing ≤k needed words per file
  *    (the driver only ever holds the per-file verdicts, the same
  *    O(files) class as the manifest itself).
  * Both formats make IDENTICAL pruning decisions (spec-pinned); a
  * reader finding no sidecar keeps every file.
  */
final case class BloomSidecar(snapshot: Long, key: String, bits: Int,
    hashes: Int, files: Map[String, Map[String, Long]])

object BloomIndex {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  /** 64 KiB of bits ≈ 2.4% false positives at 8k distinct keys/file
    * (k=3); at real scale m is sized from the manifest's per-file row
    * counts. */
  val DefaultBits = 65536
  val DefaultHashes = 3

  /** "auto" switches to the parquet sidecar above this file count. */
  val JsonMaxFiles = 256

  private def sidecarPath(ref: TableRef, key: String): Path =
    ref.dir.resolve(s"bloom.$key.json")

  private def parquetPath(ref: TableRef, key: String): Path =
    ref.dir.resolve(s"bloom.$key.parquet")

  /** The k probe positions as Columns over `keyCol` (build side) —
    * MUST mirror [[positions]] bit-for-bit. */
  private def probeCols(keyCol: Column, bits: Int, hashes: Int): Seq[Column] =
    (0 until hashes).map(i =>
      pmod(xxhash64(lit(i), keyCol.cast("long")), lit(bits.toLong)))

  /** The k probe positions for a lookup value (probe side): the same
    * XxHash64(seed=42) Catalyst expression functions.xxhash64 builds,
    * evaluated driver-side — no job, and bit-identical to the build. */
  private[icelite] def positions(value: Long, bits: Int, hashes: Int): Seq[Int] =
    (0 until hashes).map { i =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(i),
          org.apache.spark.sql.catalyst.expressions.Literal(value)), 42L)
        .eval(null).asInstanceOf[Long]
      (((h % bits) + bits) % bits).toInt
    }

  /** The shared build job: (file, word, bits_word) rows for the
    * current snapshot, file paths already table-relative. */
  private def buildRows(spark: SparkSession, ref: TableRef,
      snap: Snapshot, key: String, bits: Int, hashes: Int): DataFrame = {
    val paths = snap.files.map(f => ref.dir.resolve(f).toString)
    val filesB = spark.sparkContext.broadcast(snap.files)
    val toRel = udf((uri: String) =>
      IceLite.matchStagedPath(filesB.value, uri).orNull)
    spark.read.parquet(paths: _*)
      .select(toRel(input_file_name()).as("file"),
        col(key).cast("long").as("_k"))
      .filter(col("_k").isNotNull && col("file").isNotNull)
      .select(col("file"), explode(array(
        probeCols(col("_k"), bits, hashes): _*)).as("_p"))
      .groupBy(col("file"), (col("_p") / lit(64)).cast("long").as("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT)))")
        .as("bits_word"))
  }

  /** Build (or rebuild) the sidecar for `key` over the CURRENT
    * snapshot. Integral keys only (the point-lookup shape).
    * `format`: "json", "parquet", or "auto" (parquet past
    * JsonMaxFiles). Returns the snapshot indexed. */
  def build(spark: SparkSession, ref: TableRef, key: String,
      bits: Int = DefaultBits, hashes: Int = DefaultHashes,
      format: String = "auto"): Long = {
    val snap = IceLite.readManifest(ref).current
    val useParquet = format match {
      case "parquet" => true
      case "json" => false
      case "auto" => snap.files.size > JsonMaxFiles
      case other => throw new IllegalArgumentException(
        s"bloom format '$other' (have: json, parquet, auto)")
    }
    if (useParquet) {
      val tmp = ref.dir.resolve(s".bloom.$key.parquet.tmp-${
        java.util.UUID.randomUUID.toString.take(8)}")
      val rows =
        if (snap.files.isEmpty)
          spark.range(0).select(lit("").as("file"), lit(0L).as("word"),
            lit(0L).as("bits_word"))
        else buildRows(spark, ref, snap, key, bits, hashes)
      rows
        .withColumn("snapshot", lit(snap.id))
        .withColumn("bits", lit(bits)).withColumn("hashes", lit(hashes))
        .write.mode("overwrite").parquet(tmp.toString)
      // swap: derived index, readers are conservative — the brief
      // window where no sidecar exists only disables pruning
      val target = parquetPath(ref, key)
      val trash = ref.dir.resolve(s".bloom.$key.trash-${
        java.util.UUID.randomUUID.toString.take(8)}")
      if (Files.exists(target)) Files.move(target, trash)
      Files.move(tmp, target)
      Seq(trash).filter(Files.exists(_)).foreach(deleteTree)
      Files.deleteIfExists(sidecarPath(ref, key)) // retire other format
      snap.id
    } else {
      val byFile: Map[String, Map[String, Long]] =
        if (snap.files.isEmpty) Map.empty
        else buildRows(spark, ref, snap, key, bits, hashes).collect()
          .groupBy(_.getString(0))
          .map { case (f, rs) =>
            f -> rs.map(r => r.getLong(1).toString -> r.getLong(2)).toMap }
      val sc = BloomSidecar(snap.id, key, bits, hashes, byFile)
      val tmp = ref.dir.resolve(s".bloom.tmp.${java.util.UUID.randomUUID}")
      Files.writeString(tmp, Serialization.writePretty(sc))
      Files.move(tmp, sidecarPath(ref, key),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      if (Files.exists(parquetPath(ref, key))) // retire other format
        deleteTree(parquetPath(ref, key))
      snap.id
    }
  }

  private def deleteTree(p: Path): Unit =
    IceLite.listDir(Files.walk(p))(_.toSeq).sortBy(-_.getNameCount)
      .foreach(q => scala.util.Try(Files.deleteIfExists(q)))

  /** Rebuild EVERY existing sidecar of `ref` against the CURRENT
    * snapshot — the post-rewrite maintenance hook (compaction and
    * MERGE call this automatically): a rewrite replaces the files the
    * index was built over, leaving the sidecar stale — correct but
    * useless (unindexed files are conservatively kept, so point
    * lookups stop pruning). Tables with no sidecar pay nothing; each
    * format rebuilds into itself. Returns the rebuilt keys. */
  def refreshAll(spark: SparkSession, ref: TableRef): Seq[String] = {
    if (!Files.exists(ref.dir)) return Nil
    val entries = IceLite.listDir(Files.list(ref.dir))(_
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("bloom.") && !n.startsWith("."))
      .toSeq.sorted)
    entries.flatMap {
      case n if n.endsWith(".json") =>
        val sc = Serialization.read[BloomSidecar](
          Files.readString(ref.dir.resolve(n)))
        build(spark, ref, sc.key, sc.bits, sc.hashes, format = "json")
        Some(sc.key)
      case n if n.endsWith(".parquet") =>
        val key = n.stripPrefix("bloom.").stripSuffix(".parquet")
        // an empty sidecar (built over an empty table or all-null
        // key) carries no (bits, hashes) row — rebuild with the
        // defaults instead of failing the maintenance op that
        // triggered the refresh
        val (bits, hashes) = spark.read.parquet(ref.dir.resolve(n).toString)
          .select("bits", "hashes").limit(1).collect().headOption
          .map(r => (r.getInt(0), r.getInt(1)))
          .getOrElse((DefaultBits, DefaultHashes))
        build(spark, ref, key, bits, hashes, format = "parquet")
        Some(key)
      case _ => None
    }
  }

  def readSidecar(ref: TableRef, key: String): Option[BloomSidecar] = {
    val p = sidecarPath(ref, key)
    if (!Files.exists(p)) None
    else Some(Serialization.read[BloomSidecar](Files.readString(p)))
  }

  /** Current-snapshot files that may contain `value`: a file is
    * skipped only when its bloom exists and provably misses one probe
    * bit. No sidecar, or files appended after the index was built →
    * conservatively kept (entries for still-live files stay valid
    * because data files are immutable). JSON sidecars prune through
    * the driver map; parquet sidecars prune through one aggregation
    * job (the scale path — the words never fold into the driver). */
  def prunedFiles(ref: TableRef, key: String, value: Long): Seq[String] = {
    val snap = IceLite.readManifest(ref).current
    readSidecar(ref, key) match {
      case Some(sc) =>
        val pos = positions(value, sc.bits, sc.hashes)
        snap.files.filter { f =>
          sc.files.get(f) match {
            case None => true
            case Some(words) => pos.forall { p =>
              ((words.getOrElse((p / 64).toString, 0L) >> (p % 64)) & 1L) == 1L
            }
          }
        }
      case None if Files.exists(parquetPath(ref, key)) =>
        prunedFilesParquet(org.apache.spark.sql.SparkSession.active,
          ref, snap, key, value)
      case None => snap.files
    }
  }

  private def prunedFilesParquet(spark: SparkSession, ref: TableRef,
      snap: Snapshot, key: String, value: Long): Seq[String] = {
    val rows = spark.read.parquet(parquetPath(ref, key).toString)
    val metaRow = rows.select("bits", "hashes").limit(1).collect()
    if (metaRow.isEmpty) return snap.files // empty index = nothing indexed
    val pos = positions(value, metaRow.head.getInt(0), metaRow.head.getInt(1))
    // ≤k needed (word, mask) pairs — inline them as one CASE chain, no
    // join; per file: count of satisfied needed words
    val needed = pos.groupBy(_ / 64).toSeq.map { case (w, ps) =>
      (w.toLong, ps.map(p => 1L << (p % 64)).reduce(_ | _)) }
    val hit = needed.map { case (w, m) =>
      when(col("word") === lit(w) &&
        col("bits_word").bitwiseAND(lit(m)) === lit(m), 1).otherwise(0)
    }.reduce(_ + _)
    // one job, O(files) verdict rows on the driver — same class as the
    // manifest's own file list
    val verdicts = rows.groupBy("file").agg(sum(hit).as("ok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    snap.files.filter(f => verdicts.get(f).forall(_ == needed.size))
  }

  /** Point lookup through the bloom: membership-pruned file list +
    * the residual equality filter. */
  def readPointLookup(spark: SparkSession, ref: TableRef, key: String,
      value: Long): DataFrame = {
    val files = prunedFiles(ref, key, value)
    val cond = col(key).cast("long") === lit(value)
    if (files.isEmpty) IceLite.read(spark, ref).where(cond).limit(0)
    else IceLite.readFiles(spark, ref, files).where(cond)
  }
}
