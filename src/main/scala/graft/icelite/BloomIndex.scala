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
  * bit_or) with a metadata-sized result: files × m/64 rows max.
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

  private def sidecarPath(ref: TableRef, key: String): Path =
    ref.dir.resolve(s"bloom.$key.json")

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

  /** Build (or rebuild) the sidecar for `key` over the CURRENT
    * snapshot. Integral keys only (the point-lookup shape). */
  def build(spark: SparkSession, ref: TableRef, key: String,
      bits: Int = DefaultBits, hashes: Int = DefaultHashes): BloomSidecar = {
    val snap = IceLite.readManifest(ref).current
    val byFile: Map[String, Map[String, Long]] =
      if (snap.files.isEmpty) Map.empty
      else {
        val paths = snap.files.map(f => ref.dir.resolve(f).toString)
        val rows = spark.read.parquet(paths: _*)
          .select(input_file_name().as("_f"), col(key).cast("long").as("_k"))
          .filter(col("_k").isNotNull)
          .select(col("_f"), explode(array(
            probeCols(col("_k"), bits, hashes): _*)).as("_p"))
          .groupBy(col("_f"), (col("_p") / lit(64)).cast("long").as("_w"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT)))")
            .as("_bits"))
          .collect()
        rows.groupBy(r => IceLite.matchStagedPath(snap.files, r.getString(0)))
          .collect { case (Some(f), rs) =>
            f -> rs.map(r => r.getLong(1).toString -> r.getLong(2)).toMap }
          .toMap
      }
    val sc = BloomSidecar(snap.id, key, bits, hashes, byFile)
    val tmp = ref.dir.resolve(s".bloom.tmp.${java.util.UUID.randomUUID}")
    Files.writeString(tmp, Serialization.writePretty(sc))
    Files.move(tmp, sidecarPath(ref, key),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    sc
  }

  /** Rebuild EVERY existing sidecar of `ref` against the CURRENT
    * snapshot — the post-rewrite maintenance hook (compaction and
    * MERGE call this automatically): a rewrite replaces the files the
    * index was built over, leaving the sidecar stale — correct but
    * useless (unindexed files are conservatively kept, so point
    * lookups stop pruning). Tables with no sidecar pay nothing; each
    * existing key costs one metadata-sized build job over the new
    * files. Returns the rebuilt keys. */
  def refreshAll(spark: SparkSession, ref: TableRef): Seq[String] = {
    if (!Files.exists(ref.dir)) return Nil
    val sidecars = IceLite.listDir(Files.list(ref.dir))(_
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("bloom.") && n.endsWith(".json") && !n.startsWith(".")
      }.toSeq)
    sidecars.map { p =>
      val sc = Serialization.read[BloomSidecar](Files.readString(p))
      build(spark, ref, sc.key, sc.bits, sc.hashes).key
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
    * because data files are immutable). */
  def prunedFiles(ref: TableRef, key: String, value: Long): Seq[String] = {
    val snap = IceLite.readManifest(ref).current
    readSidecar(ref, key) match {
      case None => snap.files
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
    }
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
