package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import syntax._

/** Part D (builder extension, SURVEY §2 addendum) — multimodal column
  * handling for a training-data pipeline: media as opaque BINARY
  * columns with typed metadata, decode/feature/frame-sample stages.
  *
  * No image/audio codec exists in this environment, so the DECODE step
  * is a clearly-marked deterministic stub (per-chunk byte statistics
  * standing in for pixel decoding); everything around it — binary
  * payload construction, metadata schema, typed mapPartitions
  * batching, per-frame explode shape, partition behavior — is real
  * Spark and is what the stub would plug into.
  *
  * Scale notes: payloads stay opaque end-to-end (no driver collect);
  * m02 is a mapPartitions pipeline whose batch shape is
  * partition-local (the real decoder would amortize codec init per
  * partition exactly here); m03 frame sampling is expression-only
  * (sequence + binary substring) and codegen-friendly.
  */
object MultimodalPack extends Pack {

  /** Typed row for the decode stage — the schema a real image/audio
    * decoder would consume. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, features: Array[Double])

  /** STUB decoder: per-chunk mean byte value over 8 fixed chunks — a
    * deterministic stand-in for "decode image → pooled features".
    * Swap this body for a real codec; the signature and the
    * mapPartitions plumbing around it stay unchanged. */
  def decodeStub(payload: Array[Byte], nChunks: Int = 8): Array[Double] = {
    if (payload.isEmpty) return Array.fill(nChunks)(0.0)
    val chunk = math.max(1, payload.length / nChunks)
    (0 until nChunks).toArray.map { c =>
      val from = c * chunk
      val until = math.min(payload.length, (c + 1) * chunk)
      if (from >= payload.length) 0.0
      else {
        var s = 0L; var i = from
        while (i < until) { s += (payload(i) & 0xff); i += 1 }
        s.toDouble / (until - from)
      }
    }
  }

  /** Media table derived deterministically from `documents`: payload =
    * UTF-8 bytes of text (an opaque blob as far as the pipeline is
    * concerned), kind alternates image/audio, metadata from n_chars. */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id".as("media_id"),
        when(pmod($"doc_id", lit(2)) === 0, "image").otherwise("audio").as("kind"),
        encode($"text", "UTF-8").as("payload"))

  val decls: Seq[Decl] = Seq(

    // binary ingest + typed metadata; fingerprint is engine-local
    // (xxhash64) so the oracle checks the portable columns
    Decl("m01_media_ingest",
      (s, dir) => media(s, dir)
        .select($"media_id", $"kind",
          length($"payload").cast("long").as("n_bytes"),
          xxhash64($"payload").as("fingerprint"))
        .filter($"media_id" < 200)
        .select($"media_id", $"kind", $"n_bytes")
        .orderBy($"media_id"),
      Some("""SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             FROM documents WHERE doc_id < 200 ORDER BY media_id""")),

    // typed mapPartitions decode pipeline (the real-codec slot);
    // features exploded to rows for a dtype-stable dump. Stub output
    // is still deterministic, so the oracle recomputes the per-chunk
    // byte means relationally in DuckDB.
    Decl("m02_feature_extract_stub",
      (s, dir) => {
        implicit val enc = Encoders.product[MediaFeatures]
        val rows = media(s, dir).filter($"media_id" < 100)
          .as(Encoders.product[MediaRow])
          .mapPartitions { it =>
            // per-partition init would happen here (codec handles etc.)
            it.map(m => MediaFeatures(m.media_id, m.kind,
              m.payload.length.toLong, decodeStub(m.payload)))
          }
        rows.toDF()
          .select($"media_id", $"kind", $"n_bytes",
            posexplode($"features").as(Seq("chunk", "mean_byte")))
          .select($"media_id", $"kind", $"n_bytes", $"chunk".cast("long").as("chunk"),
            round($"mean_byte", 6).as("mean_byte"))
          .orderBy($"media_id", $"chunk")
      },
      // byte-level folds over BLOBs are not expressible in DuckDB SQL —
      // semantics pinned in MultimodalSpec instead (driver: rows-only)
      None),

    // frame sampling: payload as fixed-size frames, keep every 3rd;
    // expression-only (no UDF), oracle checks frame accounting
    Decl("m03_frame_sample",
      (s, dir) => media(s, dir).filter($"media_id" < 100)
        .withColumn("n_bytes", length($"payload"))
        .withColumn("frame_size", lit(64))
        .withColumn("n_frames", ceil($"n_bytes" / $"frame_size").cast("long"))
        .select($"media_id", $"n_frames",
          posexplode(expr("transform(sequence(0, CAST(n_frames - 1 AS INT), 3), " +
            "i -> length(substring(payload, i * 64 + 1, 64)))"))
            .as(Seq("k", "frame_len")))
        // posexplode's pos is the ordinal; the sampled frame index is
        // ordinal × stride
        .select($"media_id", $"n_frames", ($"k" * 3).cast("long").as("sample_idx"),
          $"frame_len".cast("long").as("frame_len"))
        .orderBy($"media_id", $"sample_idx"),
      // DuckDB cannot slice BLOBs; the corpus is ASCII so byte frames
      // == char frames and the oracle slices the text directly
      Some("""WITH f AS (SELECT doc_id AS media_id, text,
                    CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames
                    FROM documents WHERE doc_id < 100)
             SELECT media_id, n_frames, CAST(k AS BIGINT) AS sample_idx,
               CAST(length(substring(text, CAST(k AS INT) * 64 + 1, 64)) AS BIGINT) AS frame_len
             FROM f, LATERAL (SELECT unnest(range(0, CAST(n_frames AS INT), 3)) AS k)
             ORDER BY media_id, sample_idx"""))
  )
}
