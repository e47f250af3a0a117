package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import syntax._

/** Part D (builder extension, SURVEY §2 addendum) — multimodal column
  * handling for a training-data pipeline: media as opaque BINARY
  * columns with typed metadata, decode/feature/frame-sample stages.
  *
  * No image/audio codec exists in this environment. Since r15 the
  * declared decode path (m02, m06) runs a REAL byte-level codec —
  * JDK zlib inflate over synthetically deflated payloads — through
  * the per-partition codec seam; [[IdentityCodec]] remains the
  * documented no-codec stance and the spec pins the two paths
  * feature-identical on the ASCII corpus. m04's RESIZE body stays a
  * clearly-marked deterministic stand-in (nearest-neighbor grid
  * gather — the shape a real image resize has). Everything around
  * the seam — binary payload construction, metadata schema, typed
  * mapPartitions batching, per-frame explode shape, partition
  * behavior — is real Spark.
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

  /** The CODEC SEAM (m02's slot, m06's proof): a real decoder plugs
    * in here. `init()` runs once per PARTITION — where a native codec
    * amortizes its setup — and `decode` maps raw media bytes to
    * decoded bytes. The pipeline around the seam (typed
    * mapPartitions, feature pooling, explode shape) never changes
    * when the codec does. */
  trait MediaCodec extends Serializable {
    /** Once per partition, before the first decode. */
    def init(): Unit = ()
    def decode(payload: Array[Byte]): Array[Byte]
  }

  /** m02's stub stance: the payload IS the decoded media (no codec in
    * the sandbox). */
  object IdentityCodec extends MediaCodec {
    override def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** m06: a REAL byte-level codec in the slot — zlib inflate, JDK
    * built-in, no image libraries needed. Proves the seam carries an
    * actual decoder: payloads arrive DEFLATED (synthetic compressed
    * media) and the per-partition pipeline inflates them before
    * feature pooling. */
  object ZlibCodec extends MediaCodec {
    override def decode(payload: Array[Byte]): Array[Byte] =
      inflateBytes(payload)
  }

  def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](math.max(64, b.length))
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end()
    out.toByteArray
  }

  def inflateBytes(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b)
    val buf = new Array[Byte](math.max(64, b.length * 4))
    val out = new java.io.ByteArrayOutputStream()
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      // empty-content streams: the call that yields 0 bytes is also
      // the one that flips finished — only a 0 with input exhausted
      // and the stream NOT finished is a truncation
      if (n == 0 && !inf.finished() && inf.needsInput())
        throw new java.util.zip.DataFormatException("truncated zlib payload")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** The decode STAGE — one shape for every codec: per-partition
    * init, then decode + pooled features per row. m02 runs it with
    * IdentityCodec (documented stub stance), m06 with ZlibCodec
    * (real decoder); the spec pins that the two paths share this
    * exact plumbing. */
  def decodeWith(codec: MediaCodec)(it: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    codec.init() // amortized once per partition — the native-codec slot
    it.map { m =>
      val decoded = codec.decode(m.payload)
      MediaFeatures(m.media_id, m.kind, decoded.length.toLong,
        decodeStub(decoded))
    }
  }

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

  /** STUB resize: nearest-neighbor 2× downsample of the payload viewed
    * as a width×height byte grid — the shape a real image resize would
    * have (gather strided pixels); deterministic and total. */
  def resizeStub(payload: Array[Byte], width: Int, factor: Int): Array[Byte] = {
    if (payload.isEmpty || width <= 0 || factor <= 0) return Array.emptyByteArray
    val height = math.ceil(payload.length.toDouble / width).toInt
    val out = collection.mutable.ArrayBuffer[Byte]()
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val idx = r * width + c
        if (idx < payload.length) out += payload(idx)
        c += factor
      }
      r += factor
    }
    out.toArray
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

    // typed mapPartitions decode pipeline with a REAL codec in the
    // slot (r15 — the m06-proven zlib seam promoted into the declared
    // feature-extract path): payloads arrive DEFLATED (synthetic
    // compressed media) and the per-partition decode stage INFLATES
    // them before feature pooling, so the declared multimodal surface
    // carries no stub decode body. IdentityCodec remains the
    // documented no-codec stance (MultimodalSpec pins stub ≡ codec on
    // the ASCII corpus). Features exploded to rows for a dtype-stable
    // dump. The corpus is pure ASCII (spec-checked), so decoded bytes
    // == code points and DuckDB CAN replay the chunk means
    // relationally (ord(substr(…)) folds) — a full value oracle.
    Decl("m02_feature_extract_stub",
      (s, dir) => {
        implicit val enc = Encoders.product[MediaFeatures]
        implicit val encR = Encoders.product[MediaRow]
        val rows = media(s, dir).filter($"media_id" < 100)
          .as(Encoders.product[MediaRow])
          .mapPartitions(_.map(m =>
            MediaRow(m.media_id, m.kind, deflateBytes(m.payload))))
          .mapPartitions(decodeWith(ZlibCodec))
        rows.toDF()
          .select($"media_id", $"kind", $"n_bytes",
            posexplode($"features").as(Seq("chunk", "mean_byte")))
          .select($"media_id", $"kind", $"n_bytes", $"chunk".cast("long").as("chunk"),
            round($"mean_byte", 6).as("mean_byte"))
          .orderBy($"media_id", $"chunk")
      },
      // mirrors decodeStub exactly: chunk = max(1, n/8); chunk c covers
      // bytes [c*chunk, min(n,(c+1)*chunk)); a chunk starting past the
      // payload is 0.0; trailing bytes past 8*chunk are dropped
      Some("""WITH m AS (SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               text AS s, CAST(length(text) AS BIGINT) AS n
               FROM documents WHERE doc_id < 100)
             SELECT media_id, kind, n AS n_bytes, CAST(c AS BIGINT) AS chunk,
               CASE WHEN c * GREATEST(n // 8, 1) >= n THEN 0.0
                    ELSE round((SELECT AVG(ord(substr(s, CAST(i + 1 AS INT), 1)))
                      FROM unnest(range(c * GREATEST(n // 8, 1),
                        LEAST(n, (c + 1) * GREATEST(n // 8, 1)))) AS t(i)), 6)
               END AS mean_byte
             FROM m, unnest(range(0, 8)) AS u(c)
             ORDER BY media_id, chunk""")),

    // resize: payload as a 64-wide byte grid, nearest-neighbor 2×
    // downsample in the typed pipeline; oracle checks the dimension
    // arithmetic (kept-rows × kept-cols accounting) relationally
    Decl("m04_resize_stub",
      (s, dir) => {
        implicit val enc = org.apache.spark.sql.Encoders
          .product[(Long, Long, Long, Long)]
        media(s, dir).filter($"media_id" < 100)
          .as(org.apache.spark.sql.Encoders.product[MediaRow])
          .mapPartitions { it =>
            it.map { m =>
              val resized = resizeStub(m.payload, width = 64, factor = 2)
              (m.media_id, m.payload.length.toLong,
                resized.length.toLong,
                resized.map(b => (b & 0xffL)).sum)
            }
          }
          .toDF("media_id", "n_bytes", "n_bytes_resized", "byte_sum")
          .select($"media_id", $"n_bytes", $"n_bytes_resized")
          .orderBy($"media_id")
      },
      // kept rows r ∈ {0,2,4,…}: full rows keep 32 of 64 cols; a
      // partial last row keeps ceil(rem/2)
      Some("""WITH m AS (SELECT doc_id AS media_id,
                    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                    FROM documents WHERE doc_id < 100),
             g AS (SELECT media_id, n_bytes,
                    CAST(CEIL(n_bytes / 64.0) AS BIGINT) AS height FROM m)
             SELECT media_id, n_bytes,
               CAST((SELECT COALESCE(SUM(CASE
                   WHEN (r + 1) * 64 <= n_bytes THEN 32
                   ELSE CAST(CEIL((n_bytes - r * 64) / 2.0) AS BIGINT) END), 0)
                FROM (SELECT unnest(range(0, CAST(height AS INT), 2)) AS r)
                WHERE r * 64 < n_bytes) AS BIGINT) AS n_bytes_resized
             FROM g ORDER BY media_id""")),

    // frame sampling: payload as fixed-size frames, keep every 3rd;
    // expression-only (no UDF), oracle checks frame accounting
    Decl("m03_frame_sample",
      (s, dir) => media(s, dir).filter($"media_id" < 100)
        .withColumn("n_bytes", length($"payload"))
        .withColumn("frame_size", lit(64))
        .withColumn("n_frames", ceil($"n_bytes" / $"frame_size").cast("long"))
        .select($"media_id", $"n_frames",
          // empty payload → n_frames = 0 → sequence(0, -1, 3) throws;
          // emit zero frames instead
          posexplode(expr("CASE WHEN n_frames <= 0 THEN array() " +
            "ELSE transform(sequence(0, CAST(n_frames - 1 AS INT), 3), " +
            "i -> length(substring(payload, i * 64 + 1, 64))) END"))
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
             ORDER BY media_id, sample_idx""")),

    // m05: media dedup by content — c01's exact-dedup shape over
    // opaque BINARY payloads: keep the min media_id per payload, with
    // the copy count as the audit column. One window shuffle keyed by
    // (xxhash64, payload); at 100 TB the shuffle key becomes
    // (hash64, fingerprint128) so payload bytes never move — the
    // equality verify then touches only colliding candidates. The
    // oracle groups by text, which equals payload-grouping because
    // UTF-8 encoding is injective.
    Decl("m05_media_dedup",
      (s, dir) => {
        val w = Window.partitionBy(xxhash64($"payload"), $"payload")
        media(s, dir)
          .withColumn("keeper", min($"media_id").over(w))
          .withColumn("n_copies", count(lit(1)).over(w).cast("long"))
          .filter($"media_id" === $"keeper")
          .select($"media_id", $"n_copies",
            length($"payload").cast("long").as("n_bytes"))
          .orderBy($"media_id")
      },
      Some("""SELECT CAST(MIN(doc_id) AS BIGINT) AS media_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             FROM documents GROUP BY text ORDER BY media_id""")),

    // m06: a REAL codec in m02's slot — zlib (JDK built-in). Payloads
    // arrive DEFLATED (synthetic compressed media); the decode stage
    // inflates them per partition through the SAME decodeWith
    // plumbing m02 runs, then pools the same features. Because
    // inflate∘deflate is identity on the original bytes, the decoded
    // sizes are DuckDB-checkable against the source text — the codec
    // path gets a real oracle where the stub could not — and the
    // features_match witness pins that the zlib path produces
    // byte-identical features to the identity path (the "swap the
    // codec, keep the pipeline" claim, demonstrated).
    Decl("m06_zlib_codec",
      (s, dir) => {
        implicit val encR = Encoders.product[MediaRow]
        implicit val encF = Encoders.product[MediaFeatures]
        val raw = media(s, dir).filter($"media_id" < 100)
        // synthetic compressed media: deflate each payload (typed
        // stage, same partition-local shape as any encode pipeline)
        val deflated = raw.as(Encoders.product[MediaRow])
          .mapPartitions(_.map(m =>
            MediaRow(m.media_id, m.kind, deflateBytes(m.payload))))
        val viaZlib = deflated.mapPartitions(decodeWith(ZlibCodec)).toDF()
        val viaIdentity = raw.as(Encoders.product[MediaRow])
          .mapPartitions(decodeWith(IdentityCodec)).toDF()
        // the swap witness: identical features from both codec paths
        val mismatches = viaZlib.as("z")
          .join(viaIdentity.as("i"), Seq("media_id"))
          .filter($"z.n_bytes" =!= $"i.n_bytes" ||
            $"z.features" =!= $"i.features")
          .count()
        viaZlib
          .select($"media_id", $"kind", $"n_bytes".as("n_bytes_decoded"))
          .withColumn("features_match", lit(mismatches == 0L))
          .orderBy($"media_id")
      },
      Some("""SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_decoded,
             TRUE AS features_match
             FROM documents WHERE doc_id < 100 ORDER BY media_id"""))
  )
}
