package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Opaque binary payload + typed metadata. `payload` maps to Spark
  * BinaryType via the case-class Encoder; everything downstream treats
  * it as an uninterpreted byte blob, the way image/audio/video columns
  * ride through a real training-data pipeline. */
case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

/** Decoded per-asset features. Fixed-width, codegen-friendly schema. */
case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Int,
    n_distinct_bytes: Int, byte_sum: Long, width: Int, height: Int)

/** One sampled frame of a video payload. */
case class MediaFrame(asset_id: Long, frame_idx: Int, frame_hash: Long)

/** Multimodal-column operators: decode / feature-extract / resize /
  * frame-sample over opaque `binary` payloads.
  *
  * The decode step is REAL for two container formats — BMP (54-byte
  * BITMAPFILEHEADER + BITMAPINFOHEADER: magic, little-endian i32
  * width/height, pixel-data offset) and canonical 44-byte PCM WAV
  * (RIFF/WAVE/fmt chunk: LE u16 channels, LE u32 sample rate) — both
  * parsed from the actual payload bytes in `decodeContainer`, pure JVM,
  * no native codec. Formats that would need a native library (video
  * codecs, compressed images) fall through to a DOCUMENTED STUB branch
  * returning deterministic fake dimensions from the payload bytes.
  * Everything around the decoder — the BinaryType schema, the
  * per-partition batch iteration (`mapPartitions`, the Scala analog of
  * `mapInPandas`: one JVM-side pass per partition, no per-row lambda
  * dispatch, no shuffle), the typed Encoders, and the frame fan-out —
  * is real and tested.
  *
  * The binary corpus is derived deterministically from `documents`
  * (UTF-8 text bytes as stand-in payloads, kind = doc_id mod 3), which
  * keeps the whole path DuckDB-oracle-checkable byte for byte. NOTE:
  * the oracle SQL iterates CHARACTERS (string_split/unicode) while
  * the byte_sum/frame_hash paths iterate BYTES — equivalent only
  * because the synthetic corpus is pure ASCII (verified); a non-ASCII
  * corpus would need a blob-based oracle for those, not a code change
  * here. The stub WIDTH/HEIGHT branches, by contrast, are computed
  * from UTF-8 CODE POINTS on this side (see `decodeContainer`), so
  * they match the oracle's unicode() on any corpus. Empty documents are
  * guarded on BOTH sides (DuckDB's string_split('','') is [''] and
  * unicode('') is -1, which would otherwise diverge from the guarded
  * decoder).
  *
  * Scale: every operator here is a narrow map/flatMap — partition
  * count and placement are preserved end-to-end (asserted in the
  * spec), so a 100 TB corpus flows through without a single shuffle
  * until the final aggregation.
  */
object Multimodal {

  private val P = 1000000007L
  private val FrameStride = 64
  private val FrameLen = 16
  private val MaxFrames = 8

  private val kinds = Seq("image", "audio", "video")

  /** Binary corpus: one opaque payload per document. */
  def assets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("asset_id"),
        element_at(typedLit(kinds), (col("doc_id") % 3).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  // ---- Real container codecs (BMP / canonical PCM WAV) --------------

  /** Deterministic container parameters for the synthetic corpus —
    * replicated arithmetically by the m1 oracle, so a parse error in
    * `decodeContainer` hash-fails the round. */
  private[multimodal] def bmpDims(id: Long): (Int, Int) =
    (16 + (id % 64).toInt, 16 + ((id / 7) % 64).toInt)
  private[multimodal] def wavParams(id: Long): (Int, Int) =
    (1 + (id % 2).toInt, 8000 + (id % 5).toInt * 8000)

  private def le(n: Int): java.nio.ByteBuffer =
    java.nio.ByteBuffer.allocate(n).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  /** Real 54-byte BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * 24-bit uncompressed) in front of `body`. Field layout per the
    * public Windows BMP format. */
  private[multimodal] def encodeBmp(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val b = le(54 + body.length)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(54 + body.length) // file size
      .putInt(0)                // reserved
      .putInt(54)               // pixel-data offset
      .putInt(40)               // biSize (BITMAPINFOHEADER)
      .putInt(width).putInt(height)
      .putShort(1)              // planes
      .putShort(24)             // bits per pixel
      .putInt(0)                // BI_RGB (uncompressed)
      .putInt(body.length)      // image data size
      .putInt(2835).putInt(2835) // 72 dpi in px/m
      .putInt(0).putInt(0)      // palette sizes
      .put(body)
    b.array()
  }

  /** Real canonical 44-byte PCM WAV header (RIFF/WAVE + fmt + data
    * chunks) in front of `body`. */
  private[multimodal] def encodeWav(channels: Int, sampleRate: Int, body: Array[Byte]): Array[Byte] = {
    val bits = 16
    val b = le(44 + body.length)
    b.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + body.length) // RIFF chunk size
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII"))
      .putInt(16)               // fmt chunk size (PCM)
      .putShort(1)              // audio format = PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * bits / 8) // byte rate
      .putShort((channels * bits / 8).toShort)  // block align
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII"))
      .putInt(body.length)
      .put(body)
    b.array()
  }

  private def leU16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def leI32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) | ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
  private def tag(p: Array[Byte], o: Int, t: String): Boolean =
    t.indices.forall(i => p(o + i) == t.charAt(i).toByte)

  /** REAL DECODER for BMP and WAV payloads: validates the container
    * magic and parses (width, height) / (channels, kHz) plus the body
    * offset from the actual header bytes. Unknown formats (the video
    * stand-ins here; any codec needing a native lib) fall through to
    * the deterministic STUB branch — fake dims from the payload bytes,
    * body offset 0 — kept loudly documented. Returns
    * (width, height, bodyOffset); for WAV, width = channels and
    * height = sample rate in kHz. ASCII stand-in payloads can never
    * false-positive the BMP/WAV checks: both require 0x00 bytes at
    * fixed header offsets, which ASCII text cannot contain. */
  private[multimodal] def decodeContainer(p: Array[Byte]): (Int, Int, Int) =
    if (p.length >= 54 && p(0) == 'B' && p(1) == 'M' && leI32(p, 14) == 40)
      (leI32(p, 18), leI32(p, 22), leI32(p, 10))
    else if (p.length >= 44 && tag(p, 0, "RIFF") && tag(p, 8, "WAVE") &&
        tag(p, 12, "fmt ") && leU16(p, 20) == 1)
      (leU16(p, 22), leI32(p, 24) / 1000, 44)
    else if (p.isEmpty) (0, 0, 0)
    else {
      // Stub dims from the first/last UNICODE CODE POINTS of the
      // payload decoded as UTF-8 — matching the oracle's
      // unicode(substr(text, …)) exactly, so the parity holds on
      // non-ASCII corpora too (a last-BYTE formula would diverge the
      // moment any document ends in a multi-byte character).
      val s = new String(p, java.nio.charset.StandardCharsets.UTF_8)
      (16 + s.codePointAt(0) % 64, 16 + s.codePointBefore(s.length) % 64, 0)
    }

  /** Binary corpus wrapped in REAL containers: image payloads become
    * well-formed BMP files, audio payloads canonical PCM WAVs (both
    * with doc_id-derived parameters the oracle recomputes); video
    * payloads stay raw — the formats a pure-JVM decoder can't parse
    * are exactly the ones left to the stub branch. Narrow map. */
  def containerAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    assets(s, d).map { a =>
      a.kind match {
        case "image" =>
          val (w, h) = bmpDims(a.asset_id)
          a.copy(payload = encodeBmp(w, h, a.payload))
        case "audio" =>
          val (c, r) = wavParams(a.asset_id)
          a.copy(payload = encodeWav(c, r, a.payload))
        case _ => a
      }
    }
  }

  /** Batch feature extraction: one pass per partition over the binary
    * payloads — decode the container header, then byte stats over the
    * BODY only (n_bytes excludes the header). Narrow (no shuffle),
    * preserves partitioning. */
  def extractFeatures(ds: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { assets =>
      // per-partition scratch reused across the batch — the point of
      // mapPartitions over map: allocate once, stream the partition.
      val seen = new java.util.BitSet(256)
      assets.map { a =>
        val (w, h, off) = decodeContainer(a.payload)
        seen.clear()
        var sum = 0L
        var i = off
        while (i < a.payload.length) {
          val b = a.payload(i) & 0xff
          seen.set(b)
          sum = (sum + b) % P
          i += 1
        }
        MediaFeatures(a.asset_id, a.kind, a.payload.length - off, seen.cardinality(), sum, w, h)
      }
    }
  }

  /** "Resize": pure metadata transform capping the longest side at
    * `maxDim`, preserving aspect via integer math (deterministic, no
    * floats). The pixel resample would live in the stubbed decode
    * layer; schema-wise this is the whole operation. */
  def resizeMeta(ds: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val longest = math.max(f.width, f.height)
      if (longest <= maxDim || longest == 0) f
      else f.copy(width = f.width * maxDim / longest, height = f.height * maxDim / longest)
    }
  }

  /** Frame sampling: video payloads fan out to ≤8 fixed-stride frames,
    * each fingerprinted with the polynomial byte hash. flatMap = narrow
    * generator, no shuffle. */
  def sampleFrames(ds: Dataset[MediaAsset]): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { a =>
      // guard len < FrameLen explicitly: Java int division truncates
      // toward zero, so (len-16)/64 + 1 would be 1 for 0..15-byte
      // payloads and the frame read would run past the end
      val nFrames =
        if (a.payload.length < FrameLen) 0
        else math.min(MaxFrames, (a.payload.length - FrameLen) / FrameStride + 1)
      (0 until nFrames).iterator.map { k =>
        var h = 0L
        var i = k * FrameStride
        val end = i + FrameLen
        while (i < end) { h = (h * 257 + (a.payload(i) & 0xff)) % P; i += 1 }
        MediaFrame(a.asset_id, k, h)
      }
    }
  }

  // -------------------------------------------------------------------
  // M1: per-kind feature aggregation over the DECODED corpus — image
  // assets are real BMP files and audio assets real PCM WAVs
  // (containerAssets), so width/height come out of an actual header
  // parse (BMP: LE i32 dims; WAV: channels + kHz); the oracle
  // recomputes the encode parameters arithmetically from doc_id, so
  // any mis-parsed header field hash-fails. Byte stats cover the BODY
  // (text bytes) on both sides. Video stays on the stub branch.
  // -------------------------------------------------------------------
  def m1MediaFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(containerAssets(s, d))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        round(sum(col("n_distinct_bytes").cast(DecimalType(30, 6))) / count(lit(1)), 6)
          .cast("double").as("avg_distinct_bytes"),
        sum(col("byte_sum")).as("checksum"),
        round(sum(col("width").cast(DecimalType(30, 6))) / count(lit(1)), 6)
          .cast("double").as("avg_width"),
        round(sum(col("height").cast(DecimalType(30, 6))) / count(lit(1)), 6)
          .cast("double").as("avg_height"))
      .orderBy("kind")

  val m1Sql: String =
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |         text, length(text) AS n_bytes,
      |         CASE WHEN length(text) = 0 THEN 0
      |              ELSE len(list_distinct(string_split(text, ''))) END AS n_distinct_bytes,
      |         CASE WHEN length(text) = 0 THEN 0
      |              ELSE list_reduce(list_transform(string_split(text, ''),
      |                c -> CAST(unicode(c) AS BIGINT)), (h, c) -> (h + c) % 1000000007) END AS byte_sum,
      |         CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 64
      |              WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2
      |              WHEN length(text) = 0 THEN 0
      |              ELSE 16 + unicode(substr(text, 1, 1)) % 64 END AS width,
      |         CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id // 7) % 64
      |              WHEN doc_id % 3 = 1 THEN 8 + (doc_id % 5) * 8
      |              WHEN length(text) = 0 THEN 0
      |              ELSE 16 + unicode(substr(text, length(text), 1)) % 64 END AS height
      |  FROM documents)
      |SELECT kind, COUNT(*) AS n_assets, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |       CAST(ROUND(SUM(CAST(n_distinct_bytes AS DECIMAL(30,6)))/COUNT(*), 6) AS DOUBLE) AS avg_distinct_bytes,
      |       CAST(SUM(byte_sum) AS BIGINT) AS checksum,
      |       CAST(ROUND(SUM(CAST(width AS DECIMAL(30,6)))/COUNT(*), 6) AS DOUBLE) AS avg_width,
      |       CAST(ROUND(SUM(CAST(height AS DECIMAL(30,6)))/COUNT(*), 6) AS DOUBLE) AS avg_height
      |FROM a GROUP BY kind ORDER BY kind""".stripMargin

  // -------------------------------------------------------------------
  // M2: frame sampling fan-out — every video asset's ≤8 frame
  // fingerprints.
  // -------------------------------------------------------------------
  def m2FrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(assets(s, d)).toDF()
      .select(col("asset_id"), col("frame_idx"), col("frame_hash"))
      .orderBy("asset_id", "frame_idx")

  val m2Sql: String =
    s"""SELECT doc_id AS asset_id, CAST(k AS INT) AS frame_idx,
      |       list_reduce(list_transform(string_split(substr(text, CAST(k*$FrameStride+1 AS INT), $FrameLen), ''),
      |         c -> CAST(unicode(c) AS BIGINT)), (h, c) -> (h*257 + c) % $P) AS frame_hash
      |FROM documents, UNNEST(range(0, $MaxFrames)) AS u(k)
      |WHERE doc_id % 3 = 2 AND k*$FrameStride + $FrameLen <= length(text)
      |ORDER BY asset_id, frame_idx""".stripMargin

  // -------------------------------------------------------------------
  // M3: resize pass over the decoded corpus — caps the longest side at
  // 32 via resizeMeta and reports, per kind, how many assets end at the
  // cap (n_capped counts longest-side == 32 after resize, which
  // includes assets that were already exactly 32) and the post-resize
  // dimension profile. This puts the resize operator itself (not just
  // decode/extract) under the DuckDB oracle.
  // -------------------------------------------------------------------
  private val ResizeMax = 32

  def m3Resize(s: SparkSession, d: String): DataFrame = {
    resizeMeta(extractFeatures(assets(s, d)), ResizeMax).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(when(greatest(col("width"), col("height")) === ResizeMax, 1L).otherwise(0L))
          .as("n_capped"),
        round(sum(col("width").cast(DecimalType(30, 6))) / count(lit(1)), 6)
          .cast("double").as("avg_width_after"),
        max(col("height")).as("max_height_after"))
      .orderBy("kind")
  }

  val m3Sql: String =
    s"""WITH dims AS (
      |  SELECT doc_id AS asset_id,
      |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |         CASE WHEN length(text) = 0 THEN 0
      |              ELSE 16 + unicode(substr(text, 1, 1)) % 64 END AS w0,
      |         CASE WHEN length(text) = 0 THEN 0
      |              ELSE 16 + unicode(substr(text, length(text), 1)) % 64 END AS h0
      |  FROM documents),
      |resized AS (
      |  SELECT asset_id, kind,
      |         CASE WHEN GREATEST(w0, h0) <= $ResizeMax OR GREATEST(w0, h0) = 0 THEN w0
      |              ELSE w0 * $ResizeMax // GREATEST(w0, h0) END AS width,
      |         CASE WHEN GREATEST(w0, h0) <= $ResizeMax OR GREATEST(w0, h0) = 0 THEN h0
      |              ELSE h0 * $ResizeMax // GREATEST(w0, h0) END AS height
      |  FROM dims)
      |SELECT kind, COUNT(*) AS n_assets,
      |       CAST(SUM(CASE WHEN GREATEST(width, height) = $ResizeMax THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
      |       CAST(ROUND(SUM(CAST(width AS DECIMAL(30,6))) / COUNT(*), 6) AS DOUBLE) AS avg_width_after,
      |       CAST(MAX(height) AS INT) AS max_height_after
      |FROM resized GROUP BY kind ORDER BY kind""".stripMargin

  // -------------------------------------------------------------------
  // M4: chunk-level binary dedup — content-addressable-storage
  // accounting over the opaque payloads: fixed 32-byte chunks, md5
  // digest per chunk, unique-vs-total ratio per kind (the dedup factor
  // a CAS/blob store achieves on the corpus). Fixed-boundary chunking
  // is the deterministic baseline (a rolling-hash content-defined
  // chunker slots in the same pipeline shape). The whole pass is a
  // narrow explode + one digest-key aggregation — a linear shuffle on
  // the digest; identical chunks land on one reducer regardless of
  // which asset or executor produced them, which is exactly the CAS
  // property. ASCII payloads keep the byte-chunk digests equal to the
  // oracle's char-chunk digests (same caveat as M1, verified there).
  // -------------------------------------------------------------------
  private val ChunkBytes = 32

  def m4ChunkDedup(s: SparkSession, d: String): DataFrame = {
    val chunks = assets(s, d).toDF()
      .withColumn("n", ceil(length(col("payload")) / lit(ChunkBytes.toDouble)).cast("int"))
      .filter(col("n") > 0)
      .select(col("kind"),
        explode(expr(
          s"transform(sequence(0, n - 1), i -> substring(payload, i * $ChunkBytes + 1, $ChunkBytes))"))
          .as("chunk"))
      .withColumn("digest", md5(col("chunk")))
    chunks.groupBy("kind")
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("digest")).as("n_unique"),
        round(countDistinct(col("digest")).cast(DecimalType(30, 6)) / count(lit(1)), 6)
          .cast("double").as("unique_frac"))
      .orderBy("kind")
  }

  val m4Sql: String =
    s"""WITH a AS (SELECT doc_id AS asset_id,
      |                  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |                  text FROM documents),
      |c AS (SELECT kind, md5(substring(text, (i - 1) * $ChunkBytes + 1, $ChunkBytes)) AS digest
      |      FROM a, UNNEST(range(1, CAST(ceil(len(text) / $ChunkBytes.0) AS BIGINT) + 1)) t(i)
      |      WHERE len(text) > 0)
      |SELECT kind, COUNT(*) AS n_chunks, COUNT(DISTINCT digest) AS n_unique,
      |       CAST(ROUND(CAST(COUNT(DISTINCT digest) AS DECIMAL(30,6)) / COUNT(*), 6) AS DOUBLE) AS unique_frac
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // M5: byte-distribution uniformity — the compressibility/corruption
  // triage pass a binary-ingest pipeline runs before spending codec
  // time: a payload whose byte histogram is near-uniform is already
  // compressed (or encrypted/corrupt); a heavily peaked one is text or
  // raw bitmap. The statistic is the ALL-INTEGER per-byte scaled
  // chi-square against uniform: with c_b the count of byte b and
  // L = Σc_b,
  //   chi2pb = (Σ_b (256·c_b − L)²) / L = (65536·Σc² − 256·L²) / L,
  // which needs only the present-byte squared counts. The numerator
  // can exceed int64 for peaked payloads ≥ ~12 MB (65536·L² at the
  // constant-byte extreme), so it is computed in BigInt and only the
  // L-normalized quotient — bounded by 65280·L, int64-safe for any
  // array-sized payload — is emitted; the DuckDB oracle's HUGEINT sum
  // follows the same exact route. Truncating division is identical on
  // both engines for the non-negative operands here. Computed in the
  // same narrow mapPartitions batch pass as M1 (shared scratch, no
  // shuffle until the per-kind aggregate). Empty payloads score 0.
  // -------------------------------------------------------------------
  def m5Uniformity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scored = assets(s, d).mapPartitions { as =>
      val counts = new Array[Long](256)
      as.map { a =>
        java.util.Arrays.fill(counts, 0L)
        var i = 0
        while (i < a.payload.length) {
          counts(a.payload(i) & 0xff) += 1; i += 1
        }
        var sumsq = 0L
        var b = 0
        while (b < 256) { sumsq += counts(b) * counts(b); b += 1 }
        val len = a.payload.length.toLong
        val chi2pb =
          if (len == 0) 0L
          else ((BigInt(65536) * sumsq - BigInt(256) * len * len) / len).toLong
        (a.asset_id, a.kind, len, chi2pb)
      }
    }.toDF("asset_id", "kind", "n_bytes", "chi2pb")
    scored.groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("chi2pb")).as("chi2pb_total"),
        min(col("chi2pb")).as("chi2pb_min"),
        max(col("chi2pb")).as("chi2pb_max"))
      .orderBy("kind")
  }

  /** Character-based oracle (ASCII corpus ⇒ chars == bytes, same
    * equivalence note as m1). */
  val m5Sql: String =
    """WITH a AS (SELECT doc_id AS asset_id,
      |                  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |                  text, CAST(length(text) AS BIGINT) AS n_bytes
      |           FROM documents),
      |cc AS (SELECT asset_id, COUNT(*) AS c
      |       FROM (SELECT asset_id, UNNEST(string_split(text, '')) AS ch FROM a WHERE length(text) > 0)
      |       GROUP BY asset_id, ch),
      |sq AS (SELECT asset_id, SUM(c * c) AS sumsq FROM cc GROUP BY 1),
      |sc AS (SELECT a.asset_id, a.kind, a.n_bytes,
      |              CASE WHEN a.n_bytes = 0 THEN 0
      |                   ELSE (65536 * COALESCE(sq.sumsq, 0)
      |                         - 256 * CAST(a.n_bytes AS HUGEINT) * a.n_bytes) // a.n_bytes
      |              END AS chi2pb
      |       FROM a LEFT JOIN sq USING (asset_id))
      |SELECT kind, COUNT(*) AS n_assets, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |       CAST(SUM(chi2pb) AS BIGINT) AS chi2pb_total,
      |       CAST(MIN(chi2pb) AS BIGINT) AS chi2pb_min,
      |       CAST(MAX(chi2pb) AS BIGINT) AS chi2pb_max
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------------
  // M6: video near-dup detection by shared frame fingerprints — the
  // multimodal analog of d2's text LSH: two videos sharing sampled-
  // frame hashes are re-encodes/clips of the same content. Candidate
  // pairs come from an equi-join on frame_hash (content-addressed, the
  // only scalable join key for binary media), with a document-frequency
  // cap (same MOSS-boilerplate rule as t4: a frame hash present in
  // > 64 videos is a test card/black frame and identifies nothing);
  // verification computes exact frame-set Jaccard over candidate pairs
  // only. Per-pair arithmetic is count ratios (integers + one per-row
  // IEEE division) — engine-exact.
  // -------------------------------------------------------------------
  private val FrameDfCap = 64

  def m6VideoNeardup(s: SparkSession, d: String): DataFrame = {
    val frames = sampleFrames(assets(s, d)).toDF()
      .select(col("asset_id"), col("frame_hash")).distinct()
    val capped = frames.join(
      frames.groupBy("frame_hash").agg(count(lit(1)).as("dfh"))
        .filter(col("dfh") <= FrameDfCap).select("frame_hash"),
      "frame_hash")
    val sizes = frames.groupBy("asset_id").agg(count(lit(1)).as("nf"))
    val pairs = capped.select(col("frame_hash"), col("asset_id").as("va"))
      .join(capped.select(col("frame_hash"), col("asset_id").as("vb")), "frame_hash")
      .filter(col("va") < col("vb"))
      .groupBy("va", "vb").agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("asset_id").as("va"), col("nf").as("na")), "va")
      .join(sizes.select(col("asset_id").as("vb"), col("nf").as("nb")), "vb")
      .select(col("va"), col("vb"), col("n_shared"), col("na"), col("nb"),
        (col("n_shared").cast("double") /
          (col("na") + col("nb") - col("n_shared")).cast("double")).as("jacc"))
      .orderBy("va", "vb")
  }

  val m6Sql: String =
    s"""WITH fr AS (SELECT doc_id AS asset_id,
      |                   list_reduce(list_transform(string_split(substr(text, CAST(k*$FrameStride+1 AS INT), $FrameLen), ''),
      |                     c -> CAST(unicode(c) AS BIGINT)), (h, c) -> (h*257 + c) % $P) AS frame_hash
      |            FROM documents, UNNEST(range(0, $MaxFrames)) AS u(k)
      |            WHERE doc_id % 3 = 2 AND k*$FrameStride + $FrameLen <= length(text)),
      |f AS (SELECT DISTINCT asset_id, frame_hash FROM fr),
      |cap AS (SELECT f.asset_id, f.frame_hash
      |        FROM f JOIN (SELECT frame_hash FROM f GROUP BY 1 HAVING COUNT(*) <= $FrameDfCap) ok
      |        USING (frame_hash)),
      |sz AS (SELECT asset_id, COUNT(*) AS nf FROM f GROUP BY 1),
      |p AS (SELECT a.asset_id AS va, b.asset_id AS vb, COUNT(*) AS n_shared
      |      FROM cap a JOIN cap b ON a.frame_hash = b.frame_hash AND a.asset_id < b.asset_id
      |      GROUP BY 1, 2)
      |SELECT p.va, p.vb, p.n_shared, sa.nf AS na, sb.nf AS nb,
      |       CAST(p.n_shared AS DOUBLE) / (sa.nf + sb.nf - p.n_shared) AS jacc
      |FROM p JOIN sz sa ON sa.asset_id = p.va JOIN sz sb ON sb.asset_id = p.vb
      |ORDER BY va, vb""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("m1_media_features", m1MediaFeatures _, m1Sql),
    ("m2_frame_sample", m2FrameSample _, m2Sql),
    ("m3_resize", m3Resize _, m3Sql),
    ("m4_chunk_dedup", m4ChunkDedup _, m4Sql),
    ("m5_uniformity", m5Uniformity _, m5Sql),
    ("m6_video_neardup", m6VideoNeardup _, m6Sql))
}
