package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (north-star extension; the container has no codec libraries, so
  * the DECODE STEP IS A DETERMINISTIC FAKE — it parses a synthetic header
  * we generate ourselves. Everything around it — schema, batch shape,
  * mapPartitions plumbing, partitioning — is real and tested, so swapping
  * in a real codec is a one-function change).
  *
  * Batch shape: typed Dataset + mapPartitions so a real decoder could
  * amortize per-partition init (model load, codec context) exactly where
  * the fake sits. At 100 TB the binary column dominates row size — the
  * media table carries only (id, media, format) and all metadata joins
  * happen on the slim decoded side.
  */
object Multimodal {

  /** Decoded media metadata — what a real image decoder would surface. */
  case class MediaMeta(doc_id: Long, format: String, width: Int, height: Int,
                       n_bytes: Long, mean_byte: Double)

  case class MediaRow(doc_id: Long, format: String, media: Array[Byte])

  /** Synthesize a deterministic fake "image": 8-byte header
    * [width:int32BE][height:int32BE] + the document text bytes as payload.
    * Stands in for real image files; derived from the documents table so
    * the driver contract can exercise it.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), col("text"))
      .as[(Long, Long, String)]
      .map { case (id, nChars, text) =>
        val w = (nChars % 64 + 1).toInt
        val h = (nChars % 48 + 1).toInt
        val payload = text.getBytes("UTF-8")
        val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
        buf.putInt(w).putInt(h).put(payload)
        MediaRow(id, "fakeimg", buf.array())
      }
  }

  /** ===== STUB DECODER =====
    * Parses the synthetic header above. A real implementation would call an
    * image codec here (per-partition init + per-row decode); the signature,
    * batching, and output schema are the real contract.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init decoder context once per partition here
      rows.map { r =>
        val buf = java.nio.ByteBuffer.wrap(r.media)
        val w = buf.getInt(); val h = buf.getInt()
        val payload = r.media.drop(8)
        val mean =
          if (payload.isEmpty) 0.0
          else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length
        MediaMeta(r.doc_id, r.format, w, h, r.media.length.toLong, mean)
      }
    }
  }

  /** Resize stub: rewrites header dims, truncates payload proportionally —
    * deterministic stand-in for a real scaler, keeps the binary contract.
    */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val buf = java.nio.ByteBuffer.wrap(r.media)
        val w = buf.getInt(); val h = buf.getInt()
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        val payload = r.media.drop(8)
        // keep=0 for an empty payload (header-only media is in-domain)
        val keep = if (payload.isEmpty) 0 else math.max(1, (payload.length * scale).toInt)
        val out = java.nio.ByteBuffer.allocate(8 + keep)
        out.putInt(nw).putInt(nh).put(payload, 0, keep)
        r.copy(media = out.array())
      }
    }
  }

  /** Frame sampling: view the payload as fixed-size frames, keep every
    * k-th — the video-pipeline shape (explode to one row per kept frame).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val payload = r.media.drop(8)
      payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (frame, idx) => (r.doc_id, idx, frame.length, frame) }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "frame")
  }

  /** Driver-contract query: decode metadata for every synthesized media
    * row. Columns chosen to be derivable from the documents table so the
    * DuckDB oracle can check the full encode→decode roundtrip.
    */
  def q70MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeMeta(mediaTable(spark, dir))
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"))
      .orderBy(col("doc_id"))
  }

  val q70Sql: String =
    """SELECT doc_id,
      |  CAST(n_chars % 64 + 1 AS INT) AS width,
      |  CAST(n_chars % 48 + 1 AS INT) AS height,
      |  octet_length(encode(text)) + 8 AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame-sampling query. The payload is the document's UTF-8 bytes, so
    * the kept-frame indices and sizes are pure arithmetic over the byte
    * length — fully oracle-checkable. */
  def q71FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), frameBytes = 32, everyK = 3)
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Frames of 32 payload bytes, every 3rd kept; last frame is the
    * remainder. n_chars == octet_length(encode(text)) for this corpus
    * (ASCII) but the oracle derives the length from the text itself. */
  val q71Sql: String =
    """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents),
      |f AS (
      |  SELECT doc_id, len, unnest(range((len + 31) // 32)) AS idx
      |  FROM d WHERE len > 0)
      |SELECT doc_id, CAST(idx AS INT) AS frame_idx,
      |  CAST(CASE WHEN (idx + 1) * 32 <= len THEN 32 ELSE len - idx * 32 END AS INT)
      |    AS frame_bytes
      |FROM f WHERE idx % 3 = 0 ORDER BY doc_id, frame_idx""".stripMargin

  /** ===== STUB FEATURE EXTRACTOR =====
    * The missing third stage of the media pipeline (decode → transform →
    * EMBED). Per-partition "model" initialization + per-row map to a
    * fixed-dim Array[Float] — exactly the batching contract a real vision
    * encoder needs (weights loaded once per partition, rows streamed
    * through). The stub computes byte-stripe means so outputs are
    * deterministic for tests; the downstream contract (fixed dim,
    * unit-range floats, feeds VectorOps centroids/ANN unchanged) is real.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real path: load encoder weights ONCE here, reuse across rows
      rows.map { r =>
        val acc = Array.ofDim[Float](dim)
        val p = r.media
        var i = 0
        while (i < p.length) { acc(i % dim) += (p(i) & 0xff); i += 1 }
        if (p.nonEmpty) {
          val per = math.max(p.length.toFloat / dim, 1f)
          var d = 0
          while (d < dim) { acc(d) = acc(d) / per / 255f; d += 1 }
        }
        (r.doc_id, acc)
      }
    }.toDF("doc_id", "features")
  }

  /** Media-embedding query. Demonstrates the full multimodal chain: synth
    * media → stub encoder (n_dims comes from the extractFeatures output,
    * so the encoder runs under the driver check) → per-row norm. The
    * driver-compared norm is computed from the INTEGER stripe sums (exact
    * in both engines — the media bytes are header + document UTF-8, so
    * the oracle rebuilds them from the text); the float-normalized
    * features keep their unit-range contract under MultimodalSpec.
    */
  def q80MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    val nDims = extractFeatures(media, dim = 8)
      .select(col("doc_id"), size(col("features")).as("n_dims"))
    val rawNorm = media.map { r =>
      val acc = Array.ofDim[Long](8)
      var i = 0
      while (i < r.media.length) { acc(i % 8) += (r.media(i) & 0xff); i += 1 }
      (r.doc_id, math.sqrt(acc.map(v => v.toDouble * v).sum))
    }.toDF("doc_id", "norm_raw")
    nDims.join(rawNorm, "doc_id")
      .select(col("doc_id"), col("n_dims"), round(col("norm_raw"), 6).as("stripe_norm"))
      .orderBy(col("doc_id"))
  }

  /** Media bytes = [0,0,0,w, 0,0,0,h] header + UTF-8 text; byte i of the
    * payload is read out of hex(encode(text)). Stripe sums stay < 2^53 so
    * the sqrt sees the identical double in both engines. */
  val q80Sql: String =
    """WITH d AS (
      |  SELECT doc_id, n_chars, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS plen
      |  FROM documents),
      |bytes AS (
      |  SELECT doc_id, i,
      |    CASE
      |      WHEN i = 3 THEN n_chars % 64 + 1
      |      WHEN i = 7 THEN n_chars % 48 + 1
      |      WHEN i < 8 THEN 0
      |      ELSE ('0x' || substr(hx, 2 * (i - 8) + 1, 2))::BIGINT
      |    END AS v
      |  FROM d, LATERAL (SELECT unnest(range(plen + 8)) AS i) r),
      |stripes AS (
      |  SELECT doc_id, i % 8 AS d8, SUM(v) AS s FROM bytes GROUP BY doc_id, i % 8)
      |SELECT doc_id, CAST(8 AS INT) AS n_dims,
      |  ROUND(sqrt(CAST(SUM(s * s) AS DOUBLE)), 6) AS stripe_norm
      |FROM stripes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q70_media_meta", q70MediaMeta _, Some(q70Sql)),
    ("q71_frame_sample", q71FrameSample _, Some(q71Sql)),
    ("q80_media_features", q80MediaFeatures _, Some(q80Sql)))
}
