package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (north-star extension). The media column carries REAL PNG
  * files: [[pngEncode]] writes spec-compliant 8-bit grayscale PNGs with
  * nothing but the JDK (CRC32 + Deflater), metadata extraction parses the
  * IHDR chunk, and pixel decode goes through the JDK's own ImageIO PNG
  * codec — no external codec jars, no synthetic stand-in format.
  *
  * Batch shape: typed Dataset + mapPartitions so heavier codecs/encoders
  * can amortize per-partition init (codec context, model weights) exactly
  * where the JDK codec sits. At 100 TB the binary column dominates row
  * size — the media table carries only (id, media, format) and all
  * metadata joins happen on the slim decoded side.
  *
  * Oracle strategy: pixel content is a deterministic function of the
  * document text (pixel i = text byte i mod len), so everything derived
  * from DECODED pixels or IHDR dims is DuckDB-checkable from the documents
  * table — while the bytes on the wire are genuine compressed PNGs whose
  * size the oracle never needs to predict.
  */
object Multimodal {

  /** Decoded media metadata — IHDR dims + full-decode pixel stats. */
  case class MediaMeta(doc_id: Long, format: String, width: Int, height: Int,
                       n_bytes: Long, mean_byte: Double)

  case class MediaRow(doc_id: Long, format: String, media: Array[Byte])

  // ------------------------------------------------------------------ codec

  /** Deterministic grayscale pixels for a document: pixel i = UTF-8 text
    * byte (i mod len); all-zero for empty OR NULL text (a null payload is
    * a routine row at scale, not a reason to kill the partition). */
  private[ops] def pixelsFor(text: String, w: Int, h: Int): Array[Byte] = {
    val tb = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
    val px = Array.ofDim[Byte](w * h)
    if (tb.nonEmpty) {
      var i = 0
      while (i < px.length) { px(i) = tb(i % tb.length); i += 1 }
    }
    px
  }

  /** Minimal real PNG encoder — 8-bit grayscale (color type 0), one IDAT,
    * filter 0 per scanline, CRC32-correct chunks. Pure JVM (java.util.zip);
    * MultimodalSpec proves validity by round-tripping through the JDK's
    * ImageIO PNG codec. */
  def pngEncode(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h, s"need $w*$h pixels, got ${pixels.length}")
    val out = new java.io.ByteArrayOutputStream(64 + pixels.length / 2)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      val tagBytes = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tagBytes); crc.update(data)
      out.write(tagBytes); out.write(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk("IHDR", ihdr.array())
    // scanlines: leading filter byte 0 + raw row
    val raw = Array.ofDim[Byte](h * (w + 1))
    var r = 0
    while (r < h) {
      System.arraycopy(pixels, r * w, raw, r * (w + 1) + 1, w)
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val cbuf = new java.io.ByteArrayOutputStream(raw.length / 2)
    val tmp = Array.ofDim[Byte](8192)
    while (!deflater.finished()) cbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    chunk("IDAT", cbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private val PngSignature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** IHDR metadata parse — the cheap width/height path that never inflates
    * pixel data (what a 100 TB metadata sweep runs; IHDR is mandated to be
    * the first chunk, so dims sit at fixed offsets 16/20). */
  def pngDims(png: Array[Byte]): (Int, Int) = {
    require(png.length >= 24 && png.take(8).sameElements(PngSignature),
      "not a PNG (bad signature)")
    val buf = java.nio.ByteBuffer.wrap(png)
    (buf.getInt(16), buf.getInt(20))
  }

  /** Full pixel decode through the JDK's real ImageIO PNG codec (row-major
    * grayscale samples). */
  def pngPixels(png: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "ImageIO could not decode media as an image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val px = Array.ofDim[Byte](w * h)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(i) = raster.getSample(x, y, 0).toByte; i += 1; x += 1 }
      y += 1
    }
    px
  }

  // ------------------------------------------------------------------ table

  /** The media table: one real PNG per document — dims derived from
    * n_chars (w = n_chars % 64 + 1, h = n_chars % 48 + 1), pixels from the
    * text — so the driver contract can check decoded values end-to-end.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // null-KEY contract: doc_id is a primitive Long at the typed
      // boundary — a media blob with no id is undeliverable, so such
      // rows drop here, mirrored in every consumer's oracle
      // (WHERE doc_id IS NOT NULL)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("n_chars"), col("text"))
      .as[(Long, Long, String)]
      .map { case (id, nChars, text) =>
        val w = (nChars % 64 + 1).toInt
        val h = (nChars % 48 + 1).toInt
        MediaRow(id, "png", pngEncode(w, h, pixelsFor(text, w, h)))
      }
  }

  /** Decode metadata for each media row: IHDR dims (no inflate) + full
    * ImageIO pixel decode for the content stats. mapPartitions so a
    * heavier codec can init once per partition. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // heavier codecs: init decoder context once per partition here
      rows.map { r =>
        val (w, h) = pngDims(r.media)
        val px = pngPixels(r.media)
        val mean =
          if (px.isEmpty) 0.0
          else px.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / px.length
        MediaMeta(r.doc_id, r.format, w, h, r.media.length.toLong, mean)
      }
    }
  }

  /** Real resize: decode pixels, integer nearest-neighbor subsample to fit
    * maxDim, re-encode as PNG. Deterministic (integer source indices). */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = pngDims(r.media)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        if (nw == w && nh == h) r
        else {
          val src = pngPixels(r.media)
          val dst = Array.ofDim[Byte](nw * nh)
          var y = 0
          while (y < nh) {
            val sy = y * h / nh
            var x = 0
            while (x < nw) { dst(y * nw + x) = src(sy * w + x * w / nw); x += 1 }
            y += 1
          }
          r.copy(media = pngEncode(nw, nh, dst))
        }
      }
    }
  }

  /** Frame sampling over the DECODED pixel stream: view the w×h samples as
    * fixed-size frames, keep every k-th — the video-pipeline shape
    * (explode to one row per kept frame). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      pngPixels(r.media).grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (frame, idx) => (r.doc_id, idx, frame.length, frame) }
    }.toDF("doc_id", "frame_idx", "frame_bytes", "frame")
  }

  /** Driver-contract query: IHDR metadata for every PNG. width/height are
    * re-derivable from n_chars and n_px = width × height, so the DuckDB
    * oracle checks the full encode → IHDR-parse roundtrip without having
    * to predict compressed byte sizes.
    */
  def q70MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeMeta(mediaTable(spark, dir))
      .select(col("doc_id"), col("width"), col("height"),
        (col("width") * col("height")).as("n_px"))
      .orderBy(col("doc_id"))
  }

  val q70Sql: String =
    """SELECT doc_id,
      |  CAST(n_chars % 64 + 1 AS INT) AS width,
      |  CAST(n_chars % 48 + 1 AS INT) AS height,
      |  CAST((n_chars % 64 + 1) * (n_chars % 48 + 1) AS INT) AS n_px
      |FROM documents WHERE doc_id IS NOT NULL
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling query. Decoded pixels are text bytes cycled to w×h, so
    * the kept-frame indices and sizes are pure arithmetic over n_chars —
    * fully oracle-checkable even though the wire bytes are compressed. */
  def q71FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), frameBytes = 32, everyK = 3)
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Frames of 32 pixels over the w×h = (n_chars%64+1)(n_chars%48+1)
    * decoded samples, every 3rd kept; last frame is the remainder. */
  val q71Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST((n_chars % 64 + 1) * (n_chars % 48 + 1) AS BIGINT) AS len
      |  FROM documents WHERE doc_id IS NOT NULL),
      |f AS (
      |  SELECT doc_id, len, unnest(range((len + 31) // 32)) AS idx
      |  FROM d WHERE len > 0)
      |SELECT doc_id, CAST(idx AS INT) AS frame_idx,
      |  CAST(CASE WHEN (idx + 1) * 32 <= len THEN 32 ELSE len - idx * 32 END AS INT)
      |    AS frame_bytes
      |FROM f WHERE idx % 3 = 0 ORDER BY doc_id, frame_idx""".stripMargin

  /** ===== STUB FEATURE EXTRACTOR =====
    * The third stage of the media pipeline (decode → transform → EMBED).
    * The DECODE below it is real (ImageIO); the embedding itself is a
    * deterministic pixel-stripe mean standing in for a vision encoder —
    * per-partition "model" initialization + per-row map to a fixed-dim
    * Array[Float], exactly the batching contract real weights need. The
    * downstream contract (fixed dim, unit-range floats, feeds VectorOps
    * centroids/ANN unchanged) is real.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real path: load encoder weights ONCE here, reuse across rows
      rows.map { r =>
        val p = pngPixels(r.media)
        val acc = Array.ofDim[Float](dim)
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

  /** Media-embedding query. Demonstrates the full multimodal chain: real
    * PNG encode → real ImageIO decode → stub encoder (n_dims comes from
    * the extractFeatures output, so the encoder runs under the driver
    * check) → per-row norm. The driver-compared norm is computed from the
    * INTEGER pixel stripe sums (exact in both engines — decoded pixels are
    * text bytes cycled to w×h, which the oracle rebuilds from the text);
    * the float-normalized features keep their unit-range contract under
    * MultimodalSpec.
    */
  def q80MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    val nDims = extractFeatures(media, dim = 8)
      .select(col("doc_id"), size(col("features")).as("n_dims"))
    val rawNorm = media.map { r =>
      val p = pngPixels(r.media)
      val acc = Array.ofDim[Long](8)
      var i = 0
      while (i < p.length) { acc(i % 8) += (p(i) & 0xff); i += 1 }
      (r.doc_id, math.sqrt(acc.map(v => v.toDouble * v).sum))
    }.toDF("doc_id", "norm_raw")
    nDims.join(rawNorm, "doc_id")
      .select(col("doc_id"), col("n_dims"), Num.pround(col("norm_raw"), 6).as("stripe_norm"))
      .orderBy(col("doc_id"))
  }

  /** Decoded pixel i = text byte (i mod len) over w×h samples, read out of
    * hex(encode(text)). Stripe sums stay < 2^53 so the sqrt sees the
    * identical double in both engines. */
  val q80Sql: String =
    """WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS plen,
      |    CAST((n_chars % 64 + 1) * (n_chars % 48 + 1) AS BIGINT) AS npx
      |  FROM documents WHERE doc_id IS NOT NULL),
      |px AS (
      |  SELECT doc_id, i,
      |    CASE WHEN plen = 0 THEN 0
      |         ELSE ('0x' || substr(hx, 2 * CAST(i % plen AS BIGINT) + 1, 2))::BIGINT
      |    END AS v
      |  FROM d, LATERAL (SELECT unnest(range(npx)) AS i) r),
      |stripes AS (
      |  SELECT doc_id, i % 8 AS d8, SUM(v) AS s FROM px GROUP BY doc_id, i % 8)
      |SELECT doc_id, CAST(8 AS INT) AS n_dims,
      |  FLOOR((sqrt(CAST(SUM(s * s) AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS stripe_norm
      |FROM stripes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ audio

  case class AudioRow(doc_id: Long, media: Array[Byte])

  /** Deterministic 16-bit PCM samples for a document: sample i =
    * (text byte (i mod len) − 128) · 256 — centered, full-scale-ish. */
  private[ops] def samplesFor(text: String, n: Int): Array[Short] = {
    // null text = silence, like pixelsFor's all-zero contract
    val tb = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
    val s = Array.ofDim[Short](n)
    if (tb.nonEmpty) {
      var i = 0
      while (i < n) { s(i) = (((tb(i % tb.length) & 0xff) - 128) * 256).toShort; i += 1 }
    }
    s
  }

  /** Minimal real WAV encoder — RIFF/PCM, 16-bit mono little-endian.
    * Pure JVM; MultimodalSpec proves validity by round-tripping through
    * the JDK's own javax.sound.sampled WAV codec. */
  def wavEncode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Header parse + sample decode: (sampleRate, channels, bits, samples).
    * Fixed 44-byte canonical-WAV offsets (what [[wavEncode]] writes). */
  def wavParse(wav: Array[Byte]): (Int, Int, Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(wav.length >= 44 &&
      new String(wav, 0, 4, "US-ASCII") == "RIFF" &&
      new String(wav, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    val channels = buf.getShort(22).toInt
    val rate = buf.getInt(24)
    val bits = buf.getShort(34).toInt
    val dataLen = buf.getInt(40)
    val samples = Array.ofDim[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = buf.getShort(44 + 2 * i); i += 1 }
    (rate, channels, bits, samples)
  }

  /** One real WAV per document: n_chars%2000+100 samples at 16 kHz. */
  def audioTable(spark: SparkSession, dir: String): Dataset[AudioRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // null-KEY contract: see mediaTable
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("n_chars"), col("text"))
      .as[(Long, Long, String)]
      .map { case (id, nChars, text) =>
        AudioRow(id, wavEncode(16000, samplesFor(text, (nChars % 2000 + 100).toInt)))
      }
  }

  /** q145 — audio metadata + waveform stats over DECODED samples: header
    * fields (real parse of the wire bytes), exact duration, zero-crossing
    * count, and integer energy Σs² — every output an exact integer, so
    * the oracle (which rebuilds the same PCM from the text via
    * hex(encode(text))) is boundary-free. Same mapPartitions
    * per-partition-init contract as the image path.
    */
  def q145AudioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).mapPartitions { rows =>
      // heavier codecs: init decoder once per partition here
      rows.map { r =>
        val (rate, _, _, s) = wavParse(r.media)
        var zc = 0L; var energy = 0L
        var i = 0
        while (i < s.length) {
          if (i > 0 && s(i).toLong * s(i - 1) < 0) zc += 1
          energy += s(i).toLong * s(i); i += 1
        }
        (r.doc_id, rate, s.length.toLong, s.length.toLong * 1000 / rate, zc, energy)
      }
    }.toDF("doc_id", "sample_rate", "n_samples", "duration_ms", "zero_cross", "energy")
      .orderBy(col("doc_id"))
  }

  val q145Sql: String =
    """WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS plen,
      |    CAST(n_chars % 2000 + 100 AS BIGINT) AS ns
      |  FROM documents WHERE doc_id IS NOT NULL),
      |sm AS (
      |  SELECT doc_id, i,
      |    CASE WHEN plen = 0 THEN 0
      |         ELSE (('0x' || substr(hx, 2 * CAST(i % plen AS BIGINT) + 1, 2))::BIGINT - 128) * 256
      |    END AS s
      |  FROM d, LATERAL (SELECT unnest(range(ns)) AS i) r),
      |lagged AS (
      |  SELECT doc_id, s, LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |  FROM sm),
      |agg AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN s * prev < 0 THEN 1 ELSE 0 END) AS zero_cross,
      |    SUM(s * s) AS energy
      |  FROM lagged GROUP BY doc_id)
      |SELECT d.doc_id, 16000 AS sample_rate, ns AS n_samples,
      |  ns * 1000 // 16000 AS duration_ms,
      |  CAST(zero_cross AS BIGINT) AS zero_cross,
      |  CAST(energy AS BIGINT) AS energy
      |FROM d JOIN agg ON d.doc_id = agg.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q155 — cross-modal feature join: one record per document combining
  // image metadata (real PNG decode), audio stats (real WAV decode), and
  // text features. Executes the file-header claim as a catalog operator:
  // ALL joins happen on the slim decoded side (a few ints per doc) —
  // the binary payloads are projected away before any shuffle, so at
  // 100 TB the exchanges carry metadata, not media.
  def q155MultimodalJoin(spark: SparkSession, dir: String): DataFrame = {
    val img = decodeMeta(mediaTable(spark, dir))
      .select(col("doc_id"), col("width"), col("height"))
    val audio = q145AudioMeta(spark, dir)
      .select(col("doc_id"), col("n_samples"), col("energy"))
    val text = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.ops.TextOps.toks).as("n_words"), col("lang"))
    img.join(audio, "doc_id").join(text, "doc_id")
      .orderBy(col("doc_id"))
  }

  val q155Sql: String =
    """WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS plen,
      |    CAST(n_chars % 2000 + 100 AS BIGINT) AS ns
      |  FROM documents WHERE doc_id IS NOT NULL),
      |sm AS (
      |  SELECT doc_id, i,
      |    CASE WHEN plen = 0 THEN 0
      |         ELSE (('0x' || substr(hx, 2 * CAST(i % plen AS BIGINT) + 1, 2))::BIGINT - 128) * 256
      |    END AS s
      |  FROM d, LATERAL (SELECT unnest(range(ns)) AS i) r),
      |agg AS (SELECT doc_id, SUM(s * s) AS energy FROM sm GROUP BY doc_id)
      |SELECT doc.doc_id,
      |  CAST(doc.n_chars % 64 + 1 AS INT) AS width,
      |  CAST(doc.n_chars % 48 + 1 AS INT) AS height,
      |  CAST(doc.n_chars % 2000 + 100 AS BIGINT) AS n_samples,
      |  CAST(agg.energy AS BIGINT) AS energy,
      |  CAST(len(list_filter(string_split(lower(doc.text), ' '), t -> t != '')) AS INT) AS n_words,
      |  doc.lang
      |FROM documents doc JOIN agg ON agg.doc_id = doc.doc_id
      |ORDER BY doc.doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q244 — ENERGY-BASED VOICE-ACTIVITY SEGMENTATION over decoded audio:
  // the classic VAD front-end for a speech-training pipeline. Each WAV is
  // decoded ONCE (same mapPartitions contract as q145) and collapsed
  // row-locally to per-10ms-frame energies (160 samples @16 kHz, exact
  // integer Σs²) — the binary payload never leaves the decode task; only
  // the slim (doc, frame, energy) stream shuffles. Active frames (energy
  // above the corpus-median threshold) merge into maximal runs with the
  // gaps-and-islands window (frame − row_number per doc), and runs
  // shorter than 2 frames drop (min-duration rule). Trailing partial
  // frames are excluded (pinned in the oracle via i < (ns//160)*160).
  //
  // Everything is exact integers end-to-end — no float boundary anywhere.
  def q244VadSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = audioTable(spark, dir).mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, _, s) = wavParse(r.media)
        val nf = s.length / 160
        (0 until nf).iterator.map { f =>
          var fe = 0L
          var i = f * 160
          while (i < (f + 1) * 160) { fe += s(i).toLong * s(i); i += 1 }
          (r.doc_id, f, fe)
        }
      }
    }.toDF("doc_id", "f", "fe")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"))
    frames.filter(col("fe") > 21100000000L)
      .withColumn("grp", col("f") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("f")).as("start_frame"), max(col("f")).as("end_frame"),
        count(lit(1)).as("n_frames"), sum(col("fe")).as("energy"))
      .filter(col("n_frames") >= 2)
      .select(col("doc_id"), col("start_frame"), col("end_frame"),
        col("n_frames"), col("energy"))
      .orderBy(col("doc_id"), col("start_frame"))
  }

  val q244Sql: String =
    """WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS plen,
      |    CAST(n_chars % 2000 + 100 AS BIGINT) AS ns
      |  FROM documents WHERE doc_id IS NOT NULL),
      |sm AS (
      |  SELECT doc_id, i,
      |    CASE WHEN plen = 0 THEN 0
      |         ELSE (('0x' || substr(hx, 2 * CAST(i % plen AS BIGINT) + 1, 2))::BIGINT - 128) * 256
      |    END AS s
      |  FROM d, LATERAL (SELECT unnest(range(ns)) AS i) r
      |  WHERE i < (ns // 160) * 160),
      |fr AS (
      |  SELECT doc_id, CAST(i // 160 AS INT) AS f, SUM(s * s) AS fe
      |  FROM sm GROUP BY 1, 2),
      |act AS (
      |  SELECT doc_id, f, fe,
      |    f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
      |  FROM fr WHERE fe > 21100000000)
      |SELECT doc_id, CAST(MIN(f) AS INT) AS start_frame,
      |  CAST(MAX(f) AS INT) AS end_frame,
      |  COUNT(*) AS n_frames, CAST(SUM(fe) AS BIGINT) AS energy
      |FROM act GROUP BY doc_id, grp
      |HAVING COUNT(*) >= 2
      |ORDER BY doc_id, start_frame""".stripMargin

  // --------------------------------------------------------------------------
  // q256 — VIDEO SCENE-CUT DETECTION from per-frame difference hashes:
  // the shot-segmentation front-end of a video-training pipeline. Each
  // "video" decodes ONCE (mapPartitions, q244's contract) into a sequence
  // of frame dHashes — 8 bits per frame comparing adjacent bytes of a
  // 9-byte window at stride 8 over the sample stream (windows overlap, so
  // the hash is locality-preserving: gradual content drifts keep small
  // hamming steps, content discontinuities spike them). A cut fires where
  // consecutive-frame hamming distance ≥ 5; scenes are the islands
  // between cuts. Integer-exact end-to-end; the oracle rebuilds the same
  // dHash stream from hex(encode(text)) in SQL.
  //
  // Scale: per-video work is row-local; only the slim (doc, frame, hash)
  // stream shuffles for the lag window, partitioned by video.
  def q256SceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frames = Tables.documents(spark, dir)
      // null-KEY contract: see mediaTable
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text, nChars) =>
          val ns = (nChars % 2000 + 100).toInt
          // null text = an all-zero frame stream (pixelsFor's contract)
          val bytes = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
          val plen = bytes.length
          def b(i: Int): Int = if (plen == 0) 0 else bytes(i % plen) & 0xff
          val nf = if (ns >= 9) (ns - 9) / 8 + 1 else 0
          (0 until nf).iterator.map { f =>
            val o = f * 8
            var h = 0
            var j = 0
            while (j < 8) { if (b(o + j) > b(o + j + 1)) h |= 1 << j; j += 1 }
            (id, f, h)
          }
        }
      }.toDF("doc_id", "f", "h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"))
    val withCut = frames
      .withColumn("prev", lag(col("h"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull && expr("bit_count(h ^ prev)") >= 5, 1).otherwise(0))
      .withColumn("scene", sum(col("cut")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    val scenes = withCut.groupBy(col("doc_id"), col("scene"))
      .agg(count(lit(1)).as("len"))
    withCut.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("cut")).as("n_cuts"))
      .join(scenes.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_scenes"), max(col("len")).as("max_scene_frames")),
        Seq("doc_id"))
      .orderBy(col("doc_id"))
  }

  val q256Sql: String =
    """WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS plen,
      |    CAST(n_chars % 2000 + 100 AS BIGINT) AS ns
      |  FROM documents WHERE doc_id IS NOT NULL),
      |fr AS (
      |  SELECT doc_id, hx, plen, unnest(range((ns - 9) // 8 + 1)) AS f
      |  FROM d WHERE ns >= 9),
      |bits AS (
      |  SELECT doc_id, f,
      |    CAST(SUM(CASE WHEN
      |        ('0x' || substr(hx, 2 * CAST((f * 8 + j) % plen AS BIGINT) + 1, 2))::INT >
      |        ('0x' || substr(hx, 2 * CAST((f * 8 + j + 1) % plen AS BIGINT) + 1, 2))::INT
      |      THEN 1 << CAST(j AS INT) ELSE 0 END) AS INT) AS h
      |  FROM fr, LATERAL (SELECT unnest(range(8)) AS j) s
      |  GROUP BY 1, 2),
      |wc AS (
      |  SELECT doc_id, f, h,
      |    LAG(h) OVER (PARTITION BY doc_id ORDER BY f) AS prev
      |  FROM bits),
      |cuts AS (
      |  SELECT doc_id, f,
      |    CASE WHEN prev IS NOT NULL AND bit_count(xor(h, prev)) >= 5
      |      THEN 1 ELSE 0 END AS cut
      |  FROM wc),
      |sc AS (
      |  SELECT doc_id, f, cut,
      |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY f ROWS UNBOUNDED PRECEDING)
      |      AS scene
      |  FROM cuts),
      |sl AS (SELECT doc_id, scene, COUNT(*) AS len FROM sc GROUP BY 1, 2)
      |SELECT sc2.doc_id, sc2.n_frames, sc2.n_cuts, sg.n_scenes, sg.max_scene_frames
      |FROM (SELECT doc_id, COUNT(*) AS n_frames, CAST(SUM(cut) AS BIGINT) AS n_cuts
      |      FROM sc GROUP BY 1) sc2
      |JOIN (SELECT doc_id, COUNT(*) AS n_scenes, MAX(len) AS max_scene_frames
      |      FROM sl GROUP BY 1) sg ON sc2.doc_id = sg.doc_id
      |ORDER BY sc2.doc_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q244_vad_segments", q244VadSegments _, Some(q244Sql)),
    ("q256_scene_cuts", q256SceneCuts _, Some(q256Sql)),
    ("q70_media_meta", q70MediaMeta _, Some(q70Sql)),
    ("q71_frame_sample", q71FrameSample _, Some(q71Sql)),
    ("q80_media_features", q80MediaFeatures _, Some(q80Sql)),
    ("q145_audio_meta", q145AudioMeta _, Some(q145Sql)),
    ("q155_multimodal_join", q155MultimodalJoin _, Some(q155Sql)))
}
