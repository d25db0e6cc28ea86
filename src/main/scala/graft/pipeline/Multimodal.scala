package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch UDFs.
  *
  * The Spark-side machinery here — schema, partition sizing, batch
  * iteration, deterministic outputs — is real and tested, and so is the
  * decode: uncompressed 24-bit BMP and binary PPM via pure header walks,
  * and PNG/JPEG/GIF — the formats real corpora actually hold — via the
  * JDK's own `javax.imageio` codecs ([[decodeImage]]; no external
  * dependency). Only payloads no JDK codec recognizes fall back to a
  * deterministic byte histogram.
  *
  * Scale notes: binary payloads dominate row size — `repartitionForMedia`
  * targets a payload budget per partition so a 100 TB scan does not
  * produce multi-GB tasks; feature extraction is a narrow mapPartitions
  * (no shuffle); downstream joins carry only (id, features). */
object Multimodal {

  /** Canonical media schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap arbitrary rows into the media schema, payload = UTF-8 bytes of
    * `payloadCol` (for tests / fixtures; real pipelines read binary files
    * or parquet binary columns directly). */
  def fromStrings(df: DataFrame, idCol: String, payloadCol: String, kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(payloadCol).cast("string"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Partition so that each task holds at most ~`targetBytes` of payload
    * (estimated from a sample mean). The repartition is the ONLY shuffle
    * in the media path. */
  def repartitionForMedia(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    val stats = df.select(avg(length(col("payload")))).head()
    val meanBytes = if (stats.isNullAt(0)) 1024.0 else math.max(stats.getDouble(0), 1.0)
    val total = df.count() * meanBytes
    val parts = math.max(1, math.ceil(total / targetBytes).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** 6-decimal HALF_UP round — matches SQL `round(x, 6)` (DuckDB and
    * Spark SQL both round half AWAY from zero; `math.rint` is half-to-
    * even and diverges on exact half-microdecimals — observed once at
    * sf0.1: rms 0.6328125). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** A decoded raster: interleaved RGB bytes, row-major, top-down. */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** Pure-JVM image decode. Fast header walks handle uncompressed 24-bit
    * BMP and binary PPM (P6, maxval <= 255); compressed formats the JDK
    * ships codecs for — PNG, JPEG, GIF — dispatch on magic bytes to
    * `javax.imageio` ([[decodeJdk]]). Anything else returns None and
    * flows through the byte-histogram fallback in [[extractFeatures]].
    * PNG/GIF are lossless: the same pixels as PPM or PNG decode to
    * bit-identical rasters (unit-pinned in MultimodalDecodeSpec). */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    if (payload == null || payload.length < 4) None
    else if (payload(0) == 'B' && payload(1) == 'M') decodeBmp24(payload)
    else if (payload(0) == 'P' && payload(1) == '6') decodePpm(payload)
    else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G') decodeJdk(payload)         // PNG
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
      (payload(2) & 0xff) == 0xff) decodeJdk(payload)                   // JPEG
    else if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')
      decodeJdk(payload)                                                // GIF
    else None
  }

  // ImageIO's disk cache would write temp files per decode on every
  // executor — decode in memory instead (payloads are already heap-bound
  // by repartitionForMedia's payload budget).
  javax.imageio.ImageIO.setUseCache(false)

  /** JDK codec decode (PNG/JPEG/GIF via `javax.imageio` — public JDK API,
    * no extra dependency). The BufferedImage is read out through
    * `getRGB`, which converts to default-sRGB ARGB — exact for the
    * 8-bit-per-channel images training corpora hold; alpha is dropped.
    * Any codec failure returns None (fallback contract of
    * [[decodeImage]]). */
  private def decodeJdk(b: Array[Byte]): Option[DecodedImage] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue - 8) return None
      val rgb = new Array[Byte](w * h * 3)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val argb = row(x); val d = (y * w + x) * 3
          rgb(d) = ((argb >>> 16) & 0xff).toByte
          rgb(d + 1) = ((argb >>> 8) & 0xff).toByte
          rgb(d + 2) = (argb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(w, h, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** BMP header walk: BITMAPFILEHEADER (14 bytes: magic, size, reserved,
    * pixel-data offset) + BITMAPINFOHEADER (width/height int32 LE at 18/22,
    * bpp uint16 at 28, compression uint32 at 30). Only bpp=24,
    * compression=BI_RGB; rows are 4-byte padded, stored bottom-up when
    * height > 0 (top-down when negative), pixels BGR. */
  private def decodeBmp24(b: Array[Byte]): Option[DecodedImage] = {
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    if (b.length < 54) return None
    val dataOffset = i32(10)
    val width = i32(18)
    val rawHeight = i32(22)
    val bpp = u16(28)
    val compression = i32(30)
    if (bpp != 24 || compression != 0 || width <= 0 || rawHeight == 0) return None
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val stride = ((width * 3 + 3) / 4) * 4
    if (dataOffset.toLong + stride.toLong * height > b.length) return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (if (bottomUp) (height - 1 - y) else y) * stride
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3 // BGR on disk
        val d = (y * width + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, rgb))
  }

  /** PPM P6: ASCII header `P6 <w> <h> <maxval>` with `#` comments and
    * arbitrary whitespace, one whitespace byte, then w*h*3 RGB bytes. */
  private def decodePpm(b: Array[Byte]): Option[DecodedImage] = {
    var pos = 2 // past "P6"
    def nextInt(): Int = {
      // skip whitespace and # comments
      var inComment = false
      while (pos < b.length && {
        val c = b(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      var v = 0; var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1; any = true
      }
      if (any) v else -1
    }
    val width = nextInt(); val height = nextInt(); val maxval = nextInt()
    pos += 1 // the single whitespace after maxval
    if (width <= 0 || height <= 0 || maxval <= 0 || maxval > 255) return None
    val n = width * height * 3
    if (pos + n > b.length) return None
    Some(DecodedImage(width, height, java.util.Arrays.copyOfRange(b, pos, pos + n)))
  }

  /** A decoded PCM clip: mono-mixed samples in [-1, 1]. */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
      samples: Array[Float])

  /** Pure-JVM audio decode for canonical WAV: RIFF/WAVE container walk
    * (chunk id + LE size pairs), `fmt ` must be PCM (audioFormat 1) with
    * 8- or 16-bit samples; the `data` chunk is mixed down to mono floats.
    * Non-PCM/compressed audio returns None — same fallback contract as
    * [[decodeImage]]. */
  def decodeAudio(payload: Array[Byte]): Option[DecodedAudio] = {
    val b = payload
    if (b == null || b.length < 44 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    var pos = 12
    var fmtOk = false; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val sz = i32(pos + 4)
      if (sz < 0 || pos.toLong + 8 + sz > b.length) return None
      id match {
        case "fmt " if sz >= 16 =>
          val audioFormat = u16(pos + 8)
          channels = u16(pos + 10); rate = i32(pos + 12); bits = u16(pos + 22)
          fmtOk = audioFormat == 1 && (bits == 8 || bits == 16) &&
            channels >= 1 && rate > 0
        case "data" => dataOff = pos + 8; dataLen = sz
        case _ => ()
      }
      pos += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val bytesPerSample = bits / 8
    val frames = dataLen / (bytesPerSample * channels)
    val mono = new Array[Float](frames)
    var f = 0
    while (f < frames) {
      var acc = 0.0f; var c = 0
      while (c < channels) {
        val o = dataOff + (f * channels + c) * bytesPerSample
        acc += (if (bits == 16) ((b(o) & 0xff) | (b(o + 1) << 8)) / 32768.0f
                else ((b(o) & 0xff) - 128) / 128.0f)
        c += 1
      }
      mono(f) = acc / channels
      f += 1
    }
    Some(DecodedAudio(rate, channels, mono))
  }

  /** Deterministic audio features: RMS energy, zero-crossing rate, and a
    * 16-bin normalized |sample| histogram — the format-independent shape
    * a real spectral frontend would replace. */
  def audioFeatures(a: DecodedAudio): Array[Float] = {
    val out = new Array[Float](18) // [rms, zcr, hist*16]
    val n = a.samples.length
    if (n == 0) return out
    var sumSq = 0.0; var zc = 0; var i = 0
    while (i < n) {
      val s = a.samples(i)
      sumSq += s.toDouble * s
      if (i > 0 && (s >= 0) != (a.samples(i - 1) >= 0)) zc += 1
      val bin = math.min(15, (math.abs(s) * 16).toInt)
      out(2 + bin) += 1.0f
      i += 1
    }
    out(0) = math.sqrt(sumSq / n).toFloat
    out(1) = zc.toFloat / n
    i = 0
    while (i < 16) { out(2 + i) /= n; i += 1 }
    out
  }

  /** Typed per-clip metadata from the real WAV decode:
    * [media_id, decoded, sample_rate, channels, duration_ms, rms (6dp)].
    * Undecodable payloads get decoded=false and nulls. */
  def audioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAudio(bytes) match {
            case Some(a) =>
              val durMs = a.samples.length.toLong * 1000L / a.sampleRate
              // double-precision rms (not audioFeatures' float32): each
              // sample value is exact in float, so double accumulation
              // matches an all-double oracle to the last ulp and the
              // 6-decimal round is cross-engine stable
              var sumSq = 0.0; var i = 0
              while (i < a.samples.length) {
                val s = a.samples(i).toDouble; sumSq += s * s; i += 1
              }
              val rms = if (a.samples.isEmpty) 0.0
                else math.sqrt(sumSq / a.samples.length)
              (id, true, Some(a.sampleRate), Some(a.channels), Some(durMs),
                Some(round6(rms)))
            case None => (id, false, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "sample_rate", "channels", "duration_ms", "rms")
  }

  /** 64-bit audio energy dHash — the [[dHashBits]] idea on the time
    * axis: split the mono sample stream into `windows` (= 65) equal
    * windows, compute each window's energy, and emit bit w = 1 iff
    * E(w+1) > E(w) — a gradient-sign fingerprint robust to uniform
    * gain changes (energy scales monotonically) and replayable by any
    * engine because the energies are EXACT INTEGERS: PCM sample values
    * are dyadic rationals, so sample·32768 is an integral float for
    * both 8- and 16-bit sources and the per-window Σ(c·…)² sums in
    * Long (order-free — no float accumulation anywhere). Trailing
    * samples beyond windows·⌊n/windows⌋ are ignored (the mirror does
    * the same). None when the clip has fewer samples than windows.
    * Multi-channel clips mix down in [[decodeAudio]] (float division —
    * exact for 1/2/4 channels; document-level caveat for 3). */
  def audioDHash(a: DecodedAudio, windows: Int = 65): Option[Long] = {
    require(windows >= 65,
      s"audioDHash: windows=$windows but the 64-bit gradient hash reads " +
        "energy pairs (w, w+1) for w < 64, so windows must be >= 65")
    val n = a.samples.length
    val win = n / windows
    if (win < 1) return None
    val e = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var s = 0L
      var i = 0
      while (i < win) {
        val c = math.round(a.samples(w * win + i) * 32768f).toLong
        s += c * c
        i += 1
      }
      e(w) = s
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) { if (e(b + 1) > e(b)) h |= (1L << b); b += 1 }
    Some(h)
  }

  /** Audio fingerprint table: decode → [[audioDHash]], one narrow
    * mapPartitions — the [[imagePhash]] twin for audio, emitting the
    * SAME 16-bit band layout (b0 = least-significant), so
    * [[phashPairs]] runs unchanged on the output for banded-Hamming
    * audio near-dup pairs. Undecodable/too-short clips report
    * decoded = false. Returns [media_id, decoded, afp_hex, b0..b3]. */
  def audioFingerprint(media: DataFrame, windows: Int = 65): DataFrame = {
    require(windows >= 65,
      s"audioFingerprint: windows=$windows — audioDHash needs >= 65 " +
        "windows (64 energy-gradient bits read pairs (w, w+1))")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAudio(bytes).flatMap(audioDHash(_, windows)) match {
            case Some(h) =>
              (id, true, Some(f"$h%016x"),
                Some((h >>> 0) & 0xffffL), Some((h >>> 16) & 0xffffL),
                Some((h >>> 32) & 0xffffL), Some((h >>> 48) & 0xffffL))
            case None => (id, false, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "afp_hex", "b0", "b1", "b2", "b3")
  }

  /** 16-bin luminance histogram (normalized) of a decoded image —
    * format-independent: the same pixels encoded as BMP or PPM produce
    * bit-identical features. Luminance = integer BT.601
    * (77 R + 150 G + 29 B) >> 8. */
  def imageFeatures(img: DecodedImage): Array[Float] = {
    val hist = new Array[Float](16)
    val px = img.width * img.height
    var i = 0
    while (i < px) {
      val o = i * 3
      val lum = (77 * (img.rgb(o) & 0xff) + 150 * (img.rgb(o + 1) & 0xff) +
        29 * (img.rgb(o + 2) & 0xff)) >> 8
      hist(lum >>> 4) += 1.0f
      i += 1
    }
    if (px > 0) { i = 0; while (i < 16) { hist(i) /= px; i += 1 } }
    hist
  }

  /** Fallback feature for undecodable payloads: normalized byte-value
    * histogram — deterministic, so fixtures without real image bytes
    * still exercise the full dataflow. */
  def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload == null || payload.isEmpty) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >>> 4) += 1.0f
      i += 1
    }
    var s = 0.0f
    i = 0
    while (i < 16) { s += hist(i); i += 1 }
    if (s > 0) { i = 0; while (i < 16) { hist(i) /= s; i += 1 } }
    hist
  }

  /** Feature extraction: narrow mapPartitions over the media table,
    * batching `batchSize` payloads per decode call (the shape a GPU/
    * vectorized decoder needs). Dispatches on magic bytes: BMP/PPM →
    * luminance histogram, WAV → audio features; anything else gets the
    * byte-histogram fallback. Returns [media_id, features]. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized/GPU decoder would run once
          batch.map { case (id, bytes) =>
            (id, decodeImage(bytes).map(imageFeatures)
              .orElse(decodeAudio(bytes).map(audioFeatures))
              .getOrElse(byteHistogram(bytes)))
          }
        }
      }
      .toDF("media_id", "features")
  }

  /** Typed per-image metadata from the real decode: dimensions and mean
    * channel values, null for payloads no header walk can decode.
    * Returns [media_id, decoded, width, height, mean_r, mean_g, mean_b]. */
  def imageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              val px = img.width * img.height
              var r = 0L; var g = 0L; var bl = 0L; var i = 0
              while (i < px) {
                val o = i * 3
                r += img.rgb(o) & 0xff; g += img.rgb(o + 1) & 0xff
                bl += img.rgb(o + 2) & 0xff
                i += 1
              }
              (id, true, Some(img.width), Some(img.height),
                Some(round6(r.toDouble / px)), Some(round6(g.toDouble / px)),
                Some(round6(bl.toDouble / px)))
            case None => (id, false, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** Encode a decoded raster as PNG through the JDK codec — the inverse
    * of the [[decodeImage]] PNG dispatch. PNG is lossless, so
    * decode(encodePng(img)) is byte-identical to img (the round-trip
    * gate [[pngRoundTripMeta]] and MultimodalDecodeSpec pin). */
  def encodePng(img: DecodedImage): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val o = (y * img.width + x) * 3
        bi.setRGB(x, y, ((img.rgb(o) & 0xff) << 16) |
          ((img.rgb(o + 1) & 0xff) << 8) | (img.rgb(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", out)
    out.toByteArray
  }

  /** PNG round-trip decode gate — [[imageMeta]] computed through a full
    * compressed-codec cycle: decode the incoming payload, re-encode as
    * PNG ([[encodePng]]), decode THAT through the `javax.imageio`
    * dispatch of [[decodeImage]], and report the round-tripped raster's
    * dimensions and channel means plus a byte-equality flag against the
    * source raster. Because PNG is lossless the stats are provably
    * identical to the direct decode's — which is what lets a SQL oracle
    * with no image codec gate the compressed-format path: any codec
    * drift (dropped row, channel swap, color-space surprise) breaks
    * either the means or `roundtrip_exact`. One narrow mapPartitions,
    * same media-pipeline shape as [[imageMeta]]. */
  def pngRoundTripMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes).flatMap { src =>
            decodeImage(encodePng(src)).map { rt =>
              val px = rt.width * rt.height
              var r = 0L; var g = 0L; var bl = 0L; var i = 0
              while (i < px) {
                val o = i * 3
                r += rt.rgb(o) & 0xff; g += rt.rgb(o + 1) & 0xff
                bl += rt.rgb(o + 2) & 0xff
                i += 1
              }
              (id, true, Some(rt.width), Some(rt.height),
                Some(round6(r.toDouble / px)), Some(round6(g.toDouble / px)),
                Some(round6(bl.toDouble / px)),
                Some(rt.width == src.width && rt.height == src.height &&
                  java.util.Arrays.equals(rt.rgb, src.rgb)))
            }
          }.getOrElse((id, false, None, None, None, None, None, None))
        }
      }
      .toDF("media_id", "decoded", "width", "height", "mean_r", "mean_g",
        "mean_b", "roundtrip_exact")
  }

  /** Nearest-neighbor raster resize: destination pixel (x, y) copies
    * source pixel (x·sw/dw, y·sh/dh) — pure integer index math, so any
    * engine can replay the pixel selection exactly (the property the
    * oracle row leans on). The thumbnail/down-sample step every
    * multimodal training pipeline runs before feature extraction. */
  def resizeImage(img: DecodedImage, dw: Int, dh: Int): DecodedImage = {
    require(dw > 0 && dh > 0, s"resize dims must be positive: ${dw}x$dh")
    val out = new Array[Byte](dw * dh * 3)
    var y = 0
    while (y < dh) {
      val sy = y * img.height / dh
      var x = 0
      while (x < dw) {
        val sx = x * img.width / dw
        val so = (sy * img.width + sx) * 3
        val o = (y * dw + x) * 3
        out(o) = img.rgb(so); out(o + 1) = img.rgb(so + 1)
        out(o + 2) = img.rgb(so + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(dw, dh, out)
  }

  /** Decode → nearest-neighbor resize → report, one narrow
    * mapPartitions (the same media-pipeline shape as [[imageMeta]]):
    * per image the resized raster as lowercase hex (pins every byte of
    * the resize exactly) plus the resized channel means. Undecodable
    * payloads report decoded = false with nulls. */
  def imageResize(media: DataFrame, dw: Int, dh: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              val rz = resizeImage(img, dw, dh)
              val px = dw * dh
              var r = 0L; var g = 0L; var bl = 0L; var i = 0
              while (i < px) {
                val o = i * 3
                r += rz.rgb(o) & 0xff; g += rz.rgb(o + 1) & 0xff
                bl += rz.rgb(o + 2) & 0xff
                i += 1
              }
              val hex = rz.rgb.map(b => f"${b & 0xff}%02x").mkString
              (id, true, Some(hex),
                Some(round6(r.toDouble / px)), Some(round6(g.toDouble / px)),
                Some(round6(bl.toDouble / px)))
            case None => (id, false, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "raster_hex", "mean_r", "mean_g", "mean_b")
  }

  /** 64-bit dHash (difference hash) of a decoded raster — the standard
    * perceptual image fingerprint for image NEAR-dup (crop-resistant
    * where byte hashes are not): nearest-neighbor resize to
    * (gw+1)×gh ([[resizeImage]] — integer index math, engine-
    * replayable), integer luma per pixel (the [[imageFeatures]]
    * (77·r + 150·g + 29·b) >> 8 weights), bit (x, y) set iff
    * luma(x, y) > luma(x+1, y) on the resized grid. All-integer, so
    * the hash is bit-identical across engines and partitionings. */
  def dHashBits(img: DecodedImage, gw: Int = 8, gh: Int = 8): Long = {
    require(gw >= 1 && gh >= 1 && gw * gh <= 64,
      s"dHash grid must fit 64 bits: ${gw}x$gh")
    val rz = resizeImage(img, gw + 1, gh)
    def luma(x: Int, y: Int): Int = {
      val o = (y * (gw + 1) + x) * 3
      (77 * (rz.rgb(o) & 0xff) + 150 * (rz.rgb(o + 1) & 0xff) +
        29 * (rz.rgb(o + 2) & 0xff)) >> 8
    }
    var hash = 0L
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        if (luma(x, y) > luma(x + 1, y)) hash |= 1L << (y * gw + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Perceptual-hash table over a media frame: decode → [[dHashBits]],
    * one narrow mapPartitions (the [[imageMeta]] media-pipeline shape).
    * The hash is surfaced BOTH as a 16-hex-char string (presentation /
    * exact-grouping key) and as four 16-bit bands b0..b3 (b0 = least-
    * significant 16 bits) — the band split is what [[phashPairs]]
    * blocks on, and keeping bands ≤ 2^16 sidesteps BIGINT bit-63 sign
    * traps in SQL mirrors. Undecodable payloads report decoded = false
    * with nulls. Returns [media_id, decoded, phash_hex, b0, b1, b2, b3]. */
  def imagePhash(media: DataFrame, gw: Int = 8, gh: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              val h = dHashBits(img, gw, gh)
              (id, true, Some(f"$h%016x"),
                Some((h >>> 0) & 0xffffL), Some((h >>> 16) & 0xffffL),
                Some((h >>> 32) & 0xffffL), Some((h >>> 48) & 0xffffL))
            case None => (id, false, None, None, None, None, None)
          }
        }
      }
      .toDF("media_id", "decoded", "phash_hex", "b0", "b1", "b2", "b3")
  }

  /** Image near-dup pairs by banded Hamming distance over an
    * [[imagePhash]] table — the simhashPairs recipe on the visual
    * fingerprint: two images within `maxHamming` differing bits share
    * at least one identical 16-bit band whenever maxHamming < 4... in
    * practice near-dups differ in a handful of bits, so band-equality
    * blocking finds them without an all-pairs scan. Candidates are
    * generated per (band index, band value) bucket, capped at
    * `maxBucketSize` via a map-side-combined count + left_semi (the
    * minhashLsh guard — a degenerate bucket of flat-color images would
    * otherwise go quadratic), then verified with the EXACT Hamming
    * distance (per-band xor bit_count — never the long, bit 63 is a
    * BIGINT sign trap in SQL mirrors). Returns [id_a, id_b, hamming]. */
  /** One (id, b0..b3, band, bucket) row per 16-bit band of an
    * [[imagePhash]] table — the blocking key layout [[phashPairs]] and
    * [[incrementalPhash]] join on. */
  private def phashBands(hashed: DataFrame): DataFrame =
    hashed.filter(col("decoded"))
      .select(col("media_id").cast("long").as("id"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        explode(array((0 to 3).map(i =>
          struct(lit(i).as("band"), col(s"b$i").as("bucket"))): _*))
          .as("bb"))
      .select(col("id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** Per-band exact Hamming between the a0..a3 and c0..c3 band sets. */
  private def bandHamming(pre1: String, pre2: String): Column =
    ((0 to 3).map(i => bit_count(col(s"$pre1$i").bitwiseXOR(col(s"$pre2$i"))))
      .reduce(_ + _)).cast("long")

  def phashPairs(hashed: DataFrame, maxHamming: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    val bands = phashBands(hashed)
      // persisted: decode runs once; feeds the cap count + both join
      // sides (released by the caller's clearCache, the simhashPairs
      // lifetime contract)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val okBuckets = bands.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bounded = bands
      .join(okBuckets, Seq("band", "bucket"), "left_semi")
    val a = bounded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
      col("b3").as("a3"))
    val b = bounded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"),
      col("b3").as("c3"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), bandHamming("a", "c").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Persisted-index IMAGE near-dup resolve — the daily multimodal
    * ingest loop (the Dedup.incrementalMinhash twin on the visual
    * fingerprint): every decoded batch image resolves against the
    * historical [[imagePhash]] index first (nearest corpus match by
    * (hamming, id) within `maxHamming`), then against its own batch
    * (id_a < id_b), and reports one row per image:
    * `dup_of_corpus` / `dup_in_batch` / `new`, with the matched id and
    * distance (−1 sentinels for `new`). The corpus never rescans — the
    * index is the only historical state, and the STATIC side is where
    * degenerate buckets accumulate over time, so the bucket-size cap
    * applies there as well as in-batch (the cappedIndexSide reasoning).
    * Returns [media_id, status, dup_of, hamming]. */
  def incrementalPhash(index: DataFrame, batch: DataFrame,
      maxHamming: Int = 4, maxBucketSize: Int = 1000): DataFrame =
    incrementalPhashFromFps(index, imagePhash(batch), maxHamming,
      maxBucketSize)

  /** The resolve half of [[incrementalPhash]] over already-computed
    * batch FINGERPRINTS — split out because [[imagePhash]] (the decode,
    * the expensive narrow stage) is stateless and therefore streamable:
    * the at-ingest twin hashes each arriving image in-stream and this
    * half resolves the drained fingerprint table at the sink through
    * the SAME joins as the batch row. */
  def incrementalPhashFromFps(index: DataFrame, batchFps: DataFrame,
      maxHamming: Int = 4, maxBucketSize: Int = 1000): DataFrame = {
    // both band tables persist: each feeds its cap count plus every
    // join side below, and an unpersisted lineage re-runs the DECODE
    // mapPartitions once per subplan (measured ~2× wall on the entry)
    val bBands = phashBands(batchFps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val iBands = phashBands(index)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val okIdx = iBands.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val iB = iBands.join(okIdx, Seq("band", "bucket"), "left_semi")
      .select(col("band"), col("bucket"), col("id").as("cid"),
        col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"),
        col("b3").as("c3"))
    val cRes = bBands
      .select(col("band"), col("bucket"), col("id"),
        col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
        col("b3").as("a3"))
      .join(iB, Seq("band", "bucket"))
      .dropDuplicates("id", "cid")
      .withColumn("ham", bandHamming("a", "c"))
      .filter(col("ham") <= maxHamming)
      .groupBy(col("id"))
      .agg(min_by(struct(col("cid"), col("ham")),
        struct(col("ham"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("corpus_of"),
        col("m.ham").as("corpus_ham"))
    val okB = bBands.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("band"), col("bucket"))
    val bounded = bBands.join(okB, Seq("band", "bucket"), "left_semi")
    val bRes = bounded
      .select(col("band"), col("bucket"), col("id").as("id_a"),
        col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
        col("b3").as("a3"))
      .join(bounded.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"),
        col("b3").as("c3")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("ham", bandHamming("a", "c"))
      .filter(col("ham") <= maxHamming)
      .groupBy(col("id_b").as("id"))
      .agg(min_by(struct(col("id_a"), col("ham")),
        struct(col("ham"), col("id_a"))).as("m"))
      .select(col("id"), col("m.id_a").as("batch_of"),
        col("m.ham").as("batch_ham"))
    bBands.select(col("id")).distinct() // decoded batch ids, no re-decode
      .join(cRes, Seq("id"), "left")
      .join(bRes, Seq("id"), "left")
      .select(col("id").as("media_id"),
        when(col("corpus_of").isNotNull, "dup_of_corpus")
          .when(col("batch_of").isNotNull, "dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_of"), col("batch_of"), lit(-1L)).as("dup_of"),
        coalesce(col("corpus_ham"), col("batch_ham"), lit(-1L)).as("hamming"))
  }

  /** Per-frame perceptual hashes of a video — [[imagePhash]] extended
    * along the frame axis: decode → one [[dHashBits]] per frame, the
    * same 16-bit band layout. One narrow mapPartitions; rows ∝ frames.
    * Returns [media_id, frame_index, phash_hex, b0..b3]. */
  def videoPhash(media: DataFrame, gw: Int = 8, gh: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeVideoFrames(bytes).zipWithIndex.map { case (img, idx) =>
            val h = dHashBits(img, gw, gh)
            (id, idx, f"$h%016x", (h >>> 0) & 0xffffL, (h >>> 16) & 0xffffL,
              (h >>> 32) & 0xffffL, (h >>> 48) & 0xffffL)
          }
        }
      }
      .toDF("media_id", "frame_index", "phash_hex", "b0", "b1", "b2", "b3")
  }

  /** Video near-dup pairs over a [[videoPhash]] table: two videos are
    * near-dups when their SAME-INDEX frames match within `maxHamming`
    * on at least `minFrames` frames — the re-encode/container-change
    * detector (same cut, new codec settings). Blocking is per
    * (frame_index, band, bucket) with the [[phashPairs]] bucket cap, so
    * candidates never go all-pairs; verification is the exact per-band
    * popcount on the matched frame. Returns
    * [id_a, id_b, n_frames, min_hamming] (id_a < id_b). */
  def videoPhashPairs(framesFp: DataFrame, maxHamming: Int = 4,
      minFrames: Int = 1, maxBucketSize: Int = 1000): DataFrame = {
    val bands = framesFp
      .select(col("media_id").cast("long").as("id"),
        col("frame_index").cast("long").as("frame"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        explode(array((0 to 3).map(i =>
          struct(lit(i).as("band"), col(s"b$i").as("bucket"))): _*))
          .as("bb"))
      .select(col("id"), col("frame"), col("b0"), col("b1"), col("b2"),
        col("b3"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ok = bands.groupBy(col("frame"), col("band"), col("bucket"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") <= maxBucketSize)
      .select(col("frame"), col("band"), col("bucket"))
    val bounded = bands.join(ok, Seq("frame", "band", "bucket"), "left_semi")
    val a = bounded.select(col("frame"), col("band"), col("bucket"),
      col("id").as("id_a"), col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val b = bounded.select(col("frame"), col("band"), col("bucket"),
      col("id").as("id_b"), col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    a.join(b, Seq("frame", "band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b", "frame")
      .withColumn("hamming", bandHamming("a", "c"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_frames"), min(col("hamming")).as("min_hamming"))
      .filter(col("n_frames") >= minFrames)
  }

  /** REAL evenly-spaced frame sampling over the concatenated-P6 video
    * container: walk the actual frame stream ([[decodeVideoFrames]] —
    * no byte-offset guessing), keep the `n` frames at indices
    * ⌊i·F/n⌋ (deduplicated when the clip has fewer than `n` frames),
    * and report each kept frame's real dimensions. One narrow
    * mapPartitions — decoded rasters never leave their partition; a
    * payload that decodes to zero frames emits zero rows (undecodable
    * media is invisible to downstream, the media-pipeline norm).
    * Returns [media_id, frame_index, n_frames, width, height]. */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame = {
    require(n >= 1, s"sampleFrames: n=$n must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video" || col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = decodeVideoFrames(bytes)
          val f = frames.size
          if (f == 0) Iterator.empty
          else (0 until n).map(i => (i.toLong * f / n).toInt).distinct
            .map { idx =>
              val img = frames(idx)
              (id, idx, f, img.width, img.height)
            }
        }
      }
      .toDF("media_id", "frame_index", "n_frames", "width", "height")
  }

  /** REAL frame walk for the concatenated-P6 "video" container (the
    * pure-JVM stand-in for an MJPEG-style frame stream — each frame is
    * a complete binary PPM, frames back to back): parse each header
    * (magic, width, height, maxval, one whitespace, then w·h·3 raster
    * bytes), decode, advance. A malformed frame stops the walk — the
    * frames decoded so far are returned (truncation tolerance, the
    * media-pipeline norm). */
  def decodeVideoFrames(payload: Array[Byte],
      maxFrames: Int = 10000): Seq[DecodedImage] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[DecodedImage]
    if (payload == null) return out.toSeq
    val len = payload.length
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    var off = 0
    var halt = false
    while (!halt && out.size < maxFrames && off + 2 <= len &&
        payload(off) == 'P' && payload(off + 1) == '6') {
      var p = off + 2
      val ints = new Array[Int](3); var k = 0; var ok = true
      while (k < 3 && ok) {
        // skip whitespace and '#'-to-newline comments (P6 headers allow
        // them; the raster after maxval may legitimately start with '#')
        while (p < len && (isWs(payload(p)) || payload(p) == '#')) {
          if (payload(p) == '#') {
            while (p < len && payload(p) != '\n') p += 1
          } else p += 1
        }
        var v = 0; val p0 = p
        while (p < len && payload(p) >= '0' && payload(p) <= '9') {
          v = v * 10 + (payload(p) - '0'); p += 1
        }
        if (p == p0) ok = false else { ints(k) = v; k += 1 }
      }
      if (!ok || p >= len || !isWs(payload(p)) || ints(2) > 255) halt = true
      else {
        p += 1 // the single whitespace separating maxval from the raster
        // Long math: a hostile width*height overflows Int to a small
        // positive value and would mis-frame the walk as garbage frames
        // instead of halting cleanly
        val dataLen = ints(0).toLong * ints(1) * 3
        if (dataLen <= 0 || p + dataLen > len) halt = true
        else {
          val dl = dataLen.toInt
          out += DecodedImage(ints(0), ints(1),
            java.util.Arrays.copyOfRange(payload, p, p + dl))
          off = p + dl
        }
      }
    }
    out.toSeq
  }

  /** Frame-SAMPLED video metadata — the real form of [[sampleFrames]]:
    * decode the frame stream, keep every `step`-th frame, report
    * per-frame dimensions and channel means (the features a vision
    * curation pass thresholds on). One narrow mapPartitions — frames
    * never leave their partition; rows out = frames/step per video.
    * Returns [media_id, frame_index, n_frames, width, height, mean_r,
    * mean_g, mean_b]. */
  def videoFrameMeta(media: DataFrame, step: Int = 2): DataFrame = {
    require(step >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = decodeVideoFrames(bytes)
          frames.zipWithIndex
            .filter(_._2 % step == 0)
            .map { case (img, idx) =>
              val px = img.width * img.height
              var r = 0L; var g = 0L; var bl = 0L; var i = 0
              while (i < px) {
                val o = i * 3
                r += img.rgb(o) & 0xff; g += img.rgb(o + 1) & 0xff
                bl += img.rgb(o + 2) & 0xff
                i += 1
              }
              (id, idx, frames.size, img.width, img.height,
                round6(r.toDouble / px), round6(g.toDouble / px),
                round6(bl.toDouble / px))
            }
        }
      }
      .toDF("media_id", "frame_index", "n_frames", "width", "height",
        "mean_r", "mean_g", "mean_b")
  }
}
