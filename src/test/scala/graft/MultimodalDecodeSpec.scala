package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Real-decode tests: hand-assembled BMP and PPM payloads with known
  * pixels, checked through decodeImage / imageFeatures / imageMeta and
  * the Spark dataflow. The same pixels encoded in both formats must
  * produce bit-identical features — the proof the decode is reading
  * pixels, not hashing bytes. */
class MultimodalDecodeSpec extends SparkSpec {

  /** 3x2 test raster, row-major top-down RGB:
    * (255,0,0) (0,255,0) (0,0,255)
    * (0,0,0)   (128,128,128) (255,255,255) */
  private val px: Array[Array[Int]] = Array(
    Array(255, 0, 0), Array(0, 255, 0), Array(0, 0, 255),
    Array(0, 0, 0), Array(128, 128, 128), Array(255, 255, 255))
  private val W = 3
  private val H = 2

  /** Minimal uncompressed 24-bit BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, 4-byte padded rows, bottom-up, BGR. */
  private def bmpBytes: Array[Byte] = {
    val stride = ((W * 3 + 3) / 4) * 4
    val dataSize = stride * H
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def le16(v: Int): Unit = (0 until 2).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    out.write('B'); out.write('M')
    le32(54 + dataSize); le32(0); le32(54) // file size, reserved, data offset
    le32(40); le32(W); le32(H)             // DIB size, width, height (bottom-up)
    le16(1); le16(24); le32(0); le32(dataSize) // planes, bpp, BI_RGB, image size
    le32(2835); le32(2835); le32(0); le32(0)   // ppm resolution, palette
    for (y <- (H - 1) to 0 by -1) {
      for (x <- 0 until W) {
        val p = px(y * W + x)
        out.write(p(2)); out.write(p(1)); out.write(p(0)) // BGR
      }
      (W * 3 until stride).foreach(_ => out.write(0)) // row padding
    }
    out.toByteArray
  }

  /** PPM P6 with a comment in the header, maxval 255, top-down RGB. */
  private def ppmBytes: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n# test raster\n$W $H\n255\n".getBytes("US-ASCII"))
    px.foreach(p => { out.write(p(0)); out.write(p(1)); out.write(p(2)) })
    out.toByteArray
  }

  test("decodeImage: BMP and PPM of the same pixels decode identically") {
    val bmp = Multimodal.decodeImage(bmpBytes)
    val ppm = Multimodal.decodeImage(ppmBytes)
    assert(bmp.isDefined && ppm.isDefined)
    assert(bmp.get.width === W && bmp.get.height === H)
    assert(ppm.get.width === W && ppm.get.height === H)
    assert(bmp.get.rgb.toSeq === ppm.get.rgb.toSeq)
    // spot-check actual pixel values survived the BGR/bottom-up walk
    val rgb = bmp.get.rgb
    assert((rgb(0) & 0xff, rgb(1) & 0xff, rgb(2) & 0xff) === ((255, 0, 0)))
    val last = (H * W - 1) * 3
    assert((rgb(last) & 0xff, rgb(last + 1) & 0xff, rgb(last + 2) & 0xff)
      === ((255, 255, 255)))
    assert(Multimodal.imageFeatures(bmp.get).toSeq ===
      Multimodal.imageFeatures(ppm.get).toSeq)
  }

  test("resizeImage: nearest-neighbor index math, hand-checked") {
    // 4x2 raster with pixel (x, y) = (10x+y, 100+x, 200+y)
    val rgb = new Array[Byte](4 * 2 * 3)
    for (y <- 0 until 2; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      rgb(o) = (10 * x + y).toByte; rgb(o + 1) = (100 + x).toByte
      rgb(o + 2) = (200 + y).toByte
    }
    val img = Multimodal.DecodedImage(4, 2, rgb)
    // 2x1: picks (0,0) and (2,0)
    val r1 = Multimodal.resizeImage(img, 2, 1)
    assert(r1.rgb.map(_ & 0xff).toSeq ===
      Seq(0, 100, 200, 20, 102, 200))
    // upscale 8x2: each source column repeats twice, rows repeat
    val r2 = Multimodal.resizeImage(img, 8, 2)
    assert(r2.width === 8 && r2.height === 2)
    for (x <- 0 until 8) {
      val o = x * 3
      assert((r2.rgb(o) & 0xff) === 10 * (x / 2)) // sx = x*4/8 = x/2
    }
    // identity resize is a byte-exact copy
    assert(Multimodal.resizeImage(img, 4, 2).rgb.toSeq === rgb.toSeq)
  }

  test("decodeVideoFrames: walks concatenated P6 frames, truncation-tolerant") {
    val two = ppmBytes ++ ppmBytes
    val frames = Multimodal.decodeVideoFrames(two)
    assert(frames.size === 2)
    assert(frames(0).rgb.toSeq === frames(1).rgb.toSeq)
    assert(frames(0).width === W && frames(0).height === H)
    // single image == one-frame video
    assert(Multimodal.decodeVideoFrames(ppmBytes).size === 1)
    // truncated second frame: first survives, walk stops cleanly
    val truncated = ppmBytes ++ ppmBytes.take(ppmBytes.length - 3)
    assert(Multimodal.decodeVideoFrames(truncated).size === 1)
    // junk and empty
    assert(Multimodal.decodeVideoFrames("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeVideoFrames(Array.emptyByteArray).isEmpty)
    // videoFrameMeta samples every step-th frame through the dataflow
    import spark.implicits._
    val media = Seq((1L, two ++ ppmBytes)).toDF("media_id", "payload")
    val meta = Multimodal.videoFrameMeta(media, step = 2)
      .orderBy("frame_index").collect()
    assert(meta.map(_.getAs[Int]("frame_index")).toSeq === Seq(0, 2))
    assert(meta.forall(_.getAs[Int]("n_frames") === 3))
    assert(meta.forall(r => r.getAs[Int]("width") === W &&
      r.getAs[Int]("height") === H))
  }

  test("decodeImage: PNG re-encode of the PPM fixture is bit-identical (lossless gate)") {
    val ppm = Multimodal.decodeImage(ppmBytes).get
    val png = Multimodal.encodePng(ppm)
    // really a PNG payload, and really the JDK-codec dispatch
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte)
    val viaPng = Multimodal.decodeImage(png)
    assert(viaPng.isDefined, "PNG must decode via the javax.imageio dispatch")
    assert(viaPng.get.width === W && viaPng.get.height === H)
    assert(viaPng.get.rgb.toSeq === ppm.rgb.toSeq,
      "PNG is lossless: decoded raster must be bit-identical to the PPM source")
    // so are the features — the multimodal_meta gate property
    assert(Multimodal.imageFeatures(viaPng.get).toSeq ===
      Multimodal.imageFeatures(ppm).toSeq)
  }

  test("decodeImage: JPEG decode sanity — dimensions exact, pixels near-lossless on a flat image") {
    // flat mid-gray 16x8: JPEG of a constant image reconstructs ~exactly
    val w = 16; val h = 8
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", out)
    val jpg = out.toByteArray
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8)
    val dec = Multimodal.decodeImage(jpg)
    assert(dec.isDefined, "JPEG must decode via the javax.imageio dispatch")
    assert(dec.get.width === w && dec.get.height === h)
    val worst = dec.get.rgb.map(b => math.abs((b & 0xff) - 0x80)).max
    assert(worst <= 2, s"flat-gray JPEG roundtrip drifted by $worst levels")
    // and imageMeta sees it as decoded through the Spark dataflow
    import spark.implicits._
    val media = Seq((7L, "image", jpg)).toDF("media_id", "kind", "payload")
    val row = Multimodal.imageMeta(media).collect().head
    assert(row.getBoolean(1) && row.getInt(2) === w && row.getInt(3) === h)
    assert(math.abs(row.getDouble(4) - 128.0) < 2.5)
  }

  test("pngRoundTripMeta: stats equal the direct decode, raster byte-equal") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", ppmBytes), (2L, "image", bmpBytes),
      (3L, "image", "undecodable".getBytes)
    ).toDF("media_id", "kind", "payload")
    val direct = Multimodal.imageMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rt = Multimodal.pngRoundTripMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(rt(id).getBoolean(1) && rt(id).getAs[Boolean]("roundtrip_exact"),
        s"PNG round trip must be exact for $id")
      assert(rt(id).getInt(2) === direct(id).getInt(2))
      assert(rt(id).getDouble(4) === direct(id).getDouble(4))
      assert(rt(id).getDouble(5) === direct(id).getDouble(5))
      assert(rt(id).getDouble(6) === direct(id).getDouble(6))
    }
    assert(!rt(3L).getBoolean(1) && rt(3L).isNullAt(7))
  }

  test("decodeImage: rejects junk, truncated, and unsupported payloads") {
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(bmpBytes.take(30)).isEmpty)  // truncated header
    assert(Multimodal.decodeImage(bmpBytes.take(58)).isEmpty)  // truncated pixels
    assert(Multimodal.decodeImage(ppmBytes.take(10)).isEmpty)
    // 8-bpp BMP (palette) is out of scope for the header walk
    val b8 = bmpBytes.clone(); b8(28) = 8
    assert(Multimodal.decodeImage(b8).isEmpty)
  }

  /** Canonical PCM16 mono WAV: RIFF header + fmt + data, `hz` sine at
    * `rate` for `n` samples, amplitude 0.5. */
  private def wavBytes(rate: Int = 8000, hz: Double = 440.0, n: Int = 800): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def le16(v: Int): Unit = (0 until 2).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val dataLen = n * 2
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(rate)
    le32(rate * 2); le16(2); le16(16) // byte rate, block align, bits
    ascii("data"); le32(dataLen)
    (0 until n).foreach { i =>
      val s = (0.5 * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      le16(s & 0xffff)
    }
    out.toByteArray
  }

  test("decodeAudio: PCM16 WAV sine tone — rate, duration, RMS, ZCR") {
    val a = Multimodal.decodeAudio(wavBytes()).get
    assert(a.sampleRate === 8000 && a.channels === 1 && a.samples.length === 800)
    val f = Multimodal.audioFeatures(a)
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ~ 0.3536
    assert(math.abs(f(0) - 0.3536f) < 0.01f, s"rms ${f(0)}")
    // 440 Hz at 8 kHz over 0.1 s: ~88 zero crossings -> zcr ~ 0.11
    assert(math.abs(f(1) - 0.11f) < 0.01f, s"zcr ${f(1)}")
    assert(Multimodal.decodeAudio("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(wavBytes().take(40)).isEmpty)
    // non-PCM format code must be rejected
    val b = wavBytes(); b(20) = 3
    assert(Multimodal.decodeAudio(b).isEmpty)
  }

  test("audioDHash: hand-checked energy gradient bits; twin flips <= 1 bit") {
    // PCM8 mono WAV whose 65 windows have strictly RISING energy ->
    // every E(w+1) > E(w) bit set -> fingerprint = all-ones
    def pcm8Wav(sampleAt: Int => Int, n: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit =
        (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
      def le16(v: Int): Unit =
        (0 until 2).foreach(i => out.write((v >>> (8 * i)) & 0xff))
      def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      ascii("RIFF"); le32(36 + n); ascii("WAVE")
      ascii("fmt "); le32(16); le16(1); le16(1); le32(8000)
      le32(8000); le16(1); le16(8)
      ascii("data"); le32(n)
      (0 until n).foreach(i => out.write(sampleAt(i) & 0xff))
      out.toByteArray
    }
    val n = 65 * 8
    // window w samples = 128 + w (monotone energy (w*256)^2 * 8)
    val rising = pcm8Wav(i => 128 + (i / 8), n)
    val a = Multimodal.decodeAudio(rising).get
    assert(Multimodal.audioDHash(a) === Some(-1L), "all-ones expected")
    // flat -> no strict rise -> all-zero fingerprint
    val flat = pcm8Wav(_ => 200, n)
    assert(Multimodal.audioDHash(Multimodal.decodeAudio(flat).get)
      === Some(0L))
    // twin: silence ONLY the last window of the rising clip -> exactly
    // bit 63 flips (E(64)=0 is no longer > E(63))
    val twin = pcm8Wav(i => if (i >= 64 * 8) 128 else 128 + (i / 8), n)
    val ht = Multimodal.audioDHash(Multimodal.decodeAudio(twin).get).get
    assert(java.lang.Long.bitCount(ht ^ -1L) === 1 &&
      (ht >>> 63) === 0L, f"twin drifted: $ht%016x")
    // too short for 65 windows -> None
    val short = pcm8Wav(_ => 128, 64)
    assert(Multimodal.audioDHash(Multimodal.decodeAudio(short).get).isEmpty)
  }

  test("audioFingerprint + phashPairs: banded audio near-dup recovery") {
    import spark.implicits._
    val n = 65 * 8
    def clip(seed: Int, lastSilent: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit =
        (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
      def le16(v: Int): Unit =
        (0 until 2).foreach(i => out.write((v >>> (8 * i)) & 0xff))
      def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      ascii("RIFF"); le32(36 + n); ascii("WAVE")
      ascii("fmt "); le32(16); le16(1); le16(1); le32(8000)
      le32(8000); le16(1); le16(8)
      ascii("data"); le32(n)
      (0 until n).foreach { i =>
        val v = if (lastSilent && i >= 64 * 8) 128
          else 128 + ((i / 8 * 31 + seed * 17) % 97)
        out.write(v & 0xff)
      }
      out.toByteArray
    }
    val media = Seq(
      (1L, clip(1, lastSilent = false)),
      (2L, clip(2, lastSilent = false)),
      (101L, clip(1, lastSilent = true))) // twin of 1
      .toDF("media_id", "payload")
    val fp = Multimodal.audioFingerprint(media)
    assert(fp.filter(col("decoded")).count() === 3)
    val pairs = Multimodal.phashPairs(fp, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 101L)), s"twin pair missing: $pairs")
    assert(!pairs.contains((1L, 2L)), s"unrelated clips paired: $pairs")
  }

  test("videoPhash + videoPhashPairs: same-index frame match, twin recovery") {
    import spark.implicits._
    def p6(seed: Int, zeroLast: Boolean): Array[Byte] = {
      val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
      val raster = Array.tabulate(192)(i =>
        if (zeroLast && i >= 189) 0.toByte
        else ((i * 31 + seed * 17) % 251).toByte)
      header ++ raster
    }
    def video(seed: Int, twin: Boolean): Array[Byte] =
      p6(seed, zeroLast = false) ++ p6(seed + 1, zeroLast = false) ++
        p6(seed + 2, zeroLast = twin)
    val media = Seq(
      (1L, video(1, twin = false)),
      (2L, video(50, twin = false)),
      (101L, video(1, twin = true))).toDF("media_id", "payload")
    val fp = Multimodal.videoPhash(media)
    assert(fp.count() === 9, "3 videos x 3 frames")
    val pairs = Multimodal.videoPhashPairs(fp, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val twin = pairs.find(p => p._1 == 1L && p._2 == 101L)
    assert(twin.isDefined, s"twin pair missing: ${pairs.toSeq}")
    assert(twin.get._3 === 3L, s"all 3 frames must match: ${twin.get}")
    assert(twin.get._4 === 0L, "frames 0/1 are identical -> min hamming 0")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"unrelated videos paired: ${pairs.toSeq}")
  }

  test("audioMeta: typed WAV metadata through the Spark dataflow") {
    import spark.implicits._
    val media = Seq(
      (1L, "audio", wavBytes()), (2L, "audio", "noise".getBytes)
    ).toDF("media_id", "kind", "payload")
    val m = Multimodal.audioMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getBoolean(1) && m(1L).getInt(2) === 8000)
    assert(m(1L).getLong(4) === 100L) // 800 samples @ 8 kHz = 100 ms
    assert(!m(2L).getBoolean(1) && m(2L).isNullAt(2))
  }

  test("imageMeta + extractFeatures: real decode through the Spark dataflow") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", bmpBytes), (2L, "image", ppmBytes),
      (3L, "image", "plain text payload".getBytes)
    ).toDF("media_id", "kind", "payload")

    val meta = Multimodal.imageMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getBoolean(1) && meta(2L).getBoolean(1))
    assert(meta(1L).getInt(2) === W && meta(1L).getInt(3) === H)
    // mean over the 6 known pixels: R (255+0+0+0+128+255)/6
    assert(meta(1L).getDouble(4) === math.rint(638 / 6.0 * 1e6) / 1e6)
    assert(meta(2L).getDouble(4) === meta(1L).getDouble(4))
    assert(!meta(3L).getBoolean(1) && meta(3L).isNullAt(2))

    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L) === feats(2L))            // format-independent
    assert(math.abs(feats(1L).sum - 1.0f) < 1e-6)
    // luminance bins: black pixel -> bin 0, white -> bin 15
    assert(feats(1L)(0) > 0 && feats(1L)(15) > 0)
    assert(feats(3L).sum > 0)                  // fallback path still fires
  }

  /** P6 payload from an explicit RGB raster (row-major top-down). */
  private def p6(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n$w $h\n255\n".getBytes)
    rgb.foreach(out.write)
    out.toByteArray
  }

  test("dHashBits: hand-computed gradient bits, format independence") {
    // 2x1 source, gw=1, gh=1: resize to 2x1 is identity; bit 0 set iff
    // luma(left) > luma(right)
    val bright = p6(2, 1, Array(255, 255, 255, 0, 0, 0))
    val dark = p6(2, 1, Array(0, 0, 0, 255, 255, 255))
    val Some(b) = Multimodal.decodeImage(bright)
    val Some(d) = Multimodal.decodeImage(dark)
    assert(Multimodal.dHashBits(b, 1, 1) === 1L)
    assert(Multimodal.dHashBits(d, 1, 1) === 0L)
    // flat image: every gradient 0 -> hash 0 at any grid
    val Some(flat) = Multimodal.decodeImage(
      p6(4, 4, Array.fill(48)(100)))
    assert(Multimodal.dHashBits(flat) === 0L)
    // same pixels as BMP and PPM hash identically (decode independence)
    val Some(fromBmp) = Multimodal.decodeImage(bmpBytes)
    val Some(fromPpm) = Multimodal.decodeImage(ppmBytes)
    assert(Multimodal.dHashBits(fromBmp) === Multimodal.dHashBits(fromPpm))
    // and the PNG codec round-trip preserves the hash (lossless)
    val Some(fromPng) = Multimodal.decodeImage(Multimodal.encodePng(fromPpm))
    assert(Multimodal.dHashBits(fromPng) === Multimodal.dHashBits(fromPpm))
  }

  test("imagePhash + phashPairs: planted twin found, flat-bucket cap holds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def noisy(): Array[Int] = Array.fill(8 * 8 * 3)(rnd.nextInt(256))
    val base = noisy()
    val twin = base.clone(); twin(base.length - 1) = 0; twin(base.length - 2) = 0
    val media = (Seq(
      (1L, p6(8, 8, base)), (2L, p6(8, 8, twin)),
      (3L, "not an image".getBytes)) ++
      (10L to 19L).map(i => (i, p6(8, 8, noisy())))
    ).toDF("media_id", "payload")
    val hashed = Multimodal.imagePhash(media)
    val rows = hashed.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(3L).getBoolean(1) === false && rows(3L).isNullAt(2))
    // hex presentation == %016x of the band-reassembled long
    val h1 = (0 to 3).map(i => rows(1L).getLong(3 + i) << (16 * i)).reduce(_ | _)
    assert(rows(1L).getString(2) === f"$h1%016x")
    val pairs = Multimodal.phashPairs(hashed, maxHamming = 4).collect()
    assert(pairs.exists(r => r.getLong(0) === 1L && r.getLong(1) === 2L
      && r.getLong(2) <= 1L), "planted twin must pair with its original")
    // degenerate flat-color corpus: every image hashes to 0 — the
    // bucket cap must drop the bucket instead of going quadratic
    val flat = (1L to 30L).map(i => (i, p6(8, 8, Array.fill(192)(50))))
      .toDF("media_id", "payload")
    val capped = Multimodal.phashPairs(
      Multimodal.imagePhash(flat), maxHamming = 4, maxBucketSize = 10)
    assert(capped.count() === 0L)
  }

  test("incrementalPhash: dup_of_corpus / dup_in_batch / new statuses") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def noisy(): Array[Int] = Array.fill(8 * 8 * 3)(rnd.nextInt(256))
    val a = noisy(); val b = noisy(); val x = noisy()
    val aTwin = a.clone(); aTwin(a.length - 1) = 0; aTwin(a.length - 2) = 0
    val index = Multimodal.imagePhash(
      Seq((1L, p6(8, 8, a)), (2L, p6(8, 8, b))).toDF("media_id", "payload"))
    val batch = Seq(
      (10L, p6(8, 8, aTwin)),        // near the corpus image 1
      (11L, p6(8, 8, x)),            // fresh -> new
      (12L, p6(8, 8, x)),            // same fresh raster -> dup of 11
      (13L, "junk".getBytes)         // undecodable: excluded
    ).toDF("media_id", "payload")
    val out = Multimodal.incrementalPhash(index, batch)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(10L, 11L, 12L))
    assert(out(10L)._1 === "dup_of_corpus" && out(10L)._2 === 1L
      && out(10L)._3 <= 1L)
    assert(out(11L) === (("new", -1L, -1L)))
    assert(out(12L) === (("dup_in_batch", 11L, 0L)))
  }
}
