package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition over batches of rows (the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: one iterator per partition, library handles loaded
  * once per partition, vectorized work inside).
  *
  * Decode is REAL for every image kind (BMP via a pure-JVM parser,
  * PNG/JPEG via the JDK's javax.imageio — no external codec dependency),
  * for 16-bit PCM WAV, and for AVI video with uncompressed-DIB or MJPG
  * frames (pure-JVM RIFF walker; MJPG frames through the JDK JPEG
  * codec); only genuinely compressed codecs (MP3/H.264) route to a
  * deterministic byte-histogram stand-in, this container having no such
  * libraries. Everything Spark-side is real and tested: the
  * schema, the binary encoding, the partition-iterator batch shape, and
  * the feature definitions (pixel-luminance / PCM-amplitude / byte
  * histograms), the last simple enough to mirror into the DuckDB oracle.
  *
  * Scale: feature extraction is embarrassingly parallel (mapPartitions, no
  * shuffle); downstream similarity joins reuse the Similarity operators.
  */
object Multimodal {

  val FeatureDim = 16

  /** Typed media row: opaque payload + metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           features: Array[Double])

  /** STUB decoder (compressed-codec AUDIO/VIDEO only) =======================
    * MP3/H.264 need codec libraries this container doesn't have; for
    * those kinds this deterministic stand-in computes a normalized byte
    * histogram folded to `FeatureDim` buckets — real plumbing, fake
    * decode. Everything else is REAL: BMP (pure-JVM parser), PNG/JPEG
    * (JDK `javax.imageio`), WAV PCM (pure-JVM parser), AVI video with
    * DIB or MJPG frames (pure-JVM container walker, [[decodeAvi]]);
    * [[decodeFeatures]] dispatches on the payload's magic bytes.
    */
  def decodeFeaturesStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatureDim) += 1.0
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < FeatureDim) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /** Decoded uncompressed image: row-major top-down RGB triples. */
  case class ImageDecoded(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded PCM audio. */
  case class AudioDecoded(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** REAL decoder: uncompressed 24-bpp BMP (BITMAPINFOHEADER, BI_RGB).
    * Pure JVM — file header ("BM", pixel-array offset at byte 10), info
    * header (width/height/bpp/compression), 4-byte-padded BGR pixel rows,
    * bottom-up when height > 0 (the format's default). Returns None on
    * anything malformed or any other BMP variant — the caller falls back
    * to the stub rather than guessing.
    */
  def decodeBmp(payload: Array[Byte]): Option[ImageDecoded] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val pixelOff = le32(payload, 10)
    val headerSize = le32(payload, 14)
    if (headerSize < 40) return None // BITMAPCOREHEADER etc. unsupported
    val width = le32(payload, 18)
    val rawHeight = le32(payload, 22)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    if (width <= 0 || rawHeight == 0 || rawHeight == Int.MinValue ||
      bpp != 24 || compression != 0) return None
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    // row/pixel arithmetic in LONG: a crafted width near 2^31/3 wraps
    // `width * 3` negative in Int, slipping past the bounds check into an
    // out-of-bounds read or a NegativeArraySizeException — a failed
    // stage, where a malformed header must mean a skipped row (P5)
    val rowBytesL = (width.toLong * 3 + 3) & ~3L
    if (pixelOff < 0 || pixelOff.toLong + rowBytesL * height > payload.length ||
      3L * width * height > Int.MaxValue)
      return None
    val rowBytes = rowBytesL.toInt
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = pixelOff + (if (bottomUp) height - 1 - y else y) * rowBytes
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3 // stored BGR
        val d = (y * width + x) * 3
        rgb(d) = payload(s + 2)
        rgb(d + 1) = payload(s + 1)
        rgb(d + 2) = payload(s)
        x += 1
      }
      y += 1
    }
    Some(ImageDecoded(width, height, rgb))
  }

  /** REAL decoder: RIFF/WAVE with 16-bit integer PCM (format tag 1).
    * Walks the chunk list (fmt / data may be preceded by LIST etc.,
    * chunks pad to even sizes). Returns None for any other encoding.
    */
  def decodeWav(payload: Array[Byte]): Option[AudioDecoded] = {
    if (payload.length < 44 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
      payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(payload, off, 4, StandardCharsets.US_ASCII)
      val size = le32(payload, off + 4)
      // LONG arithmetic: a crafted size near 2^31 wraps the Int sum
      // negative and admits an out-of-bounds data chunk (P5: skip, don't
      // fail the stage)
      if (size < 0 || off.toLong + 8L + size > payload.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = le16(payload, off + 8)
          val channels = le16(payload, off + 10)
          val sampleRate = le32(payload, off + 12)
          val bits = le16(payload, off + 22)
          if (audioFormat != 1 || bits != 16 || channels <= 0) return None
          fmt = Some((channels, sampleRate, bits))
        case "data" => data = Some((off + 8, size))
        case _ => // skip LIST/fact/…
      }
      off += 8 + size + (size & 1) // chunks pad to even length
    }
    for ((channels, rate, _) <- fmt; (dOff, dSize) <- data) yield {
      val n = dSize / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = le16(payload, dOff + 2 * i).toShort; i += 1 }
      AudioDecoded(rate, channels, samples)
    }
  }

  /** REAL decoder: PNG / JPEG via the JDK's built-in `javax.imageio`
    * readers — zero new dependencies. Dispatches on magic bytes only
    * (PNG `\x89PNG`, JPEG `\xFF\xD8\xFF`) so arbitrary binary never
    * reaches ImageIO, and disables ImageIO's disk cache (the default
    * spills every stream to a temp file — per-row file churn at scale).
    * The decoded image converts to the same top-down row-major RGB
    * triples decodeBmp emits, so every consumer is format-blind.
    *
    * Determinism: PNG is lossless — bit-exact pixels everywhere. JPEG
    * inverse-DCT rounding is implementation-defined, so JPEG features
    * are deterministic per JDK but not a cross-engine gate — which is
    * why pixel pins live in the spec fixtures, not the DuckDB oracle
    * (the registry's media column synthesizes from text payloads).
    */
  def decodeImageIO(payload: Array[Byte]): Option[ImageDecoded] = {
    val isPng = payload.length > 8 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'
    val isJpeg = payload.length > 3 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff
    // GIF87a / GIF89a — the JDK reader handles LZW + palette; grayscale
    // round-trips losslessly (<=256 distinct colors -> exact palette)
    val isGif = payload.length > 6 && payload(0) == 'G' &&
      payload(1) == 'I' && payload(2) == 'F' && payload(3) == '8' &&
      (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a'
    if (!isPng && !isJpeg && !isGif) None
    else try {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // dimension gate BEFORE the raster exists: getWidth/getHeight
            // parse the header only, so a crafted 100-byte bomb declaring
            // a multi-gigapixel canvas is rejected here instead of
            // OOM-killing the task inside ImageIO.read (an
            // OutOfMemoryError is the one failure no catch can turn into
            // a P5 skip)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
            else {
              val bi = reader.read(0)
              val argb = bi.getRGB(0, 0, w, h, null, 0, w) // packed ARGB, any model
              val rgb = new Array[Byte](w * h * 3)
              var i = 0
              while (i < argb.length) {
                rgb(3 * i) = ((argb(i) >> 16) & 0xff).toByte
                rgb(3 * i + 1) = ((argb(i) >> 8) & 0xff).toByte
                rgb(3 * i + 2) = (argb(i) & 0xff).toByte
                i += 1
              }
              Some(ImageDecoded(w, h, rgb))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pixel-count cap for the ImageIO path (16.7M pixels = 8192x2048 ≈
    * 50 MB decoded RGB — generous for any document-pipeline image, small
    * enough that 32 concurrent decode tasks stay bounded). decodeBmp and
    * the AVI DIB walk are separately bounded by the payload's own length.
    */
  val MaxDecodePixels: Long = 1L << 24

  /** Feature vector from REAL decoded content, same 16-dim normalized
    * histogram shape as the stub so the schema and every consumer are
    * unchanged: BMP -> luminance histogram over decoded pixels (integer
    * luma (r+g+b)/3, 16 buckets of 16), WAV -> amplitude histogram over
    * PCM samples (16 buckets of 4096 across the int16 range). Anything
    * else (compressed kinds, text payloads) falls back to the byte
    * histogram stub.
    */
  private def lumaHistogram(img: ImageDecoded): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    val n = img.rgb.length / 3
    var i = 0
    while (i < n) {
      val luma = ((img.rgb(3 * i) & 0xff) + (img.rgb(3 * i + 1) & 0xff) +
        (img.rgb(3 * i + 2) & 0xff)) / 3
      hist(luma / FeatureDim) += 1.0
      i += 1
    }
    if (n > 0) { var j = 0; while (j < FeatureDim) { hist(j) /= n; j += 1 } }
    hist
  }

  /** The codec boundary as a FUNCTION (not prose): which decoder accepts
    * this payload, in [[decodeFeatures]]'s exact dispatch order. "stub"
    * means the payload reaches the byte-histogram stand-in — either a
    * genuinely compressed codec this container has no library for
    * (MP3/AAC/H.264) or an undecodable/corrupt blob. MultimodalSpec pins
    * a magic→value table over this, so a decoder addition or regression
    * fails a named test instead of silently rerouting to the stub.
    */
  def decoderOf(payload: Array[Byte]): String =
    if (decodeBmp(payload).isDefined) "bmp"
    else if (decodeImageIO(payload).isDefined) "imageio"
    else if (decodeAvi(payload).isDefined) "avi"
    else if (decodeWav(payload).isDefined) "wav"
    else "stub"

  def decodeFeatures(payload: Array[Byte]): Array[Double] =
    decodeBmp(payload).orElse(decodeImageIO(payload)).map(lumaHistogram)
      .orElse(decodeAvi(payload).map { v =>
        // video: luminance histogram pooled over every decoded frame
        lumaHistogram(ImageDecoded(v.width, v.height * v.frames.length,
          v.frames.flatten))
      })
      .orElse(decodeWav(payload).map { au =>
      val hist = new Array[Double](FeatureDim)
      var i = 0
      while (i < au.samples.length) {
        hist((au.samples(i) + 32768) / 4096) += 1.0
        i += 1
      }
      if (au.samples.length > 0) {
        var j = 0
        while (j < FeatureDim) { hist(j) /= au.samples.length; j += 1 }
      }
      hist
    }).getOrElse(decodeFeaturesStub(payload))

  /** REAL encoder: grayscale lumas → top-down 24-bpp BMP (r=g=b=luma,
    * negative height = top-down, rows 4-byte padded). The inverse of
    * [[decodeBmp]] for gray images — lets a pipeline synthesize genuine
    * binary image payloads and round-trip them through the real decoder
    * (dedup_phash does exactly that; the round-trip is spec-pinned).
    */
  def bmpFromLumas(lumas: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && lumas.length % width == 0, "lumas must fill rows")
    val height = lumas.length / width
    val rowBytes = (width * 3 + 3) & ~3
    val pixelOff = 54
    val buf = java.nio.ByteBuffer.allocate(pixelOff + rowBytes * height)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(pixelOff + rowBytes * height)
      .putInt(0).putInt(pixelOff)
    buf.putInt(40).putInt(width).putInt(-height) // negative = top-down
    buf.putShort(1).putShort(24).putInt(0).putInt(rowBytes * height)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (lumas(y * width + x) & 0xff).toByte
        buf.put(v).put(v).put(v) // BGR, all equal for gray
        x += 1
      }
      var p = width * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y += 1
    }
    buf.array()
  }

  /** REAL encoder: grayscale lumas → PNG via JDK ImageIO. PNG is
    * lossless, so pixels round-trip bit-exact through [[decodeImageIO]]
    * (byte-level encoding may differ across JDKs; PIXELS cannot) —
    * which is what lets PNG payloads flow through the oracle-gated
    * dedup_phash unchanged: the hash reads pixels, not bytes.
    */
  def pngFromLumas(lumas: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && lumas.length % width == 0, "lumas must fill rows")
    val height = lumas.length / width
    val bi = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < lumas.length) {
      val v = lumas(i) & 0xff
      bi.setRGB(i % width, i / width, (v << 16) | (v << 8) | v)
      i += 1
    }
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(bi, "png", out))
      sys.error("JDK PNG writer unavailable")
    out.toByteArray
  }

  /** REAL GIF encoder via the JDK writer — gray lumas have <= 256
    * distinct colors, so the palette is exact and the LZW round trip is
    * lossless (spec-pinned), extending the format-blind image family to
    * a third on-disk codec.
    */
  def gifFromLumas(lumas: Array[Int], width: Int): Array[Byte] = {
    require(width > 0 && lumas.length % width == 0, "lumas must fill rows")
    val height = lumas.length / width
    val bi = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < lumas.length) {
      val v = lumas(i) & 0xff
      bi.getRaster.setSample(i % width, i / width, 0, v)
      i += 1
    }
    javax.imageio.ImageIO.setUseCache(false)
    // NON-interlaced, explicitly: the JDK GIF writer interlaces by
    // default and the JDK READER mis-deinterlaces small heights (rows
    // land scrambled at h=4 — measured), so the plain ImageIO.write
    // round trip silently corrupts pixels. MODE_DISABLED is exact.
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = w.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close()
    w.dispose()
    out.toByteArray
  }

  /** Decode any supported image payload to RGB: the pure-JVM BMP parser
    * first (cheap magic check), then the ImageIO formats (PNG/JPEG/GIF).
    */
  def decodeImage(payload: Array[Byte]): Option[ImageDecoded] =
    decodeBmp(payload).orElse(decodeImageIO(payload))

  /** MP3 metadata from a pure-JVM FRAME-HEADER walk — the honest middle
    * tier of the codec boundary: no sample decode (that needs a codec
    * library this container doesn't have; content stays "stub" by
    * contract), but duration/bitrate/frame-count are genuinely PARSED
    * from the frame structure, which is what corpus statistics actually
    * need. Scope: MPEG-1 Layer III, the overwhelmingly common case; an
    * optional ID3v2 prefix is skipped (synchsafe size). STRICT walk —
    * every frame to the payload's end must parse and agree on
    * version/layer/samplerate, a truncated or corrupt tail returns None
    * (P5: the row skips, the stage survives).
    */
  case class Mp3Meta(bitrateKbps: Int, sampleRateHz: Int, frames: Int,
                     totalSamples: Long)

  private val Mp3Bitrates = // MPEG-1 Layer III, kbps; 0 = free (rejected)
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val Mp3Rates = Array(44100, 48000, 32000, -1)

  def decodeMp3Meta(payload: Array[Byte]): Option[Mp3Meta] = {
    val n = payload.length
    // optional ID3v2 container: "ID3" maj min flags + 4-byte synchsafe size
    var off = 0L
    if (n >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7fL) << 21) | ((payload(7) & 0x7fL) << 14) |
        ((payload(8) & 0x7fL) << 7) | (payload(9) & 0x7fL)
      // ID3v2.4 footer flag (header byte 5 bit 4): the synchsafe size
      // excludes both the 10-byte header and the 10-byte footer
      val footer = if ((payload(5) & 0x10) != 0) 10L else 0L
      off = 10L + size + footer
    }
    var frames = 0
    var bitrate = -1
    var rate = -1
    while (off + 4 <= n) {
      val b0 = payload(off.toInt) & 0xff
      val b1 = payload(off.toInt + 1) & 0xff
      val b2 = payload(off.toInt + 2) & 0xff
      // sync (11 bits) + MPEG-1 (verBits 11) + Layer III (layerBits 01)
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) return None
      val br = Mp3Bitrates((b2 >> 4) & 0xf)
      val sr = Mp3Rates((b2 >> 2) & 0x3)
      if (br <= 0 || sr <= 0) return None
      if (frames == 0) { bitrate = br; rate = sr }
      else if (sr != rate) return None // mid-stream rate switch: corrupt
      val frameLen = 144L * br * 1000L / sr + ((b2 >> 1) & 1)
      off += frameLen
      frames += 1
    }
    // a valid stream ends exactly on a frame boundary with >= 1 frame
    if (frames == 0 || off != n) None
    else Some(Mp3Meta(bitrate, rate, frames, 1152L * frames))
  }

  /** Synthesize a structurally valid MPEG-1 Layer III stream: real frame
    * headers (correct sync/version/layer/bitrate/samplerate bits, no
    * padding) with zeroed frame payloads — [[decodeMp3Meta]]'s inverse
    * at the header level, the same synthesize-then-really-parse pattern
    * as bmpFromLumas/wavFromSamples.
    */
  def mp3FromParams(frames: Int, bitrateKbps: Int, sampleRateHz: Int): Array[Byte] = {
    val bIdx = Mp3Bitrates.indexOf(bitrateKbps)
    val rIdx = Mp3Rates.indexOf(sampleRateHz)
    // bIdx 0 is the "free" bitrate and index 15 holds the -1 "bad" sentinel
    // (so does Mp3Rates index 3): both must fail the params check here, or
    // bitrateKbps = -1 would pass and crash on the negative frame length
    require(bIdx > 0 && bIdx < 15 && rIdx >= 0 && rIdx < 3 && frames > 0,
      "unsupported params")
    val frameLen = (144L * bitrateKbps * 1000L / sampleRateHz).toInt
    val out = new Array[Byte](frameLen * frames)
    var f = 0
    while (f < frames) {
      val o = f * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(o + 2) = ((bIdx << 4) | (rIdx << 2)).toByte // no padding bit
      out(o + 3) = 0xc4.toByte // mono, no emphasis
      f += 1
    }
    out
  }

  /** Decoded video: per-frame top-down row-major RGB triples, same pixel
    * layout as [[ImageDecoded]] so every image consumer is frame-blind.
    */
  case class VideoDecoded(width: Int, height: Int, frames: Array[Array[Byte]])

  /** Depth-first walk over a RIFF chunk range: LIST chunks recurse into
    * their children, leaf chunks invoke `onChunk(id, dataOff, dataSize)`.
    * Chunks pad to even sizes; any size running past `end` stops the walk
    * (truncated file) rather than throwing.
    */
  private def riffWalk(payload: Array[Byte], start: Int, end: Int,
                       onChunk: (String, Int, Int) => Unit,
                       depth: Int = 0): Unit = {
    // P5 hardening, both in LONG arithmetic and with a nesting cap: a
    // crafted size near 2^31 would wrap `off + 8 + size` negative and
    // admit an out-of-bounds chunk (AIOOBE = a failed stage, not a
    // skipped row), and a blob of nothing but nested LIST headers would
    // recurse payload/12 deep into a StackOverflowError — which is NOT
    // NonFatal, so no catch-all would save the task. Real AVIs nest 2-3
    // LISTs; 32 is beyond any legitimate file.
    if (depth > 32) return
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      val id = new String(payload, off, 4, StandardCharsets.US_ASCII)
      val size = le32(payload, off + 4)
      if (size < 0 || off.toLong + 8L + size > end) ok = false
      else {
        if (id == "LIST" && size >= 4)
          riffWalk(payload, off + 12, off + 8 + size, onChunk, depth + 1)
        else onChunk(id, off + 8, size)
        off += 8 + size + (size & 1)
      }
    }
  }

  /** REAL decoder: RIFF/AVI container. Pure-JVM chunk walking (hdrl →
    * strf BITMAPINFOHEADER for the frame geometry, movi → `##db`/`##dc`
    * frame chunks); frame payloads decode per stream format:
    *
    *  - `##db` (uncompressed DIB): 24-bpp BGR rows, 4-byte padded,
    *    bottom-up when the strf height is positive — decoded by the same
    *    pure-JVM row loop as [[decodeBmp]]. Lossless, bit-exact.
    *  - `##dc` with a JPEG payload (the MJPG handler): each frame is a
    *    complete JPEG stream, decoded via [[decodeImageIO]] — the JDK
    *    codec, no new dependencies.
    *
    * Anything else (H.264 etc. need codec libraries this container
    * doesn't have) returns None and the caller falls back to the stub —
    * which after this decoder covers ONLY genuinely compressed non-MJPG
    * video and compressed audio.
    */
  def decodeAvi(payload: Array[Byte]): Option[VideoDecoded] = {
    if (payload.length < 16 ||
      payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
      payload(8) != 'A' || payload(9) != 'V' || payload(10) != 'I' || payload(11) != ' ')
      return None
    var fmt: Option[(Int, Int, Int, Int)] = None // (width, signedHeight, bpp, compression)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var dims: Option[(Int, Int)] = None
    riffWalk(payload, 12, payload.length, (id, off, size) => {
      if (id == "strf" && size >= 40 && fmt.isEmpty) {
        fmt = Some((le32(payload, off + 4), le32(payload, off + 8),
          le16(payload, off + 14), le32(payload, off + 16)))
      } else if (id.length == 4 && id(0).isDigit && id(1).isDigit) {
        val isDib = id.endsWith("db")
        val isCompressed = id.endsWith("dc")
        if (isDib) fmt match {
          case Some((w, rawH, 24, 0))
              if w > 0 && rawH != 0 && rawH != Int.MinValue &&
                3L * w * math.abs(rawH) <= Int.MaxValue =>
            val bottomUp = rawH > 0
            val h = math.abs(rawH)
            // long row arithmetic — same crafted-width overflow class as
            // decodeBmp (P5: skip the frame, never fail the stage)
            val rowBytes = ((w.toLong * 3 + 3) & ~3L).toInt
            if (rowBytes.toLong * h <= size) {
              val rgb = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                val srcRow = off + (if (bottomUp) h - 1 - y else y) * rowBytes
                var x = 0
                while (x < w) {
                  val sp = srcRow + x * 3 // stored BGR
                  val d = (y * w + x) * 3
                  rgb(d) = payload(sp + 2)
                  rgb(d + 1) = payload(sp + 1)
                  rgb(d + 2) = payload(sp)
                  x += 1
                }
                y += 1
              }
              if (dims.isEmpty) dims = Some((w, h))
              if (dims.contains((w, h))) frames += rgb
            }
          case _ =>
        }
        else if (isCompressed && size > 0) {
          val frame = java.util.Arrays.copyOfRange(payload, off, off + size)
          decodeImageIO(frame).foreach { img =>
            if (dims.isEmpty) dims = Some((img.width, img.height))
            if (dims.contains((img.width, img.height))) frames += img.rgb
          }
        }
      }
    })
    dims.filter(_ => frames.nonEmpty)
      .map { case (w, h) => VideoDecoded(w, h, frames.toArray) }
  }

  /** Assemble a minimal valid AVI container around pre-built frame
    * chunks: RIFF("AVI ") → LIST(hdrl){avih, LIST(strl){strh, strf}} →
    * LIST(movi){frame chunks}. `handler`/`compression` distinguish the
    * uncompressed ("DIB ", 0) and MJPG (fourcc) stream types.
    */
  private def aviAssemble(frameChunks: Seq[Array[Byte]], chunkId: String,
                          width: Int, height: Int, fps: Int,
                          handler: String, compression: Int,
                          frameBufSize: Int): Array[Byte] = {
    val n = frameChunks.length
    val moviChildren = frameChunks.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val moviSize = 4 + moviChildren
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = b.put(s.getBytes(StandardCharsets.US_ASCII))
    fourcc("RIFF"); b.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); b.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); b.putInt(56)
    b.putInt(1000000 / math.max(1, fps)) // microseconds per frame
      .putInt(frameBufSize * fps).putInt(0).putInt(0)
      .putInt(n).putInt(0).putInt(1).putInt(frameBufSize)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); b.putInt(56)
    fourcc("vids"); fourcc(handler)
    b.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1).putInt(math.max(1, fps)) // scale / rate
      .putInt(0).putInt(n).putInt(frameBufSize).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); b.putInt(40)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(compression).putInt(frameBufSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); b.putInt(moviSize); fourcc("movi")
    frameChunks.foreach { f =>
      fourcc(chunkId); b.putInt(f.length); b.put(f)
      if ((f.length & 1) == 1) b.put(0.toByte)
    }
    b.array()
  }

  /** REAL encoder: grayscale luma frames → AVI with uncompressed 24-bpp
    * DIB frames (bottom-up, 4-byte-padded BGR rows — the container
    * default, exercising the opposite orientation from [[bmpFromLumas]]'s
    * top-down). Lossless: pixels round-trip bit-exact through
    * [[decodeAvi]], which is what lets multimodal_video_stats gate the
    * real container parse + frame decode against an arithmetic oracle.
    */
  def aviFromLumaFrames(frames: Seq[Array[Int]], width: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && width > 0, "at least one frame")
    val len = frames.head.length
    require(len % width == 0 && frames.forall(_.length == len),
      "equal-sized frames filling rows")
    val height = len / width
    val rowBytes = (width * 3 + 3) & ~3
    val dibs = frames.map { lumas =>
      val bits = new Array[Byte](rowBytes * height)
      var y = 0
      while (y < height) {
        val dstRow = (height - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < width) {
          val v = (lumas(y * width + x) & 0xff).toByte
          val d = dstRow + x * 3
          bits(d) = v; bits(d + 1) = v; bits(d + 2) = v // BGR, gray
          x += 1
        }
        y += 1
      }
      bits
    }
    aviAssemble(dibs, "00db", width, height, fps, "DIB ", 0, rowBytes * height)
  }

  /** REAL encoder: pre-encoded JPEG frames → MJPG AVI (`##dc` chunks,
    * 'MJPG' handler/compression fourcc). Each frame is a complete JPEG
    * stream the JDK codec can decode back out of the container.
    */
  def aviFromJpegFrames(jpegs: Seq[Array[Byte]], width: Int, height: Int,
                        fps: Int = 10): Array[Byte] = {
    require(jpegs.nonEmpty, "at least one frame")
    val mjpg = ('M'.toInt) | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
    aviAssemble(jpegs, "00dc", width, height, fps, "MJPG", mjpg,
      jpegs.map(_.length).max)
  }

  /** REAL encoder: 16-bit mono PCM → minimal RIFF/WAVE, the inverse of
    * [[decodeWav]] (which also tolerates richer chunk lists). Lets a
    * pipeline synthesize genuine audio payloads and round-trip them
    * through the real parser (multimodal_audio_stats does exactly that).
    */
  def wavFromSamples(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val size = 12 + (8 + 16) + (8 + dataSize)
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(size - 8)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    b.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    b.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  /** 32-bit average hash (aHash) of a decoded image's first 32 pixels'
    * lumas: bit j set iff luma_j exceeds the integer mean. 32 bits — not
    * 64 — so the signature reuses the SimHash machinery unchanged
    * (16-bit half banding, bit_count hamming) and never touches the
    * long's sign bit (the engine-fragile shift/% zone the band-geometry
    * clamp also avoids). Images with fewer than 32 pixels pad with 0
    * (0 > mean is false, so pads contribute no bits but do shape the
    * mean, same as materializing them).
    */
  def averageHash32(img: ImageDecoded): Long = {
    val n = math.min(32, img.rgb.length / 3)
    val lumas = Array.tabulate(32) { i =>
      if (i < n) ((img.rgb(3 * i) & 0xff) + (img.rgb(3 * i + 1) & 0xff) +
        (img.rgb(3 * i + 2) & 0xff)) / 3
      else 0
    }
    val mean = lumas.sum / 32
    var h = 0L
    var j = 0
    while (j < 32) { if (lumas(j) > mean) h |= (1L << j); j += 1 }
    h
  }

  /** Synthesize a media table from `documents` (UTF-8 text bytes as the
    * opaque payload) — the testdata carries no real binary column.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      concat(lit("text/"), col("lang")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  case class FrameFeatures(media_id: Long, frame_idx: Long, mean_byte: Double)

  /** Frame-sampling geometry: fixed windows of `frameBytes` every
    * `hopBytes` over the payload (the audio/video frame-sample pattern).
    * Pure column arithmetic — narrow, shuffle-free, and simple enough to
    * mirror into a DuckDB oracle. Media shorter than one frame yield no
    * rows (sequence() would count DOWN for a negative frame count, hence
    * the explicit n_frames > 0 guard).
    */
  def frameIndex(media: DataFrame, frameBytes: Int, hopBytes: Int): DataFrame =
    media.select(col("media_id"), length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("n_frames",
        (floor((col("n_bytes") - frameBytes) / hopBytes) + 1).cast("long"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), col("n_frames") - 1)))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * hopBytes).as("frame_off"),
        lit(frameBytes.toLong).as("frame_len"), col("n_bytes"))

  /** Resize planning: fit (width, height) inside (maxW, maxH) preserving
    * aspect ratio, never upscaling — the metadata half of an image-resize
    * stage (the pixel resample itself is codec work, stubbed like decode).
    * Pure double arithmetic both engines compute identically.
    */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media
      .withColumn("scale", least(lit(1.0),
        lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height")))
      .withColumn("out_w",
        greatest(lit(1L), floor(col("width") * col("scale"))))
      .withColumn("out_h",
        greatest(lit(1L), floor(col("height") * col("scale"))))

  /** Per-frame STUB feature (mean byte value) via the same
    * partition-iterator batch shape as extractFeatures — a real codec would
    * decode samples per frame here.
    */
  def frameFeatures(spark: SparkSession, media: DataFrame,
                    frameBytes: Int, hopBytes: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val n = if (r.payload.length < frameBytes) 0
          else (r.payload.length - frameBytes) / hopBytes + 1
        (0 until n).iterator.map { i =>
          val off = i * hopBytes
          var s = 0L
          var k = 0
          while (k < frameBytes) { s += (r.payload(off + k) & 0xff); k += 1 }
          FrameFeatures(r.media_id, i.toLong, s.toDouble / frameBytes)
        }
      }
    }
  }

  /** Per-partition batch feature extraction (mapPartitions — the rows of a
    * partition stream through one iterator, mirroring a Pandas-UDF batch).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init would go here (load codec once)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          decodeFeatures(r.payload))
      }
    }
  }
}
