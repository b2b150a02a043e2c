package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The codec boundary as a CONTRACT (VERDICT r8 #6) plus the media path's
  * P5 malformed-input tolerance (#4): exactly these formats decode real —
  * BMP, PNG, JPEG (images), 16-bit-PCM WAV (audio), AVI with DIB or MJPG
  * frames (video) — and everything else, compressed codecs and corrupt
  * blobs alike, routes to the byte-histogram stub WITHOUT failing the
  * stage. A decoder addition or regression fails a named row here instead
  * of silently rerouting.
  */
class MultimodalSpec extends SparkSpec {

  private val lumas32 = Array.tabulate(32)(i => (i * 37 + 11) % 256)

  private def jpegGray(w: Int, h: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w * h).foreach { i =>
      val v = (i * 11 + 3) % 256
      bi.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
    }
    javax.imageio.ImageIO.setUseCache(false)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", out), "JDK JPEG writer")
    out.toByteArray
  }

  test("codec boundary: magic -> decoder table (real vs stub is a contract)") {
    val bmp = Multimodal.bmpFromLumas(lumas32, 8)
    val png = Multimodal.pngFromLumas(lumas32, 8)
    val jpg = jpegGray(8, 4)
    val wav = Multimodal.wavFromSamples(
      Array.tabulate(32)(i => (i * 1000 - 16000).toShort), 8000)
    val aviDib = Multimodal.aviFromLumaFrames(Seq(lumas32, lumas32), 8)
    val aviMjpg = Multimodal.aviFromJpegFrames(Seq(jpg, jpg), 8, 4)
    val gif = Multimodal.gifFromLumas(lumas32, 8)
    val mp3 = Multimodal.mp3FromParams(frames = 3, bitrateKbps = 128,
      sampleRateHz = 44100)
    val table: Seq[(String, Array[Byte], String)] = Seq(
      ("BMP", bmp, "bmp"),
      ("PNG", png, "imageio"),
      ("JPEG", jpg, "imageio"),
      ("GIF", gif, "imageio"),
      ("WAV-PCM", wav, "wav"),
      ("AVI-DIB", aviDib, "avi"),
      ("AVI-MJPG", aviMjpg, "avi"),
      // compressed codecs this container has no SAMPLE decoder for:
      // content is STUB by contract -- a truncated MP3 frame, an ID3v2
      // tag, an ADTS AAC sync, an H.264 Annex-B start code + SPS NAL.
      // (MP3 gets a metadata-real middle tier below: valid streams parse
      // header-level duration/bitrate via decodeMp3Meta, samples don't.)
      ("MP3-sync", Array[Byte](0xff.toByte, 0xfb.toByte) ++
        Array.fill[Byte](64)(0x55), "stub"),
      ("MP3-valid", mp3, "stub"),
      ("MP3-ID3", "ID3 ".getBytes("ISO-8859-1") ++
        Array.fill[Byte](64)(0x21), "stub"),
      ("AAC-ADTS", Array[Byte](0xff.toByte, 0xf1.toByte) ++
        Array.fill[Byte](64)(0x33), "stub"),
      ("H264-AnnexB", Array[Byte](0, 0, 0, 1, 0x67) ++
        Array.fill[Byte](64)(0x42), "stub"),
      ("plain-text", "not media at all, just bytes".getBytes, "stub"),
      ("empty", Array.emptyByteArray, "stub"))
    table.foreach { case (label, payload, expected) =>
      val got = Multimodal.decoderOf(payload)
      assert(got == expected, s"$label: expected $expected, got $got")
    }
    // the metadata tier of the boundary: exactly valid MP3 streams parse,
    // everything else (truncated frame, bare tag, other codecs) is None
    assert(Multimodal.decodeMp3Meta(mp3).isDefined, "valid MP3 meta lost")
    table.filter(_._1 != "MP3-valid").foreach { case (label, payload, _) =>
      assert(Multimodal.decodeMp3Meta(payload).isEmpty,
        s"$label wrongly parsed as MP3 metadata")
    }
  }

  test("GIF gray round-trip is lossless; MP3 header walk inverts the synthesizer") {
    // every gray value 0..255 at 16x16, AND the 8x4 shape dedup_phash
    // uses — the small height is load-bearing: the JDK GIF writer
    // interlaces by default and the JDK reader mis-deinterlaces h=4
    // (rows came back scrambled until gifFromLumas forced MODE_DISABLED;
    // found by the dedup_phash oracle gate, 259 -> 104 pair rows)
    for ((lumas, w) <- Seq((Array.tabulate(256)(identity), 16),
        (Array.tabulate(32)(i => (i * 37 + 11) % 256), 8))) {
      val decoded = Multimodal.decodeImage(Multimodal.gifFromLumas(lumas, w))
        .getOrElse(fail("GIF did not decode"))
      assert(decoded.width == w && decoded.height == lumas.length / w)
      lumas.indices.foreach { i =>
        val (r, g, b) = (decoded.rgb(3 * i) & 0xff,
          decoded.rgb(3 * i + 1) & 0xff, decoded.rgb(3 * i + 2) & 0xff)
        assert(r == lumas(i) && g == lumas(i) && b == lumas(i),
          s"${w}x${lumas.length / w} pixel $i: expected ${lumas(i)}, got ($r,$g,$b)")
      }
    }
    // MP3: meta fields invert the synthesis params; ID3v2 prefix skipped;
    // a mid-stream truncation is rejected (strict to-the-end walk)
    for (frames <- Seq(1, 2, 7); br <- Seq(64, 128, 320);
         sr <- Seq(32000, 44100, 48000)) {
      val m = Multimodal.decodeMp3Meta(Multimodal.mp3FromParams(frames, br, sr))
        .getOrElse(fail(s"valid MP3 ($frames,$br,$sr) did not parse"))
      assert(m.frames == frames && m.bitrateKbps == br &&
        m.sampleRateHz == sr && m.totalSamples == 1152L * frames)
    }
    val base = Multimodal.mp3FromParams(4, 128, 44100)
    val tagged = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0, 0, 0, 0, 12) ++ Array.fill[Byte](12)(0x7f) ++ base
    assert(Multimodal.decodeMp3Meta(tagged).exists(_.frames == 4),
      "ID3v2-prefixed stream did not parse")
    assert(Multimodal.decodeMp3Meta(base.dropRight(1)).isEmpty,
      "truncated tail frame wrongly accepted")
    // ID3v2.4 footer flag (byte 5 bit 4): the synchsafe size excludes the
    // 10-byte footer, so the skip must add it (ADVICE r9 regression)
    val footered = "ID3".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0x10, 0, 0, 0, 12) ++
      Array.fill[Byte](12)(0x7f) ++ Array.fill[Byte](10)(0x3e) ++ base
    assert(Multimodal.decodeMp3Meta(footered).exists(_.frames == 4),
      "ID3v2.4 footer-flagged stream rejected as corrupt")
    // the -1 "bad" sentinels at bitrate index 15 / rate index 3 must fail
    // the params check, not crash downstream (ADVICE r9 regression)
    for ((br, sr) <- Seq((-1, 44100), (0, 44100), (128, -1)))
      assertThrows[IllegalArgumentException](
        Multimodal.mp3FromParams(2, br, sr))
  }

  test("gigapixel header bombs skip without allocating the raster") {
    // a ~100-byte payload declaring a multi-gigapixel canvas must reject
    // at the header gate (MaxDecodePixels) — before ImageIO.read would
    // allocate w*h*4 bytes and OOM the task (AUDIT_r10)
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val pngBomb = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a) ++ be32(13) ++ "IHDR".getBytes("ISO-8859-1") ++
      be32(1000000) ++ be32(1000000) ++
      Array[Byte](8, 0, 0, 0, 0) ++ be32(0) // bogus CRC: gate fires first
    assert(Multimodal.decodeImage(pngBomb).isEmpty,
      "gigapixel PNG was not rejected")
    val gifBomb = "GIF89a".getBytes("ISO-8859-1") ++
      Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
        0x00, 0x00, 0x00) ++
      Array[Byte](0x2c, 0, 0, 0, 0, 0xff.toByte, 0xff.toByte,
        0xff.toByte, 0xff.toByte, 0x00, 0x02) // 65535x65535 descriptor
    assert(Multimodal.decodeImage(gifBomb).isEmpty,
      "gigapixel GIF was not rejected")
    // and a legitimate image still decodes through the gated path
    assert(Multimodal.decodeImage(Multimodal.pngFromLumas(lumas32, 8)).isDefined,
      "dimension gate broke the legitimate PNG path")
    assert(Multimodal.decodeImage(Multimodal.gifFromLumas(lumas32, 8)).isDefined,
      "dimension gate broke the legitimate GIF path")
  }

  test("corrupt blobs route to the stub and never fail the stage") {
    val aviGood = Multimodal.aviFromLumaFrames(Seq(lumas32), 8)
    val pngGood = Multimodal.pngFromLumas(lumas32, 8)
    // deliberate truncations at several depths: mid-magic, mid-header,
    // mid-payload — every one must classify stub, none may throw
    Seq(aviGood, pngGood).foreach { good =>
      Seq(2, 8, good.length / 2).foreach { n =>
        assert(Multimodal.decoderOf(good.take(n)) == "stub",
          s"truncated-to-$n payload decoded as real")
      }
    }
    // bit-flipped PNG body (CRC breaks): ImageIO must reject, stub catches
    val flipped = pngGood.clone()
    flipped(pngGood.length / 2) = (flipped(pngGood.length / 2) ^ 0xff).toByte
    assert(Multimodal.decoderOf(flipped) == "stub")

    // a mixed media table with corrupt rows flows through extractFeatures
    // end-to-end: one row out per row in, real features for good payloads,
    // stub histograms for corrupt ones — and the job completes
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/bmp", Multimodal.bmpFromLumas(lumas32, 8)),
      Multimodal.MediaRow(2L, "video/avi", aviGood.take(8)),
      Multimodal.MediaRow(3L, "image/png", flipped),
      Multimodal.MediaRow(4L, "audio/wav",
        Multimodal.wavFromSamples(Array.fill(16)(123.toShort), 8000)))
    val out = Multimodal.extractFeatures(spark, rows.toDF())
      .collect().map(f => f.media_id -> f).toMap
    assert(out.size == 4, "a corrupt payload dropped or failed a row")
    // histograms always normalized (sum 1) for non-empty payloads
    assert(out.values.forall(f => math.abs(f.features.sum - 1.0) < 1e-9))
  }

  test("adversarial headers: Int-overflow sizes and LIST bombs skip, never throw") {
    import java.nio.{ByteBuffer, ByteOrder}
    // BMP whose width*3 wraps negative in Int arithmetic: must be
    // rejected by the long-math bounds check, not crash on a negative
    // array size or an out-of-bounds read
    val evilBmp = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    evilBmp.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
    evilBmp.putInt(40).putInt(715827883).putInt(2) // width*3 = 2^31+1
    evilBmp.putShort(1).putShort(24).putInt(0).putInt(0)
    assert(Multimodal.decoderOf(evilBmp.array()) == "stub")
    // WAV whose data-chunk size is near 2^31: off+8+size wraps negative
    val evilWav = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    evilWav.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    evilWav.put("fmt ".getBytes).putInt(16)
    evilWav.putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    evilWav.put("data".getBytes).putInt(0x7ffffff0)
    assert(Multimodal.decoderOf(evilWav.array()) == "stub")
    // AVI frame chunk with a near-2^31 size
    val evilAvi = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    evilAvi.put("RIFF".getBytes).putInt(56).put("AVI ".getBytes)
    evilAvi.put("00db".getBytes).putInt(0x7ffffff0)
    assert(Multimodal.decoderOf(evilAvi.array()) == "stub")
    // LIST bomb: thousands of nested LIST headers — without the walk's
    // depth cap this recurses into StackOverflowError (NOT NonFatal)
    val depth = 200000
    val bomb = ByteBuffer.allocate(12 + depth * 12)
      .order(ByteOrder.LITTLE_ENDIAN)
    bomb.put("RIFF".getBytes).putInt(4 + depth * 12).put("AVI ".getBytes)
    (0 until depth).foreach { i =>
      val remaining = (depth - i) * 12 - 8
      bomb.put("LIST".getBytes).putInt(remaining).put("hdrl".getBytes)
    }
    assert(Multimodal.decoderOf(bomb.array()) == "stub")
  }

  test("media_decode_audit counts skips exactly (corrupt <=> doc_id % 13 = 0)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.MultimodalQueries.mediaDecodeAudit(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("audio", "image", "video"))
    // independent expectation from the fixture rule
    val ids = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.Tokenizer.tokenize(col("text"))).as("n"))
      .where(col("n") > 0).select("doc_id")
      .collect().map(_.getLong(0))
    def kindOf(id: Long) = (id % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    got.foreach { case (kind, (nMedia, nDecoded, nSkipped)) =>
      val k = ids.filter(kindOf(_) == kind)
      assert(nMedia == k.length.toLong, s"$kind n_media")
      assert(nSkipped == k.count(_ % 13 == 0).toLong, s"$kind n_skipped")
      assert(nDecoded == nMedia - nSkipped, s"$kind n_decoded")
      assert(nSkipped > 0, s"$kind fixture has no corrupt payloads to count")
    }
  }
}
