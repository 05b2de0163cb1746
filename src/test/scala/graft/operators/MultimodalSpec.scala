package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The PNG metadata path must be a real format decode — signature
  * validated, IHDR dimensions parsed big-endian — with the stub reserved
  * for codec-less mimes, and the partition-batched extraction must carry
  * the right width/height per mime.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("pngWrap → decodePngDims round-trips the IHDR dimensions") {
    Seq(0L, 42L, 448L, 123456L).foreach { id =>
      val body = s"payload_$id".getBytes("UTF-8")
      val wrapped = Multimodal.pngWrap(id, body)
      assert(wrapped.length == Multimodal.PngHeaderLen + body.length)
      assert(Multimodal.decodePngDims(wrapped) == Some(Multimodal.dimsFor(id)))
    }
  }

  test("bmpWrap → decodeBmpDims round-trips; corrupt/edge BMPs rejected") {
    Seq(0L, 42L, 448L, 123456L).foreach { id =>
      val body = s"pixels_$id".getBytes("UTF-8")
      val wrapped = Multimodal.bmpWrap(id, body)
      assert(wrapped.length == Multimodal.BmpHeaderLen + body.length)
      assert(Multimodal.decodeBmpDims(wrapped) == Some(Multimodal.dimsFor(id)))
    }
    // negative height = top-down row order per spec: dims report |h|
    val neg = Multimodal.bmpWrap(9L, "b".getBytes)
    val bb = java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val h = bb.getInt(22); bb.putInt(22, -h)
    assert(Multimodal.decodeBmpDims(neg) == Some(Multimodal.dimsFor(9L)))
    // rejections: wrong magic, illegal bpp, zero planes, truncation
    val bad = Multimodal.bmpWrap(7L, "b".getBytes); bad(0) = 'X'.toByte
    assert(Multimodal.decodeBmpDims(bad) == None)
    val badBpp = Multimodal.bmpWrap(7L, "b".getBytes)
    java.nio.ByteBuffer.wrap(badBpp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 13)
    assert(Multimodal.decodeBmpDims(badBpp) == None)
    assert(Multimodal.decodeBmpDims("BM too short".getBytes) == None)
    assert(Multimodal.decodeBmpDims("plain utf-8 text payload far over 54 bytes long padding".getBytes) == None)
  }

  test("gifWrap → decodeGifDims round-trips; non-GIF rejected") {
    Seq(0L, 42L, 448L, 123456L).foreach { id =>
      val body = s"frames_$id".getBytes("UTF-8")
      val wrapped = Multimodal.gifWrap(id, body)
      assert(wrapped.length == Multimodal.GifHeaderLen + body.length)
      assert(Multimodal.decodeGifDims(wrapped) == Some(Multimodal.dimsFor(id)))
    }
    // GIF87a variant also accepted
    val w87 = Multimodal.gifWrap(11L, "b".getBytes)
    w87(4) = '7'.toByte
    assert(Multimodal.decodeGifDims(w87) == Some(Multimodal.dimsFor(11L)))
    val bad = Multimodal.gifWrap(7L, "b".getBytes); bad(5) = 'x'.toByte
    assert(Multimodal.decodeGifDims(bad) == None)
    assert(Multimodal.decodeGifDims(Array[Byte](1, 2, 3)) == None)
  }

  test("mp4Wrap → decodeMp4Dims walks ftyp/moov/trak/tkhd; malformed rejected") {
    Seq(0L, 42L, 448L, 123456L).foreach { id =>
      val body = s"samples_$id".getBytes("UTF-8")
      val wrapped = Multimodal.mp4Wrap(id, body)
      assert(wrapped.length == Multimodal.Mp4HeaderLen + body.length)
      assert(Multimodal.decodeMp4Dims(wrapped) == Some(Multimodal.dimsFor(id)))
    }
    // version-1 tkhd (64-bit times): widen the box by 12 bytes and shift
    // the dimension fields per the spec layout — the decoder must follow
    val v0 = Multimodal.mp4Wrap(9L, Array.empty[Byte])
    val v1 = {
      val bb = java.nio.ByteBuffer.allocate(v0.length + 12)
      bb.put(v0, 0, 20)                      // ftyp unchanged
      bb.putInt(8 + 8 + 104).put("moov".getBytes("ASCII"))
      bb.putInt(8 + 104).put("trak".getBytes("ASCII"))
      bb.putInt(104).put("tkhd".getBytes("ASCII"))
      bb.putInt(0x01000000)                  // version 1 + flags
      bb.putLong(0L).putLong(0L)             // 64-bit times
      bb.putInt(1).putInt(0).putLong(0L)     // track/reserved/64-bit duration
      bb.putLong(0L)                         // reserved
      bb.putShort(0).putShort(0).putShort(0).putShort(0)
      bb.putInt(0x10000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x10000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      val (w, h) = Multimodal.dimsFor(9L)
      bb.putInt(w << 16).putInt(h << 16)
      bb.putInt(8).put("mdat".getBytes("ASCII"))
      bb.array()
    }
    assert(Multimodal.decodeMp4Dims(v1) == Some(Multimodal.dimsFor(9L)))
    // rejections: no ftyp, truncated box chain, zero dims
    assert(Multimodal.decodeMp4Dims("plain utf-8 text payload".getBytes) == None)
    val bad = Multimodal.mp4Wrap(7L, "b".getBytes); bad(4) = 'x'.toByte
    assert(Multimodal.decodeMp4Dims(bad) == None)
    val trunc = Multimodal.mp4Wrap(7L, "b".getBytes).take(40)
    assert(Multimodal.decodeMp4Dims(trunc) == None)
  }

  test("ISO BMFF size escapes: size==0 (box to end of file) and size==1 (largesize)") {
    // layout of mp4Wrap output: ftyp [0,20), moov..tkhd [20,128), mdat [128,..)
    val dims = Multimodal.dimsFor(5L)
    val v0 = Multimodal.mp4Wrap(5L, "body".getBytes("UTF-8"))
    val ftyp = v0.slice(0, 20)
    val moov = v0.slice(20, 128)
    val mdat = v0.slice(128, v0.length)
    // moov as the LAST top-level box with size==0 (extends to end of file) —
    // the mdat-first arrangement real muxers emit with a trailing moov
    val toEnd = {
      val m = moov.clone()
      m(0) = 0; m(1) = 0; m(2) = 0; m(3) = 0
      ftyp ++ mdat ++ m
    }
    assert(Multimodal.decodeMp4Dims(toEnd) == Some(dims))
    // moov encoded with size==1 + 64-bit largesize (16-byte header)
    val large = {
      val bb = java.nio.ByteBuffer.allocate(v0.length + 8)
      bb.put(ftyp)
      bb.putInt(1).put("moov".getBytes("ASCII")).putLong(16L + (moov.length - 8))
      bb.put(moov, 8, moov.length - 8) // trak..tkhd payload unchanged
      bb.put(mdat)
      bb.array()
    }
    assert(Multimodal.decodeMp4Dims(large) == Some(dims))
    // a largesize below the 16-byte header is still malformed
    val badLs = large.clone()
    java.nio.ByteBuffer.wrap(badLs).putLong(28, 8L)
    assert(Multimodal.decodeMp4Dims(badLs) == None)
    // size==0 NOT at the end (moov after it would be unreachable) rejects
    val zeroFirst = {
      val m = mdat.clone()
      m(0) = 0; m(1) = 0; m(2) = 0; m(3) = 0
      ftyp ++ m ++ moov
    }
    assert(Multimodal.decodeMp4Dims(zeroFirst) == None)
    // size==0 on a NESTED box (spec allows it only top-level-last): a
    // corrupted tkhd size must yield None, not dimensions read from
    // whatever sibling bytes sit past the inflated span
    val nestedZero = v0.clone()
    nestedZero(36) = 0; nestedZero(37) = 0; nestedZero(38) = 0; nestedZero(39) = 0
    assert(Multimodal.decodeMp4Dims(nestedZero) == None)
  }

  test("webmWrap → decodeWebmDims walks the EBML tree; malformed rejected") {
    Seq(0L, 42L, 448L, 123456L).foreach { id =>
      val body = s"cluster_$id".getBytes("UTF-8")
      val wrapped = Multimodal.webmWrap(id, body)
      assert(wrapped.length == Multimodal.WebmHeaderLen + body.length)
      assert(Multimodal.decodeWebmDims(wrapped) == Some(Multimodal.dimsFor(id)))
    }
    // hand-built SHORT-VINT variant (1-byte sizes everywhere) — the writer
    // always emits 8-byte size VINTs, so this pins the general VINT parse
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val short = b(
      0x1A, 0x45, 0xDF, 0xA3, 0x84, 0x42, 0x82, 0x81, 'w', // EBML(DocType "w")
      0x18, 0x53, 0x80, 0x67, 0x95,                        // Segment size 21
      0x16, 0x54, 0xAE, 0x6B, 0x8D,                        // Tracks size 13
      0xAE, 0x8B,                                          // TrackEntry size 11
      0xE0, 0x89,                                          // Video size 9
      0xB0, 0x82, 0x01, 0x90,                              // PixelWidth 400
      0xBA, 0x83, 0x00, 0x01, 0x2C,                        // PixelHeight 300 (3-byte uint)
      0xEC, 0x81, 0x00)                                    // trailing Void size 1
    assert(Multimodal.decodeWebmDims(short) == Some((400, 300)))
    // unknown-size Segment (streamed form): all-ones 1-byte size VINT 0xFF
    val streamed = short.clone(); streamed(13) = 0xFF.toByte
    assert(Multimodal.decodeWebmDims(streamed) == Some((400, 300)))
    // corrupt the Tracks id (offset 24: 12B EBML header + 4B Segment id +
    // 8B size VINT) → not found
    val bad = Multimodal.webmWrap(7L, "b".getBytes); bad(24) = 0x55.toByte
    assert(Multimodal.decodeWebmDims(bad) == None)
    // non-EBML payloads rejected, cross-routing rejected
    assert(Multimodal.decodeWebmDims("plain utf-8 text payload".getBytes) == None)
    assert(Multimodal.decodeWebmDims(Multimodal.pngWrap(3L, "b".getBytes)) == None)
    assert(Multimodal.decodeMp4Dims(Multimodal.webmWrap(3L, "b".getBytes)) == None)
    val trunc = Multimodal.webmWrap(7L, "body".getBytes).take(30)
    assert(Multimodal.decodeWebmDims(trunc) == None)
    // a non-target element declaring a near-Int.MaxValue size must reject
    // as implausible, not wrap the skip offset negative and crash
    val huge = b(0x1A, 0x45, 0xDF, 0xA3, 0x84, 0x42, 0x82, 0x81, 'w',
      0xEC, 0x01, 0x00, 0x00, 0x00, 0x00, 0x7F, 0xFF, 0xFF, 0xFF, // Void size 2^31-1
      0x18, 0x53, 0x80, 0x67, 0x80)
    assert(Multimodal.decodeWebmDims(huge) == None)
  }

  test("registry routes png/bmp/gif to their own codecs (distinct layouts)") {
    val reg = Multimodal.defaultRegistry
    val id = 100L
    val body = "shared body".getBytes("UTF-8")
    // same id → same true dims; each decoder must recover them from ITS
    // OWN byte layout (BE IHDR vs LE DIB vs LE u16) — cross-routing any
    // payload to the wrong codec would fall back to the stub and diverge
    assert(reg.forMime("image/png").dims(Multimodal.pngWrap(id, body)) == Multimodal.dimsFor(id))
    assert(reg.forMime("image/bmp").dims(Multimodal.bmpWrap(id, body)) == Multimodal.dimsFor(id))
    assert(reg.forMime("image/gif").dims(Multimodal.gifWrap(id, body)) == Multimodal.dimsFor(id))
    // a BMP payload through the GIF decoder must NOT return header dims
    assert(reg.forMime("image/gif").dims(Multimodal.bmpWrap(id, body)) !=
      Multimodal.dimsFor(id))
  }

  test("non-PNG payloads are rejected, not misparsed") {
    assert(Multimodal.decodePngDims("plain utf-8 text payload far".getBytes) == None)
    assert(Multimodal.decodePngDims(Array[Byte](1, 2, 3)) == None)
    // corrupt one signature byte of a valid wrap
    val w = Multimodal.pngWrap(7L, "body".getBytes)
    w(3) = 'X'.toByte
    assert(Multimodal.decodePngDims(w) == None)
  }

  test("extracted features use real PNG dims for images, stub elsewhere") {
    val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(spark, media)
      .join(media.select(col("media_id"), col("mime_type").as("mt")), Seq("media_id"))
    val png = feats.where(col("mt") === "image/png")
      .select("media_id", "width", "height").collect()
    assert(png.nonEmpty)
    png.foreach { r =>
      val (w, h) = Multimodal.dimsFor(r.getLong(0))
      assert(r.getLong(1) == w && r.getLong(2) == h)
    }
    // stub mimes keep the fake-dim range
    val other = feats.where(col("mt") =!= "image/png")
      .select("width", "height").collect()
    assert(other.nonEmpty)
    other.foreach(r => assert(r.getLong(0) >= 64 && r.getLong(0) < 512 &&
      r.getLong(1) >= 64 && r.getLong(1) < 512))
  }

  test("registry dispatches by mime and falls back for unknown types") {
    val reg = Multimodal.defaultRegistry
    assert(reg.forMime("image/png") eq Multimodal.PngDecoder)
    assert(reg.forMime("audio/wav").isInstanceOf[Multimodal.StubDecoder])
    // unknown mime → fallback stub, never a crash
    val png = Multimodal.pngWrap(42L, Array[Byte](1, 2, 3))
    assert(reg.forMime("application/x-unknown").dims(png)._1 >= 64)
  }

  test("custom decoder plugs in and overrides dispatch per partition") {
    import spark.implicits._
    val counted = new Multimodal.MediaDecoder {
      override def mimes: Seq[String] = Seq("image/png")
      @volatile var opens = 0
      override def open(): Unit = opens += 1
      override def dims(payload: Array[Byte]): (Int, Int) = (1, 2)
    }
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", Multimodal.pngWrap(1L, Array[Byte](9))),
      Multimodal.MediaRow(2L, "audio/wav", Array[Byte](9, 9)))
      .toDF().repartition(1)
    val out = Multimodal.extractFeatures(spark, media,
        new Multimodal.DecoderRegistry(Seq(counted)))
      .orderBy("media_id").collect()
    assert(out(0).getAs[Long]("width") == 1L && out(0).getAs[Long]("height") == 2L)
    // the wav row hit the registry fallback, not the custom decoder
    assert(out(1).getAs[Long]("width") >= 64L)
  }

  test("wav: wrap/decode round-trips the planted parameters; non-wav rejected") {
    for (id <- 0L to 24L) {
      val body = Array.fill(97)((id % 251).toByte)
      val wav = Multimodal.wavWrap(id, body)
      assert(wav.length == Multimodal.WavHeaderLen + body.length)
      val m = Multimodal.decodeWavMeta(wav).get
      val p = Multimodal.wavParamsFor(id)
      assert(m.sampleRate == p.sampleRate && m.channels == p.channels &&
        m.bitsPerSample == p.bitsPerSample && m.dataLen == body.length)
      // derived values: integer sample count and floor-division duration
      assert(m.nSamples == body.length / m.blockAlign)
      assert(m.durationMs == m.nSamples * 1000L / m.sampleRate)
    }
    // rejection: truncated, wrong magic, non-PCM format tag
    assert(Multimodal.decodeWavMeta(Array.fill(10)(1.toByte)).isEmpty)
    assert(Multimodal.decodeWavMeta("x" * 64 getBytes "ASCII").isEmpty)
    val nonPcm = Multimodal.wavWrap(3L, Array.fill(8)(0.toByte))
    nonPcm(20) = 2 // IEEE-float format tag
    assert(Multimodal.decodeWavMeta(nonPcm).isEmpty)
  }

  test("mp3: frame header round-trips the published tables; malformed rejected") {
    Seq(0L, 1L, 13L, 14L, 42L, 123456L).foreach { id =>
      val (bIdx, sIdx, mode, pad) = Multimodal.mp3ParamsFor(id)
      val wrapped = Multimodal.mp3Wrap(id, s"pcm_$id".getBytes("UTF-8"))
      val m = Multimodal.decodeMp3Meta(wrapped)
      assert(m.isDefined, s"id=$id")
      val kbps = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(bIdx - 1)
      val sr = Array(44100, 48000, 32000)(sIdx)
      assert(m.get.bitrateKbps == kbps && m.get.sampleRate == sr)
      assert(m.get.channels == (if (mode == 3) 1 else 2))
      assert(m.get.frameBytes == 144000 * kbps / sr + pad)
    }
    // reserved bitrate index 15 and 0, reserved sample-rate index 3
    val good = Multimodal.mp3Wrap(5L, "b".getBytes)
    val bad1 = good.clone(); bad1(2) = 0xF0.toByte // bitrate idx 15
    assert(Multimodal.decodeMp3Meta(bad1) == None)
    val bad2 = good.clone(); bad2(2) = (bad2(2) & 0x0F).toByte // bitrate idx 0
    assert(Multimodal.decodeMp3Meta(bad2) == None)
    val bad3 = good.clone(); bad3(2) = (bad3(2) | 0x0C).toByte // sr idx 3
    assert(Multimodal.decodeMp3Meta(bad3) == None)
    // MPEG-2 / Layer I / broken sync rejected; cross-routing rejected
    val v2 = good.clone(); v2(1) = 0xF3.toByte // version bits 10 (MPEG-2)
    assert(Multimodal.decodeMp3Meta(v2) == None)
    val l1 = good.clone(); l1(1) = 0xFF.toByte // layer bits 11 (Layer I)
    assert(Multimodal.decodeMp3Meta(l1) == None)
    assert(Multimodal.decodeMp3Meta("text".getBytes) == None)
    assert(Multimodal.decodeMp3Meta(Multimodal.wavWrap(3L, "b".getBytes)) == None)
  }

  test("openAll runs exactly once per input partition") {
    import spark.implicits._
    val media = (1L to 8L)
      .map(i => Multimodal.MediaRow(i, "image/png", Multimodal.pngWrap(i, Array[Byte](1))))
      .toDF().repartition(3)
    val before = Multimodal.DecoderRegistry.opened.get()
    Multimodal.extractFeatures(spark, media).count()
    val delta = Multimodal.DecoderRegistry.opened.get() - before
    assert(delta == 3, s"expected one openAll per partition (3), got $delta")
  }
}
