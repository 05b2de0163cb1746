package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PngCodec: real zlib PNG encode/decode roundtrip, CRC validation,
  * filter coverage, resize semantics.
  */
class PngCodecSpec extends AnyFunSuite {

  test("decode(encode(id)) reproduces the fixture pixel function exactly") {
    for (id <- Seq(0L, 3L, 99L, 300L, 100002L)) {
      val (w, h, px) = PngCodec.decode(PngCodec.encode(id))
      val (ew, eh) = PngCodec.dimsFor(id)
      assert((w, h) == ((ew, eh)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val got = px((y * w + x) * 3 + c) & 0xff
        assert(got == PngCodec.pixelFor(id, x, y, c),
          s"id=$id pixel ($x,$y,$c)")
      }
    }
  }

  test("every image exercises all five scanline filters") {
    // encoder cycles filter = y % 5 and the minimum height is 16
    val (_, h) = PngCodec.dimsFor(0L)
    assert(h >= 5)
  }

  test("a corrupted chunk fails CRC validation") {
    val png = PngCodec.encode(42L)
    // flip a byte inside the first IDAT chunk's data
    val idx = png.length / 2
    png(idx) = (png(idx) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(png))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("inflate")
      || e.getMessage.contains("filter"))
  }

  test("a truncated payload is rejected") {
    val png = PngCodec.encode(7L)
    intercept[IllegalArgumentException](
      PngCodec.decode(png.slice(0, 4)))
  }

  test("a truncated IDAT stream (valid CRCs) throws instead of spinning") {
    // Rebuild the PNG with only HALF the deflate stream, re-CRC'd so chunk
    // validation passes — the inflater then starves (inflate() returns 0,
    // never finished), which pre-fix looped forever at PngCodec.decode.
    val png = PngCodec.encode(7L)
    val bb = java.nio.ByteBuffer.wrap(png)
    bb.position(8)
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, 8)
    def writeChunk(tag: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      out.write(tag.getBytes("ASCII"))
      out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(tag.getBytes("ASCII")); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    var wrote = false
    while (bb.remaining() >= 12) {
      val len = bb.getInt
      val tagBytes = new Array[Byte](4); bb.get(tagBytes)
      val tag = new String(tagBytes, "ASCII")
      val data = new Array[Byte](len); bb.get(data); bb.getInt
      tag match {
        case "IDAT" if !wrote =>
          writeChunk("IDAT", data.slice(0, data.length / 2)); wrote = true
        case "IDAT" => () // drop the rest of the stream
        case t => writeChunk(t, data)
      }
    }
    assert(wrote)
    val e = intercept[IllegalArgumentException](PngCodec.decode(out.toByteArray))
    assert(e.getMessage.contains("short inflate"))
  }

  test("nearest-neighbor resize: identity and 2x downscale") {
    val id = 33L
    val (w, h, px) = PngCodec.decode(PngCodec.encode(id))
    assert(PngCodec.resizeNearest(px, w, h, w, h).toSeq == px.toSeq)
    val half = PngCodec.resizeNearest(px, w, h, w / 2, h / 2)
    // sample maps to floor(i * src / dst): check one pixel
    val i = 3; val j = 2
    val sy = i * h / (h / 2); val sx = j * w / (w / 2)
    for (c <- 0 until 3)
      assert((half((i * (w / 2) + j) * 3 + c) & 0xff) ==
        (px((sy * w + sx) * 3 + c) & 0xff))
  }
}
