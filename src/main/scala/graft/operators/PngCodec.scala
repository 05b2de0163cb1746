package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL PNG codec for 8-bit RGB (color type 2) images, pure JVM — no
  * native codecs needed: IDAT is zlib (java.util.zip), chunk CRCs are
  * CRC32, and all five scanline filters (None/Sub/Up/Average/Paeth) are
  * implemented per the published PNG specification (RFC 2083 / W3C PNG).
  * This closes the "image decode is header-only" gap in Multimodal: the
  * multimodal_pixel_stats query decodes compressed pixel data for real,
  * and its DuckDB oracle — which recomputes channel stats and the
  * thumbnail from the closed-form pixel function alone — proves the
  * inflate + unfilter + resize path byte-exact end to end.
  *
  * The encoder exists to build the deterministic fixture: it exercises
  * the decoder adversarially (filter type cycles y % 5 per scanline, the
  * IDAT stream is split across two chunks) so decoding is never a
  * pass-through.
  */
object PngCodec {

  private val Sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private val Bpp = 3 // 8-bit RGB

  /** Deterministic fixture dimensions: 16..31 each side. */
  def dimsFor(id: Long): (Int, Int) =
    (16 + math.floorMod(id, 16).toInt, 16 + math.floorMod(id / 16, 16).toInt)

  /** Deterministic fixture pixel: channel c of (x, y), integer-SQL-exact. */
  def pixelFor(id: Long, x: Int, y: Int, c: Int): Int =
    math.floorMod(3L * x + 5L * y + 7L * c + id, 256).toInt

  // ------------------------------------------------------------- encode

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length)
    val tagBytes = tag.getBytes("ASCII")
    out.put(tagBytes).put(data)
    val crc = new CRC32
    crc.update(tagBytes)
    crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Real PNG bytes for the deterministic fixture image of `id`: IHDR +
    * two IDAT chunks (zlib) + IEND, scanline filter type cycling y % 5.
    */
  def encode(id: Long): Array[Byte] = {
    val (w, h) = dimsFor(id)
    val stride = w * Bpp
    val raw = Array.tabulate(h, stride) { (y, i) =>
      pixelFor(id, i / Bpp, y, i % Bpp).toByte
    }
    // filtered scanlines: 1 filter-type byte + stride filtered bytes each
    val filtered = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      val f = y % 5
      filtered(y * (stride + 1)) = f.toByte
      for (i <- 0 until stride) {
        val x = raw(y)(i) & 0xff
        val a = if (i >= Bpp) raw(y)(i - Bpp) & 0xff else 0
        val b = if (y > 0) raw(y - 1)(i) & 0xff else 0
        val c = if (y > 0 && i >= Bpp) raw(y - 1)(i - Bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered(y * (stride + 1) + 1 + i) = ((x - pred) & 0xff).toByte
      }
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(filtered)
    deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zBuf.toByteArray

    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type RGB
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    // split IDAT across two chunks so the decoder must concatenate
    val cut = math.max(1, z.length / 2)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", ihdr.array()))
    out.write(chunk("IDAT", z.slice(0, cut)))
    out.write(chunk("IDAT", z.slice(cut, z.length)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode a color-type-2 (8-bit RGB) PNG: validate signature and every
    * chunk CRC, concatenate IDAT, inflate, reverse the per-scanline
    * filter. Returns (width, height, rgb bytes row-major). Throws on
    * malformed input — callers quarantine, mirroring the geometry path.
    */
  def decode(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(png.length >= 8 && (0 until 8).forall(i => png(i) == Sig(i)),
      "not a PNG signature")
    val bb = java.nio.ByteBuffer.wrap(png)
    bb.position(8)
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && bb.remaining() >= 12) {
      val len = bb.getInt
      val tagBytes = new Array[Byte](4); bb.get(tagBytes)
      val tag = new String(tagBytes, "ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val crcStored = bb.getInt
      val crc = new CRC32
      crc.update(tagBytes); crc.update(data)
      require(crc.getValue.toInt == crcStored, s"CRC mismatch in $tag")
      tag match {
        case "IHDR" =>
          val ib = java.nio.ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          require(ib.get() == 8 && ib.get() == 2,
            "only 8-bit RGB (color type 2) supported")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
    }
    require(w > 0 && h > 0, "missing IHDR")
    val stride = w * Bpp
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val filtered = new Array[Byte](h * (stride + 1))
    var off = 0
    // A truncated IDAT makes inflate() return 0 forever (needs more input,
    // never finished) — treat a zero-progress round as end-of-stream so the
    // short-inflate require below throws instead of spinning.
    var made = 1
    while (!inflater.finished() && off < filtered.length && made > 0) {
      made = inflater.inflate(filtered, off, filtered.length - off)
      off += made
    }
    inflater.end()
    require(off == filtered.length, s"short inflate: $off of ${filtered.length}")

    val out = new Array[Byte](h * stride)
    for (y <- 0 until h) {
      val f = filtered(y * (stride + 1)) & 0xff
      require(f <= 4, s"bad filter type $f")
      for (i <- 0 until stride) {
        val filt = filtered(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= Bpp) out(y * stride + i - Bpp) & 0xff else 0
        val b = if (y > 0) out((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= Bpp) out((y - 1) * stride + i - Bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        out(y * stride + i) = ((filt + pred) & 0xff).toByte
      }
    }
    (w, h, out)
  }

  /** Nearest-neighbor resize (the standard thumbnail map: source index =
    * target index * src / dst, floor).
    */
  def resizeNearest(rgb: Array[Byte], w: Int, h: Int,
                    tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * Bpp)
    for (i <- 0 until th; j <- 0 until tw; c <- 0 until Bpp) {
      val sy = i * h / th
      val sx = j * w / tw
      out((i * tw + j) * Bpp + c) = rgb((sy * w + sx) * Bpp + c)
    }
    out
  }
}
