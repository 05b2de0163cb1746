package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with typed
  * metadata, processed by batch-friendly partition-level operators — the
  * Scala/Dataset equivalent of a Pandas-UDF/mapInPandas stage.
  *
  * Decoding is pluggable by mime type. PNG metadata decode is REAL: image
  * payloads carry a spec-valid PNG signature + IHDR chunk and the decoder
  * parses width/height from it (the published PNG format). Audio/video
  * stay clearly-marked STUBS — this container ships no codecs — but the
  * Spark-side plumbing (binary payload column, metadata struct,
  * partition-batched processing, flat feature schema) is what a production
  * codec would plug into either way.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, mime_type: String, payload: Array[Byte])
  // All integral fields are Long and content_hash is an md5 hex string so
  // the whole feature row is DuckDB-expressible (the driver's oracle
  // compares every column; computed ints arrive as BIGINT there).
  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, byte_mean: Double, content_hash: String,
      width: Long, height: Long, thumb_bytes: Long, n_frames: Long)

  /** PNG signature (8) + IHDR chunk (4 len + 4 type + 13 data + 4 crc). */
  val PngHeaderLen = 33
  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Deterministic image dimensions per id (64..511 each). */
  def dimsFor(id: Long): (Int, Int) =
    (64 + math.floorMod(id, 448).toInt, 64 + math.floorMod(id / 7, 448).toInt)

  /** Wrap bytes in a spec-valid PNG signature + IHDR (8-bit RGBA, zero CRC
    * — the metadata decoder reads dimensions, not pixel data).
    */
  def pngWrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(id)
    val out = java.nio.ByteBuffer.allocate(PngHeaderLen + body.length)
    out.put(PngSig)
    out.putInt(13) // IHDR data length
    out.put("IHDR".getBytes("ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte) // bit depth
    out.put(6.toByte) // color type RGBA
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    out.putInt(0) // CRC (not validated by the metadata decoder)
    out.put(body)
    out.array()
  }

  /** REAL PNG metadata decode: validate the signature, read IHDR
    * width/height (big-endian, offsets 16/20 per the PNG spec). None when
    * the payload is not a PNG — caller falls back.
    */
  def decodePngDims(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < PngHeaderLen) return None
    var i = 0
    while (i < 8) { if (payload(i) != PngSig(i)) return None; i += 1 }
    if (!(payload(12) == 'I' && payload(13) == 'H' && payload(14) == 'D' && payload(15) == 'R'))
      return None
    val bb = java.nio.ByteBuffer.wrap(payload)
    Some((bb.getInt(16), bb.getInt(20)))
  }

  // ------------------------------------------------------------------ BMP
  // BMP needs no codec either: BITMAPFILEHEADER (14 bytes) +
  // BITMAPINFOHEADER (40 bytes), all little-endian, published fixed
  // offsets — 'BM' at 0, pixel-data offset at 10, DIB size at 14, signed
  // width/height at 18/22, planes at 26, bits-per-pixel at 28.

  /** BITMAPFILEHEADER + BITMAPINFOHEADER. */
  val BmpHeaderLen = 54

  /** Wrap bytes in a spec-valid 24-bit BI_RGB BMP header (same dimsFor
    * lattice as PNG, so oracles share the id arithmetic).
    */
  def bmpWrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(id)
    val out = java.nio.ByteBuffer.allocate(BmpHeaderLen + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(BmpHeaderLen + body.length) // file size
    out.putShort(0).putShort(0)            // reserved
    out.putInt(BmpHeaderLen)               // pixel-data offset
    out.putInt(40)                         // DIB header size
    out.putInt(w).putInt(h)
    out.putShort(1)                        // color planes
    out.putShort(24)                       // bits per pixel
    out.putInt(0)                          // compression = BI_RGB
    out.putInt(body.length)                // image data size
    out.putInt(2835).putInt(2835)          // 72 DPI in pixels/metre
    out.putInt(0).putInt(0)                // palette: colors used/important
    out.put(body)
    out.array()
  }

  /** REAL BMP metadata decode: validate the 'BM' magic, a DIB header of at
    * least BITMAPINFOHEADER size, one color plane and a legal bit depth,
    * then read the signed little-endian dimensions (negative height means
    * top-down row order per the spec — dimensions report |h|). None when
    * not a plausible BMP — caller falls back.
    */
  def decodeBmpDims(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < BmpHeaderLen) return None
    if (payload(0) != 'B'.toByte || payload(1) != 'M'.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(14) < 40) return None // DIB header older than BITMAPINFOHEADER
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val planes = bb.getShort(26).toInt
    val bpp = bb.getShort(28).toInt
    val legalBpp = bpp == 1 || bpp == 4 || bpp == 8 || bpp == 16 || bpp == 24 || bpp == 32
    if (w <= 0 || h == 0 || planes != 1 || !legalBpp) None
    else Some((w, math.abs(h)))
  }

  // ------------------------------------------------------------------ GIF
  // GIF87a/GIF89a: 6-byte signature + 7-byte logical screen descriptor
  // with unsigned little-endian u16 width/height at offsets 6/8.

  /** Signature + logical screen descriptor. */
  val GifHeaderLen = 13

  /** Wrap bytes in a spec-valid GIF89a header (dimsFor lattice — both
    * dimensions stay well under the u16 ceiling).
    */
  def gifWrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(id)
    val out = java.nio.ByteBuffer.allocate(GifHeaderLen + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte) // packed fields: no global color table
    out.put(0.toByte) // background color index
    out.put(0.toByte) // pixel aspect ratio
    out.put(body)
    out.array()
  }

  /** REAL GIF metadata decode: validate the GIF87a/GIF89a signature and
    * read the unsigned little-endian logical screen dimensions. None when
    * not a GIF — caller falls back.
    */
  def decodeGifDims(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload.length < GifHeaderLen) return None
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    if (!ascii(0, "GIF87a") && !ascii(0, "GIF89a")) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bb.getShort(6) & 0xffff
    val h = bb.getShort(8) & 0xffff
    if (w == 0 || h == 0) None else Some((w, h))
  }

  // ------------------------------------------------------------------ MP4
  // ISO/IEC 14496-12 (ISO BMFF) needs no codec for metadata either: the
  // file is a tree of length-prefixed boxes ([u32 size][4cc type], both
  // big-endian), and track dimensions live at fixed offsets inside
  // moov → trak → tkhd as 16.16 fixed-point. Only the lossy sample DATA
  // needs a codec — the container walk below is a real parse.

  /** ftyp(20) + moov(8 + trak(8 + tkhd(92))) + mdat header(8). */
  val Mp4HeaderLen = 20 + 8 + 8 + 92 + 8

  /** Wrap bytes as a minimal ISO BMFF file: ftyp, a moov/trak/tkhd chain
    * carrying the dimsFor lattice as 16.16 fixed-point, and an mdat box
    * holding the body.
    */
  def mp4Wrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(id)
    val out = java.nio.ByteBuffer.allocate(Mp4HeaderLen + body.length)
    // big-endian is ByteBuffer's default order
    out.putInt(20).put("ftyp".getBytes("ASCII"))
      .put("isom".getBytes("ASCII")).putInt(0).put("isom".getBytes("ASCII"))
    out.putInt(8 + 8 + 92).put("moov".getBytes("ASCII"))
    out.putInt(8 + 92).put("trak".getBytes("ASCII"))
    out.putInt(92).put("tkhd".getBytes("ASCII"))
    out.putInt(0)             // version 0 + flags
    out.putInt(0).putInt(0)   // creation/modification time
    out.putInt(1)             // track id
    out.putInt(0)             // reserved
    out.putInt(0)             // duration
    out.putLong(0L)           // reserved
    out.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/reserved
    // identity transform matrix (9 × 32-bit fixed-point)
    out.putInt(0x10000).putInt(0).putInt(0)
    out.putInt(0).putInt(0x10000).putInt(0)
    out.putInt(0).putInt(0).putInt(0x40000000)
    out.putInt(w << 16).putInt(h << 16) // 16.16 fixed-point dimensions
    out.putInt(8 + body.length).put("mdat".getBytes("ASCII"))
    out.put(body)
    out.array()
  }

  /** REAL ISO BMFF metadata decode: validate the leading ftyp box, walk
    * the top-level box chain to moov, recurse moov → trak → tkhd, and
    * read the 16.16 fixed-point track dimensions (version 0 and 1 tkhd
    * layouts per the spec). None when the payload is not a plausible BMFF
    * container — caller falls back.
    */
  def decodeMp4Dims(payload: Array[Byte]): Option[(Int, Int)] = {
    def be32(off: Int): Long =
      if (off + 4 > payload.length) -1L
      else ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
           ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
    def fourcc(off: Int, s: String): Boolean =
      off + 4 <= payload.length &&
        s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    def findBox(from: Int, until: Int, tpe: String,
                topLevel: Boolean = false): Option[(Int, Int)] = {
      var off = from
      while (off + 8 <= until) {
        val size32 = be32(off)
        // ISO BMFF size escapes: 0 = box extends to the end of the FILE
        // (the spec permits it only for the last top-level box, e.g. a
        // trailing mdat — accepting it nested would let a corrupted inner
        // size swallow sibling boxes and read garbage dimensions);
        // 1 = 64-bit largesize follows the fourcc.
        var body = off + 8L
        val end: Long =
          if (size32 == 0L) { if (!topLevel) return None; until.toLong }
          else if (size32 == 1L) {
            if (off + 16 > until) return None
            val largesize = (be32(off + 8) << 32) | be32(off + 12)
            if (largesize < 16L) return None
            body = off + 16L
            off + largesize
          } else {
            if (size32 < 8L) return None
            off + size32
          }
        if (end < body || end > until) return None // malformed chain
        if (fourcc(off + 4, tpe)) return Some((body.toInt, end.toInt))
        off = end.toInt
      }
      None
    }
    if (payload.length < 16 || !fourcc(4, "ftyp")) return None
    for {
      (moovS, moovE) <- findBox(0, payload.length, "moov", topLevel = true)
      (trakS, trakE) <- findBox(moovS, moovE, "trak")
      (tkhdS, tkhdE) <- findBox(trakS, trakE, "tkhd")
      dims <- {
        val version = if (tkhdS < payload.length) payload(tkhdS) & 0xff else -1
        // offset of the width field within the tkhd payload, after
        // version/flags + times/ids/duration + reserved + layer block +
        // matrix (spec layout; times/duration are 64-bit in version 1)
        val wOff = version match {
          case 0 => tkhdS + 4 + 20 + 8 + 8 + 36
          case 1 => tkhdS + 4 + 32 + 8 + 8 + 36
          case _ => -1
        }
        if (wOff < 0 || wOff + 8 > tkhdE) None
        else {
          val w = (be32(wOff) >> 16).toInt
          val h = (be32(wOff + 4) >> 16).toInt
          if (w <= 0 || h <= 0) None else Some((w, h))
        }
      }
    } yield dims
  }

  // ----------------------------------------------------------------- WebM
  // Matroska/WebM is an EBML document (RFC 8794): every element is a VINT
  // id (marker bits kept) + VINT size (marker stripped; all-ones payload =
  // unknown size) + payload. Track dimensions live under Segment → Tracks
  // → TrackEntry → Video as unsigned big-endian PixelWidth/PixelHeight —
  // a pure container walk, no codec, like the BMFF path above.

  /** EBML header(12) + Segment(4+8) + Tracks(4+8+26) + Void(1+8). */
  val WebmHeaderLen = 12 + 12 + 38 + 9

  /** Wrap bytes as a minimal WebM file: EBML header (DocType "webm"), a
    * Segment holding a Tracks → TrackEntry → Video chain carrying the
    * dimsFor lattice as u16 PixelWidth/PixelHeight, and a Void element
    * holding the body (fixed 8-byte size VINTs so the byte layout is a
    * constant the oracle reconstructs; the DECODER handles every width).
    */
  def webmWrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(id)
    val out = java.nio.ByteBuffer.allocate(WebmHeaderLen + body.length)
    def size8(v: Long): Unit = {
      out.put(0x01.toByte) // 8-byte VINT marker
      var i = 48
      while (i >= 0) { out.put(((v >> i) & 0xff).toByte); i -= 8 }
    }
    out.put(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)).put(0x87.toByte)
    out.put(Array(0x42, 0x82).map(_.toByte)).put(0x84.toByte)
      .put("webm".getBytes("ASCII"))
    out.put(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)); size8(47L + body.length)
    out.put(Array(0x16, 0x54, 0xAE, 0x6B).map(_.toByte)); size8(26)
    out.put(0xAE.toByte); size8(17)
    out.put(0xE0.toByte); size8(8)
    out.put(0xB0.toByte).put(0x82.toByte).putShort(w.toShort)
    out.put(0xBA.toByte).put(0x82.toByte).putShort(h.toShort)
    out.put(0xEC.toByte); size8(body.length) // Void: opaque filler element
    out.put(body)
    out.array()
  }

  /** REAL EBML metadata decode: general VINT ids/sizes (any width,
    * unknown-size Segment supported — the streamed-webm form), walk
    * EBML header → Segment → Tracks → TrackEntry → Video, read the
    * unsigned PixelWidth/PixelHeight. None when not plausible EBML —
    * caller falls back.
    */
  def decodeWebmDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val n = payload.length
    def vintLen(b: Int): Int = {
      var l = 1; var m = 0x80
      while (m != 0 && (b & m) == 0) { l += 1; m >>>= 1 }
      if (m == 0) -1 else l
    }
    def readId(off: Int): (Long, Int) = {
      if (off >= n) return (-1L, -1)
      val l = vintLen(payload(off) & 0xff)
      if (l < 1 || l > 4 || off + l > n) return (-1L, -1)
      var v = 0L; var i = 0
      while (i < l) { v = (v << 8) | (payload(off + i) & 0xffL); i += 1 }
      (v, l)
    }
    def readSize(off: Int): (Long, Int) = {
      if (off >= n) return (-2L, -1)
      val b0 = payload(off) & 0xff
      val l = vintLen(b0)
      if (l < 1 || l > 8 || off + l > n) return (-2L, -1)
      var v = (b0 & (0xff >>> l)).toLong
      var i = 1
      while (i < l) { v = (v << 8) | (payload(off + i) & 0xffL); i += 1 }
      val allOnes = (1L << (7 * l)) - 1
      (if (v == allOnes) -1L else v, l) // -1 = unknown size (RFC 8794 §6)
    }
    def uint(off: Int, len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (payload(off + i) & 0xffL); i += 1 }
      v
    }
    /** First child of [from, until) with `target` id → its content span.
      * An unknown-size TARGET extends to the container end; an
      * unknown-size non-target can't be skipped → not found.
      */
    def find(from: Int, until: Int, target: Long): Option[(Int, Int)] = {
      var off = from
      while (off < until) {
        val (id, il) = readId(off)
        if (il < 0) return None
        val (sz, sl) = readSize(off + il)
        if (sl < 0) return None
        val cs = off + il + sl
        // span arithmetic in LONG: a declared size near Int.MaxValue must
        // reject as implausible, not wrap negative and re-enter the walk
        val ce = if (sz < 0) until.toLong else cs.toLong + sz
        if (id == target) {
          return if (ce > until) None else Some((cs, ce.toInt))
        }
        if (sz < 0 || ce > until) return None
        off = ce.toInt
      }
      None
    }
    if (n < 4 || readId(0)._1 != 0x1A45DFA3L) return None
    for {
      (_, ebmlEnd) <- find(0, n, 0x1A45DFA3L)
      (segS, segE) <- find(ebmlEnd, n, 0x18538067L)
      (trkS, trkE) <- find(segS, segE, 0x1654AE6BL)
      (entS, entE) <- find(trkS, trkE, 0xAEL)
      (vidS, vidE) <- find(entS, entE, 0xE0L)
      w <- find(vidS, vidE, 0xB0L).map { case (s, e) => uint(s, e - s) }
      h <- find(vidS, vidE, 0xBAL).map { case (s, e) => uint(s, e - s) }
      if w > 0 && h > 0 && w <= 65535 && h <= 65535
    } yield (w.toInt, h.toInt)
  }

  // ------------------------------------------------------------------ WAV
  // PCM WAV is a published container whose header needs no codec: RIFF
  // chunk + fmt subchunk + data subchunk, all little-endian. The parse
  // below is REAL (like the PNG IHDR path); only lossy codecs stay stubs.

  /** Canonical 44-byte PCM WAV header. */
  val WavHeaderLen = 44

  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           dataLen: Int) {
    def blockAlign: Int = channels * bitsPerSample / 8
    def nSamples: Long = if (blockAlign == 0) 0L else dataLen.toLong / blockAlign
    def durationMs: Long =
      if (sampleRate == 0) 0L else nSamples * 1000L / sampleRate
  }

  private val WavRates = Array(8000, 16000, 22050, 44100, 48000)

  /** Deterministic audio parameters per id (reproducible by integer SQL). */
  def wavParamsFor(id: Long): WavMeta = WavMeta(
    sampleRate = WavRates(math.floorMod(id, 5).toInt),
    channels = 1 + math.floorMod(id, 2).toInt,
    bitsPerSample = if (math.floorMod(id / 2, 2) == 0) 8 else 16,
    dataLen = 0)

  /** Wrap bytes in a spec-valid PCM WAV header (RIFF little-endian). */
  def wavWrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val p = wavParamsFor(id)
    val out = java.nio.ByteBuffer.allocate(WavHeaderLen + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII"))
    out.putInt(36 + body.length)
    out.put("WAVE".getBytes("ASCII"))
    out.put("fmt ".getBytes("ASCII"))
    out.putInt(16)                       // fmt subchunk length (PCM)
    out.putShort(1)                      // audio format = PCM
    out.putShort(p.channels.toShort)
    out.putInt(p.sampleRate)
    out.putInt(p.sampleRate * p.blockAlign)
    out.putShort(p.blockAlign.toShort)
    out.putShort(p.bitsPerSample.toShort)
    out.put("data".getBytes("ASCII"))
    out.putInt(body.length)
    out.put(body)
    out.array()
  }

  /** REAL PCM WAV metadata decode: validate RIFF/WAVE/fmt/data markers and
    * PCM format, read the little-endian fields. None when not a canonical
    * PCM WAV — caller falls back.
    */
  def decodeWavMeta(payload: Array[Byte]): Option[WavMeta] = {
    if (payload.length < WavHeaderLen) return None
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE") || !ascii(12, "fmt ") ||
        !ascii(36, "data")) return None
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getShort(20) != 1) return None // PCM only
    val meta = WavMeta(
      sampleRate = bb.getInt(24),
      channels = bb.getShort(22).toInt,
      bitsPerSample = bb.getShort(34).toInt,
      dataLen = bb.getInt(40))
    if (meta.sampleRate <= 0 || meta.channels <= 0 || meta.bitsPerSample <= 0)
      None
    else Some(meta)
  }

  // ------------------------------------------------------------------ MP3
  // An MPEG-1 Layer III frame header is 4 self-describing big-endian bytes
  // (ISO/IEC 11172-3): 11-bit sync, version/layer bits, then bitrate and
  // sample-rate TABLE INDICES — the published tables below turn them into
  // physical parameters and the exact frame length, no codec needed.

  /** Published MPEG-1 Layer III bitrate table (kbps), index 1..14. */
  private val Mp3BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Published MPEG-1 sample-rate table, index 0..2. */
  private val Mp3SampleRate = Array(44100, 48000, 32000)

  final case class Mp3Meta(bitrateKbps: Int, sampleRate: Int, channels: Int,
                           padding: Int) {
    /** Layer III frame length: 144 · bitrate/samplerate + padding. */
    def frameBytes: Int = 144000 * bitrateKbps / sampleRate + padding
  }

  /** Deterministic MP3 parameters per id (reproducible by integer SQL) —
    * the divisors differ so a doc subset filtered on one modulus still
    * sweeps the other fields.
    */
  def mp3ParamsFor(id: Long): (Int, Int, Int, Int) = (
    1 + math.floorMod(id, 14).toInt,      // bitrate index 1..14
    math.floorMod(id / 3, 3).toInt,       // sample-rate index 0..2
    math.floorMod(id / 4, 4).toInt,       // channel mode 0..3 (3 = mono)
    math.floorMod(id, 2).toInt)           // padding bit

  /** Prefix bytes with a spec-valid MPEG-1 Layer III frame header. */
  def mp3Wrap(id: Long, body: Array[Byte]): Array[Byte] = {
    val (bIdx, sIdx, mode, pad) = mp3ParamsFor(id)
    val out = new Array[Byte](4 + body.length)
    out(0) = 0xFF.toByte
    out(1) = 0xFB.toByte // sync(3) | MPEG1(11) | Layer III(01) | no-CRC(1)
    out(2) = ((bIdx << 4) | (sIdx << 2) | (pad << 1)).toByte
    out(3) = (mode << 6).toByte
    System.arraycopy(body, 0, out, 4, body.length)
    out
  }

  /** REAL MP3 frame-header decode: validate the sync word, version and
    * layer bits, reject reserved bitrate/sample-rate indices, then read
    * the physical parameters from the published tables. None when not a
    * plausible MPEG-1 Layer III frame — caller falls back.
    */
  def decodeMp3Meta(payload: Array[Byte]): Option[Mp3Meta] = {
    if (payload.length < 4) return None
    val b1 = payload(1) & 0xff
    if ((payload(0) & 0xff) != 0xff || (b1 & 0xe0) != 0xe0) return None
    if (((b1 >> 3) & 3) != 3) return None // MPEG-1 only
    if (((b1 >> 1) & 3) != 1) return None // Layer III only
    val b2 = payload(2) & 0xff
    val bIdx = b2 >> 4
    val sIdx = (b2 >> 2) & 3
    if (bIdx < 1 || bIdx > 14 || sIdx > 2) return None // reserved indices
    val mode = (payload(3) & 0xff) >> 6
    Some(Mp3Meta(Mp3BitrateKbps(bIdx), Mp3SampleRate(sIdx),
      if (mode == 3) 1 else 2, (b2 >> 1) & 1))
  }

  /** Synthesize an MP3 table: frame-headed text bytes for doc_id % 3 = 2
    * docs, parameters a deterministic function of the id (mp3ParamsFor).
    */
  def mp3Table(spark: SparkSession, dir: String): DataFrame = {
    val wrap = udf((id: Long, body: Array[Byte]) => mp3Wrap(id, body))
    spark.read.parquet(s"$dir/documents.parquet")
      .where(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id").as("media_id"), lit("audio/mpeg").as("mime_type"),
        wrap(col("doc_id"), encode(col("text"), "UTF-8")).as("payload"))
  }

  final case class Mp3MetaRow(media_id: Long, bitrate_kbps: Long,
      sample_rate: Long, n_channels: Long, frame_bytes: Long, n_bytes: Long,
      content_hash: String)

  /** Partition-batched REAL MP3 header decode over a media frame. */
  def extractMp3Meta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val m = decodeMp3Meta(r.payload).getOrElse(Mp3Meta(0, 1, 0, 0))
        Mp3MetaRow(
          media_id = r.media_id,
          bitrate_kbps = m.bitrateKbps.toLong,
          sample_rate = (if (m.bitrateKbps == 0) 0 else m.sampleRate).toLong,
          n_channels = m.channels.toLong,
          frame_bytes = (if (m.bitrateKbps == 0) 0 else m.frameBytes).toLong,
          n_bytes = r.payload.length.toLong,
          content_hash = contentHash(r.payload))
      }
    }.toDF()
  }

  /** Synthesize a media table from documents: image payloads are valid
    * PNG-framed bytes, audio/video stay raw utf-8.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val wrap = udf((id: Long, body: Array[Byte]) => pngWrap(id, body))
    spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime_type"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        wrap(col("doc_id"), encode(col("text"), "UTF-8")))
        .otherwise(encode(col("text"), "UTF-8")).as("payload"))
  }

  /** STUB decoder for codec-less mimes — deterministic fake dimensions.
    * Derived from the payload byte SUM (not a chained hash) so an oracle
    * engine can reproduce them with plain integer SQL.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    // ??? real decode unavailable offline; deterministic fake dimensions
    var s = 0L
    var i = 0
    while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
    (64 + (s % 448).toInt, 64 + ((s / 7) % 448).toInt) // 64..511 each
  }

  /** Uppercase hex of a payload (the cross-engine canonical byte string:
    * DuckDB's hex(BLOB) is uppercase).
    */
  def hexUpper(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) { sb.append(f"${b(i) & 0xff}%02X"); i += 1 }
    sb.toString
  }

  /** Content hash = md5 of the uppercase-hex payload encoding. Hashing the
    * HEX (not the raw bytes) keeps the value computable by SQL engines
    * whose md5 only accepts text — arbitrary payload bytes are not valid
    * UTF-8, their hex always is.
    */
  def contentHash(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(hexUpper(payload).getBytes("US-ASCII"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** "Resize": stub thumbnail = stride-subsampled bytes. */
  def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (payload.length <= maxBytes) payload
    else {
      val stride = payload.length / maxBytes + 1
      payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray
    }
  }

  /** "Frame sample": stub frame count from payload length. */
  def frameSampleStub(payload: Array[Byte], frameBytes: Int): Int =
    math.max(1, payload.length / frameBytes)

  /** A pluggable per-mime decoder. Implementations must be Serializable —
    * a decoder instance ships inside the mapPartitions closure; heavyweight
    * non-serializable state (codec handles, model weights) belongs in
    * `open()`, which runs once per partition on the executor.
    */
  trait MediaDecoder extends Serializable {
    /** Exact mime types this decoder claims. */
    def mimes: Seq[String]
    /** Per-partition executor-side init (codec handles, model weights…). */
    def open(): Unit = ()
    def dims(payload: Array[Byte]): (Int, Int)
    def frames(payload: Array[Byte]): Int = 1
  }

  /** Real decoder: PNG signature + IHDR header (published format). Falls
    * back to the deterministic stub for payloads that aren't valid PNG.
    */
  object PngDecoder extends MediaDecoder {
    override def mimes: Seq[String] = Seq("image/png")
    override def dims(payload: Array[Byte]): (Int, Int) =
      decodePngDims(payload).getOrElse(decodeStub(payload))
    override def frames(payload: Array[Byte]): Int =
      frameSampleStub(payload, 4096)
  }

  /** Real decoder: BMP fixed-offset header parse (published format). */
  object BmpDecoder extends MediaDecoder {
    override def mimes: Seq[String] = Seq("image/bmp", "image/x-ms-bmp")
    override def dims(payload: Array[Byte]): (Int, Int) =
      decodeBmpDims(payload).getOrElse(decodeStub(payload))
    override def frames(payload: Array[Byte]): Int =
      frameSampleStub(payload, 4096)
  }

  /** Real decoder: GIF signature + logical screen descriptor. */
  object GifDecoder extends MediaDecoder {
    override def mimes: Seq[String] = Seq("image/gif")
    override def dims(payload: Array[Byte]): (Int, Int) =
      decodeGifDims(payload).getOrElse(decodeStub(payload))
    override def frames(payload: Array[Byte]): Int =
      frameSampleStub(payload, 4096)
  }

  /** Real decoder: ISO BMFF box walk to the tkhd track dimensions. */
  object Mp4Decoder extends MediaDecoder {
    override def mimes: Seq[String] = Seq("video/mp4", "video/quicktime")
    override def dims(payload: Array[Byte]): (Int, Int) =
      decodeMp4Dims(payload).getOrElse(decodeStub(payload))
    override def frames(payload: Array[Byte]): Int =
      frameSampleStub(payload, 4096)
  }

  /** Real decoder: EBML walk to the Video track's pixel dimensions. */
  object WebmDecoder extends MediaDecoder {
    override def mimes: Seq[String] = Seq("video/webm", "video/x-matroska")
    override def dims(payload: Array[Byte]): (Int, Int) =
      decodeWebmDims(payload).getOrElse(decodeStub(payload))
    override def frames(payload: Array[Byte]): Int =
      frameSampleStub(payload, 4096)
  }

  /** Audio metadata row: real header fields + derived duration. */
  final case class AudioMeta(
      media_id: Long, sample_rate: Long, n_channels: Long,
      bits_per_sample: Long, n_samples: Long, duration_ms: Long,
      content_hash: String)

  /** Synthesize an audio table: WAV-framed text bytes for audio docs
    * (doc_id % 3 = 1), header parameters a deterministic function of the
    * id (wavParamsFor) so an oracle engine reconstructs the byte stream.
    */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    val wrap = udf((id: Long, body: Array[Byte]) => wavWrap(id, body))
    spark.read.parquet(s"$dir/documents.parquet")
      .where(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id").as("media_id"), lit("audio/wav").as("mime_type"),
        wrap(col("doc_id"), encode(col("text"), "UTF-8")).as("payload"))
  }

  final case class AudioFeatures(media_id: Long, n_samples: Long,
      sum_abs: Long, max_abs: Long, sum_sq: Long, reversals: Long)

  /** Partition-batched REAL PCM feature extraction: parse the WAV header,
    * decode the interleaved sample stream (8-bit unsigned-centered or
    * 16-bit signed little-endian per the fmt chunk), and compute exact
    * integer signal features — total |sample| mass, peak, energy (Σs²),
    * and direction reversals (sign changes of the first difference, the
    * integer stand-in for dominant-frequency content). All map-side; a
    * non-PCM payload degrades to an all-zero row (quarantine policy).
    */
  def extractPcmFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        decodeWavMeta(r.payload) match {
          case None => AudioFeatures(r.media_id, 0L, 0L, 0L, 0L, 0L)
          case Some(m) =>
            val body = r.payload.drop(WavHeaderLen)
            val samples: Array[Int] =
              if (m.bitsPerSample == 8) body.map(b => (b & 0xff) - 128)
              else {
                val n = body.length / 2
                Array.tabulate(n) { j =>
                  val v = (body(2 * j) & 0xff) | ((body(2 * j + 1) & 0xff) << 8)
                  if (v >= 32768) v - 65536 else v
                }
              }
            var sumAbs = 0L; var maxAbs = 0L; var sumSq = 0L; var rev = 0L
            var i = 0
            var prevDeltaNeg = false; var havePrev = false
            while (i < samples.length) {
              val s = samples(i).toLong
              val a = math.abs(s)
              sumAbs += a; if (a > maxAbs) maxAbs = a; sumSq += s * s
              if (i > 0) {
                val dNeg = samples(i) - samples(i - 1) < 0
                if (havePrev && dNeg != prevDeltaNeg) rev += 1
                prevDeltaNeg = dNeg; havePrev = true
              }
              i += 1
            }
            AudioFeatures(r.media_id, samples.length.toLong, sumAbs, maxAbs, sumSq, rev)
        }
      }
    }.toDF()
  }

  /** Partition-batched REAL audio metadata extraction: parse each WAV
    * header (decodeWavMeta), derive sample count and duration from the
    * parsed fields. Rows that are not canonical PCM WAV surface as
    * all-zero metadata rather than failing the batch (quarantine-style
    * degradation, same policy as geometry repair).
    */
  def extractAudioMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val m = decodeWavMeta(r.payload).getOrElse(WavMeta(0, 0, 0, 0))
        AudioMeta(
          media_id = r.media_id,
          sample_rate = m.sampleRate.toLong,
          n_channels = m.channels.toLong,
          bits_per_sample = m.bitsPerSample.toLong,
          n_samples = m.nSamples,
          duration_ms = m.durationMs,
          content_hash = contentHash(r.payload))
      }
    }.toDF()
  }

  /** STUB decoder for codec-less mimes (none ship in this container) —
    * deterministic fake dimensions, length-derived frame count. The
    * open()/dims()/frames() surface is exactly what a real libav/libsndfile
    * binding would implement.
    */
  final class StubDecoder(override val mimes: Seq[String]) extends MediaDecoder {
    override def dims(payload: Array[Byte]): (Int, Int) = decodeStub(payload)
    override def frames(payload: Array[Byte]): Int =
      frameSampleStub(payload, 4096)
  }

  /** Mime → decoder dispatch. `DecoderRegistry.opened` counts per-partition
    * openAll() calls JVM-wide (diagnostic; in local mode MultimodalSpec
    * asserts exactly one per input partition).
    */
  final class DecoderRegistry(decoders: Seq[MediaDecoder]) extends Serializable {
    private val byMime: Map[String, MediaDecoder] =
      decoders.flatMap(d => d.mimes.map(_ -> d)).toMap
    private val fallback = new StubDecoder(Seq("*/*"))

    def forMime(mime: String): MediaDecoder = byMime.getOrElse(mime, fallback)

    /** Open every decoder once (call at the top of each partition). */
    def openAll(): Unit = {
      DecoderRegistry.opened.incrementAndGet()
      decoders.foreach(_.open()); fallback.open()
    }
  }

  object DecoderRegistry {
    /** JVM-wide openAll() call count (per-executor on a cluster). */
    val opened = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  def defaultRegistry: DecoderRegistry = new DecoderRegistry(Seq(
    PngDecoder, BmpDecoder, GifDecoder, Mp4Decoder, WebmDecoder,
    new StubDecoder(Seq("audio/wav", "audio/mpeg"))))

  /** Media table routed by doc_id mod arms.length: each arm is a (mime,
    * wrapper) pair and every payload carries a REAL spec-valid header
    * whose dimensions come from the shared dimsFor(id) lattice, so a SQL
    * oracle reconstructs the parsed metadata with integer arithmetic
    * alone. One definition serves every codec-count variant — adding a
    * codec is one arm, not a third copied when-chain.
    */
  private def mediaTableMod(spark: SparkSession, dir: String,
      arms: Seq[(String, (Long, Array[Byte]) => Array[Byte])]): DataFrame = {
    val m = arms.length
    def branch(i: Int) = pmod(col("doc_id"), lit(m)) === i
    val mime = arms.zipWithIndex.map { case ((mt, _), i) => (branch(i), lit(mt)) }
      .foldLeft(Option.empty[Column]) {
        case (None, (c, v)) => Some(when(c, v))
        case (Some(acc), (c, v)) => Some(acc.when(c, v))
      }.get
    val payload = arms.zipWithIndex.map { case ((_, w), i) =>
      (branch(i), udf(w).apply(col("doc_id"), encode(col("text"), "UTF-8")))
    }.foldLeft(Option.empty[Column]) {
      case (None, (c, v)) => Some(when(c, v))
      case (Some(acc), (c, v)) => Some(acc.when(c, v))
    }.get
    spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("media_id"), mime.as("mime_type"), payload.as("payload"))
  }

  private val CodecArms: Seq[(String, (Long, Array[Byte]) => Array[Byte])] = Seq(
    "image/png" -> (pngWrap _),
    "image/bmp" -> (bmpWrap _),
    "image/gif" -> (gifWrap _),
    "video/mp4" -> (mp4Wrap _),
    "video/webm" -> (webmWrap _))

  /** Four-real-codec media table (PNG / BMP / GIF / MP4 by doc_id mod 4). */
  def mediaTableV2(spark: SparkSession, dir: String): DataFrame =
    mediaTableMod(spark, dir, CodecArms.take(4))

  /** FIVE-real-codec media table (PNG / BMP / GIF / MP4 / WEBM by doc_id
    * mod 5) — the mediaTableV2 lattice with the EBML container joining.
    */
  def mediaTableV3(spark: SparkSession, dir: String): DataFrame =
    mediaTableMod(spark, dir, CodecArms)

  /** Partition-batched feature extraction (mapPartitions: decoders open
    * once per partition, rows processed in a batch loop — the shape a real
    * codec-backed decoder needs). Dispatch is per-mime through the
    * registry: PNG rows get real header dimensions, codec-less mimes get
    * the documented stub.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      registry: DecoderRegistry = defaultRegistry): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      registry.openAll() // per-partition init site
      rows.map { r =>
        val dec = registry.forMime(r.mime_type)
        val (w, h) = dec.dims(r.payload)
        var bsum = 0L
        var i = 0
        while (i < r.payload.length) { bsum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(
          media_id = r.media_id,
          n_bytes = r.payload.length.toLong,
          // one exact-integer-over-exact-integer double division: bit-equal
          // across engines with no rounding convention to agree on
          byte_mean = if (r.payload.isEmpty) 0.0
                      else bsum.toDouble / r.payload.length,
          content_hash = contentHash(r.payload),
          width = w.toLong,
          height = h.toLong,
          thumb_bytes = resizeStub(r.payload, 256).length.toLong,
          n_frames = dec.frames(r.payload).toLong)
      }
    }.toDF()
  }
}
