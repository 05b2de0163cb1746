package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    PngDecoder,
    new StubDecoder(Seq("audio/wav", "audio/mpeg")),
    new StubDecoder(Seq("video/mp4", "video/webm"))))

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
