package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with typed
  * metadata, processed by batch-friendly partition-level operators — the
  * Scala/Dataset equivalent of a Pandas-UDF/mapInPandas stage.
  *
  * The decode step is a clearly-marked STUB: this container ships no
  * image/audio codecs, so `decodeStub` derives deterministic fake raster
  * stats from the bytes. The Spark-side plumbing — binary payload column,
  * metadata struct, partition-batched processing, flat feature schema — is
  * real and is what a production decoder would plug into.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, mime_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, byte_mean: Double, content_hash: Long,
      fake_width: Int, fake_height: Int, thumb_bytes: Int, n_frames: Int)

  /** Synthesize a media table from documents (payload = utf-8 bytes). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — a real implementation would decode the codec here. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    // ??? real decode unavailable offline; deterministic fake dimensions
    val h = payload.foldLeft(0xcbf29ce484222325L)((a, b) => (a ^ b) * 0x100000001b3L)
    val w = 64 + math.floorMod(h, 448).toInt        // 64..511
    val ht = 64 + math.floorMod(h >>> 16, 448).toInt
    (w, ht)
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

  /** Partition-batched feature extraction (mapPartitions: one decoder init
    * per partition, rows processed in a batch loop — the shape a real
    * codec-backed decoder needs).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init site (codec handles, model weights, …)
      rows.map { r =>
        val (w, h) = decodeStub(r.payload)
        val mean =
          if (r.payload.isEmpty) 0.0
          else r.payload.map(b => (b & 0xff).toDouble).sum / r.payload.length
        MediaFeatures(
          media_id = r.media_id,
          n_bytes = r.payload.length.toLong,
          byte_mean = math.rint(mean * 1e6) / 1e6,
          content_hash = Dedup.fnv64(new String(r.payload, "UTF-8")),
          fake_width = w,
          fake_height = h,
          thumb_bytes = resizeStub(r.payload, 256).length,
          n_frames = frameSampleStub(r.payload, 4096))
      }
    }.toDF()
  }
}
