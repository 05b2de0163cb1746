package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: event-time windowed aggregation with a
  * watermark over the events table, consumed as a file stream.
  *
  * The reference is batch-only (SURVEY.md §1.1: no streaming abstractions),
  * so this is a beyond-parity capability: the same hourly rollup the batch
  * query computes, expressed as readStream → watermark → window agg →
  * writeStream. At scale this runs continuously against arriving files with
  * bounded state (the watermark expires windows); here it is driven to
  * completion with Trigger.AvailableNow so the result is a checkable batch
  * DataFrame with the SAME DuckDB oracle as the batch rollup.
  */
object EventStream {

  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    // file-stream sources read directories; stage the single parquet file
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val srcDir = Files.createTempDirectory("graft_stream_src")
    srcDir.toFile.deleteOnExit()
    Files.copy(Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val raw = spark.readStream.schema(batch.schema).parquet(srcDir.toString)
    val events = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }

    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"), col("n"), col("sum_value"))

    val sinkName = s"graft_stream_rollup_${math.abs(dir.hashCode)}"
    val q = agg.writeStream
      .format("memory").queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stream_ckpt").toString)
      .start()
    q.awaitTermination()
    spark.table(sinkName).orderBy("h", "event_type")
  }
}
