package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming document-pipeline gates — the training-data curation passes a
  * continuously-arriving corpus needs, expressed as stateful Structured
  * Streaming (beyond-parity: the reference is batch-only, SURVEY.md §1.1).
  *
  * The segment-dedup gate keeps each 10-token segment only at its FIRST
  * occurrence across the whole stream (C4-style exact segment dedup,
  * Raffel et al. 2020 §2.2): per-key state (one presence bit per segment
  * hash) suppresses every later arrival, and within a micro-batch the
  * lexicographically smallest (doc_id, seg_idx) wins — so when files
  * arrive in doc-id band order the emitted set equals the batch
  * `dedup_segments` survivor pick and shares its DuckDB oracle.
  *
  * Scale shape: state is keyed by the segment HASH (bounded per segment,
  * no document text retained), the stream shuffles once on that key, and
  * suppression is O(1) per arrival. In production the presence state
  * would be bounded by a TTL/watermark (dedup horizon); the test driver
  * runs to completion with AvailableNow.
  */
object DocStream {

  final case class SegRow(doc_id: Long, seg_idx: Long, seg: String, seg_h: String)

  /** First-occurrence gate: earlier micro-batch wins outright; within a
    * batch the smallest (doc_id, seg_idx) wins.
    */
  private def firstOccurrenceFn(key: String, rows: Iterator[SegRow],
      state: GroupState[Boolean]): Iterator[SegRow] = {
    if (state.exists) Iterator.empty
    else {
      var best: SegRow = null
      rows.foreach { r =>
        if (best == null || r.doc_id < best.doc_id ||
          (r.doc_id == best.doc_id && r.seg_idx < best.seg_idx)) best = r
      }
      state.update(true)
      if (best == null) Iterator.empty else Iterator.single(best)
    }
  }

  /** Run the gate over `segs` (doc_id, seg_idx, seg, seg_h), staged as a
    * file stream in doc-id band order (one file per 100000-wide band,
    * maxFilesPerTrigger=1 → one micro-batch per band) so cross-batch
    * suppression is exercised deterministically. Returns the kept segment
    * rows plus the number of micro-batches processed.
    */
  def segmentDedup(spark: SparkSession, segs: DataFrame): (DataFrame, Long) = {
    import spark.implicits._
    val typed = segs.select(col("doc_id").cast("long"),
      col("seg_idx").cast("long"), col("seg"), col("seg_h"))
    val srcDir = Files.createTempDirectory("graft_segdedup_src")
    srcDir.toFile.deleteOnExit()
    // one file per band, written in band order (coalesce(1): a band split
    // across files could process out of order WITHIN the band and break
    // the min-pick determinism)
    val bands = typed.select(expr("doc_id div 100000").as("b"))
      .distinct().orderBy("b").as[Long].collect()
    bands.foreach { b =>
      typed.where(expr(s"doc_id div 100000 = $b"))
        .coalesce(1).write.mode("overwrite")
        .parquet(srcDir.resolve(f"$b%02d_band").toString)
    }
    val raw = spark.readStream.schema(typed.schema)
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
    val kept = raw.as[SegRow].groupByKey(_.seg_h)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        firstOccurrenceFn)
    val sinkName = s"graft_stream_segdedup_${math.abs(srcDir.toString.hashCode)}"
    val q = kept.toDF().writeStream
      .format("memory").queryName(sinkName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_segdedup_ckpt").toString)
      .start()
    q.awaitTermination()
    val nBatches = q.recentProgress.count(_.numInputRows > 0).toLong
    (spark.table(sinkName), nBatches)
  }
}
