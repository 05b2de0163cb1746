package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming segment-dedup gate must (a) pick the min (doc_id,
  * seg_idx) within a micro-batch, (b) suppress re-arrivals in LATER
  * micro-batches through keyed state, and (c) actually process multiple
  * micro-batches (band staging + maxFilesPerTrigger).
  */
class DocStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("first-occurrence gate: within-batch min pick + cross-batch suppression") {
    import spark.implicits._
    // band 0: docs 3 and 7 share segment A (min pick → doc 3);
    // band 1: doc 100001 re-sends A (state suppression) and introduces B
    val segs = Seq(
      (7L, 0L, "seg A text", "hA"),
      (3L, 2L, "seg A text", "hA"),
      (3L, 0L, "seg C text", "hC"),
      (100001L, 0L, "seg A text", "hA"),
      (100001L, 1L, "seg B text", "hB"))
      .toDF("doc_id", "seg_idx", "seg", "seg_h")
    val (kept, nBatches) = DocStream.segmentDedup(spark, segs)
    assert(nBatches >= 2, s"expected >=2 micro-batches, saw $nBatches")
    val rows = kept.select("seg_h", "doc_id", "seg_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("hA", 3L, 2L), ("hC", 3L, 0L), ("hB", 100001L, 1L)),
      s"got $rows")
  }

  test("curation gate: repetition drop + cross-band segment suppression") {
    import spark.implicits._
    // doc 1 (band 0): clean 20-word text → 2 segments survive.
    // doc 2 (band 0): one phrase repeated 10× → dupf ≈ 1 → dropped whole.
    // doc 100001 (band 1): re-sends doc 1's first 10 words as its own
    //   opening segment → suppressed by the stateful gate; its distinct
    //   second segment survives.
    val w = (1 to 20).map(i => s"w$i").mkString(" ")
    val rep = Seq.fill(10)("spam spam").mkString(" ")
    val tail = (21 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "a", w),
      (2L, "a", rep),
      (100001L, "b", ((1 to 10).map(i => s"w$i") ++ tail.split(" ")).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val (kept, nBatches) = DocStream.curationGate(spark, docs)
    assert(nBatches >= 2, s"expected >=2 micro-batches, saw $nBatches")
    val rows = kept.select("doc_id", "seg_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 0L), (1L, 1L), (100001L, 1L)), s"got $rows")
  }

  test("ttl gate: suppression inside the horizon, re-admission after expiry") {
    import spark.implicits._
    val t0 = 1735689600L // epoch seconds
    def ts(offMin: Long) = new java.sql.Timestamp((t0 + offMin * 60) * 1000)
    // band 0: A and B first occurrences at t0.
    // band 1 (t0+10min): A re-sent INSIDE the 5-min horizon? No — horizon
    //   is 5 min, so by band 1 the watermark is still t0-1min (watermark
    //   trails one batch), state alive → suppressed.
    // band 2 (t0+40min): watermark = t0+9min > A's t0+5min horizon →
    //   evicted → this arrival is admitted as a new first occurrence.
    val segs = Seq(
      (1L, 0L, "seg A", "hA", ts(0)),
      (1L, 1L, "seg B", "hB", ts(0)),
      (100001L, 0L, "seg A", "hA", ts(10)),
      (100001L, 1L, "seg C", "hC", ts(10)),
      (200002L, 0L, "seg A", "hA", ts(40)))
      .toDF("doc_id", "seg_idx", "seg", "seg_h", "ts")
    val (kept, nBatches) = DocStream.segmentDedupTtl(spark, segs,
      ttlMillis = 5 * 60 * 1000L, delayThreshold = "1 minute")
    assert(nBatches >= 3, s"expected >=3 micro-batches, saw $nBatches")
    val rows = kept.select("seg_h", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("hA", 1L), ("hB", 1L), ("hC", 100001L), ("hA", 200002L)),
      s"got $rows")
  }

  test("stream survivor set equals the batch keepFirstOccurrence pick") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val segs = (1 to 300).map { i =>
      val doc = rnd.nextInt(3) * 100000L + rnd.nextInt(20)
      (doc, rnd.nextInt(50).toLong, s"seg ${rnd.nextInt(40)}")
    }.toDF("doc_id", "seg_idx", "seg")
      .withColumn("seg_h", md5(col("seg")))
      .dropDuplicates("doc_id", "seg_idx")
    val (kept, _) = DocStream.segmentDedup(spark, segs)
    val streamed = kept.select("seg_h", "doc_id", "seg_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Dedup.keepFirstOccurrence(segs)
      .select("seg_h", "doc_id", "seg_idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
