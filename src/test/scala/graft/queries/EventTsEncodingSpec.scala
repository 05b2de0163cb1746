package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 regression: the driver's events.parquet changed physical `ts`
  * encoding from TIMESTAMP(NANOS) to TIMESTAMP_MICROS isAdjustedToUTC=0,
  * which Spark reads as TIMESTAMP_NTZ — and every event-time op
  * (withWatermark, window, session_window, unix_micros) failed analysis.
  * T.normTs must normalize ALL encodings the driver has ever shipped to a
  * microsecond TimestampType with identical epoch-µs values under the UTC
  * session, and event-time queries must analyze and run over each.
  */
class EventTsEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  // one event per hour across 3 hours, exact epoch-µs anchors
  private val baseUs = 1700000000000000L // 2023-11-14 22:13:20 UTC
  private def rowsUs: Seq[(Long, Long)] =
    (0 until 6).map(i => (i.toLong, baseUs + i * 1800L * 1000000L))

  private def runEventTimeOps(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("ts").dataType == TimestampType,
      s"normTs must yield TimestampType, got ${df.schema("ts").dataType}")
    // window agg (the hourly-rollup shape)
    val win = df.groupBy(window(col("ts"), "1 hour")).count().collect()
    assert(win.map(_.getLong(1)).sum == 6)
    // watermark (the streaming shape — type-checked at analysis in batch too)
    val wm = df.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).count().collect()
    assert(wm.map(_.getLong(1)).sum == 6)
    // exact epoch-µs arithmetic must be preserved
    val got = df.select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == rowsUs.map(_._2).sorted)
  }

  test("NTZ-µs parquet fixture (the round-7 driver encoding) normalizes and runs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ntz_fix").toString
    rowsUs.toDF("event_id", "us")
      .select(col("event_id"),
        expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(dir)
    // force the NTZ read path regardless of session inference flags —
    // exactly what an un-pinned session sees on the driver's current files
    val raw = spark.read.schema("event_id LONG, ts TIMESTAMP_NTZ").parquet(dir)
    assert(raw.schema("ts").dataType == TimestampNTZType)
    runEventTimeOps(T.normTs(raw))
  }

  test("NANOS-as-long fixture (the pre-round-7 encoding) normalizes and runs") {
    import spark.implicits._
    // nanosAsLong=true reads TIMESTAMP(NANOS) as a nanosecond LONG — emulate
    // that reader output directly (Spark cannot write NANOS parquet)
    val raw = rowsUs.map { case (id, us) => (id, us * 1000L) }.toDF("event_id", "ts")
    runEventTimeOps(T.normTs(raw))
  }

  test("already-LTZ timestamps pass through unchanged") {
    import spark.implicits._
    val raw = rowsUs.toDF("event_id", "us")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"))
    runEventTimeOps(T.normTs(raw))
  }

  test("T.events on the driver's real testdata yields event-time-ready ts") {
    val ev = T.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    val n = ev.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).count().collect()
    assert(n.nonEmpty)
  }
}
