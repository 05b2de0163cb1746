package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-resume semantics: a stopped AvailableNow stream restarted
  * against the SAME checkpoint must process only files that arrived since
  * the last run — the exactly-once property a production file feed relies
  * on across restarts/redeploys.
  */
class StreamResumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("restart from checkpoint processes only newly arrived files") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val n = batch.count()

    val src = Files.createTempDirectory("graft_resume_src")
    val out = Files.createTempDirectory("graft_resume_out").toString
    val ckpt = Files.createTempDirectory("graft_resume_ckpt").toString
    Seq(src).foreach(_.toFile.deleteOnExit())

    def drain(): Unit = {
      val raw = spark.readStream.schema(batch.schema).parquet(src.toString)
      val q = raw.select("event_id").writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: one file
    Files.copy(Paths.get(s"$dir/events.parquet"),
      src.resolve("a_events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    drain()
    assert(spark.read.parquet(out).count() == n)

    // run 2, same checkpoint: a second file arrives — only IT is processed
    Files.copy(Paths.get(s"$dir/events.parquet"),
      src.resolve("b_events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    drain()
    val after = spark.read.parquet(out)
    assert(after.count() == 2 * n,
      "the resumed stream must append exactly the new file, not reprocess A")
    // every event id appears exactly twice (once per delivered file)
    val bad = after.groupBy("event_id").count()
      .where(col("count") =!= 2).count()
    assert(bad == 0)

    // run 3, same checkpoint, nothing new: a no-op
    drain()
    assert(spark.read.parquet(out).count() == 2 * n)
  }
}
