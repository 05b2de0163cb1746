package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streamed per-cell rollup must equal the batch twin EXACTLY — same
  * cells, same counts, same decimal-summed values — because the map side is
  * the same codegen expression and the aggregate is decimal (order-proof).
  */
class GeoStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // events.parquet is TIMESTAMP(NANOS) — readable only as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("streamed H3 point rollup equals the batch twin exactly") {
    val dir = "/root/testdata/sf0.001"
    val streamed = GeoStream.pointsRollupStream(spark, dir, 6).collect()
    val batch = GeoStream.pointsRollupBatch(spark, dir, 6).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s1, b1) =>
      assert(s1.toString == b1.toString)
    }
  }

  test("streamed hourly HLL distinct-users equals the batch twin exactly") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.hourlyDistinctUsers(spark, dir).collect()
    val batch = EventStream.hourlyDistinctUsers(spark, dir, streaming = false).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    // register-max merge is partition/batch invariant → identical estimates
    streamed.zip(batch).foreach { case (s1, b1) =>
      assert(s1.toString == b1.toString)
    }
  }

  test("streamed GeoJSON ingest equals its batch twin and the parquet stream") {
    val dir = "/root/testdata/sf0.001"
    val streamed = GeoStream.geojsonPointsRollupStream(spark, dir, 6).collect()
    val batch = GeoStream.geojsonPointsRollupStream(spark, dir, 6,
      streaming = false).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (s1, b1) => assert(s1.toString == b1.toString) }
    // and the GeoJSON round-trip preserves the rollup of the parquet path
    val viaParquet = GeoStream.pointsRollupBatch(spark, dir, 6).collect()
    assert(streamed.length == viaParquet.length)
    streamed.zip(viaParquet).foreach { case (s1, p1) =>
      assert(s1.toString == p1.toString)
    }
  }

  test("streamed hourly KLL quantiles equal the batch twin at sub-buffer scale") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.hourlyValueQuantiles(spark, dir).collect()
    val batch = EventStream.hourlyValueQuantiles(spark, dir, streaming = false).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    // each hourly window holds far fewer values than the sketch buffer, so
    // no compaction fires and both paths return EXACT quantiles
    streamed.zip(batch).foreach { case (s1, b1) =>
      assert(s1.toString == b1.toString)
    }
  }
}
