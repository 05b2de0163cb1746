package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming SCD2 machine must carry its OPEN version across
  * micro-batch boundaries (the time-split staging forces the second half
  * of every user's history into a later batch), close versions only at
  * genuine change points, and flush exactly one current version per user
  * on the sentinel — byte-identical to the batch window build.
  */
class Scd2StreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

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

  test("multi-batch stream equals the batch SCD2 build row-for-row") {
    val (streamed, nBatches) = EventStream.scd2MultiBatch(spark, dir)
    assert(nBatches >= 3, s"expected >=3 micro-batches, saw $nBatches")
    val batch = graft.SparkEntry.registry
      .find(_.name == "events_scd2_dimension").get.fn(spark, dir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed SCD2 differs from the batch build")
  }

  test("exactly one current version per user, intervals contiguous") {
    val (streamed, _) = EventStream.scd2MultiBatch(spark, dir)
    val df = streamed.cache()
    import org.apache.spark.sql.functions._
    val users = df.select("user_id").distinct().count()
    assert(df.where(col("is_current")).count() == users)
    // each non-current version's valid_to equals the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val gaps = df
      .withColumn("next_from", lead("valid_from_us", 1).over(w))
      .where(col("valid_to_us").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
      .count()
    assert(gaps == 0, "validity intervals are not contiguous")
    df.unpersist()
  }
}
