package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Co-located join via bucketed tables (the pre-shuffle strategy for
  * repeated large-scale joins: both sides bucketed on the join key write
  * once, then every join on that key runs shuffle-free), plus the
  * salting pattern for skewed aggregation keys. PLAN_r2 item 5.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = java.nio.file.Files.createTempDirectory("graft_wh")

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      // force sort-merge so only bucketing can remove the exchanges
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("bucketed-by-key tables join without a shuffle") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 97, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"dim_$i")).toDF("k", "name")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("facts_bucketed")
    dims.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("dims_bucketed")

    val joined = spark.table("facts_bucketed").join(spark.table("dims_bucketed"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() == 1000)

    // the unbucketed control DOES shuffle — proves the assertion has teeth
    val control = facts.join(dims, "k")
    assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("salted aggregation equals direct aggregation on a skewed key") {
    import spark.implicits._
    // 90% of rows share one key — the classic skew shape
    val skewed = (1L to 20000L)
      .map(i => (if (i % 10 == 0) s"k${i % 50}" else "hot", 1L))
      .toDF("k", "v")
    val direct = skewed.groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    // two-phase: spread the hot key over 16 salts, partial-agg, final-agg
    val salted = skewed
      .withColumn("salt", pmod(crc32(monotonically_increasing_id().cast("string")), lit(16)))
      .groupBy("k", "salt").agg(sum("v").as("ps"))
      .groupBy("k").agg(sum("ps").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(direct.sameElements(salted))
    assert(direct.find(_._1 == "hot").exists(_._2 == 18000L))
  }
}
