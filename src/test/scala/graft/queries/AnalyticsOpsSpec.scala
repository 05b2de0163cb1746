package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The AnalyticsOps queries' physical plans must be the scale plans the
  * Scaladoc claims — top-k via TakeOrderedAndProject (not a global sort),
  * the range join broadcasting the tiny side, semi/anti joins planned as
  * such — checked at sf0.001 (plans don't change with SF, only sizes do).
  */
class AnalyticsOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def plan(name: String): String = {
    val q = AnalyticsOps.qs.find(_.name == name).get
    q.fn(spark, dir).queryExecution.executedPlan.toString()
  }

  test("text_vocab_topk plans a partial top-k, not a global sort") {
    assert(plan("text_vocab_topk").contains("TakeOrderedAndProject"))
  }

  test("range join broadcasts the tier table; fact side does not shuffle") {
    val p = plan("j7_range_join_tiers")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only exchanges are the broadcast of the 4-row side and the
    // post-aggregation shuffle on the 4 tier keys
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("semi and anti joins are planned as semi/anti, not inner+dedup") {
    assert(plan("j5_semi_join").contains("LeftSemi"))
    assert(plan("j6_anti_join").contains("LeftAnti"))
  }

  test("hash sampling is a scan-level filter (no join, no aggregation)") {
    val p = plan("sample_hash_bucket")
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("custom top-k aggregator runs as partial+final aggregation") {
    val p = plan("agg_topk_custom")
    // the typed Aggregator must map-side combine (partial_topk3 upstream of
    // the exchange), shipping k rows per group instead of the group
    assert(p.toLowerCase.contains("partial_topk3"), p)
  }

  test("every analytics query returns rows at sf0.001") {
    AnalyticsOps.qs.foreach { q =>
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
