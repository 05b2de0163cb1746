package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the PipelineOps family (RFM, ratio-to-report, concurrency
  * sweep, churn labels, JSON quarantine, entropy, chi2 keywords, trigram
  * mining) that hold for ANY corpus — structural properties the DuckDB
  * value-compare can't state.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

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

  private def q(name: String) =
    graft.SparkEntry.registry.find(_.name == name).get.fn(spark, dir)

  test("rfm: quartiles balanced within 1 and every score in 1..4") {
    val df = q("customer_rfm_segments").cache()
    for (c <- Seq("r_q", "f_q", "m_q")) {
      val sizes = df.groupBy(c).count().collect().map(_.getAs[Long]("count"))
      assert(sizes.length == 4, s"$c must have exactly 4 quartiles")
      assert(sizes.max - sizes.min <= 1, s"$c sizes ${sizes.toSeq} not ntile-balanced")
    }
    assert(df.where(col("r_q") < 1 || col("r_q") > 4).count() == 0)
    df.unpersist()
  }

  test("share ratio: shares within each flag sum to 1 exactly") {
    // each flag's shares are cents_i / total — the exact-rational sum is 1;
    // the IEEE double sum of the shares lands within 1 ulp-ish of 1.0
    val rows = q("sales_share_ratio")
      .groupBy("l_returnflag").agg(sum("share_in_flag").as("s")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-12,
        s"flag ${r.get(0)} shares sum ${r.getAs[Double]("s")}")
    }
  }

  test("concurrency peak: >=1, and first peak instant inside its day") {
    val df = q("events_concurrency_peak").cache()
    assert(df.where(col("peak_concurrency") < 1).count() == 0)
    val bad = df.where(
      col("first_peak_us") < expr("unix_micros(CAST(CAST(day AS DATE) AS TIMESTAMP))") ||
      col("first_peak_us") >= expr("unix_micros(CAST(CAST(day AS DATE) AS TIMESTAMP)) + 86400000000L"))
      .count()
    assert(bad == 0, "peak instant outside its day partition")
    df.unpersist()
  }

  test("churn labels: one row per user, horizon user never churned") {
    val df = q("events_churn_labels").cache()
    val users = graft.queries.T.events(spark, dir)
      .select("user_id").distinct().count()
    assert(df.count() == users)
    // the user holding the global max timestamp is by construction active
    val maxUs = df.agg(max("last_us")).head().getLong(0)
    assert(df.where(col("last_us") === maxUs && col("churned") === 1L).count() == 0)
    df.unpersist()
  }

  test("json quarantine: corrupt bucket matches the 1-in-53 plan; totals conserve") {
    val df = q("json_ingest_quarantine").cache()
    val docs = T(spark, dir, "documents")
    val expectedBad = docs.where(expr("doc_id % 53 = 0")).count()
    val gotBad = df.where(col("source") === "_corrupt")
      .agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
    assert(gotBad == expectedBad)
    assert(df.agg(sum("n")).head().getLong(0) == docs.count())
    df.unpersist()
  }

  test("entropy: 0 <= H <= ln(vocab), ttr in (0, 1]") {
    val bad = q("stats_entropy_per_source")
      .where(col("entropy_nats") < 0.0 ||
        col("entropy_nats") > expr("ln(CAST(n_vocab AS DOUBLE)) + 1e-6") ||
        col("ttr") <= 0.0 || col("ttr") > 1.0)
      .count()
    assert(bad == 0, "entropy outside [0, ln |V|] or ttr outside (0,1]")
  }

  test("chi2 keywords: 3 per source, positive statistic, token over-represented") {
    val df = q("text_keyword_chi2").cache()
    val perSource = df.groupBy("source").count().collect()
    assert(perSource.forall(_.getAs[Long]("count") == 3))
    assert(df.where(col("chi2") <= 0.0).count() == 0)
    df.unpersist()
  }

  test("abtest: variants partition the users; z sign matches the lift sign") {
    val r = q("events_abtest_lift").head()
    val users = graft.queries.T.events(spark, dir)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n0") + r.getAs[Long]("n1") == users)
    val z = r.getAs[Double]("z_score"); val lift = r.getAs[Long]("lift_bp")
    assert(z.sign == lift.toDouble.sign || lift == 0L)
  }

  test("jsd: bounded by [0, ln 2] for every source") {
    val bad = q("text_js_divergence")
      .where(col("jsd_nats") < 0.0 || col("jsd_nats") > math.log(2.0) + 1e-6)
      .count()
    assert(bad == 0, "JSD outside [0, ln 2]")
  }

  test("gini: in [0, 10000) basis points") {
    val g = q("stats_gini_activity").head().getAs[Long]("gini_bp")
    assert(g >= 0L && g < 10000L, s"gini_bp $g out of range")
  }

  test("drift report: halves partition the corpus per label") {
    val df = q("embedding_drift_report").cache()
    val total = df.agg(sum(col("n_even") + col("n_odd"))).head().getLong(0)
    assert(total == T(spark, dir, "embeddings").count())
    assert(df.where(col("centroid_shift") < 0.0).count() == 0)
    df.unpersist()
  }

  test("cusum: changepoint hour exists in the series; direction matches sign") {
    val df = q("stats_cusum_changepoint").cache()
    assert(df.count() == 5)
    val bad = df.where(
      (col("cusum_scaled") > 0 && col("direction") =!= "up") ||
      (col("cusum_scaled") < 0 && col("direction") =!= "down")).count()
    assert(bad == 0)
    df.unpersist()
  }

  test("lateness audit: bucket counts conserve the event count") {
    val n = q("events_lateness_audit").agg(sum("n")).head().getLong(0)
    assert(n == graft.queries.T.events(spark, dir).count())
  }

  test("trigrams: counts conserve against the raw sequence length") {
    val df = q("events_sequence_trigrams")
    assert(df.count() <= 10)
    // total trigram instances across ALL types = sum over users of max(n_u - 2, 0)
    val ev = graft.queries.T.events(spark, dir)
    val expectedTotal = ev.groupBy("user_id").count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).head().getLong(0)
    val topSum = df.agg(sum("n")).head().getLong(0)
    assert(topSum <= expectedTotal)
    assert(df.where(col("n") <= 0).count() == 0)
  }
}
