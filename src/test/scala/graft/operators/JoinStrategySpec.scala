package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The LSH verify re-join must be size-conditional: broadcast only when the
  * corpus is provably small; above the threshold the plan must contain no
  * BroadcastExchange of the corpus (a 100 TB corpus cannot be broadcast).
  */
class JoinStrategySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      // disable size-based auto broadcast so only the explicit hint decides —
      // at test scale everything would otherwise auto-broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def corpus = {
    import spark.implicits._
    (1L to 100L).map(i => (i, s"doc $i text")).toDF("id", "text")
  }
  private def cand = {
    import spark.implicits._
    (1L to 50L).map(i => (i, i + 50)).toDF("a", "b")
  }

  test("fitsBroadcast decides by capped row probe") {
    assert(Dedup.fitsBroadcast(corpus, maxRows = 1000))
    assert(!Dedup.fitsBroadcast(corpus, maxRows = 10))
  }

  test("fitsBroadcast thresholds on bytes, not just rows") {
    // 2M rows of ~1 KB documents ≈ 2 GB — far past any broadcast limit even
    // though the row count is exactly at the default cap
    val longText = spark.range(2000000L)
      .select(col("id"), lit("x" * 1000).as("text"))
    assert(!Dedup.fitsBroadcast(longText),
      "a multi-GB corpus must not be declared broadcastable by row count alone")
    // the same 2M rows as bare ids are ~16 MB — fine to broadcast
    val ids = spark.range(2000000L).select(col("id"))
    assert(Dedup.fitsBroadcast(ids))
  }

  test("fitsBroadcast memoizes the probe per (session, plan, caps)") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"memo $i")).toDF("id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(Dedup.fitsBroadcast(df, maxRows = 1000))
    val afterFirst = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // an identical frame (same canonicalized plan) must not launch a new job
    val df2 = (1L to 500L).map(i => (i, s"memo $i")).toDF("id", "text")
    assert(Dedup.fitsBroadcast(df2, maxRows = 1000))
    val afterSecond = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(afterFirst > before, "first probe should run a job")
    assert(afterSecond == afterFirst,
      "repeat probe on the same plan+caps must be answered from the memo")
    // a different cap is a different decision — re-probed, not served stale
    assert(!Dedup.fitsBroadcast(df, maxRows = 100))
  }

  test("keepFirstOccurrence picks the global (doc_id, seg_idx) minimum past 1000 segments") {
    import spark.implicits._
    // doc 1 has 1500 segments; the shared segment sits at (1, 1200).
    // Rank arithmetic doc_id*1000+seg_idx gives 2200 for it vs 2000 for
    // (2, 0) — the overflow would mis-pick doc 2's copy as survivor.
    val segs = ((0 until 1500).map(i => (1L, i.toLong, if (i == 1200) "dup" else s"seg$i"))
      :+ (2L, 0L, "dup"))
      .toDF("doc_id", "seg_idx", "seg")
      .withColumn("seg_h", md5(col("seg")))
    val kept = Dedup.keepFirstOccurrence(segs)
    assert(kept.count() == 1500, "one of the two 'dup' copies must drop")
    val survivor = kept.where(col("seg") === "dup")
      .select("doc_id", "seg_idx").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(survivor.sameElements(Array((1L, 1200L))),
      s"survivor must be the global first occurrence (1,1200), got ${survivor.mkString}")
  }

  test("large corpus: no BroadcastExchange; small corpus: broadcast; same rows") {
    def plan(small: Boolean) = cand
      .join(Dedup.hintIf(corpus.select(col("id").as("a"), col("text").as("ta")), small), "a")
      .join(Dedup.hintIf(corpus.select(col("id").as("b"), col("text").as("tb")), small), "b")
    val big = plan(small = false)
    val bigPhysical = big.queryExecution.executedPlan.toString
    assert(!bigPhysical.contains("BroadcastExchange"),
      s"large-corpus variant must not broadcast the corpus:\n$bigPhysical")
    val sm = plan(small = true)
    assert(sm.queryExecution.executedPlan.toString.contains("BroadcastExchange"))
    // both strategies return identical results
    val r1 = big.orderBy("a", "b").collect().map(_.toSeq)
    val r2 = sm.orderBy("a", "b").collect().map(_.toSeq)
    assert(r1.sameElements(r2))
  }

  test("bucketed co-located join has no exchange under the sort-merge join") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bkt_spec")
    base.toFile.deleteOnExit()
    (1L to 200L).map(i => (i % 40, i, i * 2.0)).toDF("k", "x", "v")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "k").sortBy("k")
      .option("path", s"$base/l").saveAsTable("graft_spec_bkt_l")
    (0L until 40L).map(i => (i, s"dim$i")).toDF("k", "name")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "k").sortBy("k")
      .option("path", s"$base/r").saveAsTable("graft_spec_bkt_r")
    val j = spark.table("graft_spec_bkt_l").hint("merge")
      .join(spark.table("graft_spec_bkt_r"), "k")
    val smj = j.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(smj.nonEmpty, "expected a sort-merge join")
    val exchanges = smj.get.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join must read pre-clustered buckets with no shuffle:\n${smj.get}")
    assert(j.count() == 200)
  }
}
