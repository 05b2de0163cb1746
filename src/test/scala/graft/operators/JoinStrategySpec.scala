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
