package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract of the SemDeDup-style semantic dedup (dedup_semantic /
  * dedup_semantic_checked): the within-cluster pair search is EXHAUSTIVE —
  * against a brute-force all-pairs sweep it finds exactly the qualifying
  * pairs whose two vectors share a k-means cluster (misses are the
  * documented cross-cluster recall trade, never a within-cluster false
  * negative) — and the survivor pick keeps exactly one representative (the
  * component minimum) per semantic group.
  */
class SemanticDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("within-cluster pairs equal the same-cluster slice of brute force") {
    val (model, assigned, pairsDf) = DedupQueries.semanticScaffold(spark, dir)
    val found = pairsDf.select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: FULL all-pairs sweep (spec-only cross join), flagged by
    // whether the two vectors land in the same cluster
    graft.engine.Expressions.register(spark)
    val x = assigned.select(col("vec_id").as("a"), col("cluster").as("ca"),
      col("ve").as("va"))
    val y = assigned.select(col("vec_id").as("b"), col("cluster").as("cb"),
      col("ve").as("vb"))
    val all = x.crossJoin(y).where(col("a") < col("b"))
      .withColumn("cos", round(expr("vec_cosine_native(va, vb)"), 6))
      .where(col("cos") >= 0.9)
      .select(col("a"), col("b"), (col("ca") === col("cb")).as("same"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val sameCluster = all.filter(_._3).map(t => (t._1, t._2)).toSet
    assert(sameCluster.nonEmpty, "corpus must contain same-cluster duplicates")
    assert(found === sameCluster)
    // the planted +0.05 copies guarantee qualifying pairs exist at all
    assert(all.nonEmpty)
    assert(model.centroids.length >= 8)
  }

  test("survivor pick: one representative (the component min) per group") {
    val out = DedupQueries.qs.find(_.name == "dedup_semantic").get
      .fn(spark, dir).collect()
    assert(out.nonEmpty)
    val reps = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    out.foreach { r =>
      val (id, rep, keep) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(rep <= id, s"representative $rep must be the group min, got vs $id")
      assert(keep === (id == rep))
      assert(reps.contains(rep), s"group rep $rep must itself be kept")
    }
  }

  test("checked twin: counts match the table and every contract boolean holds") {
    val row = DedupQueries.qs.find(_.name == "dedup_semantic_checked").get
      .fn(spark, dir).head()
    val nEmb = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(row.getLong(0) == 2 * nEmb) // n_input
    assert(row.getLong(1) > 0)         // n_planted_ge_t
    for (i <- 2 to 5) assert(row.getBoolean(i), s"contract boolean $i false: $row")
  }

  test("kFor holds expected occupancy: floor 8, linear middle, 2^12 plan-size cap") {
    import graft.operators.IvfIndex.kFor
    assert(kFor(0) == 8 && kFor(10000) == 8)
    assert(kFor(1 << 20) == (1 << 20) / 2048)
    // capped where the plan-embedded centroid matrix stops being small
    assert(kFor(1L << 40) == (1 << 12))
    val ns = Seq(1L, 100L, 1L << 14, 1L << 21, 1L << 30, 1L << 45)
    assert(ns.map(kFor) == ns.map(kFor).sorted)
  }
}
