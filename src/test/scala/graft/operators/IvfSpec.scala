package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class IvfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))

  test("ivf search recall vs brute force") {
    val e = emb
    val model = IvfIndex.train(spark, e, k = 8, iters = 3)
    assert(model.centroids.length == 8)
    assert(model.centroids.forall(_.length == 64))

    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val ivf = IvfIndex.search(spark, e, qids, model, nprobe = 3, topK = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // brute force ground truth
    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val truth = qids.map { q =>
      val qv = all(q)
      q -> all.toSeq.sortBy { case (_, v) => IvfIndex.cosineDist(qv, v) }
        .take(10).map(_._1).toSet
    }.toMap

    val recalls = qids.map(q => (ivf(q) & truth(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean (per-query: $recalls)")
    // self is always found at rank 1
    ivf.foreach { case (q, ns) => assert(ns.contains(q)) }
  }

  test("training is deterministic") {
    val a = IvfIndex.train(spark, emb, k = 4, iters = 2).centroids
    val b = IvfIndex.train(spark, emb, k = 4, iters = 2).centroids
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("seeding survives sparse/clustered ids") {
    // every id ≡ 1 (mod large stride): the evenly-spaced pmod pick finds
    // NOTHING, so without the md5-order top-up the seed count lands at 0
    // (or < k) and training degenerates. ids are non-contiguous AND all
    // miss the stride lattice.
    val sparse = emb.withColumn("id", col("id") * 1000 + 1)
    val m = IvfIndex.train(spark, sparse, k = 8, iters = 2)
    assert(m.centroids.length == 8)
    assert(m.centroids.forall(_.length == 64))
    // all k seeds must be DISTINCT vectors (top-up must not duplicate)
    assert(m.centroids.map(_.toSeq).distinct.length == 8)
    // determinism holds on the top-up path too
    val m2 = IvfIndex.train(spark, sparse, k = 8, iters = 2)
    assert(m.centroids.zip(m2.centroids).forall { case (x, y) => x.sameElements(y) })
    // fewer rows than k: train yields one centroid per row, no crash
    val tiny = emb.limit(5)
    val mt = IvfIndex.train(spark, tiny, k = 8, iters = 1)
    assert(mt.centroids.length == 5)
  }
}
