package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("pq search recall vs brute force, with exact reranked scores") {
    val e = emb
    val model = ProductQuantizer.train(spark, e, m = 8, k = 16, iters = 3)
    assert(model.dsub == 8)
    assert(model.codebooks.length == 8 && model.codebooks.forall(_.length == 16))

    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val pq = ProductQuantizer.search(spark, e, qids, model, topK = 10, rerank = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(3)) }

    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val truth = qids.map { q =>
      val qv = all(q)
      q -> all.toSeq.sortBy { case (_, v) => IvfIndex.cosineDist(qv, v) }
        .take(10).map(_._1).toSet
    }.toMap

    val recalls = qids.map { q =>
      (pq(q).map(_.getLong(1)).toSet & truth(q)).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean (per-query: $recalls)")
    // rerank is exact: self at rank 1 with cosine 1.0
    qids.foreach { q =>
      val first = pq(q).head
      assert(first.getLong(1) == q)
      assert(first.getDouble(2) == 1.0)
    }
    // reranked scores are true cosines, descending within each query
    pq.values.foreach { rs =>
      val scores = rs.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("codes are in range and the index is m ints per row") {
    val model = ProductQuantizer.train(spark, emb, m = 8, k = 16, iters = 2)
    val codes = ProductQuantizer.encode(spark, emb, model).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("ivf-pq composed search: recall vs brute force, self at rank 1") {
    val e = emb
    val ivf = IvfIndex.train(spark, e, k = 8, iters = 3)
    val pq = ProductQuantizer.train(spark, e, m = 8, k = 16, iters = 3)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val got = IvfPq.search(spark, e, qids, ivf, pq, nprobe = 3, topK = 10, rerank = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(3)) }

    val all = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val truth = qids.map { q =>
      val qv = all(q)
      q -> all.toSeq.sortBy { case (_, v) => IvfIndex.cosineDist(qv, v) }
        .take(10).map(_._1).toSet
    }.toMap
    val recalls = qids.map(q => (got(q).map(_.getLong(1)).toSet & truth(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    // two pruning levers stack (nprobe misses ∪ PQ candidate misses); the
    // exact rerank restores ordering among survivors
    assert(mean >= 0.4, s"mean recall $mean (per-query: $recalls)")
    qids.foreach { q =>
      val first = got(q).head
      assert(first.getLong(1) == q && first.getDouble(2) == 1.0)
    }
  }

  test("training and search are deterministic") {
    val a = ProductQuantizer.train(spark, emb, m = 4, k = 8, iters = 2)
    val b = ProductQuantizer.train(spark, emb, m = 4, k = 8, iters = 2)
    def deep(m: ProductQuantizer.PQModel) =
      m.codebooks.map(_.map(_.toVector).toVector).toVector
    assert(deep(a) == deep(b))
    val s1 = ProductQuantizer.search(spark, emb, Seq(0L, 1L), a, topK = 5).collect()
    val s2 = ProductQuantizer.search(spark, emb, Seq(0L, 1L), b, topK = 5).collect()
    assert(s1.sameElements(s2))
  }
}
