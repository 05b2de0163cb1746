package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** graph_kcore's fixed 8-round unroll must actually BE the k-core: the
  * spec drives the parameterized peel to its fixpoint and asserts (a) one
  * extra round changes nothing, (b) every surviving node's degree within
  * the surviving subgraph is >= k, (c) maximality — no peeled node could
  * rejoin (its degree among survivors is < k).
  */
class KCoreSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def edges(): Set[(Long, Long)] = {
    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("k=60 peel reaches its fixpoint within 8 rounds and is the true core") {
    val k = 60
    val r8 = GraphOps.kcore(spark, dir, k, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val r9 = GraphOps.kcore(spark, dir, k, rounds = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r8 == r9, "one extra peel round must be a no-op at the fixpoint")
    assert(r8.nonEmpty)
    assert(r8.values.forall(_ >= k), "every core member keeps degree >= k")

    // driver-side reference peel to fixpoint
    var e = edges()
    var changed = true
    while (changed) {
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter { case (u, v) => keep(u) && keep(v) }
      changed = e2 != e
      e = e2
    }
    val refDeg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(r8 == refDeg, "8-round unroll equals the reference fixpoint peel")

    // maximality: every peeled node has < k neighbors among survivors
    val survivors = r8.keySet
    val all = edges()
    val peeled = (all.toSeq.flatMap(p => Seq(p._1, p._2)).toSet -- survivors)
    for (n <- peeled) {
      val dIn = all.count { case (u, v) =>
        (u == n && survivors(v)) || (v == n && survivors(u)) }
      assert(dIn < k, s"peeled node $n could rejoin with $dIn core neighbors")
    }
  }

  test("k=80 collapses the sf0.001 graph to the empty core") {
    assert(GraphOps.kcore(spark, dir, 80, rounds = 8).count() == 0L)
  }
}
