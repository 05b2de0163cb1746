package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star CC vs an in-memory union-find ground truth on
  * random graphs, chains (worst case for label propagation), and edge
  * cases.
  */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val got = ConnectedComponents
      .components(spark, edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(edges)
    assert(got == want, s"mismatch: extra=${got.toSet -- want.toSet} missing=${want.toSet -- got.toSet}")
  }

  test("random sparse graph matches union-find") {
    val rnd = new scala.util.Random(11)
    check(Seq.fill(3000)((rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
      .filter(e => e._1 != e._2))
  }

  test("long chains (propagation worst case)") {
    // 20 chains of length 200 sharing no nodes
    val edges = for (c <- 0 until 20; i <- 0 until 199)
      yield (c * 1000L + i, c * 1000L + i + 1)
    check(edges)
  }

  test("two cliques bridged by one edge merge into one component") {
    val a = for (i <- 0L until 30L; j <- (i + 1) until 30L) yield (i, j)
    val b = for (i <- 100L until 130L; j <- (i + 1) until 130L) yield (i, j)
    check(a ++ b ++ Seq((29L, 100L)))
  }

  test("duplicate/reversed/self edges and singleton-free inputs") {
    check(Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 3L), (7L, 9L), (9L, 7L)))
  }
}
