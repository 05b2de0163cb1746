package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Quantile sketch invariants: bounded rank error across distributions,
  * merge correctness (partition-count invariance of the BOUND, not the
  * exact value), and bounded buffer growth.
  */
class QuantileSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  /** Rank of v in sorted data (fraction of elements < v). */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  private def checkErr(data: Array[Double], label: String): Unit = {
    val sk = new QuantileSketch.QSketch(QuantileSketch.DefaultK)
    data.foreach(sk.insert)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = sk.quantile(q)
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.02, f"$label q=$q rank err $err%.4f")
    }
  }

  test("rank error <= 2% on uniform, zipf-ish, and presorted inputs") {
    val rnd = new scala.util.Random(42)
    checkErr(Array.fill(200000)(rnd.nextDouble()), "uniform")
    checkErr(Array.fill(200000)(math.pow(rnd.nextDouble(), 8) * 1e6), "zipf-ish")
    checkErr(Array.tabulate(200000)(_.toDouble), "presorted")
  }

  test("merged sketches keep the bound (distributed partial+final)") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(120000)(rnd.nextGaussian() * 100)
    val parts = data.grouped(9173).toSeq
    val merged = parts.map { p =>
      val s = new QuantileSketch.QSketch(QuantileSketch.DefaultK)
      p.foreach(s.insert); s
    }.reduce(_.merge(_))
    val sorted = data.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val err = math.abs(rankOf(sorted, merged.quantile(q)) - q)
      assert(err <= 0.02, f"q=$q err $err%.4f")
    }
    assert(merged.count == data.length.toLong)
  }

  test("buffer stays O(k log(n/k)): <= 16k doubles at n=1M") {
    val sk = new QuantileSketch.QSketch(QuantileSketch.DefaultK)
    var i = 0
    while (i < 1000000) { sk.insert((i * 2654435761L % 1000003).toDouble); i += 1 }
    val held = sk.levels.map(_.length).sum + sk.n0
    assert(held <= 16 * QuantileSketch.DefaultK, s"buffer held $held values")
  }

  test("spark aggregation end-to-end matches exact percentiles within 2%") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(80000)((rnd.nextInt(5), rnd.nextDouble() * 1000)).toDF("g", "v")
    spark.udf.register("approx_q",
      udaf(QuantileSketch.agg(Array(0.1, 0.5, 0.9))))
    val got = df.groupBy("g").agg(expr("approx_q(v)").as("qs")).orderBy("g")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val exact = df.groupBy("g")
      .agg(expr("percentile(v, array(0.1, 0.5, 0.9))").as("qs")).orderBy("g")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    got.zip(exact).foreach { case ((g1, est), (g2, ex)) =>
      assert(g1 == g2)
      est.zip(ex).foreach { case (e, x) =>
        assert(math.abs(e - x) <= 1000 * 0.03, s"group $g1: est $e exact $x")
      }
    }
  }
}
