package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The HLL Aggregator's published error bound (stderr ≈ 1.04/√4096 ≈ 1.6%)
  * must hold across cardinality regimes incl. the linear-counting range,
  * and the estimate must be exactly invariant to partitioning (merge is
  * associative+commutative register max).
  */
class HllSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.udf.register("hll_distinct", udaf(Hll.hll))
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("estimate within 5% (3 stderr) across cardinality regimes") {
    Seq(100, 5000, 200000).foreach { n =>
      val regs = new Array[Byte](Hll.M)
      (0 until n).foreach(i => Hll.add(regs, s"value_$i"))
      val est = Hll.estimate(regs)
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
    }
  }

  test("merge of disjoint sketches equals the union sketch") {
    val a = new Array[Byte](Hll.M)
    val b = new Array[Byte](Hll.M)
    val u = new Array[Byte](Hll.M)
    (0 until 3000).foreach { i => Hll.add(a, s"a_$i"); Hll.add(u, s"a_$i") }
    (0 until 3000).foreach { i => Hll.add(b, s"b_$i"); Hll.add(u, s"b_$i") }
    val merged = Hll.hll.merge(a, b)
    assert(merged.toSeq == u.toSeq)
  }

  test("estimate is exactly invariant to partitioning") {
    import spark.implicits._
    val df = (0 until 50000).map(i => s"k_${i % 17000}").toDF("v")
    val one = df.repartition(1).agg(expr("hll_distinct(v)")).head().getLong(0)
    val many = df.repartition(13).agg(expr("hll_distinct(v)")).head().getLong(0)
    assert(one == many)
    assert(math.abs(one - 17000).toDouble / 17000 < 0.05, s"est=$one")
  }
}
