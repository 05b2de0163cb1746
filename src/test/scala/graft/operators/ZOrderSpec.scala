package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout invariants: bit interleave correctness, bucket lookup,
  * and — the point of the operator — per-file min/max spans that are tight
  * in BOTH dimensions simultaneously, where a plain sort is tight in one
  * and spans ~everything in the other.
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("interleaveBits matches a reference morton encoding") {
    import spark.implicits._
    def morton(x: Long, y: Long, bits: Int): Long = {
      var out = 0L
      for (b <- 0 until bits) {
        out |= ((x >> b) & 1L) << (2 * b)
        out |= ((y >> b) & 1L) << (2 * b + 1)
      }
      out
    }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L), (2748L, 1023L))
    val got = rows.toDF("x", "y")
      .withColumn("z", ZOrder.interleaveBits(Seq(col("x"), col("y"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 12), s"($x,$y)") }
  }

  test("bucketOf is the count of boundaries <= v") {
    val bounds = Array(1.0, 2.0, 2.0, 5.0)
    assert(ZOrder.bucketOf(bounds, 0.5) == 0)
    assert(ZOrder.bucketOf(bounds, 1.0) == 1)
    assert(ZOrder.bucketOf(bounds, 2.0) == 3)
    assert(ZOrder.bucketOf(bounds, 4.9) == 3)
    assert(ZOrder.bucketOf(bounds, 99.0) == 4)
  }

  test("z-clustered files have tight min/max spans in both dimensions") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val df = Seq.fill(40000)((rnd.nextInt(100000).toDouble,
      rnd.nextInt(100000).toDouble)).toDF("x", "y")

    def spans(clustered: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("zorder").toString
      clustered.write.mode("overwrite").parquet(dir)
      val byFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (byFile.getDouble(0), byFile.getDouble(1))
    }

    val (zx, zy) = spans(ZOrder.cluster(df, Seq("x", "y"), 16))
    val (sx, sy) = spans(df.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))

    // plain sort: x-span tiny, y-span ~ full range (~100000)
    assert(sx < 15000, s"sorted x span $sx")
    assert(sy > 70000, s"sorted y span $sy should be ~unpruned")
    // z-order: BOTH spans well below the full range. 16 files → ideal 4x4
    // grid span ~25000/dim; a z-curve segment can straddle two grid cells,
    // so ~2x ideal is the expected real-world quality — still a 2x+ read
    // reduction per dimension vs the unsorted ~100000.
    assert(zx < 50000, s"z-order x span $zx")
    assert(zy < 50000, s"z-order y span $zy")
  }
}
