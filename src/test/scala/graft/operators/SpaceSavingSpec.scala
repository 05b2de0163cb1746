package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving guarantees: items with frequency > N/m are always present,
  * reported counts bracket true counts (true <= reported <= true + err),
  * and merging partitioned sketches preserves both — plus an end-to-end
  * Spark aggregation recovering planted zipf heavy hitters.
  */
class SpaceSavingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def zipfStream(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      val r = rnd.nextDouble()
      if (r < 0.3) "hh0" else if (r < 0.5) "hh1" else if (r < 0.6) "hh2"
      else s"tail${rnd.nextInt(5000)}"
    }
  }

  test("guarantee: freq > N/m items present, counts bracketed") {
    val data = zipfStream(100000, 1)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = new SpaceSaving.SSketch(64)
    data.foreach(sk.add(_))
    val reported = sk.top(64).map(t => t._1 -> ((t._2, t._3))).toMap
    val threshold = data.size / 64
    truth.filter(_._2 > threshold).foreach { case (item, f) =>
      assert(reported.contains(item), s"$item freq=$f > N/m=$threshold missing")
    }
    reported.foreach { case (item, (cnt, err)) =>
      val t = truth.getOrElse(item, 0L)
      assert(t <= cnt && cnt <= t + err + 1, s"$item true=$t cnt=$cnt err=$err")
    }
  }

  test("merged partition sketches keep the guarantee") {
    val data = zipfStream(80000, 2)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merged = data.grouped(7919).map { part =>
      val s = new SpaceSaving.SSketch(64); part.foreach(s.add(_)); s
    }.reduce(_.merge(_))
    val reported = merged.top(64).map(t => t._1 -> t._2).toMap
    Seq("hh0", "hh1", "hh2").foreach { hh =>
      assert(reported.contains(hh))
      assert(reported(hh) >= truth(hh), s"$hh merged count underestimates")
    }
  }

  test("spark end-to-end recovers the planted heavy hitters in order") {
    import spark.implicits._
    spark.udf.register("ss_topk", udaf(SpaceSaving.agg(m = 128, k = 3)))
    val df = zipfStream(60000, 3).toDF("item")
    val top = df.agg(expr("ss_topk(item)").as("top")).head()
      .getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(top == Seq("hh0", "hh1", "hh2"), top.toString)
  }
}
