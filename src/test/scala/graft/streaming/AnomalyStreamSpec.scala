package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming anomaly gate must accumulate the per-type hour→count map
  * ACROSS micro-batches (even hours and odd hours arrive in different
  * batches here), flush only on the sentinel, and reproduce the batch
  * trailing-window semantics exactly: trailing frame = the PRESENT hours
  * among H−6..H−1, spike ⇔ cnt·n > 2·sum, rows only when ≥3 trailing
  * hours exist.
  */
class AnomalyStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("cross-batch accumulation matches a reference trailing-window computation") {
    import spark.implicits._
    // type "a": hour h occurs h+1 times for h in 0..9, except hour 5 is
    // missing entirely (gap ⇒ trailing frames shrink); hour 9 is a planted
    // 40× spike. type "b": flat 2/hour — never spikes.
    val evsA = (0 to 9).filter(_ != 5).flatMap(h =>
      Seq.fill(if (h == 9) 40 else h + 1)(("a", h.toLong)))
    val evsB = (0 to 9).flatMap(h => Seq.fill(2)(("b", h.toLong)))
    val df = (evsA ++ evsB).toDF("event_type", "hr")

    val (out, nBatches) = EventStream.anomalyMultiBatch(spark, df)
    assert(nBatches >= 3, s"expected >=3 micro-batches, saw $nBatches")

    // reference computation, straight from the definition
    val counts: Map[(String, Long), Long] =
      (evsA ++ evsB).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = counts.keys.toSeq.sorted.flatMap { case (t, h) =>
      val trail = (h - 6 to h - 1).flatMap(p => counts.get((t, p)))
      if (trail.size >= 3)
        Some((t, h, counts((t, h)), trail.sum, trail.size.toLong,
          counts((t, h)) * trail.size > trail.sum * 2))
      else None
    }
    val got = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // the planted spike fires; the flat series never does
    assert(got.exists { case (t, h, _, _, _, s) => t == "a" && h == 9 && s })
    assert(got.filter(_._1 == "b").forall(!_._6))
  }
}
