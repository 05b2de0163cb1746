package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE training must reproduce a straightforward in-memory
  * reference implementation of the published algorithm exactly (same
  * pair counts, same deterministic tie-break, same merge order).
  */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  /** In-memory reference: Sennrich-style training on a word-freq dict. */
  private def referenceTrain(corpus: Seq[String], merges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = corpus
      .flatMap(_.split(" +")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toList :+ BpeTrain.EndMark) -> ws.size.toLong
      }
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }._1
        rules += ((a, b))
        vocab = vocab.map { case (syms, f) =>
          BpeTrain.fusePair(syms, a, b).toList -> f
        }
      }
    }
    rules.toSeq
  }

  test("fusePair merges left-to-right without overlap") {
    assert(BpeTrain.fusePair(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeTrain.fusePair(Seq("x", "y", "x", "y"), "x", "y") == Seq("xy", "xy"))
    assert(BpeTrain.fusePair(Seq("q"), "a", "b") == Seq("q"))
  }

  test("distributed training matches the reference implementation") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low", "lower lower", "newest newest newest newest newest newest",
      "widest widest widest", "new new nap nap nap")
    val got = BpeTrain.train(spark, corpus.toDF("text"), "text", 8)
    val want = referenceTrain(corpus, 8)
    assert(got == want, s"got=$got want=$want")
  }

  test("training survives words that merge down to a single symbol") {
    import spark.implicits._
    // At 12 merges "low</w>" (freq 5) fuses completely; the pair count must
    // skip collapsed words rather than throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    val corpus = Seq(
      "low low low low low", "lower lower", "newest newest newest newest newest newest",
      "widest widest widest", "new new nap nap nap")
    val got = BpeTrain.train(spark, corpus.toDF("text"), "text", 12)
    val want = referenceTrain(corpus, 12)
    assert(got == want, s"got=$got want=$want")
  }

  test("training on real docs is deterministic across runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = BpeTrain.train(spark, docs, "text", 5)
    val b = BpeTrain.train(spark, docs, "text", 5)
    assert(a == b && a.length == 5)
  }
}
