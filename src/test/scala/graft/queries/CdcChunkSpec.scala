package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The property that makes content-defined chunking worth its name: a
  * LOCAL edit invalidates only the chunk(s) it touches, because
  * boundaries are a function of a short rolling window of content —
  * after the edit the boundary stream resynchronizes. A fixed-stride
  * chunker fails this (one inserted char shifts EVERY downstream chunk).
  */
class CdcChunkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def chunksOf(texts: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    import spark.implicits._
    PipelineOps2.cdcChunksOf(texts.toDF("doc_id", "text"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rows) => k -> rows.map(_.getString(1)).toSeq }
  }

  private def mkText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) {
      sb.append(('a' + rnd.nextInt(26)).toChar)
      if (rnd.nextInt(6) == 0) sb.append(' ')
    }
    sb.toString.take(n)
  }

  test("chunks concatenate back to the original text (lossless cover)") {
    val t = mkText(1, 3000)
    val cs = chunksOf(Seq(1L -> t))(1L)
    assert(cs.mkString("") === t)
    assert(cs.forall(_.nonEmpty))
  }

  test("a prefix insertion resynchronizes: most chunk hashes survive") {
    val t = mkText(2, 5000)
    val edited = "XY" + t // 2-char insertion at the front
    val orig = chunksOf(Seq(1L -> t))(1L).toSet
    val after = chunksOf(Seq(1L -> edited))(1L).toSet
    val shared = (orig intersect after).size
    // every chunk past the resync point is byte-identical; only the
    // chunk(s) containing the edit (plus the W-char resync span) differ
    assert(shared >= orig.size - 3,
      s"expected resync to preserve all but ~2 chunks: shared=$shared of ${orig.size}")
  }

  test("a mid-document edit only invalidates local chunks") {
    val t = mkText(3, 5000)
    val pos = 2500
    val edited = t.substring(0, pos) + "Q" + t.substring(pos)
    val orig = chunksOf(Seq(1L -> t))(1L).toSet
    val after = chunksOf(Seq(1L -> edited))(1L).toSet
    assert((orig intersect after).size >= orig.size - 3)
  }

  test("short documents (< window) become one whole-text chunk") {
    val cs = chunksOf(Seq(1L -> "abc"))
    assert(cs(1L) === Seq("abc"))
  }

  test("identical texts chunk identically across docs (the dedup signal)") {
    val t = mkText(4, 2000)
    val cs = chunksOf(Seq(1L -> t, 2L -> t))
    assert(cs(1L) === cs(2L))
  }
}
