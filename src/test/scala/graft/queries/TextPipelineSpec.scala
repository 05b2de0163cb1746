package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-5 pipeline queries that the DuckDB oracle can't
  * express directly: the packing query's two-phase prefix scan must equal
  * the naive single-window form, and packing must conserve tokens.
  */
class TextPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("two-phase packing cumsum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val packed = SparkEntryHelper.run("text_pack_sequences", spark, dir)
    val naive = T(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " +")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("doc_id")
    val a = packed.select("doc_id", "n_tokens", "cum").collect()
    val b = naive.collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x.toString == y.toString) }
  }

  test("packing conserves tokens and block spans are consistent") {
    val packed = SparkEntryHelper.run("text_pack_sequences", spark, dir).collect()
    val totalTokens = packed.map(_.getAs[Long]("n_tokens")).sum
    assert(packed.last.getAs[Long]("cum") == totalTokens)
    packed.foreach { r =>
      val first = r.getAs[Long]("first_block")
      val last = r.getAs[Long]("last_block")
      assert(first >= 0 && last >= first)
      assert(r.getAs[Long]("n_blocks") == last - first + 1)
      // a doc of n tokens can span at most ceil(n/512)+1 blocks
      assert(last - first <= r.getAs[Long]("n_tokens") / 512 + 1)
    }
  }

  test("mixture plan gates deterministically: repeated runs are identical") {
    val a = SparkEntryHelper.run("corpus_mixture_plan", spark, dir).collect()
    val b = SparkEntryHelper.run("corpus_mixture_plan", spark, dir).collect()
    assert(a.nonEmpty && a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // even-indexed sources downsample to ~25%, odd oversample to ~150%
    a.foreach { r =>
      val idx = r.getAs[String]("source").replaceAll("\\D", "").toInt
      val ratio = r.getAs[Long]("n_copies").toDouble /
        spark.read.parquet(s"$dir/documents.parquet")
          .where(col("source") === r.getAs[String]("source")).count()
      if (idx % 2 == 0) assert(ratio <= 0.8, s"src$idx ratio $ratio")
      else assert(ratio >= 1.0 && ratio <= 2.0, s"src$idx ratio $ratio")
    }
  }

  test("decontamination flags exactly the docs sharing a 3-gram with eval") {
    val flagged = SparkEntryHelper.run("text_decontaminate", spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // brute-force reference on the collected corpus
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .replaceAll("[^a-z0-9]+", " ").trim.split(" +").toSeq)
      .toMap
    def grams(ws: Seq[String]) =
      if (ws.length < 3) Set.empty[String]
      else ws.sliding(3).map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % 97 == 0).values.flatMap(grams).toSet
    val expected = docs.filter(_._1 % 97 != 0)
      .filter { case (_, ws) => grams(ws).exists(evalGrams) }.keySet
    assert(flagged == expected)
  }
}

/** Test helper: run a registered query by name. */
object SparkEntryHelper {
  def run(name: String, spark: SparkSession, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir)
}
