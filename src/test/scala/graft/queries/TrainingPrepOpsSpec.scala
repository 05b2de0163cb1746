package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-8 training-prep additions (BM25, mask plan,
  * int8 quantization, contrastive negatives, label propagation, length
  * batching) that the DuckDB value-compare cannot state — structural
  * properties that must hold for ANY corpus, not just the pinned values
  * at one SF.
  */
class TrainingPrepOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

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

  private def q(name: String) =
    graft.SparkEntry.registry.find(_.name == name).get.fn(spark, dir)

  test("bm25: top-10, strictly ordered, positive scores") {
    val rows = q("text_bm25_rank").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(rows.forall(_.getAs[Long]("n_terms") <= 3))
  }

  test("mask plan: rate ~15%, checksum bounded by position sum") {
    val df = q("text_mask_plan").cache()
    val bad = df.where(col("n_masked") > col("n_tokens") ||
      col("pos_checksum") > col("n_tokens") * (col("n_tokens") + 1) / 2).count()
    assert(bad == 0)
    val agg = df.agg(sum("n_masked").as("m"), sum("n_tokens").as("t")).head()
    val rate = agg.getAs[Long]("m").toDouble / agg.getAs[Long]("t")
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate outside [0.10, 0.20]")
    df.unpersist()
  }

  test("int8 quantize: codes in [-127, 127] and amax dimension saturates") {
    val df = q("embedding_int8_quantize").cache()
    assert(df.where(col("qmin") < -127 || col("qmax") > 127).count() == 0)
    // for every non-degenerate vector the max-|x| dim quantizes to ±127
    val sat = df.where(col("scale") > 0 &&
      col("qmax") =!= 127 && col("qmin") =!= -127).count()
    assert(sat == 0, s"$sat vectors never hit ±127")
    df.unpersist()
  }

  test("contrastive negatives: 4 per anchor, never self or same-source") {
    val df = q("sample_negatives_contrastive").cache()
    val perDoc = df.groupBy("doc_id").agg(count(lit(1)).as("k"),
      max("rk").as("maxrk"))
    assert(perDoc.where(col("k") =!= 4 || col("maxrk") =!= 4).count() == 0)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val joined = df
      .join(docs, "doc_id")
      .join(docs.select(col("doc_id").as("neg_id"), col("source").as("neg_src")),
        "neg_id")
    assert(joined.where(col("doc_id") === col("neg_id")).count() == 0)
    assert(joined.where(col("source") === col("neg_src")).count() == 0)
    df.unpersist()
  }

  test("label propagation: node mass conserved, communities non-increasing") {
    val df = q("graph_label_propagation").cache()
    val perRound = df.groupBy("round")
      .agg(sum("sz").as("nodes"), count(lit(1)).as("ncomm"))
      .orderBy("round").collect()
    assert(perRound.length == 4)
    val nodes = perRound.map(_.getAs[Long]("nodes"))
    assert(nodes.distinct.length == 1, s"node mass drifted: ${nodes.mkString(",")}")
    val ncomm = perRound.map(_.getAs[Long]("ncomm"))
    assert(ncomm.sliding(2).forall { case Array(a, b) => b <= a; case _ => true },
      s"community count increased: ${ncomm.mkString(",")}")
    df.unpersist()
  }

  test("funnel report: survivors strictly decrease and accounting balances") {
    val rows = q("corpus_funnel_report").collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 4)
    val surv = rows.map(_.getAs[Long]("survivors"))
    assert(surv.sliding(2).forall { case Array(a, b) => b < a; case _ => true },
      s"expected monotone funnel: ${surv.mkString(",")}")
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Long]("dropped") ==
        prev.getAs[Long]("survivors") - cur.getAs[Long]("survivors"))
    case _ => ()
    }
    assert(rows.head.getAs[Long]("dropped") == 0)
  }

  test("bpe apply: token counts bounded by chars+1 per word and words per doc") {
    val df = q("text_bpe_apply").cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "CAST(size(filter(split(text, ' +'), x -> x != '')) AS LONG) AS n_words",
        "CAST(length(regexp_replace(text, ' +', '')) AS LONG) AS n_chars")
    val j = df.join(docs, "doc_id")
    // each word yields between 1 (fully merged) and len+1 (no merges) tokens
    assert(j.where(col("n_tokens") < col("n_words")).count() == 0)
    assert(j.where(col("n_tokens") > col("n_chars") + col("n_words")).count() == 0)
    // merges actually fired: total tokens strictly below the no-merge count
    val t = j.agg(sum("n_tokens"), sum(col("n_chars") + col("n_words"))).head()
    assert(t.getLong(0) < t.getLong(1))
    df.unpersist()
  }

  test("length batching: batches of 8, bucket covers doc lengths, all docs used") {
    val df = q("text_length_bucket_batches").cache()
    assert(df.agg(sum("n_docs")).head().getLong(0) == 500)
    assert(df.where(col("n_docs") > 8 || col("n_docs") < 1).count() == 0)
    assert(df.where(col("tok_sum") > col("bucket") * col("n_docs")).count() == 0)
    assert(df.where(col("first_doc") > col("last_doc")).count() == 0)
    // within a bucket only the LAST batch may be short
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket")
    val short = df.withColumn("maxb", max("batch").over(w))
      .where(col("batch") < col("maxb") && col("n_docs") =!= 8)
    assert(short.count() == 0)
    df.unpersist()
  }
}
