package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** In-engine contracts of the data-selection queries:
  *   - corpus_ccnet_buckets' salted two-phase tercile equals the plain
  *     per-language ntile(3) window row for row (the scale-safe form must
  *     be value-identical to the window it replaces);
  *   - corpus_dsir_select is exactly the top-K of the full importance
  *     ranking (no boundary losses from the TakeOrdered plan).
  */
class SelectionOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

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

  test("ccnet buckets equal the plain per-lang ntile window, and terciles balance") {
    val out = q("corpus_ccnet_buckets")
    val viaWindow = out.select("doc_id", "lang", "ppl")
      .withColumn("bucket_w", ntile(3).over(
        Window.partitionBy("lang").orderBy(col("ppl"), col("doc_id"))).cast("long"))
    val joined = out.join(viaWindow.select("doc_id", "bucket_w"), "doc_id")
    assert(joined.where(col("bucket") =!= col("bucket_w")).count() === 0)
    // tercile sizes per lang differ by at most 1 (SQL ntile contract)
    val sizes = out.groupBy("lang", "bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach(r => assert(r.getLong(1) <= 1,
      s"lang ${r.getString(0)} tercile spread ${r.getLong(1)}"))
    // head (bucket 1) has the LOWEST perplexity per lang
    val mono = out.groupBy("lang", "bucket").agg(
      min("ppl").as("lo"), max("ppl").as("hi"))
    val byLang = mono.collect().groupBy(_.getString(0))
    byLang.values.foreach { rs =>
      val m = rs.map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3))).toMap
      for (b <- 1L until m.keys.max)
        assert(m(b)._2 <= m(b + 1)._1 + 1e-9,
          s"bucket $b max ppl exceeds bucket ${b + 1} min")
    }
  }

  test("dsir selection is exactly the top-K of the full ranking") {
    val df = q("corpus_dsir_select")
    assert(df.columns.toSeq === Seq("doc_id", "n_toks", "logw_avg"))
    val sel = df.collect()
    assert(sel.length === 128 ||
      sel.length === spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").distinct().count().toInt.min(128))
    // verify the boundary property directly: every selected row outranks
    // every non-selected doc on the (logw_avg desc, doc_id asc) key, with
    // the scores recomputed independently below
    val selSet = sel.map(_.getLong(0)).toSet
    val worst = sel.map(r => (r.getDouble(2), -r.getLong(0))).min
    // docs absent from the selection with a strictly better key would
    // contradict top-K; derive all scores via the oracle-side formula in
    // Spark (same pipeline as the query, no limit)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        explode(expr("filter(split(text, ' +'), x -> x != '')")).as("tok"))
      .withColumn("b", expr(
        "pmod(cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint), 1024)"))
    val bt = toks.groupBy("b").agg(count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    val totals = bt.agg(sum("cr").cast("long").as("nr"), sum("ct").cast("long").as("nt"))
    val scores = toks.join(broadcast(bt), Seq("b")).crossJoin(broadcast(totals))
      .withColumn("lr", expr(
        """CAST(round(ln((ct + 1) / CAST(nt + 1024 AS DOUBLE)) -
          |          ln((cr + 1) / CAST(nr + 1024 AS DOUBLE)), 9)
          |     AS DECIMAL(18,9))""".stripMargin))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_toks"), sum(col("lr")).as("lw"))
      .withColumn("logw_avg", round(col("lw").cast("double") / col("n_toks"), 6))
      .collect()
    scores.filterNot(r => selSet.contains(r.getLong(0))).foreach { r =>
      val key = (r.getDouble(3), -r.getLong(0))
      assert(Ordering[(Double, Long)].lteq(key, worst),
        s"unselected doc ${r.getLong(0)} outranks the selection boundary")
    }
    // and the selected scores agree with the recomputation bit-for-bit
    val byId = scores.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    sel.foreach { r =>
      val (nt, lw) = byId(r.getLong(0))
      assert(r.getLong(1) == nt && r.getDouble(2) == lw)
    }
  }
}
