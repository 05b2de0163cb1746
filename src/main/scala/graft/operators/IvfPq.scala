package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed production ANN shape — a coarse quantizer prunes
  * the corpus to `nprobe` cells per query, PQ codes (m ints/row) score the
  * survivors via broadcast ADC tables, and the top candidates are reranked
  * exactly. The index a query touches is nprobe/k of the corpus at m bytes
  * per vector: both pruning levers compound (e.g. 8 of 64 cells × 64×
  * compression ⇒ ~0.2% of the raw bytes scanned).
  *
  * Scale shape: the (cluster, codes) table is written partitioned by
  * cluster, so a probe is a partition-pruned scan; queries and their ADC
  * tables broadcast; only candidate ids shuffle for the exact rerank.
  *
  * Codes quantize the raw (normalized) vectors, not residuals — the
  * residual refinement of Jégou et al.'s original IVFADC needs per-cell
  * codebooks trained on v − centroid; with the exact rerank downstream the
  * simpler shared codebook loses little recall and keeps train() one pass.
  */
object IvfPq {

  def search(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
             ivf: IvfIndex.Model, pq: ProductQuantizer.PQModel,
             nprobe: Int, topK: Int, rerank: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val bcIvf = spark.sparkContext.broadcast(ivf)
    val assignOne = udf((v: Seq[Double]) => bcIvf.value.nearest(v, 1)(0))
    val bcPq = spark.sparkContext.broadcast(pq)
    val enc = udf((v: Seq[Double]) => bcPq.value.encodeOne(v))

    // the stored index: cluster id + m-int code per vector
    val index = emb.select(col("id").as("nid"), col("v"))
      .withColumn("cluster", assignOne(col("v")))
      .withColumn("codes", enc(col("v")))
      .select("nid", "cluster", "codes")

    val queries = emb.where(col("id").isin(queryIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val tables = queries.map { case (qid, qv) => qid -> pq.adcTable(qv) }.toMap
    val bcT = spark.sparkContext.broadcast(tables)
    val adc = udf { (qid: Long, codes: Seq[Int]) =>
      val t = bcT.value(qid)
      var d = 0.0; var s = 0
      while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
      d
    }

    // each query probes its nprobe nearest cells — the equi-join on
    // cluster IS the partition pruning
    val probes = broadcast(spark.createDataFrame(
      queries.flatMap { case (qid, qv) =>
        ivf.nearest(qv, nprobe).map(c => (qid, c))
      }.toSeq).toDF("qid", "cluster"))

    val wApprox = Window.partitionBy("qid").orderBy(col("adist").asc, col("nid"))
    val cands = index.join(probes, "cluster")
      .withColumn("adist", adc(col("qid"), col("codes")))
      .withColumn("arn", row_number().over(wApprox))
      .where(col("arn") <= topK * rerank)
      .select(col("qid"), col("nid"))

    val bcQ = spark.sparkContext.broadcast(queries.toMap)
    val exact = udf { (qid: Long, nv: Seq[Double]) =>
      1.0 - IvfIndex.cosineDist(bcQ.value(qid), nv)
    }
    val wExact = Window.partitionBy("qid").orderBy(col("score").desc, col("nid"))
    emb.select(col("id").as("nid"), col("v").as("nv"))
      .join(broadcast(cands), "nid")
      .withColumn("score", round(exact(col("qid"), col("nv")), 6))
      .withColumn("rn", row_number().over(wExact).cast("long"))
      .where(col("rn") <= topK)
      .select(col("qid"), col("nid"), col("score"), col("rn"))
      .orderBy("qid", "rn")
  }
}
