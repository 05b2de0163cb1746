package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into cells; queries probe only the
  * `nprobe` nearest cells and rerank exactly. The second scale path next to
  * hyperplane LSH (AnnLsh): at 100 TB the corpus is scanned once to assign
  * cluster ids (map-only, centroids broadcast), stored partitioned by
  * cluster, and a query touches nprobe/k of the data.
  *
  * Training is deterministic: centroids initialize from evenly-spaced corpus
  * ids and Lloyd iterations are plain DataFrame aggregations (distributed;
  * only the k×dim centroid matrix ever reaches the driver).
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def nearest(v: Seq[Double], n: Int): Array[Int] =
      centroids.indices
        .map(i => i -> IvfIndex.cosineDist(centroids(i), v))
        .sortBy(_._2).take(n).map(_._1).toArray
  }

  private[operators] def cosineDist(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Train the coarse quantizer. `emb` needs columns (id: long, v:
    * array<double>). Callers that already know the corpus size (e.g. from
    * AnnLsh.memoizedCount) pass it via `knownN` so training doesn't run a
    * second full count pass over the corpus.
    */
  def train(spark: SparkSession, emb: DataFrame, k: Int, iters: Int,
            knownN: Option[Long] = None): Model = {
    import spark.implicits._
    val n = knownN.getOrElse(emb.count())
    val stride = math.max(1, n / k)
    // deterministic init: evenly spaced ids (corpus order is stable). This
    // assumes roughly dense ids; with sparse or clustered ids (e.g. all
    // ids ≡ 1 mod stride) the modulo filter can land on FEWER than k rows,
    // so a deterministic md5-order top-up below guarantees exactly
    // min(k, n) distinct seeds for ANY id distribution. On dense ids the
    // primary pick already yields k and the top-up is a no-op, keeping the
    // trained model (and every downstream oracle) unchanged.
    val primary = emb
      .withColumn("_rank", expr("id"))
      .where(pmod(col("_rank"), lit(stride)) === 0)
      .orderBy("id").limit(k)
      .select("id", "v").as[(Long, Seq[Double])].collect()
    val seeds =
      if (primary.length >= math.min(k.toLong, n)) primary.map(_._2)
      else {
        val have = primary.map(_._1).toSet
        val topUp = emb
          .where(!col("id").isInCollection(have))
          .withColumn("_h", md5(col("id").cast("string")))
          .orderBy("_h", "id").limit(k - primary.length)
          .select("v").as[Seq[Double]].collect()
        primary.map(_._2) ++ topUp
      }
    var centroids = seeds.map(_.toArray)

    for (_ <- 1 to iters) {
      // native codegen assignment (engine.Expressions.NearestCentroidExpr):
      // the centroid matrix rides in the plan and the kernel reads doubles
      // straight from the row buffer — no Seq boxing per row, identical
      // argmin to the former UDF (same op order, first-min ties)
      val assign = nearestCentroidCol(col("v"), centroids)
      // per-(cluster, dim) partial sums: the aggregation buffer is a single
      // double per key, so no cluster's member vectors ever materialize in
      // one row (round-1's collect_list variant OOMed by construction at
      // large cluster sizes). Only k×dim tiny rows reach the driver.
      val sums = emb
        .withColumn("c", assign)
        .select(col("c"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("c", "d")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.clone()
      sums.groupBy(_.getAs[Int]("c")).foreach { case (c, rs) =>
        val arr = new Array[Double](centroids(c).length)
        rs.foreach { r =>
          arr(r.getAs[Int]("d")) = r.getAs[Double]("sx") / r.getAs[Long]("n")
        }
        next(c) = arr
      }
      centroids = next
    }
    Model(centroids)
  }

  /** Map-only cluster assignment against a trained model: the k×dim centroid
    * matrix rides in the plan and assignment is the native codegen argmin —
    * no shuffle, no per-row boxing. Public so cluster-scoped operators
    * (semantic dedup) reuse the quantizer without re-deriving the column.
    */
  def assignCol(v: org.apache.spark.sql.Column, model: Model): org.apache.spark.sql.Column =
    nearestCentroidCol(v, model.centroids)

  /** Cluster count for an n-row corpus, holding expected occupancy ≈ 2048:
    * cluster-scoped pairwise work is quadratic IN THE CLUSTER (that is the
    * SemDeDup design — Abbas et al. 2023 run k-means precisely to bound the
    * pairwise stage), so k must grow with the corpus the same way
    * AnnLsh.bitsFor grows LSH bands. At the test SFs this floors at 8
    * (identical to the fixed-k ANN queries). Capped at 2¹² — NOT for
    * occupancy but because this flat quantizer's mechanics stop being
    * right past it: NearestCentroidExpr embeds the k×dim matrix in the
    * serialized plan (4096×64 doubles ≈ 2 MB — the ceiling of "small
    * enough to ship in the plan") and assignment scans all k centroids
    * per row. Past n ≈ 8.4M rows (cap × 2048) a semantic-dedup corpus
    * needs a two-level (hierarchical) quantizer with broadcast codebooks;
    * the flat path deliberately saturates rather than silently building
    * a quarter-GB plan.
    */
  def kFor(n: Long): Int =
    math.max(8L, math.min(1L << 12, n / 2048L)).toInt

  /** Native codegen centroid-assignment columns (no per-row boxing). */
  private[operators] def nearestCentroidCol(
      v: org.apache.spark.sql.Column, cents: Array[Array[Double]]) =
    org.apache.spark.sql.GraftBridge.column(
      graft.engine.Expressions.NearestCentroidExpr(
        org.apache.spark.sql.GraftBridge.expression(v), cents))

  private[operators] def nearestCentroidsCol(
      v: org.apache.spark.sql.Column, cents: Array[Array[Double]], n: Int) =
    org.apache.spark.sql.GraftBridge.column(
      graft.engine.Expressions.NearestCentroidsExpr(
        org.apache.spark.sql.GraftBridge.expression(v), cents, n))

  /** Top-k nearest neighbors for each query id, probing nprobe IVF cells. */
  def search(spark: SparkSession, emb: DataFrame, queryIds: Seq[Long],
             model: Model, nprobe: Int, topK: Int): DataFrame = {
    AnnLsh.register(spark)
    val corpus = emb
      .withColumn("cluster", nearestCentroidCol(col("v"), model.centroids))
      .select(col("id").as("nid"), col("cluster"), col("v").as("nv"))
    val queries = emb.where(col("id").isin(queryIds: _*))
      .withColumn("cluster",
        explode(nearestCentroidsCol(col("v"), model.centroids, nprobe)))
      .select(col("id").as("qid"), col("cluster"), col("v").as("qv"))

    // native codegen cosine on the joined pairs; `1.0 - (1.0 - cos)` keeps
    // the former UDF's exact arithmetic (score = 1 − cosineDist), and
    // VecOps.cosine accumulates dot/na/nb in the same element order
    val cosCol = org.apache.spark.sql.GraftBridge.column(
      graft.engine.Expressions.VecCosineExpr(
        org.apache.spark.sql.GraftBridge.expression(col("qv")),
        org.apache.spark.sql.GraftBridge.expression(col("nv"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("nid"))
    queries.join(corpus, "cluster")
      .withColumn("score", round(lit(1.0) - (lit(1.0) - cosCol), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= topK)
      .select(col("qid"), col("nid"), col("score"), col("rn"))
      .orderBy("qid", "rn")
  }
}
