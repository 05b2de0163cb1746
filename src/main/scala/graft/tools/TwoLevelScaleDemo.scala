package graft.tools

import org.apache.spark.sql.functions._

/** Scale demo for the two-level IVF quantizer past the old flat-plan
  * ceiling: synthesizes a deterministic corpus BIGGER than the 8.4M-vector
  * point where kFor used to saturate at 2¹², trains the two-level
  * quantizer at the k the occupancy rule actually wants (k = n/2048 >
  * FlatCap — impossible for the flat path), assigns every vector, and
  * reports the occupancy distribution. The claim under test: expected
  * occupancy stays ≈ 2048 (bounding SemDeDup's within-cluster pairwise
  * stage) INSTEAD of growing linearly with the corpus, and nothing k-sized
  * ever reaches the driver or the serialized plan — only the √k coarse
  * matrix does.
  *
  * Usage: tools/run.sh graft.tools.TwoLevelScaleDemo [n] [dim] [iters]
  * (defaults 12_000_000 16 2 — n past the 8.4M ceiling).
  */
object TwoLevelScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(12000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.Sessions.local()
    import graft.operators.IvfIndex

    // deterministic synthetic embeddings: hash-mixed components around
    // 4096 planted direction seeds so the corpus has real cluster
    // structure (id % 4096 picks the seed; a small per-id jitter keeps
    // members distinct). No RNG — rerunning reproduces bit-identically.
    val emb = spark.range(n).select(col("id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
             |  cast(pmod(xxhash64(id % 4096, j), 2001) as double) / 1000.0 - 1.0d +
             |  (cast(pmod(xxhash64(id, j), 201) as double) / 1000.0 - 0.1d))"""
        .stripMargin).as("v"))
      .localCheckpoint() // pin: train + assign re-read this corpus

    val k = IvfIndex.kFor(n)
    require(k > IvfIndex.FlatCap,
      s"demo must exercise the past-the-cap regime: k=$k, cap=${IvfIndex.FlatCap}")

    val t0 = System.nanoTime()
    val model = IvfIndex.trainTwoLevel(spark, emb, k, iters, knownN = Some(n))
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val occ = IvfIndex.assignTwoLevel(emb, col("v"), model, "cluster")
      .groupBy("cluster").count()
      .agg(count(lit(1)).as("n_clusters"),
        max("count").as("occ_max"),
        avg("count").as("occ_mean"),
        expr("percentile_approx(count, 0.99)").as("occ_p99"))
      .head()
    val assignSec = (System.nanoTime() - t1) / 1e9

    def num(v: Double, p: Int) =
      String.format(java.util.Locale.ROOT, s"%.${p}f", Double.box(v))
    // bounded-occupancy verdict in one parseable line: occ_mean must sit
    // near n / k (≈2048 by construction), NOT near n / FlatCap (≈2930+
    // and growing), which is what the old saturated cap would produce
    println(
      s"""{"demo":"two_level_ivf","n":$n,"dim":$dim,"k":$k,""" +
      s""""kc":${model.coarse.centroids.length},"kf":${model.kf},""" +
      s""""fine_mb":${num(model.fineBytes / 1048576.0, 1)},""" +
      s""""broadcast_fine":${model.fineBytes <= (64L << 20)},""" +
      s""""n_clusters":${occ.getLong(0)},"occ_max":${occ.getLong(1)},""" +
      s""""occ_mean":${num(occ.getDouble(2), 1)},"occ_p99":${occ.getLong(3)},""" +
      s""""occ_target":${num(n.toDouble / k, 1)},""" +
      s""""train_sec":${num(trainSec, 1)},"assign_sec":${num(assignSec, 1)}}""")
    spark.stop()
  }
}
