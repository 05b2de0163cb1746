package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: LSH bucket-occupancy profile (top sizes, candidate-pair mass)
  * of embedding_neardup_lsh's bucket table at a given dir/bits.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local()
    val d = args(0)
    graft.operators.AnnLsh.register(s)
    val e = s.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
    val dup = e.select((col("vec_id") + 100000L).as("vec_id"),
      expr("transform(ve, x -> x + 0.05d)").as("ve"))
    val all = e.unionByName(dup)
      .select(col("vec_id"), col("ve").cast("array<float>").as("vf"))
    val n = all.count()
    args.drop(1).map(_.toInt).foreach { bits =>
      val occ = all
        .withColumn("sig", explode(callUDF("ann_band_sigs_scaled", col("vf"), lit(bits))))
        .groupBy("sig").agg(count(lit(1)).as("c"))
      val stats = occ.agg(
        count(lit(1)).as("buckets"),
        max("c").as("max_occ"),
        sum(expr("c * (c - 1) / 2")).as("pairs")).collect()(0)
      println(s"n=$n bits=$bits buckets=${stats.get(0)} max_occ=${stats.get(1)} cand_pairs=${stats.get(2)}")
      occ.orderBy(desc("c")).limit(8).collect()
        .foreach(r => println(f"  sig=${r.getLong(0)}%x occ=${r.getLong(1)}"))
    }
    s.stop()
  }
}
