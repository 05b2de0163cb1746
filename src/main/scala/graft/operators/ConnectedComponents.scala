package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connected components over an edge list — the consolidation step of a
  * dedup pipeline: near-dup PAIRS (minhash/simhash/embedding verify output)
  * become duplicate CLUSTERS, from which one canonical document per
  * component survives.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the published
  * shuffle-based CC algorithm that converges in O(log² n) rounds, each
  * round one groupBy per direction, no driver-side graph state (the only
  * driver data is a per-round convergence checksum). That is the 100 TB
  * story: GraphX/pregel keeps vertex state in memory; this keeps everything
  * in shuffled DataFrames with lineage truncated per round.
  *
  *   large-star(u): neighbors v > u re-attach to m = min(N(u) ∪ {u})
  *   small-star(u): neighbors v ≤ u re-attach to m = min(N(u) ∪ {u})
  *
  * At the fixpoint every node's edge points at its component minimum.
  */
object ConnectedComponents {

  /** @param edges two numeric columns `src`,`dst` (undirected pair list)
    * @return (node LONG, comp LONG) — comp is the min node id reachable
    */
  def components(spark: SparkSession, edges: DataFrame,
                 src: String, dst: String, maxIter: Int = 25): DataFrame = {
    // normalize: undirected, self-loops dropped, canonical (big, small)
    var e = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    def checksum(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: ANSI mode faults on int64 overflow, and xor is
      // order-independent + collision-safe here (edges are distinct)
      val r = df.agg(
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }

    /** One star round. Large-star keeps the graph connected while hanging
      * big neighbors below the local min; small-star flattens.
      */
    def star(df: DataFrame, large: Boolean): DataFrame = {
      // neighborhood view centered on each node (both directions)
      val nbrs = df.select(col("u").as("c"), col("v").as("n"))
        .unionAll(df.select(col("v").as("c"), col("u").as("n")))
      // per-center min via groupBy + join, NOT a window: a window would
      // sort every hub's full neighborhood in one task, while the hash
      // aggregate collapses it map-side (hubs are exactly what star
      // rounds produce)
      val mins = nbrs.groupBy("c")
        .agg(min(least(col("c"), col("n"))).as("m"))
      val withMin = nbrs.join(mins, "c")
      val kept =
        if (large) withMin.where(col("n") > col("c"))
        else withMin.where(col("n") <= col("c"))
      val rewired = kept.select(greatest(col("n"), col("m")).as("u"),
        least(col("n"), col("m")).as("v"))
      // in small-star the center re-attaches to its min as well
      val withCenter =
        if (large) rewired
        else rewired.unionAll(withMin
          .select(greatest(col("c"), col("m")).as("u"),
            least(col("c"), col("m")).as("v")).distinct())
      withCenter.where(col("u") =!= col("v")).distinct()
    }

    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = star(star(e, large = true), large = false).localCheckpoint()
      val cs = checksum(next)
      converged = cs == prev
      prev = cs
      e = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter star rounds; " +
          "a partially-contracted labeling would be silently wrong")

    // fixpoint: every edge is (node, componentMin); nodes that appear only
    // as a minimum are their own component
    val member = e.groupBy(col("u").as("node")).agg(min("v").as("comp"))
    val mins = e.select(col("v").as("node")).distinct()
      .join(member, Seq("node"), "left_anti")
      .withColumn("comp", col("node"))
    member.unionByName(mins)
  }
}
