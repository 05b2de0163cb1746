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
    // LAZY checkpoints throughout: the checksum action right after each
    // checkpoint is what materializes it, so every round costs ONE job
    // (an eager localCheckpoint ran the round's pipeline as its own job
    // and the checksum then re-read the stored blocks as a second job —
    // pure driver/scheduling latency, 2x the job count per round).
    var e = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)

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
      *
      * Exploits the canonical-edge invariant (u > v on every row, kept by
      * both stars' outputs): a center's candidate minimum can only be a
      * BELOW-neighbor, and its below-neighbors are exactly the v values of
      * its u-side rows — so m(c) = min(c, min{v : (c,v) ∈ E}) comes from
      * ONE groupBy("u") instead of the former both-directions union view
      * (which shuffled 2|E| rows into the per-center aggregate and join).
      * Per-center min via groupBy + join, NOT a window: a window would
      * sort every hub's full neighborhood in one task, while the hash
      * aggregate collapses it map-side (hubs are exactly what star rounds
      * produce). Derivation, per edge (u, v):
      *   large-star keeps neighbors ABOVE their center — center v,
      *     neighbor u → emit (u, m(v)); m(v) ≤ v < u keeps canonical form
      *     and can never self-loop. Centers with no u-side rows have no
      *     below-neighbor: m = the center itself (left join + coalesce).
      *   small-star keeps neighbors AT/BELOW their center — center u,
      *     neighbor v → emit (v ∨ m(u), v ∧ m(u)); plus every center
      *     re-attaching to its own min, which is exactly the `mins` rows
      *     (m(u) < u always; centers without u-side rows would emit the
      *     self-loop (c, c) the filter drops, so omitting them is the
      *     same set the former withMin-based union produced).
      */
    def star(df: DataFrame, large: Boolean): DataFrame = {
      val mins = df.groupBy(col("u")).agg(min(col("v")).as("m"))
      val rewired =
        if (large)
          df.join(mins.select(col("u").as("v"), col("m")), Seq("v"), "left")
            .select(col("u"), coalesce(col("m"), col("v")).as("v"))
        else
          df.join(mins, Seq("u"))
            .select(greatest(col("v"), col("m")).as("u"),
              least(col("v"), col("m")).as("v"))
            .unionAll(mins.select(col("u"), col("m").as("v")))
      rewired.where(col("u") =!= col("v")).distinct()
    }

    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = star(star(e, large = true), large = false)
        .localCheckpoint(eager = false)
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
