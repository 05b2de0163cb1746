package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over relationship data — the operator family behind
  * link-based quality signals in web-corpus curation (PageRank-weighted
  * sampling, spam down-ranking) that complements the connected-components
  * operator the dedup family already uses.
  *
  * PageRank here is the standard power iteration with damping 0.85 and
  * dangling-mass redistribution, run for a fixed 5 iterations in
  * ALL-INTEGER arithmetic: ranks live as 1e12-scaled longs, every division
  * is a floor over positives, so Spark and DuckDB agree bit-for-bit with
  * zero FP tolerance (the same cross-engine-exactness trick as
  * sample_systematic_weighted). The graph is bipartite customer↔supplier
  * from order lines; supplier→customer back-edges exist only for
  * non-negative-balance suppliers, so overdrawn suppliers are genuine
  * dangling nodes and the dangling term is exercised, not decorative.
  *
  * Scale notes (100 TB): each iteration is one shuffle join of ranks with
  * edges on src plus one aggregation on dst — the textbook distributed
  * PageRank shape; ranks and degrees are |V|-sized, edges |E|-sized, and
  * nothing is collected to the driver (N travels as a broadcast scalar
  * aggregate). A production run over billions of edges would persist the
  * edge list once and checkpoint ranks every few iterations to cut
  * lineage; at a fixed 5 iterations the plan stays shallow enough that
  * Catalyst handles it directly.
  */
object GraphOps {

  private val Scale = 1000000000000L // rank unit = 1e-12

  /** DuckDB twin: the 5 iterations unrolled as chained CTEs (r0..r5), each
    * with its dangling-sum and inflow CTE. Identical integer formulas.
    */
  private def pagerankOracle: String = {
    val iters = (1 to 5).map { i =>
      val p = s"r${i - 1}"
      s"""d$i AS (SELECT CAST(COALESCE(sum(r.pr), 0) AS BIGINT) AS dang FROM $p r
         |  WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = r.node)),
         |c$i AS (SELECT e.dst AS node, CAST(sum(r.pr // od.deg) AS BIGINT) AS infl
         |  FROM edges e JOIN $p r ON e.src = r.node JOIN od ON e.src = od.src
         |  GROUP BY 1),
         |r$i AS (SELECT nd.node,
         |    (15 * $Scale // (100 * nn.n))
         |      + (85 * (COALESCE(c.infl, 0) + d$i.dang // nn.n)) // 100 AS pr
         |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i LEFT JOIN c$i c
         |    ON nd.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (
       |  SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT p.sk * 2 + 1 AS src, p.ck * 2 AS dst
       |  FROM pairs p JOIN supplier s ON p.sk = s.s_suppkey
       |  WHERE s.s_acctbal >= 0),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |r0 AS (SELECT node, $Scale // n AS pr FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT node, CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  CAST(pr AS BIGINT) AS pr,
       |  CAST(row_number() OVER (ORDER BY pr DESC, node) AS BIGINT) AS rn
       |FROM r5 QUALIFY rn <= 20 ORDER BY rn""".stripMargin
  }

  val qs: Seq[QueryDef] = Seq(
    QueryDef(
      "graph_pagerank",
      (s, d) => {
        val o = T(s, d, "orders").select("o_orderkey", "o_custkey")
        val l = T(s, d, "lineitem").select("l_orderkey", "l_suppkey")
        val sup = T(s, d, "supplier").select("s_suppkey", "s_acctbal")
        val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
          .distinct()
        val e1 = pairs.select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        val e2 = pairs.join(sup, pairs("sk") === sup("s_suppkey"))
          .where(col("s_acctbal") >= 0)
          .select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst"))
        val edges = e1.unionByName(e2)
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val nn = nodes.agg(count(lit(1)).as("n"))
        val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        var r = nodes.crossJoin(broadcast(nn))
          .select(col("node"), expr(s"${Scale}L div n").as("pr"))
        for (_ <- 1 to 5) {
          val dang = r.join(outdeg, r("node") === outdeg("src"), "left_anti")
            .agg(coalesce(sum("pr"), lit(0L)).as("dang"))
          val contrib = edges
            .join(r.withColumnRenamed("node", "rnode"), col("src") === col("rnode"))
            .join(outdeg, "src")
            .groupBy(col("dst").as("cnode"))
            .agg(sum(expr("pr div deg")).as("infl"))
          r = nodes.crossJoin(broadcast(nn)).crossJoin(broadcast(dang))
            .join(contrib, col("node") === col("cnode"), "left")
            .select(col("node"), expr(
              s"(15 * ${Scale}L) div (100 * n)" +
                " + (85 * (coalesce(infl, 0L) + dang div n)) div 100").as("pr"))
        }
        // Distributed top-20 first (TakeOrderedAndProject — per-partition
        // heaps, never a global single-partition window over |V| rows),
        // THEN rank the 20 survivors; identical to row_number <= 20.
        val top = r.orderBy(col("pr").desc, col("node")).limit(20)
        val w = Window.orderBy(col("pr").desc, col("node"))
        top.withColumn("rn", row_number().over(w).cast("long"))
          .select(col("node"),
            expr("CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END").as("kind"),
            col("pr"), col("rn"))
          .orderBy("rn")
      },
      Some(pagerankOracle)
    )
  )
}
