package graft.queries

import org.apache.spark.sql.functions._

/** Privacy / compliance auditing over the curated tables — the release
  * gates a training-data pipeline runs before shipping a corpus that
  * contains user-derived records: k-anonymity of quasi-identifier
  * groups, l-diversity of a sensitive attribute within those groups,
  * and the generalization ladder that finds the coarsening level at
  * which a release satisfies k. (Complements the PII scrub and takedown
  * propagation operators — those remove/track individual values, these
  * quantify re-identification risk of what remains.)
  *
  * All counts are exact integers; every query is one or two keyed
  * aggregations (group sizes then group stats) — at 100 TB the
  * quasi-identifier rollup is the only big shuffle and partial
  * aggregation halves it map-side.
  */
object PrivacyOps {

  // quasi-identifier: (market segment, nation, 1000-unit balance band)
  private val Band = "CAST(floor(c_acctbal / 1000.0D) AS BIGINT)"
  private val BandSql = "CAST(floor(c_acctbal / 1000.0) AS BIGINT)"

  val qs: Seq[QueryDef] = Seq(

    // k-anonymity audit (k = 5): every quasi-identifier group's size,
    // flagged when a release would expose a group smaller than k.
    QueryDef(
      "privacy_k_anonymity",
      (s, d) => {
        val c = T(s, d, "customer")
        val nat = T(s, d, "nation").select("n_nationkey", "n_name")
        c.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_mktsegment"), col("n_name"), expr(Band).as("bal_band"))
          .agg(count(lit(1)).as("n"))
          .withColumn("below_k", (col("n") < 5).cast("int"))
          .orderBy("c_mktsegment", "n_name", "bal_band")
      },
      Some(s"""SELECT c_mktsegment, n_name, $BandSql AS bal_band,
              |  count(*) AS n, CAST(count(*) < 5 AS INT) AS below_k
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    ),

    // l-diversity (l = 2) of a sensitive attribute (the customer's order
    // priorities) within each quasi-identifier group: a group whose
    // members all share one sensitive value leaks it even at k ≥ 5.
    QueryDef(
      "privacy_l_diversity",
      (s, d) => {
        val c = T(s, d, "customer")
        val nat = T(s, d, "nation").select("n_nationkey", "n_name")
        val o = T(s, d, "orders").select("o_custkey", "o_orderpriority")
        c.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(o, col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment"), col("n_name"), expr(Band).as("bal_band"))
          .agg(countDistinct("o_orderpriority").as("l_div"),
            countDistinct("c_custkey").as("n_members"))
          .withColumn("below_l", (col("l_div") < 2).cast("int"))
          .orderBy("c_mktsegment", "n_name", "bal_band")
      },
      Some(s"""SELECT c_mktsegment, n_name, $BandSql AS bal_band,
              |  count(DISTINCT o_orderpriority) AS l_div,
              |  count(DISTINCT c_custkey) AS n_members,
              |  CAST(count(DISTINCT o_orderpriority) < 2 AS INT) AS below_l
              |FROM customer
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN orders ON c_custkey = o_custkey
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    ),

    // Generalization ladder: how k-anonymity improves as the balance
    // band coarsens (width 100 → 1000 → 5000). The widths fan out from a
    // 3-row literal against the customer rollup (probe-sweep shape — the
    // corpus is never duplicated per width at the scan level, only the
    // small per-group rollup is), reporting per width the group count,
    // the smallest group, and how many groups violate k = 5.
    QueryDef(
      "privacy_generalization_ladder",
      (s, d) => {
        val widths = s.range(0, 3).select(
          element_at(array(lit(100L), lit(1000L), lit(5000L)), (col("id") + 1).cast("int"))
            .as("width"))
        val c = T(s, d, "customer")
          .select(col("c_mktsegment"),
            expr("CAST(round(c_acctbal * 100.0D, 0) AS BIGINT)").as("cents"))
        c.crossJoin(broadcast(widths))
          .groupBy(col("width"), col("c_mktsegment"),
            expr("CAST(floor(cents / (width * 100.0D)) AS BIGINT)").as("band"))
          .agg(count(lit(1)).as("n"))
          .groupBy("width")
          .agg(count(lit(1)).as("n_groups"), min("n").as("min_size"),
            sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_below_k"))
          .orderBy("width")
      },
      Some("""SELECT CAST(width AS BIGINT) AS width, count(*) AS n_groups,
             |  CAST(min(n) AS BIGINT) AS min_size,
             |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k
             |FROM (
             |  SELECT w.width, c_mktsegment,
             |    CAST(floor(CAST(round(c_acctbal * 100.0, 0) AS BIGINT) / (w.width * 100.0))
             |         AS BIGINT) AS band,
             |    count(*) AS n
             |  FROM customer
             |  CROSS JOIN (SELECT unnest([100, 1000, 5000]) AS width) w
             |  GROUP BY 1, 2, 3)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )
}
