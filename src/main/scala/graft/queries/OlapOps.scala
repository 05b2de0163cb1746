package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-level OLAP grouping surface (ROLLUP / CUBE / GROUPING SETS) and
  * rank-statistic aggregates. These are the shapes a reporting layer on
  * top of the engine issues constantly; Spark plans all of them as a
  * single Expand + hash-aggregate (one shuffle regardless of how many
  * grouping levels), which is exactly the plan that survives 100 TB —
  * subtotal levels are computed in the same pass as the leaves, never by
  * re-scanning.
  *
  * Cross-engine exactness: subtotal NULLs are coalesced to an 'ALL'
  * sentinel on both sides (the group values are year strings / enum
  * strings that can never collide with it); Spearman travels as integer
  * sufficient statistics over doubled average ranks (2*rank+ties-1 is
  * always integral), so no double summation ever crosses the compare.
  */
object OlapOps {

  private val OCents = "CAST(round(o_totalprice * 100.0D, 0) AS BIGINT)"
  private val OCentsSql = "CAST(round(o_totalprice * 100.0, 0) AS BIGINT)"

  val qs: Seq[QueryDef] = Seq(

    // ROLLUP (year, priority): leaf rows + per-year subtotals + grand
    // total in one Expand pass.
    QueryDef(
      "agg_rollup_year_priority",
      (s, d) => {
        T(s, d, "orders")
          .select(date_format(col("o_orderdate"), "yyyy").as("o_year"),
            col("o_orderpriority"), expr(OCents).as("cents"))
          .rollup("o_year", "o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
          .select(coalesce(col("o_year"), lit("ALL")).as("o_year"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
            col("n"), col("sum_cents"))
          .orderBy("o_year", "o_orderpriority")
      },
      Some(s"""SELECT coalesce(o_year, 'ALL') AS o_year,
              |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
              |  n, sum_cents
              |FROM (SELECT strftime(o_orderdate, '%Y') AS o_year, o_orderpriority,
              |        count(*) AS n, CAST(sum($OCentsSql) AS BIGINT) AS sum_cents
              |      FROM orders GROUP BY ROLLUP(o_year, o_orderpriority)) t
              |ORDER BY 1, 2""".stripMargin)
    ),

    // CUBE (segment, status) over customer⨝orders: all four grouping
    // levels from one shuffle.
    QueryDef(
      "agg_cube_segment_status",
      (s, d) => {
        // through the SQL surface: the DataFrame `cube` verb re-resolves
        // the key names against the join's child lineage and trips the
        // ambiguous-self-join check; GROUP BY CUBE in SQL resolves cleanly
        // (same Expand + single-shuffle plan either way)
        val c = T(s, d, "customer").select("c_custkey", "c_mktsegment")
        T(s, d, "orders").select(col("o_custkey"), col("o_orderstatus"), expr(OCents).as("cents"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .createOrReplaceTempView("graft_cube_co")
        s.sql("""SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
                |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                |  count(1) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
                |FROM graft_cube_co
                |GROUP BY CUBE(c_mktsegment, o_orderstatus)
                |ORDER BY 1, 2""".stripMargin)
      },
      Some(s"""SELECT coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
              |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
              |  n, sum_cents
              |FROM (SELECT c_mktsegment, o_orderstatus, count(*) AS n,
              |        CAST(sum($OCentsSql) AS BIGINT) AS sum_cents
              |      FROM orders JOIN customer ON c_custkey = o_custkey
              |      GROUP BY CUBE(c_mktsegment, o_orderstatus)) t
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Explicit GROUPING SETS — two disjoint single-column levels plus the
    // grand total, the asymmetric case ROLLUP/CUBE can't express. Goes
    // through the SQL surface (the DataFrame API has no grouping-sets
    // verb), same Expand plan underneath.
    QueryDef(
      "agg_grouping_sets_mixed",
      (s, d) => {
        T(s, d, "orders").createOrReplaceTempView("graft_gs_orders")
        s.sql(s"""SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                 |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                 |  count(1) AS n, CAST(sum($OCents) AS BIGINT) AS sum_cents
                 |FROM graft_gs_orders
                 |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
                 |ORDER BY 1, 2""".stripMargin)
      },
      Some(s"""SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
              |  coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
              |  count(*) AS n, CAST(sum($OCentsSql) AS BIGINT) AS sum_cents
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Nested-JSON shredding round-trip: each order serialized to a
    // nested document (scalar + struct + array of its sorted line
    // numbers) with to_json, re-parsed with from_json against an
    // explicit schema, and the extracted fields compared against a
    // purely relational recompute — the semi-structured path (serialize
    // → shred → extract) proven value-exact, not just parseable.
    QueryDef(
      "json_nested_roundtrip",
      (s, d) => {
        val lines = T(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_linenumber").cast("long"))).as("items"))
        val js = T(s, d, "orders")
          .join(lines, col("o_orderkey") === col("l_orderkey"))
          .select(to_json(struct(
            col("o_orderkey").as("k"),
            struct(col("o_custkey").as("cust"), col("o_orderpriority").as("pri")).as("c"),
            col("items"))).as("doc"))
        val schema = "STRUCT<k: BIGINT, c: STRUCT<cust: BIGINT, pri: STRING>, items: ARRAY<BIGINT>>"
        js.select(from_json(col("doc"), org.apache.spark.sql.types.DataType
            .fromDDL(s"v $schema").asInstanceOf[org.apache.spark.sql.types.StructType]
            .fields.head.dataType).as("v"))
          .select(col("v.k").as("k"), col("v.c.cust").as("cust"), col("v.c.pri").as("pri"),
            expr("CAST(size(v.items) AS BIGINT)").as("n_items"),
            expr("v.items[0]").as("first_item"))
          .orderBy("k")
      },
      Some("""SELECT o_orderkey AS k, o_custkey AS cust, o_orderpriority AS pri,
             |  count(*) AS n_items,
             |  CAST(min(l_linenumber) AS BIGINT) AS first_item
             |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
             |GROUP BY 1, 2, 3 ORDER BY k""".stripMargin)
    ),

    // MapType surface: per-user event-type→count maps built with
    // map_from_entries, probed with element_at — the map-typed
    // aggregation pattern, reduced to scalars so the oracle can compare.
    QueryDef(
      "agg_map_type_surface",
      (s, d) => {
        T.events(s, d)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
          .groupBy("user_id")
          .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
            .as("m"))
          .select(col("user_id"),
            coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
            coalesce(element_at(col("m"), "view"), lit(0L)).as("views"),
            expr("CAST(size(m) AS BIGINT)").as("n_types"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
             |  count(DISTINCT event_type) AS n_types
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // LATERAL correlated join surface: for each nation, the top-2
    // customers by balance from a correlated ORDER BY … LIMIT subquery —
    // the SQL shape Spark rewrites through DecorrelateInnerQuery into
    // the same ranked-window plan the DataFrame top-k uses. Ties made
    // impossible by the (cents, custkey) packed ordering.
    QueryDef(
      "j14_lateral_topk",
      (s, d) => {
        T(s, d, "nation").createOrReplaceTempView("graft_lat_nation")
        T(s, d, "customer").createOrReplaceTempView("graft_lat_customer")
        s.sql("""SELECT n_name, c_custkey,
                |  CAST(round(c_acctbal * 100.0D, 0) AS BIGINT) AS bal_cents
                |FROM graft_lat_nation,
                |LATERAL (SELECT c_custkey, c_acctbal FROM graft_lat_customer
                |         WHERE c_nationkey = n_nationkey
                |         ORDER BY CAST(round(c_acctbal * 100.0D, 0) AS BIGINT) DESC,
                |                  c_custkey
                |         LIMIT 2)
                |ORDER BY n_name, bal_cents DESC, c_custkey""".stripMargin)
      },
      Some("""SELECT n_name, c_custkey,
             |  CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS bal_cents
             |FROM nation,
             |LATERAL (SELECT c_custkey, c_acctbal FROM customer
             |         WHERE c_nationkey = n_nationkey
             |         ORDER BY CAST(round(c_acctbal * 100.0, 0) AS BIGINT) DESC,
             |                  c_custkey
             |         LIMIT 2)
             |ORDER BY n_name, bal_cents DESC, c_custkey""".stripMargin)
    ),

    // Spearman rank correlation (quantity vs extended price, per return
    // flag) as integer sufficient statistics: average ranks with ties,
    // doubled so they stay integral (2*minrank + ties - 1), then the five
    // sums any client needs to finish ρ. Two window passes + one
    // aggregate; the window partitions by the group key so no global
    // sort.
    QueryDef(
      "stats_spearman_suffstats",
      (s, d) => {
        val li = T(s, d, "lineitem").select(col("l_returnflag").as("flag"),
          expr("CAST(l_quantity AS BIGINT)").as("qv"),
          expr("CAST(round(l_extendedprice * 100.0D, 0) AS BIGINT)").as("pv"))
        val rq = rank().over(Window.partitionBy("flag").orderBy("qv"))
        val cq = count(lit(1)).over(Window.partitionBy("flag", "qv"))
        val rp = rank().over(Window.partitionBy("flag").orderBy("pv"))
        val cp = count(lit(1)).over(Window.partitionBy("flag", "pv"))
        li.withColumn("rx2", lit(2L) * rq + cq - 1L)
          .withColumn("ry2", lit(2L) * rp + cp - 1L)
          .groupBy("flag")
          .agg(count(lit(1)).as("n"),
            sum("rx2").as("sum_rx2"), sum("ry2").as("sum_ry2"),
            sum(expr("rx2 * rx2")).as("sum_rx2_sq"),
            sum(expr("ry2 * ry2")).as("sum_ry2_sq"),
            sum(expr("rx2 * ry2")).as("sum_rxy"))
          .orderBy("flag")
      },
      Some("""SELECT flag, count(*) AS n,
             |  CAST(sum(rx2) AS BIGINT) AS sum_rx2,
             |  CAST(sum(ry2) AS BIGINT) AS sum_ry2,
             |  CAST(sum(rx2 * rx2) AS BIGINT) AS sum_rx2_sq,
             |  CAST(sum(ry2 * ry2) AS BIGINT) AS sum_ry2_sq,
             |  CAST(sum(rx2 * ry2) AS BIGINT) AS sum_rxy
             |FROM (
             |  SELECT flag,
             |    2 * rank() OVER (PARTITION BY flag ORDER BY qv)
             |      + count(*) OVER (PARTITION BY flag, qv) - 1 AS rx2,
             |    2 * rank() OVER (PARTITION BY flag ORDER BY pv)
             |      + count(*) OVER (PARTITION BY flag, pv) - 1 AS ry2
             |  FROM (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qv,
             |          CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS pv
             |        FROM lineitem) raw) r
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // first_value / last_value with an explicit full-partition frame —
    // the earliest and latest order (by date, key-tiebroken) per
    // priority, reduced to one row per priority.
    QueryDef(
      "w_first_last_per_priority",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T(s, d, "orders")
          .withColumn("first_key", first_value(col("o_orderkey")).over(w))
          .withColumn("last_key", last_value(col("o_orderkey")).over(w))
          .groupBy("o_orderpriority")
          .agg(max("first_key").as("first_key"), max("last_key").as("last_key"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, max(first_key) AS first_key,
             |  max(last_key) AS last_key, count(*) AS n
             |FROM (
             |  SELECT o_orderpriority,
             |    first_value(o_orderkey) OVER w AS first_key,
             |    last_value(o_orderkey) OVER w AS last_key
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_orderdate, o_orderkey
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )
}
