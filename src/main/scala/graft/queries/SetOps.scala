package graft.queries

import org.apache.spark.sql.functions._

/** Grouping-set and set-operation coverage beyond the reference's operator
  * inventory (the reference has no rollup/cube/union — SURVEY.md §2.4 notes
  * their absence): a user of a general analytics engine expects them, and
  * each is a one-shuffle Catalyst built-in, so the scale story is the same
  * as a plain groupBy. All DuckDB-oracled.
  *
  * Oracle conventions: grouping-set null keys sort LAST on both sides via
  * explicit `NULLS LAST`; aggregate sums go through DECIMAL to stay
  * order-independent.
  */
object SetOps {

  val qs: Seq[QueryDef] = Seq(
    // ROLLUP: per-(returnflag, linestatus) totals + per-returnflag subtotals
    // + grand total, one pass (Catalyst Expand + single shuffle)
    QueryDef(
      "g1_rollup",
      (s, d) =>
        T(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
             |count(*) AS cnt
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)),

    // CUBE over two independent dimensions
    QueryDef(
      "g2_cube",
      (s, d) =>
        T(s, d, "orders")
          .cube("o_orderstatus", "o_orderpriority")
          .agg(sum(col("o_totalprice").cast("decimal(20,2)")).cast("double").as("sum_price"),
            count(lit(1)).as("cnt"))
          .orderBy(col("o_orderstatus").asc_nulls_last, col("o_orderpriority").asc_nulls_last),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_price,
             |count(*) AS cnt
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin)),

    // explicit GROUPING SETS (the general form; grouping_id disambiguates
    // the all-null key row from genuine nulls)
    QueryDef(
      "g3_grouping_sets",
      (s, d) => {
        T(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            |CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
            |FROM lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin)),

    // UNION (distinct) of two key sets
    QueryDef(
      "u1_union",
      (s, d) => {
        val a = T(s, d, "customer").select(col("c_nationkey").as("k"))
        val b = T(s, d, "supplier").select(col("s_nationkey").as("k"))
        a.union(b).distinct().orderBy("k")
      },
      Some("""SELECT c_nationkey AS k FROM customer
             |UNION
             |SELECT s_nationkey AS k FROM supplier
             |ORDER BY k""".stripMargin)),

    // INTERSECT: nations having both customers and suppliers
    QueryDef(
      "u2_intersect",
      (s, d) => {
        val a = T(s, d, "customer").select(col("c_nationkey").as("k"))
        val b = T(s, d, "supplier").select(col("s_nationkey").as("k"))
        a.intersect(b).orderBy("k")
      },
      Some("""SELECT c_nationkey AS k FROM customer
             |INTERSECT
             |SELECT s_nationkey AS k FROM supplier
             |ORDER BY k""".stripMargin)),

    // EXCEPT: customers' nations with no supplier
    QueryDef(
      "u3_except",
      (s, d) => {
        val a = T(s, d, "customer").select(col("c_nationkey").as("k"))
        val b = T(s, d, "supplier").select(col("s_nationkey").as("k"))
        a.except(b).orderBy("k")
      },
      Some("""SELECT c_nationkey AS k FROM customer
             |EXCEPT
             |SELECT s_nationkey AS k FROM supplier
             |ORDER BY k""".stripMargin)),

    // UNION ALL + re-aggregation (the multi-source append pattern)
    QueryDef(
      "u4_union_all_agg",
      (s, d) => {
        val a = T(s, d, "customer")
          .select(col("c_nationkey").as("k"), col("c_acctbal").cast("decimal(20,2)").as("v"))
        val b = T(s, d, "supplier")
          .select(col("s_nationkey").as("k"), col("s_acctbal").cast("decimal(20,2)").as("v"))
        a.unionByName(b).groupBy("k")
          .agg(sum("v").cast("double").as("sum_bal"), count(lit(1)).as("cnt"))
          .orderBy("k")
      },
      Some("""SELECT k, CAST(sum(v) AS DOUBLE) AS sum_bal, count(*) AS cnt FROM (
             |  SELECT c_nationkey AS k, CAST(c_acctbal AS DECIMAL(20,2)) AS v FROM customer
             |  UNION ALL
             |  SELECT s_nationkey AS k, CAST(s_acctbal AS DECIMAL(20,2)) AS v FROM supplier)
             |GROUP BY k ORDER BY k""".stripMargin))
  )
}
