package graft.queries

import org.apache.spark.sql.functions._

/** The rest of the TPC-H suite, adapted to the driver's schema (no
  * partsupp, no commit/receipt dates, no ship modes/containers/phones —
  * each query's header comment states the adaptation). Together with
  * TpchOps (Q3/Q5/Q10) this covers every classic analytical join shape:
  * EXISTS / NOT EXISTS pairs (Q4, Q21), correlated scalar subqueries
  * (Q15, Q17, Q22), left-outer distribution histograms (Q13), disjunctive
  * multi-column predicates (Q19), share-of-total ratios (Q8, Q14), and
  * the big snowflake aggregations (Q1, Q7, Q9).
  *
  * Cross-engine exactness rules (same as TpchOps): all money flows as
  * BIGINT cents rounded per row; every avg-threshold comparison is
  * rewritten to integer cross-multiplication (qty*5*cnt < sum, cents*cnt
  * > sum) so no double summation order can flip a boundary row; years
  * travel as strings via date_format/strftime.
  *
  * Scale notes (100 TB): nation/region/supplier and every scalar
  * aggregate ride as broadcasts; the fact-side joins shuffle on their
  * keys with AQE picking broadcast for filtered build sides; the Q21
  * "latest supplier" rewrite replaces the quadratic NOT EXISTS self-join
  * with two keyed aggregations (per-(order,supplier) then per-order
  * top-2), which is the only formulation that survives a fact table that
  * no longer fits a broadcast.
  */
object TpchOps2 {

  private val Rev = "CAST(round(l_extendedprice * (1.0D - l_discount) * 100.0D, 0) AS BIGINT)"
  private val RevSql = "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)"

  val qs: Seq[QueryDef] = Seq(

    // Q1: the pricing summary report — full-table aggregate over lineitem
    // with per-row decimal charge arithmetic. Averages are exact integer
    // divisions (floor) of the cent sums, not double avgs.
    QueryDef(
      "tpch_q1_pricing_summary",
      (s, d) => {
        T(s, d, "lineitem")
          .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"),
            sum(expr("CAST(round(l_extendedprice * 100.0D, 0) AS BIGINT)")).as("sum_base_cents"),
            sum(expr(Rev)).as("sum_disc_cents"),
            sum(expr("CAST(round(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax) * 100.0D, 0) AS BIGINT)"))
              .as("sum_charge_cents"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty_milli", expr("sum_qty * 1000L DIV count_order"))
          .withColumn("avg_price_cents", expr("sum_base_cents DIV count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0, 0) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
             |  count(*) AS count_order,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) * 1000 // count(*) AS BIGINT) AS avg_qty_milli,
             |  CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) // count(*) AS BIGINT) AS avg_price_cents
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Q2: minimum-cost supplier. Adaptation (no partsupp): for each
    // ECONOMY part under size 25, the supplier who shipped it with the
    // LOWEST account balance, restricted to EUROPE — the correlated-min
    // shape, computed as a packed-integer argmin per part (biased
    // cents·10¹⁰ + suppkey makes the minimum unique and positive) instead
    // of a correlated subquery per row. Top 20 by supplier balance desc.
    QueryDef(
      "tpch_q2_min_cost_supplier",
      (s, d) => {
        val europe = T(s, d, "region").where(col("r_name") === "EUROPE").select("r_regionkey")
        val nat = T(s, d, "nation")
          .join(broadcast(europe), col("n_regionkey") === col("r_regionkey"), "left_semi")
          .select("n_nationkey", "n_name")
        val supp = T(s, d, "supplier")
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            expr("CAST(round(s_acctbal * 100.0D, 0) AS BIGINT)").as("bal_cents"))
        val p = T(s, d, "part")
          .where(col("p_type") === "ECONOMY" && col("p_size") < 25)
          .select("p_partkey", "p_brand", "p_size")
        val shipped = T(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
          .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        // Pack with a +100000-cent bias: s_acctbal can be negative
        // (≥ −999.99), and an unbiased bal_cents*M + suppkey makes
        // packed % M a NEGATIVE remainder for those suppliers, so the
        // join back on best_suppkey silently dropped every part whose
        // cheapest supplier was in the red. The bias keeps the packed
        // value positive; the multiplier 1e10 leaves room for suppkeys
        // at any realistic scale (1e17 ≪ 2⁶³).
        val best = shipped
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy("l_partkey")
          .agg(min(expr("(bal_cents + 100000L) * 10000000000L + s_suppkey"))
            .as("packed"))
          .select(col("l_partkey").as("pk"),
            expr("packed % 10000000000L").as("best_suppkey"),
            expr("packed DIV 10000000000L - 100000L").as("bal_cents"))
        best.join(broadcast(p), col("pk") === col("p_partkey"))
          .join(broadcast(supp.select(col("s_suppkey"), col("s_name"), col("n_name"))),
            col("best_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
            col("bal_cents"))
          .orderBy(col("bal_cents").desc, col("p_partkey"))
          .limit(20)
      },
      Some("""WITH supp AS (
             |  SELECT s_suppkey, s_name, n_name,
             |    CAST(round(s_acctbal * 100.0, 0) AS BIGINT) AS bal_cents
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |p AS (SELECT p_partkey, p_brand FROM part
             |      WHERE p_type = 'ECONOMY' AND p_size < 25),
             |shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             |  WHERE l_partkey IN (SELECT p_partkey FROM p)),
             |best AS (SELECT l_partkey AS pk,
             |    CAST(min((bal_cents + 100000) * 10000000000 + s_suppkey) % 10000000000 AS BIGINT) AS best_suppkey,
             |    CAST(min((bal_cents + 100000) * 10000000000 + s_suppkey) // 10000000000 - 100000 AS BIGINT) AS bal_cents
             |  FROM shipped JOIN supp ON l_suppkey = s_suppkey
             |  GROUP BY 1)
             |SELECT p_partkey, p_brand, s_name, n_name, best.bal_cents AS bal_cents
             |FROM best JOIN p ON pk = p_partkey
             |JOIN supp ON best_suppkey = s_suppkey
             |ORDER BY best.bal_cents DESC, p_partkey LIMIT 20""".stripMargin)
    ),

    // Q4: order-priority checking. Adaptation: "late line" means shipped
    // more than 60 days after the order date (no commit/receipt dates in
    // this schema). EXISTS becomes a left-semi join with a non-equi
    // conjunct on the join condition.
    QueryDef(
      "tpch_q4_order_priority",
      (s, d) => {
        val o = T(s, d, "orders")
          .where(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = T(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
             |  AND o_orderdate < TIMESTAMP '1997-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Q6: the forecast-revenue-change scan — a single filtered map-side
    // aggregate, the query every zone-map / pushdown audit uses.
    QueryDef(
      "tpch_q6_forecast_revenue",
      (s, d) => {
        T(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") >= 0.04 && col("l_discount") <= 0.06 &&
            col("l_quantity") < 24)
          .agg(sum(expr("CAST(round(l_extendedprice * l_discount * 100.0D, 0) AS BIGINT)"))
            .as("revenue_cents"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
             |  count(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount >= 0.04 AND l_discount <= 0.06
             |  AND l_quantity < 24""".stripMargin)
    ),

    // Q7: volume shipping between two nations, both directions, by ship
    // year — the double-dimension join where each side of the pair binds
    // to a different branch of the snowflake.
    QueryDef(
      "tpch_q7_volume_shipping",
      (s, d) => {
        val n1 = T(s, d, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = T(s, d, "nation").select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        val supp = T(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val cust = T(s, d, "customer").select("c_custkey", "c_nationkey")
        val o = T(s, d, "orders").select("o_orderkey", "o_custkey")
        val l = T(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            date_format(col("l_shipdate"), "yyyy").as("l_year"), expr(Rev).as("rev"))
        l.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy("supp_nation", "cust_nation", "l_year")
          .agg(sum("rev").as("revenue_cents"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  strftime(l_shipdate, '%Y') AS l_year,
              |  CAST(sum($RevSql) AS BIGINT) AS revenue_cents
              |FROM lineitem
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN orders ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate < TIMESTAMP '1998-01-01'
              |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    ),

    // Q8: national market share — NATION_8's share of STANDARD-part
    // revenue sold to ASIA-region customers, by order year. The ratio is
    // emitted as exact numerator/denominator cents (a double division
    // would re-introduce summation-order sensitivity).
    QueryDef(
      "tpch_q8_market_share",
      (s, d) => {
        val asia = T(s, d, "region").where(col("r_name") === "ASIA").select("r_regionkey")
        val natC = T(s, d, "nation")
          .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"), "left_semi")
          .select(col("n_nationkey").as("ck"))
        val natS = T(s, d, "nation").select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val p = T(s, d, "part").where(col("p_type") === "STANDARD").select("p_partkey")
        val supp = T(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val cust = T(s, d, "customer").select("c_custkey", "c_nationkey")
        val o = T(s, d, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            date_format(col("o_orderdate"), "yyyy").as("o_year"))
        val l = T(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), expr(Rev).as("rev"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(natC), col("c_nationkey") === col("ck"), "left_semi")
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(natS), col("s_nationkey") === col("sk"))
          .groupBy("o_year")
          .agg(sum(when(col("supp_nation") === "NATION_8", col("rev")).otherwise(0L)).as("nation_cents"),
            sum("rev").as("total_cents"))
          .orderBy("o_year")
      },
      Some(s"""SELECT strftime(o_orderdate, '%Y') AS o_year,
              |  CAST(sum(CASE WHEN n2.n_name = 'NATION_8' THEN $RevSql ELSE 0 END) AS BIGINT) AS nation_cents,
              |  CAST(sum($RevSql) AS BIGINT) AS total_cents
              |FROM lineitem
              |JOIN part ON p_partkey = l_partkey
              |JOIN orders ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |JOIN region ON n1.n_regionkey = r_regionkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Q9: product-type profit. Adaptation: supply cost proxy is
    // p_retailprice/10 per unit (no partsupp), parts are the '%red%'
    // family; profit = revenue − cost, by supplier nation and order year.
    QueryDef(
      "tpch_q9_product_profit",
      (s, d) => {
        val p = T(s, d, "part").where(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice")
        val supp = T(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val nat = T(s, d, "nation").select("n_nationkey", "n_name")
        val o = T(s, d, "orders")
          .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy").as("o_year"))
        // NO fan-out here, by measurement: every join below is broadcast and
        // the final aggregate does map-side partial aggregation, so the
        // single-task scan chain (600 k rows at sf0.1) costs less than the
        // exchange a fan-out adds (A/B min-of-5: 0.60 s bare vs 0.92 s
        // fanned — the 15 MB exchange + stage barrier never pays for
        // itself when everything downstream of it is map-side anyway). At
        // cluster scale the scan has splits >= cores and a fan-out would be
        // a no-op, so leaving it out is scale-neutral.
        val l = T(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"),
            expr(Rev).as("rev"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("amount",
            col("rev") - expr("CAST(round(p_retailprice * 10.0D * l_quantity, 0) AS BIGINT)"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), col("o_year"))
          .agg(sum("amount").as("profit_cents"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
              |  CAST(sum($RevSql - CAST(round(p_retailprice * 10.0 * l_quantity, 0) AS BIGINT)) AS BIGINT) AS profit_cents
              |FROM lineitem
              |JOIN part ON p_partkey = l_partkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN orders ON o_orderkey = l_orderkey
              |WHERE p_name LIKE '%red%'
              |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin),
      headline = true
    ),

    // Q11: important stock. Adaptation (no partsupp): a part's "stock
    // value" is Σ qty · retail-price cents over lines shipped by
    // NATION_3's suppliers; keep parts whose value exceeds 1/10000 of
    // the nation's total — the HAVING-share-of-total shape with the
    // threshold integer cross-multiplied (value · 10000 > total).
    QueryDef(
      "tpch_q11_important_stock",
      (s, d) => {
        val supp3 = T(s, d, "supplier")
          .join(broadcast(T(s, d, "nation").where(col("n_name") === "NATION_3")
            .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select("s_suppkey")
        val p = T(s, d, "part").select("p_partkey", "p_retailprice")
        val vals = T(s, d, "lineitem")
          .join(broadcast(supp3), col("l_suppkey") === col("s_suppkey"), "left_semi")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("l_partkey")
          .agg(sum(expr("CAST(round(p_retailprice * 100.0D * l_quantity, 0) AS BIGINT)"))
            .as("value_cents"))
        val tot = vals.agg(sum("value_cents").as("total_cents"))
        vals.crossJoin(broadcast(tot))
          .where(col("value_cents") * 10000 > col("total_cents"))
          .select(col("l_partkey").as("p_partkey"), col("value_cents"))
          .orderBy(col("value_cents").desc, col("p_partkey"))
      },
      Some("""WITH vals AS (
             |  SELECT l_partkey AS p_partkey,
             |    CAST(sum(CAST(round(p_retailprice * 100.0 * l_quantity, 0) AS BIGINT)) AS BIGINT) AS value_cents
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey
             |  WHERE l_suppkey IN (
             |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |    WHERE n_name = 'NATION_3')
             |  GROUP BY 1)
             |SELECT p_partkey, value_cents FROM vals
             |WHERE value_cents * 10000 > (SELECT sum(value_cents) FROM vals)
             |ORDER BY value_cents DESC, p_partkey""".stripMargin)
    ),

    // Q12: shipping-priority split. Adaptation: grouped by l_returnflag
    // (no ship modes); counts lines from high- vs low-priority orders
    // shipped in 1997 — the conditional-count (CASE-sum) shape.
    QueryDef(
      "tpch_q12_priority_lines",
      (s, d) => {
        val o = T(s, d, "orders").select("o_orderkey", "o_orderpriority")
        val l = T(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_returnflag")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Q13: customer order-count distribution — the left-outer join whose
    // zero bucket matters, then a histogram over the per-customer counts.
    QueryDef(
      "tpch_q13_customer_distribution",
      (s, d) => {
        val o = T(s, d, "orders").where(!col("o_orderpriority").startsWith("4"))
          .select("o_orderkey", "o_custkey")
        val c = T(s, d, "customer").select("c_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
             |  GROUP BY 1) t
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)
    ),

    // Q14: promo revenue share for one month, as exact cents
    // numerator/denominator.
    QueryDef(
      "tpch_q14_promo_revenue",
      (s, d) => {
        val p = T(s, d, "part").select("p_partkey", "p_type")
        T(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
          .select(col("l_partkey"), expr(Rev).as("rev"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L)).as("promo_cents"),
            sum("rev").as("total_cents"))
      },
      Some(s"""SELECT
              |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $RevSql ELSE 0 END) AS BIGINT) AS promo_cents,
              |  CAST(sum($RevSql) AS BIGINT) AS total_cents
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin)
    ),

    // Q15: top supplier — revenue per supplier for one quarter, keeping
    // the supplier(s) whose total equals the global max (scalar-subquery
    // max as a broadcast single-row join, never a global sort).
    QueryDef(
      "tpch_q15_top_supplier",
      (s, d) => {
        val rev = T(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(expr(Rev)).as("total_cents"))
        val mx = rev.agg(max("total_cents").as("mx"))
        val supp = T(s, d, "supplier").select("s_suppkey", "s_name")
        rev.join(broadcast(mx), col("total_cents") === col("mx"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_cents"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, CAST(sum($RevSql) AS BIGINT) AS total_cents
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |    AND l_shipdate < TIMESTAMP '1997-04-01'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, total_cents
              |FROM rev JOIN supplier ON s_suppkey = l_suppkey
              |WHERE total_cents = (SELECT max(total_cents) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)
    ),

    // Q16: supplier diversity per part family. Adaptation: "complaint"
    // suppliers are those with negative account balance; counts distinct
    // shipping suppliers per (brand, type, size) from lineitem.
    QueryDef(
      "tpch_q16_supplier_part_counts",
      (s, d) => {
        val bad = T(s, d, "supplier").where(col("s_acctbal") < 0).select("s_suppkey")
        val p = T(s, d, "part")
          .where(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        T(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    ),

    // Q17: small-quantity-order revenue. The correlated avg-threshold
    // (l_quantity < 0.2 * avg over the part) is cross-multiplied to
    // exact integers: 5 * qty * cnt < sum_qty.
    QueryDef(
      "tpch_q17_small_quantity",
      (s, d) => {
        val p = T(s, d, "part")
          .where(col("p_brand") === "Brand#2" && col("p_type") === "ECONOMY")
          .select("p_partkey")
        val perPart = T(s, d, "lineitem").groupBy(col("l_partkey").as("pk"))
          .agg(count(lit(1)).as("cnt"), sum(expr("CAST(l_quantity AS BIGINT)")).as("sq"))
        T(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
          .join(perPart, col("l_partkey") === col("pk"))
          .where(expr("5L * CAST(l_quantity AS BIGINT) * cnt < sq"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100.0D, 0) AS BIGINT)")).as("total_cents"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS total_cents,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN (SELECT l_partkey AS pk, count(*) AS cnt,
             |        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
             |      FROM lineitem GROUP BY 1) a ON pk = l_partkey
             |WHERE p_brand = 'Brand#2' AND p_type = 'ECONOMY'
             |  AND 5 * CAST(l_quantity AS BIGINT) * cnt < sq""".stripMargin)
    ),

    // Q18: large-volume customers — orders whose line quantities sum past
    // 300, with customer context; the HAVING-subquery shape as a
    // post-aggregation filter joined back to its dimensions.
    QueryDef(
      "tpch_q18_large_volume",
      (s, d) => {
        val big = T(s, d, "lineitem").groupBy(col("l_orderkey").as("bk"))
          .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
          .where(col("sum_qty") > 300)
        val o = T(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val c = T(s, d, "customer").select("c_custkey", "c_name")
        o.join(big, col("o_orderkey") === col("bk"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            expr("CAST(round(o_totalprice * 100.0D, 0) AS BIGINT)").as("total_cents"),
            col("sum_qty"))
          .orderBy(col("total_cents").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             |  CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS total_cents,
             |  CAST(sum_qty AS BIGINT) AS sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey AS bk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |      FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300) b
             |  ON o_orderkey = bk
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY total_cents DESC, o_orderkey LIMIT 100""".stripMargin)
    ),

    // Q19: discounted revenue under three disjunctive brand/size/quantity
    // bands — the OR-of-ANDs predicate that exercises predicate
    // normalization. Joined on the equi-key; the disjunction stays a
    // post-join filter so the join itself remains hashable.
    QueryDef(
      "tpch_q19_disjunctive_bands",
      (s, d) => {
        val p = T(s, d, "part").select("p_partkey", "p_brand", "p_size")
        T(s, d, "lineitem").select(col("l_partkey"), col("l_quantity"), expr(Rev).as("rev"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#15" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#19" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(sum("rev").as("revenue_cents"), count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT CAST(sum($RevSql) AS BIGINT) AS revenue_cents, count(*) AS n_lines
              |FROM lineitem JOIN part ON p_partkey = l_partkey
              |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
    ),

    // Q20: suppliers who dominated a part's supply. Adaptation: a
    // supplier qualifies if it shipped more than half of some '%blue%'
    // part's total 1997 quantity (2*supp_qty > part_total, exact
    // integers); the semi-join keeps supplier rows.
    QueryDef(
      "tpch_q20_dominant_suppliers",
      (s, d) => {
        val p = T(s, d, "part").where(col("p_name").like("%blue%")).select("p_partkey")
        val l97 = T(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_partkey", "l_suppkey")
          .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("sq"))
        val tot = l97.groupBy(col("l_partkey").as("pk"))
          .agg(sum("sq").as("tot"))
        val winners = l97.join(tot, col("l_partkey") === col("pk"))
          .where(col("sq") * 2 > col("tot"))
          .select("l_suppkey").distinct()
        T(s, d, "supplier").select("s_suppkey", "s_name")
          .join(winners, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .orderBy("s_suppkey")
      },
      Some("""WITH sq AS (
             |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_name LIKE '%blue%'
             |    AND l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1998-01-01'
             |  GROUP BY 1, 2)
             |SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM sq a
             |  WHERE 2 * sq > (SELECT sum(sq) FROM sq b WHERE b.l_partkey = a.l_partkey))
             |ORDER BY s_suppkey""".stripMargin)
    ),

    // Q21: suppliers who kept multi-supplier orders waiting. Adaptation:
    // a line is "late" if shipped > 60 days after the order date; the
    // NOT-EXISTS ("no other supplier shipped later") is rewritten as ONE
    // fact scan: tag late lines at the orders join, aggregate
    // per-(order,supplier) carrying the (≤lines-per-order) late-ship
    // list, then derive each supplier's "other suppliers' max" with
    // chained window functions over a single order-keyed partitioning —
    // 3 shuffles and one lineitem pass total, vs the naive per-line-pair
    // self-join. A late line qualifies iff its ship date is >= that
    // other-max (only the order's strictly-latest supplier can qualify).
    QueryDef(
      "tpch_q21_waiting_orders",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = T(s, d, "orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val joined = T(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          // ONE exchange on the order key serves both the per-(order,supplier)
          // aggregate (clustering on a SUBSET of the grouping keys satisfies
          // it) and the order-partitioned windows below, which previously
          // planned their own hashpartitioning(l_orderkey) exchange over the
          // aggregated frame — 3 shuffles → 2 (guide §2.4: window keyed like
          // the preceding aggregation shares its exchange). It also moves the
          // collect_list partial aggregation out of the single-task parquet
          // scan stage (unsplittable one-row-group file at bench scale).
          .repartition(col("l_orderkey"))
        val perSupp = joined.groupBy("l_orderkey", "l_suppkey")
          .agg(max("l_shipdate").as("smax"),
            collect_list(when(col("late"), col("l_shipdate"))).as("late_ships"))
        val w = Window.partitionBy("l_orderkey")
        val ctx = perSupp
          .withColumn("max1", max("smax").over(w))
          .withColumn("nsupp", count(lit(1)).over(w))
          .withColumn("cnt1",
            sum(when(col("smax") === col("max1"), 1L).otherwise(0L)).over(w))
          .withColumn("max2", max(when(col("smax") < col("max1"), col("smax"))).over(w))
          .withColumn("other_max",
            when(col("smax") === col("max1") && col("cnt1") === 1, col("max2"))
              .otherwise(col("max1")))
        val waits = ctx.where(col("nsupp") >= 2)
          .withColumn("nw",
            expr("CAST(size(filter(late_ships, x -> x >= other_max)) AS BIGINT)"))
          .where(col("nw") > 0)
        val supp = T(s, d, "supplier").select("s_suppkey", "s_name")
        waits.groupBy("l_suppkey").agg(sum("nw").as("numwait"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier
             |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |WHERE o_orderstatus = 'F'
             |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > l1.l_shipdate)
             |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin),
      headline = true
    ),

    // Q22: dormant wealthy customers. Adaptation: grouped by market
    // segment (no phone country codes); "wealthy" means account balance
    // above the positive-balance average (exact cross-multiplication),
    // "dormant" means no orders on/after 1999-01-01 (anti-join against
    // the filtered order set — every customer has SOME order in this
    // data, so the unfiltered form would be vacuously empty).
    QueryDef(
      "tpch_q22_dormant_customers",
      (s, d) => {
        val cust = T(s, d, "customer")
          .withColumn("cents", expr("CAST(round(c_acctbal * 100.0D, 0) AS BIGINT)"))
        val pos = cust.where(col("cents") > 0)
          .agg(sum("cents").as("psum"), count(lit(1)).as("pcnt"))
        cust.crossJoin(broadcast(pos))
          .where(col("cents") * col("pcnt") > col("psum"))
          .join(T(s, d, "orders")
            .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"), sum("cents").as("tot_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust,
             |  CAST(sum(CAST(round(c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT) AS tot_cents
             |FROM customer
             |WHERE CAST(round(c_acctbal * 100.0, 0) AS BIGINT)
             |      * (SELECT count(*) FROM customer
             |         WHERE CAST(round(c_acctbal * 100.0, 0) AS BIGINT) > 0)
             |    > (SELECT CAST(sum(CAST(round(c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
             |       FROM customer WHERE CAST(round(c_acctbal * 100.0, 0) AS BIGINT) > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )
}
