package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second statistics batch: argmin/argmax aggregate surface, the
  * day-of-week × hour activity heatmap, and a deterministic Poisson
  * bootstrap — the resampling scheme that actually distributes (per-row
  * independent weights, no global multinomial draw), with every weight
  * derived from md5 so DuckDB reproduces the resamples bit-for-bit.
  */
object StatsOps2 {

  val qs: Seq[QueryDef] = Seq(

    // min_by / max_by (argmin/argmax aggregates): per priority, which
    // order carries the extreme total price. Ties are broken by the
    // value column only — o_totalprice ties on the same priority would
    // be nondeterministic, so the aggregated value is (cents, orderkey)
    // packed into one struct-ordered surrogate: cents * 10^7 + orderkey
    // stays within BIGINT (max ~6e12) and makes the argmin unique.
    QueryDef(
      "agg_min_by_argmin",
      (s, d) => {
        T(s, d, "orders")
          .withColumn("packed", expr(
            "CAST(round(o_totalprice * 100.0D, 0) AS BIGINT) * 10000000L + o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            min_by(col("o_orderkey"), col("packed")).as("cheapest_order"),
            max_by(col("o_orderkey"), col("packed")).as("priciest_order"),
            min(expr("packed DIV 10000000L")).as("min_cents"),
            max(expr("packed DIV 10000000L")).as("max_cents"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  arg_min(o_orderkey, CAST(round(o_totalprice * 100.0, 0) AS BIGINT) * 10000000 + o_orderkey) AS cheapest_order,
             |  arg_max(o_orderkey, CAST(round(o_totalprice * 100.0, 0) AS BIGINT) * 10000000 + o_orderkey) AS priciest_order,
             |  CAST(min((CAST(round(o_totalprice * 100.0, 0) AS BIGINT) * 10000000 + o_orderkey) // 10000000) AS BIGINT) AS min_cents,
             |  CAST(max((CAST(round(o_totalprice * 100.0, 0) AS BIGINT) * 10000000 + o_orderkey) // 10000000) AS BIGINT) AS max_cents
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Day-of-week × hour activity heatmap over events — the operational
    // rollup behind load forecasting. ISO day numbering pinned on both
    // sides via date_format/strftime; one |7×24|-bounded aggregation.
    QueryDef(
      "events_dow_hour_heatmap",
      (s, d) => {
        T.events(s, d)
          .groupBy((expr("weekday(ts)") + 1).cast("long").as("iso_dow"),
            hour(col("ts")).cast("long").as("hh"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(round(value * 1000000.0D, 0) AS BIGINT)")).as("sum_value_micro"))
          .orderBy("iso_dow", "hh")
      },
      Some("""SELECT CAST(isodow(ts) AS BIGINT) AS iso_dow,
             |  CAST(hour(ts) AS BIGINT) AS hh, count(*) AS n,
             |  CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS sum_value_micro
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Mann–Whitney U between two event types' values, tie-corrected, in
    // exact integers: combined average ranks doubled (2·minrank+ties−1),
    // so R1 and therefore U1 = R1 − n1(n1+1)/2 are integral when doubled.
    // Same reduced-support window pattern as the KS statistic.
    QueryDef(
      "stats_mann_whitney_u",
      (s, d) => {
        // Scale shape: the original form ran rank() OVER (ORDER BY v) on
        // the raw event rows — a single-partition global sort of the
        // fact. All the test needs per distinct value v is its tie count
        // and the count of smaller rows, so: roll up to (v, cnt,
        // view-cnt) — ONE shuffle, |distinct v| rows — then a salted
        // two-phase running sum (ScalableWindow) gives the inclusive
        // cumulative count cum(v). The doubled average rank of every row
        // tied at v is r2 = 2·rank + cnt − 1 = 2·cum − cnt + 1 with
        // rank = cum − cnt + 1, so the per-group sums reduce to closed
        // forms over the rollup. The oracle keeps the textbook per-row
        // window — same values by the algebra above.
        val ev = T.events(s, d).where(col("event_type").isin("view", "click"))
          .select(col("event_type").as("t"),
            expr("CAST(round(value * 1000000.0D, 0) AS BIGINT)").as("v"))
        val pv = ev.groupBy("v").agg(
          count(lit(1)).as("cnt"),
          sum(when(col("t") === "view", 1L).otherwise(0L)).as("vc"))
        val cum = graft.operators.ScalableWindow.withGlobalCumSum(
          pv, "cum", col("cnt"))(Seq(expr("v div 1000000L")), col("v"))
        cum.groupBy(lit(1).as("g"))
          .agg(
            sum("vc").cast("long").as("n1"),
            sum(expr("cnt - vc")).cast("long").as("n2"),
            sum(expr("vc * (2L * cum - cnt + 1L)")).cast("long").as("r1_doubled"))
          .withColumn("u1_doubled", expr("r1_doubled - n1 * (n1 + 1)"))
          .withColumn("u2_doubled", expr("2 * n1 * n2 - u1_doubled"))
          .drop("g")
      },
      Some("""WITH ev AS (SELECT event_type AS t,
             |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('view', 'click')),
             |r AS (SELECT t,
             |    2 * rank() OVER (ORDER BY v) + count(*) OVER (PARTITION BY v) - 1 AS r2
             |  FROM ev)
             |SELECT
             |  CAST(sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |  CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |  CAST(sum(CASE WHEN t = 'view' THEN r2 ELSE 0 END) AS BIGINT) AS r1_doubled,
             |  CAST(sum(CASE WHEN t = 'view' THEN r2 ELSE 0 END)
             |    - sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END)
             |      * (sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) + 1) AS BIGINT) AS u1_doubled,
             |  CAST(2 * sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END)
             |      * sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END)
             |    - (sum(CASE WHEN t = 'view' THEN r2 ELSE 0 END)
             |       - sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END)
             |         * (sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) + 1)) AS BIGINT) AS u2_doubled
             |FROM r""".stripMargin)
    ),

    // Approximate-randomization test (the distributed stand-in for an
    // exact permutation test): 99 md5-relabelings of the view/click
    // split, each emitting exact integer sufficient statistics per side
    // — the client finishes the p-value by comparing rational means.
    // Relabeling is per-row independent (u·(n1+n2) < n1·1e9, integer
    // cross-multiply), so the whole test is one ×100 map-side fan-out.
    // b = 0 carries the TRUE labels.
    QueryDef(
      "stats_permutation_test",
      (s, d) => {
        val ev = T.events(s, d).where(col("event_type").isin("view", "click"))
          .select(col("event_id"), col("event_type").as("t"),
            expr("CAST(round(value * 1000000.0D, 0) AS BIGINT)").as("v"))
        val tot = ev.agg(
          sum(when(col("t") === "view", 1L).otherwise(0L)).as("n1t"),
          count(lit(1)).as("nt"))
        val b = s.range(0, 100).select(col("id").as("b"))
        ev.crossJoin(broadcast(tot)).crossJoin(broadcast(b))
          .withColumn("u", expr(
            "CAST(conv(substring(md5(concat(CAST(event_id AS STRING), '#', CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000000000L"))
          .withColumn("lbl", expr(
            "CASE WHEN b = 0 THEN CAST(t = 'view' AS INT) " +
              "WHEN u * nt < n1t * 1000000000L THEN 1 ELSE 0 END"))
          .groupBy("b")
          .agg(sum(when(col("lbl") === 1, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("lbl") === 1, col("v")).otherwise(0L)).as("sum_a_micro"),
            sum(when(col("lbl") === 0, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("lbl") === 0, col("v")).otherwise(0L)).as("sum_b_micro"))
          .orderBy("b")
      },
      Some("""WITH ev AS (SELECT event_id, event_type AS t,
             |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('view', 'click')),
             |tot AS (SELECT CAST(sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n1t,
             |               count(*) AS nt FROM ev),
             |lab AS (SELECT b.b, v,
             |    CASE WHEN b.b = 0 THEN CAST(t = 'view' AS INT)
             |         WHEN (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#' || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT)
             |               % 1000000000) * nt < n1t * 1000000000 THEN 1 ELSE 0 END AS lbl
             |  FROM ev CROSS JOIN tot CROSS JOIN (SELECT unnest(range(0, 100)) AS b) b)
             |SELECT b, CAST(sum(CASE WHEN lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |  CAST(sum(CASE WHEN lbl = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_a_micro,
             |  CAST(sum(CASE WHEN lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |  CAST(sum(CASE WHEN lbl = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b_micro
             |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Chi-squared independence test (market segment × order status):
    // each cell's term is the exact-integer (O·N − ri·cj)² over the
    // double ri·cj·N (all products < 2^63 so the numerator is exact; the
    // one IEEE division per cell is deterministic), rounded 6 dp and
    // DECIMAL-summed over the |5×3| cells. Completes the test-stat
    // family next to KS / Mann–Whitney / randomization.
    QueryDef(
      "stats_chisq_independence",
      (s, d) => {
        val co = T(s, d, "orders")
          .join(broadcast(T(s, d, "customer").select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_orderstatus").as("st"))
          .agg(count(lit(1)).as("o"))
        val ri = co.groupBy("seg").agg(sum("o").as("rsum"))
        val cj = co.groupBy("st").agg(sum("o").as("csum"))
        val n = co.agg(sum("o").as("ntot"))
        co.join(broadcast(ri), Seq("seg")).join(broadcast(cj), Seq("st"))
          .crossJoin(broadcast(n))
          .withColumn("term", expr(
            """CAST(round(CAST((o * ntot - rsum * csum) * (o * ntot - rsum * csum) AS DOUBLE)
              |/ (CAST(rsum AS DOUBLE) * csum * ntot), 6) AS DECIMAL(18,6))"""
              .stripMargin.replace("\n", " ")))
          .agg(count(lit(1)).as("n_cells"),
            max("ntot").as("n_total"),
            sum("term").cast("double").as("chi2"),
            // dof derived from the observed table, not hardcoded: the
            // test data has 5 segments × 3 statuses, but the formula
            // must survive a cardinality change
            ((countDistinct("seg") - 1) * (countDistinct("st") - 1))
              .cast("long").as("dof"))
      },
      Some("""WITH co AS (
             |  SELECT c_mktsegment AS seg, o_orderstatus AS st, count(*) AS o
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |ri AS (SELECT seg, CAST(sum(o) AS BIGINT) AS rsum FROM co GROUP BY 1),
             |cj AS (SELECT st, CAST(sum(o) AS BIGINT) AS csum FROM co GROUP BY 1),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS ntot FROM co)
             |SELECT count(*) AS n_cells, CAST(max(ntot) AS BIGINT) AS n_total,
             |  CAST(sum(CAST(round(
             |    CAST((o * ntot - rsum * csum) * (o * ntot - rsum * csum) AS DOUBLE)
             |    / (CAST(rsum AS DOUBLE) * csum * ntot), 6) AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
             |  CAST((count(DISTINCT seg) - 1) * (count(DISTINCT st) - 1) AS BIGINT) AS dof
             |FROM co JOIN ri USING (seg) JOIN cj USING (st) CROSS JOIN n""".stripMargin)
    ),

    // count_if / bool_and / bool_or aggregate surface (booleans cast to
    // INT for a stable cross-engine dtype).
    QueryDef(
      "agg_countif_bool",
      (s, d) => {
        T(s, d, "orders")
          .groupBy("o_orderpriority")
          .agg(
            expr("count_if(o_totalprice > 150000.0D)").as("n_big"),
            expr("CAST(bool_or(o_orderstatus = 'F') AS INT)").as("any_f"),
            expr("CAST(bool_and(o_totalprice > 0.0D) AS INT)").as("all_pos"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(count(*) FILTER (WHERE o_totalprice > 150000.0) AS BIGINT) AS n_big,
             |  CAST(bool_or(o_orderstatus = 'F') AS INT) AS any_f,
             |  CAST(bool_and(o_totalprice > 0.0) AS INT) AS all_pos
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Two-sample Kolmogorov–Smirnov statistic between the value
    // distributions of two event types, as EXACT integers: D = max over
    // the merged support of |F1 − F2| is cross-multiplied to
    // max |cumA·n2 − cumB·n1| over (n1·n2) — no ECDF doubles ever cross
    // the compare. One aggregation to the distinct-value support (the
    // frame the single ordered window then runs over is |support|-sized,
    // the same reduced-frame trick as the Gini), ECDFs as running sums.
    QueryDef(
      "stats_ks_two_sample",
      (s, d) => {
        val ev = T.events(s, d).where(col("event_type").isin("view", "click"))
          .select(col("event_type").as("t"),
            expr("CAST(round(value * 1000000.0D, 0) AS BIGINT)").as("v"))
        val sup = ev.groupBy("v").agg(
          sum(when(col("t") === "view", 1L).otherwise(0L)).as("na"),
          sum(when(col("t") === "click", 1L).otherwise(0L)).as("nb"))
        val tot = sup.agg(sum("na").as("n1"), sum("nb").as("n2"))
        // the ECDF cumulatives run over the distinct-value support, which
        // GROWS with the data for a continuous value — salted two-phase
        // cumsum (ScalableWindow) instead of a single-task global window
        val cum = graft.operators.ScalableWindow.withGlobalCumSum(
          graft.operators.ScalableWindow.withGlobalCumSum(
            sup, "cumA", col("na"))(Seq(expr("v div 1000000L")), col("v")),
          "cumB", col("nb"))(Seq(expr("v div 1000000L")), col("v"))
        cum.crossJoin(broadcast(tot))
          .select(expr("abs(cumA * n2 - cumB * n1)").as("dnum"),
            col("n1"), col("n2"))
          .groupBy("n1", "n2")
          .agg(max("dnum").as("ks_num"))
          .withColumn("ks_den", expr("n1 * n2"))
          .select("n1", "n2", "ks_num", "ks_den")
      },
      Some("""WITH ev AS (SELECT event_type AS t,
             |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('view', 'click')),
             |sup AS (SELECT v,
             |    CAST(sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             |    CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nb
             |  FROM ev GROUP BY 1),
             |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2 FROM sup),
             |c AS (SELECT v, sum(na) OVER (ORDER BY v) AS cumA,
             |             sum(nb) OVER (ORDER BY v) AS cumB FROM sup)
             |SELECT n1, n2,
             |  CAST(max(abs(cumA * n2 - cumB * n1)) AS BIGINT) AS ks_num,
             |  CAST(n1 * n2 AS BIGINT) AS ks_den
             |FROM c CROSS JOIN tot GROUP BY 1, 2""".stripMargin)
    ),

    // Time-decay attribution: each purchase credits the user's preceding
    // clicks within 48h by 2^(−hours_elapsed) — exact dyadic weights
    // scaled by 2^48 so every credit is an integer (no float decay).
    // One interval join per (user) key bounded by the 48h window, then a
    // per-click rollup.
    QueryDef(
      "events_attrib_time_decay",
      (s, d) => {
        val ev = T.events(s, d)
        val buys = ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("bu"), col("ts").as("bts"), col("event_id").as("bid"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
        buys.join(clicks, col("bu") === col("cu") &&
            col("cts") <= col("bts") &&
            col("cts") > col("bts") - expr("INTERVAL 48 HOURS"))
          .withColumn("hrs", expr("CAST((unix_micros(bts) - unix_micros(cts)) DIV 3600000000L AS INT)"))
          .withColumn("credit", expr("CAST(shiftleft(1L, 48 - hrs) AS BIGINT)"))
          .groupBy(col("cu").as("user_id"), col("cid").as("click_id"))
          .agg(count(lit(1)).as("n_purchases"), sum("credit").as("credit_2e48"))
          .orderBy("user_id", "click_id")
      },
      Some("""SELECT c.user_id AS user_id, c.event_id AS click_id,
             |  count(*) AS n_purchases,
             |  CAST(sum(CAST(2 AS BIGINT) ** (48 - CAST((epoch_us(b.ts) - epoch_us(c.ts)) // 3600000000 AS INT))) AS BIGINT) AS credit_2e48
             |FROM events b JOIN events c
             |  ON b.user_id = c.user_id
             | AND b.event_type = 'purchase' AND c.event_type = 'click'
             | AND c.ts <= b.ts AND c.ts > b.ts - INTERVAL 48 HOUR
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // Deterministic Poisson bootstrap of the mean order value, B = 100
    // resamples: every (row, b) weight is Poisson(1) via inverse-CDF on
    // an md5-derived uniform — the per-row-independent scheme that scales
    // (a true multinomial bootstrap needs a global draw; Poisson weights
    // need only the row and the resample id). The output is each
    // resample's exact integer sufficient statistics plus its
    // milli-cent mean, so the 5th/95th percentile CI is a client-side
    // sort of 100 rows. One map-side ×100 fan-out, one shuffle on b.
    QueryDef(
      "stats_bootstrap_poisson",
      (s, d) => {
        val o = T(s, d, "orders").select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100.0D, 0) AS BIGINT)").as("cents"))
        val b = s.range(0, 100).select(col("id").as("b"))
        // Poisson(1) inverse CDF at 1e-9 resolution (cumulative:
        // 0.367879441, 0.735758882, 0.919698603, 0.981011843,
        // 0.996340153, 0.999405815, else 6)
        val w = """CASE WHEN u < 367879441L THEN 0L WHEN u < 735758882L THEN 1L
                  |WHEN u < 919698603L THEN 2L WHEN u < 981011843L THEN 3L
                  |WHEN u < 996340153L THEN 4L WHEN u < 999405815L THEN 5L
                  |ELSE 6L END""".stripMargin.replace("\n", " ")
        o.crossJoin(broadcast(b))
          .withColumn("u", expr(
            "CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), ':', CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000000000L"))
          .withColumn("w", expr(w))
          .groupBy("b")
          .agg(sum("w").as("n_eff"), sum(expr("w * cents")).as("sum_cents"))
          .withColumn("mean_millicents", expr("sum_cents * 1000L DIV n_eff"))
          .orderBy("b")
      },
      Some("""SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
             |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(w * cents) * 1000 // sum(w) AS BIGINT) AS mean_millicents
             |FROM (
             |  SELECT b, cents,
             |    CASE WHEN u < 367879441 THEN 0 WHEN u < 735758882 THEN 1
             |         WHEN u < 919698603 THEN 2 WHEN u < 981011843 THEN 3
             |         WHEN u < 996340153 THEN 4 WHEN u < 999405815 THEN 5
             |         ELSE 6 END AS w
             |  FROM (
             |    SELECT o_orderkey, CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents,
             |      b.b,
             |      CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT)
             |        % 1000000000 AS u
             |    FROM orders CROSS JOIN (SELECT unnest(range(0, 100)) AS b) b))
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )
}
