package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/data-quality evaluation suite — the metrics a training pipeline
  * computes over its own filters and scorers: ranking quality (AUC),
  * probability calibration (ECE), labeler agreement (Cohen's κ), and
  * source concentration (Gini). Every metric is emitted as EXACT integer
  * numerator/denominator (plus basis points via integer division), so the
  * DuckDB compare is bit-for-bit — no FP ratio ever crosses engines.
  *
  * The "model" under evaluation is a deterministic scorer derived from
  * the data (doc length), which keeps the fixtures self-contained; the
  * metric machinery is what these queries pin.
  */
object EvalOps {

  val qs: Seq[QueryDef] = Seq(

    // ROC AUC as the rank statistic it is: AUC = U/(n₁·n₂) with U the
    // Mann–Whitney statistic of positive-class scores, computed EXACTLY
    // over the per-score rollup — doubled average ranks avoid halves
    // (auc_num = 2U, auc_den = 2·n₁·n₂). Scale shape: one shuffle to the
    // (score → count, positives) rollup, then the salted two-phase
    // cumulative count (ScalableWindow) — no global-sort window over the
    // raw rows, unlike the textbook rank() formulation.
    QueryDef(
      "eval_auc_rank",
      (s, d) => {
        val pv = T(s, d, "documents")
          .select(col("n_chars").cast("long").as("v"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
          .groupBy("v")
          .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
        val cum = graft.operators.ScalableWindow.withGlobalCumSum(
          pv, "cum", col("cnt"))(Seq(expr("v div 256L")), col("v"))
        cum.groupBy(lit(1).as("g"))
          .agg(
            sum("pos").cast("long").as("n_pos"),
            sum(expr("cnt - pos")).cast("long").as("n_neg"),
            sum(expr("pos * (2L * cum - cnt + 1L)")).cast("long").as("r1_doubled"))
          .withColumn("auc_num", expr("r1_doubled - n_pos * (n_pos + 1)"))
          .withColumn("auc_den", expr("2 * n_pos * n_neg"))
          // single-class degenerate input ⇒ den = 0: Spark div yields NULL
          // but DuckDB // raises — make both engines emit NULL explicitly
          .withColumn("auc_bp", expr(
            "CASE WHEN auc_den = 0 THEN NULL ELSE auc_num * 10000 div auc_den END"))
          .drop("g")
      },
      Some("""WITH t AS (SELECT CAST(n_chars AS BIGINT) AS v,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
             |r AS (SELECT y,
             |    2 * rank() OVER (ORDER BY v) + count(*) OVER (PARTITION BY v) - 1 AS r2
             |  FROM t)
             |SELECT
             |  CAST(sum(y) AS BIGINT) AS n_pos,
             |  CAST(sum(1 - y) AS BIGINT) AS n_neg,
             |  CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r1_doubled,
             |  CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)
             |    - sum(y) * (sum(y) + 1) AS BIGINT) AS auc_num,
             |  CAST(2 * sum(y) * sum(1 - y) AS BIGINT) AS auc_den,
             |  CAST(CASE WHEN 2 * sum(y) * sum(1 - y) = 0 THEN NULL
             |    ELSE (sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) - sum(y) * (sum(y) + 1))
             |      * 10000 // (2 * sum(y) * sum(1 - y)) END AS BIGINT) AS auc_bp
             |FROM r""".stripMargin)),

    // Expected calibration error over 10 equal-width confidence bins:
    // the deterministic pseudo-model emits conf = n/(n+500) in basis
    // points (monotone in length, saturating — a plausible sigmoid-ish
    // shape); per bin the row reports count, positives, accuracy and
    // mean confidence in bp, and the |acc − conf|·n contribution. The
    // final ECE is Σ contribution ÷ N, integer everywhere. Scale: one
    // rollup shuffle to ≤10 bins; everything after is driver-trivial.
    QueryDef(
      "eval_calibration_ece",
      (s, d) => {
        val scored = T(s, d, "documents")
          .select(
            when(col("lang") === "en", 1L).otherwise(0L).as("y"),
            expr("(CAST(n_chars AS BIGINT) * 10000) div (CAST(n_chars AS BIGINT) + 500)")
              .as("conf_bp"))
          .withColumn("bin", expr("least(conf_bp div 1000, 9L)"))
        val bins = scored.groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("y").as("pos"),
            sum("conf_bp").as("conf_sum"))
          .withColumn("acc_bp", expr("pos * 10000 div n"))
          .withColumn("avg_conf_bp", expr("conf_sum div n"))
          .withColumn("contrib", expr("abs(acc_bp - avg_conf_bp) * n"))
        val tot = bins.agg(sum("n").as("nt"), sum("contrib").as("ct"))
        bins.crossJoin(broadcast(tot))
          .select(col("bin"), col("n").cast("long").as("n"),
            col("pos").cast("long").as("pos"),
            col("acc_bp").cast("long").as("acc_bp"),
            col("avg_conf_bp").cast("long").as("avg_conf_bp"),
            expr("CAST(ct div nt AS BIGINT)").as("ece_bp"))
          .orderBy("bin")
      },
      Some("""WITH scored AS (SELECT
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             |    (CAST(n_chars AS BIGINT) * 10000) // (CAST(n_chars AS BIGINT) + 500) AS conf_bp
             |  FROM documents),
             |b AS (SELECT least(conf_bp // 1000, 9) AS bin, y, conf_bp FROM scored),
             |bins AS (SELECT bin, count(*) AS n, sum(y) AS pos, sum(conf_bp) AS conf_sum
             |  FROM b GROUP BY 1),
             |w AS (SELECT bin, n, pos,
             |    pos * 10000 // n AS acc_bp, conf_sum // n AS avg_conf_bp,
             |    abs(pos * 10000 // n - conf_sum // n) * n AS contrib
             |  FROM bins),
             |tot AS (SELECT sum(n) AS nt, sum(contrib) AS ct FROM w)
             |SELECT bin, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
             |  CAST(acc_bp AS BIGINT) AS acc_bp,
             |  CAST(avg_conf_bp AS BIGINT) AS avg_conf_bp,
             |  CAST(ct // nt AS BIGINT) AS ece_bp
             |FROM w, tot ORDER BY bin""".stripMargin)),

    // Cohen's κ between two deterministic labelers (the language tag vs
    // a length rule): κ = (N·Σdiag − Σ rowᵢ·colᵢ) / (N² − Σ rowᵢ·colᵢ),
    // exact integers from the 2×2 confusion counts. The agreement audit
    // every multi-labeler annotation pipeline runs. One rollup shuffle.
    QueryDef(
      "eval_cohens_kappa",
      (s, d) => {
        val lab = T(s, d, "documents").select(
          when(col("lang") === "en", 1L).otherwise(0L).as("a"),
          when(col("n_chars") >= 800, 1L).otherwise(0L).as("b"))
        lab.groupBy(lit(1).as("g"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END")).as("n11"),
            sum(expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END")).as("n10"),
            sum(expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END")).as("n01"),
            sum(expr("CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END")).as("n00"))
          .withColumn("kappa_num", expr(
            "n * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"))
          .withColumn("kappa_den", expr(
            "n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"))
          // κ can be negative (worse than chance) and Spark's `div`
          // truncates toward zero while DuckDB's `//` floors — route the
          // division through abs() so both engines agree on the sign case.
          // den = 0 (constant labeler, pe = 1): Spark div would NULL but
          // DuckDB // raises — both engines emit NULL explicitly.
          .withColumn("kappa_bp", expr(
            """CASE WHEN kappa_den = 0 THEN NULL
              |  WHEN kappa_num < 0
              |  THEN -((-kappa_num) * 10000 div kappa_den)
              |  ELSE kappa_num * 10000 div kappa_den END"""
              .stripMargin.replace("\n", " ")))
          .select("n", "n11", "n10", "n01", "n00",
            "kappa_num", "kappa_den", "kappa_bp")
      },
      Some("""WITH lab AS (SELECT
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             |    CASE WHEN n_chars >= 800 THEN 1 ELSE 0 END AS b
             |  FROM documents),
             |c AS (SELECT count(*) AS n,
             |    sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
             |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
             |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01,
             |    sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00
             |  FROM lab)
             |SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
             |  CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
             |  CAST(n00 AS BIGINT) AS n00,
             |  CAST(n * (n11 + n00)
             |    - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS BIGINT) AS kappa_num,
             |  CAST(n * n
             |    - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) AS BIGINT) AS kappa_den,
             |  CAST(CASE WHEN n * n
             |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) = 0 THEN NULL
             |    WHEN n * (n11 + n00)
             |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) < 0
             |    THEN -((-(n * (n11 + n00)
             |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))) * 10000
             |      // (n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
             |    ELSE (n * (n11 + n00)
             |      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))) * 10000
             |      // (n * n - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
             |    END AS BIGINT) AS kappa_bp
             |FROM c""".stripMargin)),

    // Gini coefficient of the per-source document distribution — the
    // concentration number a mixture report leads with ("are we 90%
    // one crawl?"). Exact integers over the sorted per-source counts:
    // G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ ascending. The rank
    // window runs over the |sources| rollup (bounded — lint-safe).
    QueryDef(
      "eval_gini_sources",
      (s, d) => {
        val per = T(s, d, "documents").groupBy("source")
          .agg(count(lit(1)).as("x"))
        val ranked = per.withColumn("i",
          row_number().over(Window.orderBy(col("x"), col("source"))).cast("long"))
        ranked.groupBy(lit(1).as("g"))
          .agg(count(lit(1)).cast("long").as("n_sources"),
            sum("x").cast("long").as("n_docs"),
            sum(expr("i * x")).cast("long").as("ix_sum"))
          .withColumn("gini_num", expr("2 * ix_sum - (n_sources + 1) * n_docs"))
          .withColumn("gini_den", expr("n_sources * n_docs"))
          .withColumn("gini_bp", expr("gini_num * 10000 div gini_den"))
          .drop("g")
      },
      Some("""WITH per AS (SELECT source, count(*) AS x FROM documents GROUP BY 1),
             |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source) AS BIGINT) AS i
             |  FROM per)
             |SELECT CAST(count(*) AS BIGINT) AS n_sources,
             |  CAST(sum(x) AS BIGINT) AS n_docs,
             |  CAST(sum(i * x) AS BIGINT) AS ix_sum,
             |  CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS BIGINT) AS gini_num,
             |  CAST(count(*) * sum(x) AS BIGINT) AS gini_den,
             |  CAST((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 10000
             |    // (count(*) * sum(x)) AS BIGINT) AS gini_bp
             |FROM r""".stripMargin)),

    // Kneser–Ney sufficient statistics — the counts an interpolated-KN
    // bigram LM is built from: per word, its raw unigram count, its
    // CONTINUATION count N₁₊(·w) (distinct left contexts — the KN
    // insight: "Francisco" is frequent but predictable, so its
    // continuation count is tiny), its fan-out N₁₊(w·), and the KN
    // lower-order probability as an exact rational over total distinct
    // bigram types. Top 25 by continuation count (tiebreak word) — the
    // words a KN model backs off TO. Scale shape: one shuffle to the
    // distinct-bigram rollup, per-word aggregates from it, top-k via
    // TakeOrdered; the scalar total broadcasts.
    QueryDef(
      "text_kneser_ney_stats",
      (s, d) => {
        val docs = T(s, d, "documents")
          .withColumn("ws", expr("filter(split(text, ' +'), x -> x != '')"))
          .where(size(col("ws")) >= 2)
        val bigrams = docs.select(explode(expr(
            """transform(sequence(1, size(ws) - 1),
              |  i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""
            .stripMargin)).as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val types = bigrams.distinct()
        val cont = types.groupBy(col("w2").as("w"))
          .agg(count(lit(1)).cast("long").as("continuation"))
        val fanout = types.groupBy(col("w1").as("w"))
          .agg(count(lit(1)).cast("long").as("fanout"))
        val unic = docs.select(explode(col("ws")).as("w"))
          .groupBy("w").agg(count(lit(1)).cast("long").as("c_uni"))
        val totTypes = types.agg(count(lit(1)).cast("long").as("n_bigram_types"))
        cont.join(unic, Seq("w"))
          .join(fanout, Seq("w"), "left_outer")
          .crossJoin(broadcast(totTypes))
          .select(col("w"), col("c_uni"), col("continuation"),
            coalesce(col("fanout"), lit(0L)).as("fanout"),
            col("n_bigram_types"),
            expr("continuation * 1000000 div n_bigram_types").as("p_cont_ppm"))
          .orderBy(col("continuation").desc, col("w"))
          .limit(25)
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, ' +'), x -> x <> '') AS ws
             |  FROM documents),
             |d2 AS (SELECT doc_id, ws FROM t WHERE len(ws) >= 2),
             |bg AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
             |  FROM d2, LATERAL (SELECT unnest(range(1, len(ws))) AS i)),
             |types AS (SELECT DISTINCT w1, w2 FROM bg),
             |cont AS (SELECT w2 AS w, CAST(count(*) AS BIGINT) AS continuation
             |  FROM types GROUP BY 1),
             |fan AS (SELECT w1 AS w, CAST(count(*) AS BIGINT) AS fanout
             |  FROM types GROUP BY 1),
             |uni AS (SELECT unnest(ws) AS w FROM d2),
             |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c_uni FROM uni GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM types)
             |SELECT cont.w AS w, c_uni, continuation,
             |  COALESCE(fanout, 0) AS fanout, n_bigram_types,
             |  CAST(continuation * 1000000 // n_bigram_types AS BIGINT) AS p_cont_ppm
             |FROM cont JOIN uc ON cont.w = uc.w
             |LEFT JOIN fan ON cont.w = fan.w
             |CROSS JOIN tot
             |ORDER BY continuation DESC, cont.w LIMIT 25""".stripMargin))
  )
}
