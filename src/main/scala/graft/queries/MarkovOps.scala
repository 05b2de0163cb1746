package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-model operators: the Markov chain over event types (the
  * user-journey model behind next-action prediction and anomalous-flow
  * detection) and RAKE keyphrase extraction (Rose et al. 2010 — the
  * stopword-delimited phrase scorer). Both all-integer / DECIMAL-exact
  * so DuckDB hash-matches.
  */
object MarkovOps {

  private val Scale = 1000000000000L // probability unit = 1e-12

  val qs: Seq[QueryDef] = Seq(

    // Markov stationary estimate: the event-type transition matrix from
    // per-user consecutive pairs (single-ordering window), then THREE
    // unrolled power-iteration steps from the uniform vector in exact
    // integer arithmetic (v·c DIV rowsum, the PageRank convention —
    // deterministic floor both engines; at |types| this SF the products
    // stay ≪ 2^63, at larger scale the unit shrinks). Each step is one
    // broadcast-size join + aggregation: the matrix is |types|² rows.
    QueryDef(
      "events_markov_stationary",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val pairs = T.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("nxt", lead("event_type", 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
          .agg(count(lit(1)).as("cij"))
        val rowSum = pairs.groupBy("src").agg(sum("cij").as("ci"))
        val types = pairs.select(col("src").as("t")).distinct()
        val n = types.agg(count(lit(1)).as("nt"))
        val v0 = types.crossJoin(broadcast(n))
          .select(col("t"), expr(s"${Scale}L DIV nt").as("v"))
        def step(v: org.apache.spark.sql.DataFrame) =
          v.join(pairs, col("t") === col("src"))
            .join(broadcast(rowSum), Seq("src"))
            .groupBy(col("dst"))
            .agg(sum(expr("v * cij DIV ci")).as("v"))
            .select(col("dst").as("t"), col("v"))
        val v3 = step(step(step(v0)))
        v3.select(col("t").as("event_type"), col("v").as("stationary_e12"))
          .orderBy("event_type")
      },
      Some(s"""WITH seq AS (
              |  SELECT event_type,
              |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
              |  FROM events),
              |p AS (SELECT event_type AS src, nxt AS dst, count(*) AS cij
              |      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
              |rs AS (SELECT src, CAST(sum(cij) AS BIGINT) AS ci FROM p GROUP BY 1),
              |ty AS (SELECT DISTINCT src AS t FROM p),
              |n AS (SELECT count(*) AS nt FROM ty),
              |v0 AS (SELECT t, $Scale // nt AS v FROM ty CROSS JOIN n),
              |v1 AS (SELECT dst AS t, CAST(sum(v * cij // ci) AS BIGINT) AS v
              |       FROM v0 JOIN p ON t = src JOIN rs USING (src) GROUP BY 1),
              |v2 AS (SELECT dst AS t, CAST(sum(v * cij // ci) AS BIGINT) AS v
              |       FROM v1 JOIN p ON t = src JOIN rs USING (src) GROUP BY 1),
              |v3 AS (SELECT dst AS t, CAST(sum(v * cij // ci) AS BIGINT) AS v
              |       FROM v2 JOIN p ON t = src JOIN rs USING (src) GROUP BY 1)
              |SELECT t AS event_type, v AS stationary_e12 FROM v3 ORDER BY 1""".stripMargin)
    ),

    // RAKE keyphrases: phrases are maximal stopword-free word runs
    // (phrase id = running stopword count per doc — one window), word
    // deg/freq from the phrase tokens, phrase score = Σ deg(w)/freq(w)
    // with each ratio rounded to 9 dp and DECIMAL-summed (order-free).
    // The word-stat table is vocabulary-sized (broadcast); distinct
    // phrases roll up with occurrence counts; top 15.
    QueryDef(
      "text_rake_keyphrases",
      (s, d) => {
        val stops = "('the','a','of','to','and','in')"
        val toks = T(s, d, "documents")
          .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+"))
            .as(Seq("pos", "w")))
          .withColumn("is_stop", expr(s"CAST(w IN $stops AS INT)"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val grp = toks.withColumn("gid", sum("is_stop").over(w))
          .where(col("is_stop") === 0)
        val phraseLen = grp.groupBy("doc_id", "gid").agg(count(lit(1)).as("plen"))
        val stats = grp.join(phraseLen, Seq("doc_id", "gid"))
          .groupBy("w")
          .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        val scored = grp.join(broadcast(stats), Seq("w"))
          .withColumn("ratio", expr(
            "CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 9) AS DECIMAL(18,9))"))
          .groupBy("doc_id", "gid")
          .agg(concat_ws(" ", collect_list(col("w"))).as("phrase"),
            sum("ratio").as("scoreDec"))
        // collect_list order inside groupBy is partition-order-sensitive;
        // rebuild the phrase deterministically from sorted (pos, w) pairs
        val phraseTxt = grp.groupBy("doc_id", "gid")
          .agg(concat_ws(" ", expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"))
            .as("phrase"))
        val rolled = scored.drop("phrase").join(phraseTxt, Seq("doc_id", "gid"))
          .groupBy("phrase")
          .agg(count(lit(1)).as("n_occ"),
            max(expr("round(CAST(scoreDec AS DOUBLE), 6)")).as("score"))
          .orderBy(col("score").desc, col("phrase"))
          .limit(15)
        rolled
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, i - 1 AS pos, ws[i] AS w,
             |    CAST(ws[i] IN ('the','a','of','to','and','in') AS INT) AS is_stop
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
             |       LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i)),
             |g AS (SELECT doc_id, pos, w,
             |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS gid, is_stop
             |  FROM toks),
             |grp AS (SELECT doc_id, pos, w, gid FROM g WHERE is_stop = 0),
             |pl AS (SELECT doc_id, gid, count(*) AS plen FROM grp GROUP BY 1, 2),
             |stats AS (SELECT w, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS deg
             |  FROM grp JOIN pl USING (doc_id, gid) GROUP BY 1),
             |scored AS (SELECT doc_id, gid,
             |    CAST(sum(CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 9)
             |        AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS sd
             |  FROM grp JOIN stats USING (w) GROUP BY 1, 2),
             |ptxt AS (SELECT doc_id, gid,
             |    string_agg(w, ' ' ORDER BY pos) AS phrase
             |  FROM grp GROUP BY 1, 2)
             |SELECT phrase, count(*) AS n_occ,
             |  max(round(CAST(sd AS DOUBLE), 6)) AS score
             |FROM scored JOIN ptxt USING (doc_id, gid)
             |GROUP BY 1 ORDER BY score DESC, phrase LIMIT 15""".stripMargin)
    )
  )
}
