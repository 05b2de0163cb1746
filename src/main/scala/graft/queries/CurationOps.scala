package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators from the published LLM-data playbooks —
  * rule-based quality gating (the Gopher/MassiveText heuristics),
  * deterministic per-language rebalancing, curriculum difficulty
  * ordering, and link-analysis authority scoring (HITS) as a quality
  * prior. All map-side or single-shuffle; every score is integer-exact
  * (milli/basis-point scaling, floor division) so DuckDB hash-matches
  * bit-for-bit.
  */
object CurationOps {

  private lazy val GopherOracle =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
      |  CAST(length(regexp_replace(text, '\s+', '', 'g')) * 1000
      |       // len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS mean_wl_milli,
      |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
      |       w -> w IN ('the','a','of','to','and','in'))) AS BIGINT) AS stop_hits,
      |  CAST(len(string_split_regex(trim(text), '\s+')) BETWEEN 10 AND 100000
      |    AND length(regexp_replace(text, '\s+', '', 'g')) * 1000
      |        // len(string_split_regex(trim(text), '\s+')) BETWEEN 2000 AND 10000
      |    AND len(list_filter(string_split_regex(trim(text), '\s+'),
      |        w -> w IN ('the','a','of','to','and','in'))) >= 2 AS INT) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin

  val qs: Seq[QueryDef] = Seq(

    // Gopher-style rule filter: word count bounds, mean word length
    // bounds, minimum stopword evidence. Entirely map-side (no shuffle
    // but the final ordering) — at 100 TB this runs as a pure scan.
    // Scores are exact integers: mean word length in milli-chars is
    // (total chars * 1000) DIV n_words.
    QueryDef(
      "text_gopher_rules",
      (s, d) => {
        T(s, d, "documents")
          .withColumn("words", split(trim(col("text")), "\\s+"))
          .withColumn("n_words", size(col("words")).cast("long"))
          .withColumn("char_sum", length(regexp_replace(col("text"), "\\s+", "")).cast("long"))
          .withColumn("mean_wl_milli", expr("char_sum * 1000L DIV n_words"))
          .withColumn("stop_hits",
            expr("CAST(size(filter(words, w -> w IN ('the','a','of','to','and','in'))) AS BIGINT)"))
          .withColumn("keep", expr(
            """CAST(n_words BETWEEN 10 AND 100000
              |  AND mean_wl_milli BETWEEN 2000 AND 10000
              |  AND stop_hits >= 2 AS INT)""".stripMargin))
          .select("doc_id", "n_words", "mean_wl_milli", "stop_hits", "keep")
          .orderBy("doc_id")
      },
      Some(GopherOracle)
    ),

    // STREAMING twin of the Gopher gate: the same rule projection over a
    // band-ordered file stream (map-only, no state) — the lambda-
    // unification proof that the quality gate gives identical verdicts
    // whether the corpus arrives as a batch or incrementally. Shares the
    // batch oracle; narrow bands force ≥2 micro-batches.
    QueryDef(
      "text_gopher_rules_stream",
      (s, d) => {
        val (scored, nBatches) = graft.streaming.DocStream.gopherGate(
          s, T(s, d, "documents").select("doc_id", "text"))
        require(nBatches >= 2,
          s"expected >=2 micro-batches from band staging, saw $nBatches")
        scored.orderBy("doc_id")
      },
      Some(GopherOracle)
    ),

    // Deterministic language rebalancing: downsample every language to
    // the smallest language's size, in expectation, using an md5-derived
    // uniform per doc — keep iff u * cnt_lang < min_cnt * 10000 (integer
    // cross-multiply; no doubles). The per-language counts ride as a
    // broadcast (|langs| rows); the keep decision is map-side, so the
    // whole rebalance is one small-dim join over a scan — the only shape
    // that works when the corpus is 100 TB and the language table is KB.
    QueryDef(
      "corpus_lang_rebalance",
      (s, d) => {
        val docs = T(s, d, "documents")
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
        val minCnt = counts.agg(min("cnt").as("min_cnt"))
        docs.join(broadcast(counts), Seq("lang"))
          .crossJoin(broadcast(minCnt))
          .withColumn("u", expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 10000"))
          .where(col("u") * col("cnt") < col("min_cnt") * 10000)
          .groupBy("lang")
          .agg(count(lit(1)).as("kept"), max("cnt").as("orig"))
          .orderBy("lang")
      },
      Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
             |m AS (SELECT min(cnt) AS min_cnt FROM c)
             |SELECT lang, count(*) AS kept, CAST(max(cnt) AS BIGINT) AS orig
             |FROM documents JOIN c USING (lang), m
             |WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000)
             |      * cnt < min_cnt * 10000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Curriculum ordering: rank documents easy→hard inside each language
    // by an integer difficulty score (mean word length in milli-chars
    // plus type-token ratio in basis points). Partitioned rank — no
    // global sort; at scale each language sorts independently.
    QueryDef(
      "text_curriculum_order",
      (s, d) => {
        val scored = T(s, d, "documents")
          .withColumn("words", split(trim(col("text")), "\\s+"))
          .withColumn("n_words", size(col("words")).cast("long"))
          .withColumn("mean_wl_milli",
            expr("length(regexp_replace(text, '\\\\s+', '')) * 1000L DIV n_words"))
          .withColumn("ttr_bp",
            expr("CAST(size(array_distinct(words)) AS BIGINT) * 10000L DIV n_words"))
          .withColumn("difficulty", col("mean_wl_milli") + col("ttr_bp"))
        scored.withColumn("rank_in_lang",
            rank().over(Window.partitionBy("lang")
              .orderBy(col("difficulty"), col("doc_id"))).cast("long"))
          .select("lang", "doc_id", "difficulty", "rank_in_lang")
          .orderBy("lang", "rank_in_lang")
      },
      Some("""SELECT lang, doc_id, difficulty,
             |  CAST(rank() OVER (PARTITION BY lang ORDER BY difficulty, doc_id) AS BIGINT)
             |    AS rank_in_lang
             |FROM (
             |  SELECT lang, doc_id,
             |    length(regexp_replace(text, '\s+', '', 'g')) * 1000
             |      // len(string_split_regex(trim(text), '\s+'))
             |    + len(list_distinct(string_split_regex(trim(text), '\s+'))) * 10000
             |      // len(string_split_regex(trim(text), '\s+')) AS difficulty
             |  FROM documents)
             |ORDER BY lang, rank_in_lang""".stripMargin)
    ),

    // Inverted-index build: materialize per-token posting lists (the
    // batch index-construction step of a corpus search/retrieval layer).
    // One shuffle on the token key; each posting list is emitted as its
    // document frequency plus an md5 over the ascending doc-id list, so
    // the oracle proves the DISTRIBUTED build produced exactly the right
    // postings without dumping them. At 100 TB the posting lists for
    // frequent tokens are the skew risk — df is computed in the same
    // pass, so a production run would route df-above-threshold tokens to
    // a chunked encoding.
    QueryDef(
      "text_inverted_index",
      (s, d) => {
        T(s, d, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
          .distinct()
          .groupBy("tok")
          .agg(count(lit(1)).as("df"),
            md5(concat_ws(",", sort_array(collect_list(col("doc_id"))))).as("postings_md5"))
          .orderBy(col("df").desc, col("tok"))
      },
      Some("""SELECT tok, count(*) AS df,
             |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS postings_md5
             |FROM (SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
             |      FROM documents)
             |GROUP BY 1 ORDER BY df DESC, tok""".stripMargin)
    ),

    // Deterministic random-walk corpus (the DeepWalk/node2vec training-
    // data generator): one length-4 walk per customer over the bipartite
    // customer↔supplier order graph, each step's next-hop chosen by an
    // md5-derived index into the node's SORTED neighbor list — so the
    // walk corpus is a pure function of the graph and DuckDB re-derives
    // it exactly. Each step is one keyed join against the adjacency
    // table; at 100 TB the per-node neighbor lists would be capped
    // (top-K by weight) before the collect, bounding both state and the
    // hub-join fan-out.
    QueryDef(
      "graph_walk_corpus",
      (s, d) => {
        val e = T(s, d, "lineitem").select("l_orderkey", "l_suppkey")
          .join(T(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
          .distinct()
        val adjC = e.groupBy("c").agg(sort_array(collect_list(col("sup"))).as("ns"))
        val adjS = e.groupBy("sup").agg(sort_array(collect_list(col("c"))).as("nc"))
        def u(step: Int) =
          s"CAST(conv(substring(md5(concat(CAST(c0 AS STRING), ':$step')), 1, 8), 16, 10) AS BIGINT)"
        val w1 = adjC.select(col("c").as("c0"), col("ns"))
          .withColumn("s1", expr(s"element_at(ns, CAST(${u(1)} % size(ns) AS INT) + 1)"))
          .select("c0", "s1")
        val w2 = w1.join(adjS, col("s1") === col("sup"))
          .withColumn("c2", expr(s"element_at(nc, CAST(${u(2)} % size(nc) AS INT) + 1)"))
          .select("c0", "s1", "c2")
        val w3 = w2.join(adjC, col("c2") === col("c"))
          .withColumn("s2", expr(s"element_at(ns, CAST(${u(3)} % size(ns) AS INT) + 1)"))
          .select("c0", "s1", "c2", "s2")
        w3.orderBy("c0")
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
             |           FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
             |adjc AS (SELECT c, list_sort(list(sup)) AS ns FROM e GROUP BY 1),
             |adjs AS (SELECT sup, list_sort(list(c)) AS nc FROM e GROUP BY 1),
             |w1 AS (SELECT c AS c0, ns,
             |    ns[CAST(CAST(('0x' || substr(md5(CAST(c AS VARCHAR) || ':1'), 1, 8)) AS BIGINT)
             |       % len(ns) AS INT) + 1] AS s1
             |  FROM adjc),
             |w2 AS (SELECT c0, s1,
             |    nc[CAST(CAST(('0x' || substr(md5(CAST(c0 AS VARCHAR) || ':2'), 1, 8)) AS BIGINT)
             |       % len(nc) AS INT) + 1] AS c2
             |  FROM w1 JOIN adjs ON s1 = sup),
             |w3 AS (SELECT c0, s1, c2,
             |    ns[CAST(CAST(('0x' || substr(md5(CAST(c0 AS VARCHAR) || ':3'), 1, 8)) AS BIGINT)
             |       % len(ns) AS INT) + 1] AS s2
             |  FROM w2 JOIN adjc ON c2 = c)
             |SELECT c0, s1, c2, s2 FROM w3 ORDER BY c0""".stripMargin)
    ),

    // REAL PCM feature extraction: each synthetic WAV's sample stream is
    // decoded per its parsed fmt chunk (8-bit unsigned-centered or 16-bit
    // signed LE) and reduced to exact integer signal features — |sample|
    // mass, peak, energy, and first-difference sign reversals. The oracle
    // re-derives every sample from the source text bytes with integer
    // SQL, so the Spark-side codec path (header parse + byte decode) is
    // proven sample-exact, not just header-exact. Map-side per file.
    QueryDef(
      "multimodal_pcm_features",
      (s, d) => {
        import graft.operators.Multimodal
        Multimodal.extractPcmFeatures(s, Multimodal.audioTable(s, d))
          .orderBy("media_id")
      },
      // Byte-exact oracle: samples are re-derived from hex(encode(text))
      // 2-char slices — actual UTF-8 BYTES, not codepoints (ascii(substr)
      // would diverge on any non-ASCII fixture) — the 16-bit branch
      // applies the same signed wrap (≥32768 → −65536) the Spark decoder
      // does, and a zero-sample payload still yields one all-zero row via
      // the LEFT JOIN from base (Spark emits AudioFeatures(id, 0,…) for
      // an empty body; a bare GROUP BY would emit nothing).
      Some("""WITH base AS (
             |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             |    octet_length(encode(text)) AS tlen,
             |    CASE WHEN mod(doc_id // 2, 2) = 0 THEN 8 ELSE 16 END AS bits
             |  FROM documents WHERE mod(doc_id, 3) = 1),
             |s8 AS (SELECT media_id, i AS idx,
             |    CAST(('0x' || substr(hx, CAST(2 * i - 1 AS INT), 2)) AS BIGINT) - 128 AS s
             |  FROM base, LATERAL (SELECT unnest(range(1, tlen + 1)) AS i)
             |  WHERE bits = 8),
             |s16r AS (SELECT media_id, j AS idx,
             |    CAST(('0x' || substr(hx, CAST(2 * (2 * j + 1) - 1 AS INT), 2)) AS BIGINT)
             |      + 256 * CAST(('0x' || substr(hx, CAST(2 * (2 * j + 2) - 1 AS INT), 2)) AS BIGINT) AS v
             |  FROM base, LATERAL (SELECT unnest(range(0, tlen // 2)) AS j)
             |  WHERE bits = 16),
             |s16 AS (SELECT media_id, idx,
             |    CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s FROM s16r),
             |samp AS (SELECT * FROM s8 UNION ALL SELECT * FROM s16),
             |d AS (SELECT media_id, idx, s,
             |    s - lag(s) OVER (PARTITION BY media_id ORDER BY idx) AS dlt
             |  FROM samp),
             |dd AS (SELECT media_id, s,
             |    CASE WHEN dlt IS NULL THEN NULL ELSE CAST(dlt < 0 AS INT) END AS dneg,
             |    lag(CASE WHEN dlt IS NULL THEN NULL ELSE CAST(dlt < 0 AS INT) END)
             |      OVER (PARTITION BY media_id ORDER BY idx) AS pneg
             |  FROM d),
             |agg AS (SELECT media_id, count(*) AS n_samples,
             |    CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
             |    CAST(max(abs(s)) AS BIGINT) AS max_abs,
             |    CAST(sum(s * s) AS BIGINT) AS sum_sq,
             |    CAST(sum(CASE WHEN dneg IS NOT NULL AND pneg IS NOT NULL
             |                  AND dneg <> pneg THEN 1 ELSE 0 END) AS BIGINT) AS reversals
             |  FROM dd GROUP BY 1)
             |SELECT base.media_id,
             |  COALESCE(n_samples, 0) AS n_samples,
             |  COALESCE(sum_abs, 0) AS sum_abs,
             |  COALESCE(max_abs, 0) AS max_abs,
             |  COALESCE(sum_sq, 0) AS sum_sq,
             |  COALESCE(reversals, 0) AS reversals
             |FROM base LEFT JOIN agg ON base.media_id = agg.media_id
             |ORDER BY 1""".stripMargin)
    ),

    // Dunning log-likelihood-ratio collocations (the robust alternative
    // to PMI for sparse counts — LLR doesn't explode on hapax pairs).
    // The 2×2 contingency table lives entirely in bigram space (k11 =
    // pair count, margins = left/right occurrence counts, N = total
    // bigrams), every ln term is rounded to 9 dp and DECIMAL-scaled
    // WITHIN its row, so the score is order-independent and bit-equal in
    // DuckDB. Margins are vocabulary-sized broadcasts; one shuffle for
    // the bigram count.
    QueryDef(
      "text_llr_collocations",
      (s, d) => {
        val bi = T(s, d, "documents")
          .withColumn("ws", split(trim(col("text")), "\\s+"))
          .where(size(col("ws")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS l, ws[i] AS r))"))
            .as("b"))
          .select(col("b.l").as("l"), col("b.r").as("r"))
        val cb = bi.groupBy("l", "r").agg(count(lit(1)).as("k11"))
        val cl = bi.groupBy("l").agg(count(lit(1)).as("cl"))
        val cr = bi.groupBy("r").agg(count(lit(1)).as("cr"))
        val n = bi.agg(count(lit(1)).as("ng"))
        // the multiplier must be a NARROW decimal: DECIMAL(18,9) × BIGINT
        // needs precision 39 > 38, so Spark would silently drop the scale
        // to 8 and truncate every term; ×DECIMAL(10,0) fits at scale 9
        val t = "CAST(round(ln(CAST(%s AS DOUBLE) * ng / (CAST(%s AS DOUBLE) * %s)), 9) AS DECIMAL(18,9)) * CAST(%s AS DECIMAL(10,0))"
        def term(k: String, row: String, colm: String) =
          s"CASE WHEN $k > 0 THEN ${t.format(k, row, colm, k)} ELSE CAST(0 AS DECIMAL(18,9)) END"
        cb.join(broadcast(cl), "l").join(broadcast(cr), "r")
          .crossJoin(broadcast(n))
          .withColumn("k12", col("cl") - col("k11"))
          .withColumn("k21", col("cr") - col("k11"))
          .withColumn("k22", col("ng") - col("cl") - col("cr") + col("k11"))
          .withColumn("llr_nats", expr(
            s"""round(CAST(2 * (${term("k11", "cl", "cr")} + ${term("k12", "cl", "(ng - cr)")} +
               |${term("k21", "(ng - cl)", "cr")} + ${term("k22", "(ng - cl)", "(ng - cr)")})
               |AS DOUBLE), 6)""".stripMargin.replace("\n", " ").replace("|", "")))
          .select(col("l"), col("r"), col("k11"), col("llr_nats"))
          .orderBy(col("llr_nats").desc, col("l"), col("r"))
          .limit(20)
      },
      Some("""WITH bi AS (
             |  SELECT ws[i] AS l, ws[i+1] AS r
             |  FROM (SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
             |       LATERAL (SELECT unnest(range(1, len(ws))) AS i)
             |  WHERE len(ws) >= 2),
             |cb AS (SELECT l, r, count(*) AS k11 FROM bi GROUP BY 1, 2),
             |cl AS (SELECT l, count(*) AS cl FROM bi GROUP BY 1),
             |cr AS (SELECT r, count(*) AS cr FROM bi GROUP BY 1),
             |n AS (SELECT count(*) AS ng FROM bi),
             |j AS (SELECT cb.l, cb.r, k11, cl.cl, cr.cr, n.ng,
             |    cl.cl - k11 AS k12, cr.cr - k11 AS k21,
             |    n.ng - cl.cl - cr.cr + k11 AS k22
             |  FROM cb JOIN cl ON cb.l = cl.l JOIN cr ON cb.r = cr.r CROSS JOIN n)
             |SELECT l, r, k11,
             |  round(CAST(2 * (
             |    CASE WHEN k11 > 0 THEN CAST(round(ln(CAST(k11 AS DOUBLE) * ng / (CAST(cl AS DOUBLE) * cr)), 9) AS DECIMAL(18,9)) * k11 ELSE CAST(0 AS DECIMAL(18,9)) END +
             |    CASE WHEN k12 > 0 THEN CAST(round(ln(CAST(k12 AS DOUBLE) * ng / (CAST(cl AS DOUBLE) * (ng - cr))), 9) AS DECIMAL(18,9)) * k12 ELSE CAST(0 AS DECIMAL(18,9)) END +
             |    CASE WHEN k21 > 0 THEN CAST(round(ln(CAST(k21 AS DOUBLE) * ng / (CAST(ng - cl AS DOUBLE) * cr)), 9) AS DECIMAL(18,9)) * k21 ELSE CAST(0 AS DECIMAL(18,9)) END +
             |    CASE WHEN k22 > 0 THEN CAST(round(ln(CAST(k22 AS DOUBLE) * ng / (CAST(ng - cl AS DOUBLE) * (ng - cr))), 9) AS DECIMAL(18,9)) * k22 ELSE CAST(0 AS DECIMAL(18,9)) END
             |  ) AS DOUBLE), 6) AS llr_nats
             |FROM j
             |ORDER BY llr_nats DESC, l, r LIMIT 20""".stripMargin)
    ),

    // Winnowing fingerprints (the MOSS plagiarism-detection selection,
    // Schleimer et al. 2003): hash every 4-gram, slide a 5-gram window,
    // keep each window's MINIMUM hash — guarantees any shared run of ≥ 8
    // words produces a shared fingerprint, while storing ~1/5 of the
    // hashes. Position-free robust variant (distinct window minima per
    // doc); emitted as count + md5 over the ascending fingerprint list.
    // One shuffle on doc_id for the window pass, one aggregate.
    QueryDef(
      "text_winnow_fingerprints",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val grams = T(s, d, "documents")
          .withColumn("ws", split(trim(col("text")), "\\s+"))
          .where(size(col("ws")) >= 8)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, size(ws) - 3), i -> concat_ws(' ', slice(ws, i, 4)))"))
            .as(Seq("pos", "gram")))
          .withColumn("h",
            expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)"))
        val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-4, 0)
        grams.withColumn("wmin", min("h").over(w))
          .where(col("pos") >= 4) // full windows only (pos is 0-based)
          .select("doc_id", "wmin").distinct()
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_fp"),
            md5(concat_ws(",", sort_array(collect_list(col("wmin"))))).as("fp_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, i - 1 AS pos,
             |    CAST(('0x' || substr(md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3])), 1, 15))
             |         AS BIGINT) AS h
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
             |       LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i)
             |  WHERE len(ws) >= 8),
             |m AS (SELECT doc_id, pos,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS wmin
             |  FROM g),
             |fp AS (SELECT DISTINCT doc_id, wmin FROM m WHERE pos >= 4)
             |SELECT doc_id, count(*) AS n_fp,
             |  md5(string_agg(CAST(wmin AS VARCHAR), ',' ORDER BY wmin)) AS fp_md5
             |FROM fp GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Shared-fingerprint pair histogram: how many document pairs share
    // 2, 3, … winnow fingerprints — the similarity signal the MOSS
    // report ranks by. Hub fingerprints (appearing in > 10 docs) are
    // dropped before pairing, the standard common-idiom suppression that
    // also bounds the per-bucket join fan-out at scale.
    QueryDef(
      "dedup_winnow_pair_histogram",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val grams = T(s, d, "documents")
          .withColumn("ws", split(trim(col("text")), "\\s+"))
          .where(size(col("ws")) >= 8)
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, size(ws) - 3), i -> concat_ws(' ', slice(ws, i, 4)))"))
            .as(Seq("pos", "gram")))
          .withColumn("h",
            expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)"))
        val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-4, 0)
        val fp = grams.withColumn("wmin", min("h").over(w))
          .where(col("pos") >= 4)
          .select("doc_id", "wmin").distinct()
        val rare = fp.groupBy("wmin").agg(count(lit(1)).as("df"))
          .where(col("df") <= 10).select("wmin")
        val kept = fp.join(rare, Seq("wmin"), "left_semi")
        val shared = kept.as("a").join(kept.as("b"),
            col("a.wmin") === col("b.wmin") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("shared"))
          .where(col("shared") >= 2)
        shared.groupBy("shared").agg(count(lit(1)).as("n_pairs"))
          .orderBy("shared")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, i - 1 AS pos,
             |    CAST(('0x' || substr(md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3])), 1, 15))
             |         AS BIGINT) AS h
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
             |       LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i)
             |  WHERE len(ws) >= 8),
             |m AS (SELECT doc_id, pos,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS wmin
             |  FROM g),
             |fp AS (SELECT DISTINCT doc_id, wmin FROM m WHERE pos >= 4),
             |rare AS (SELECT wmin FROM fp GROUP BY 1 HAVING count(*) <= 10),
             |kept AS (SELECT fp.doc_id, fp.wmin FROM fp JOIN rare USING (wmin)),
             |pairs AS (
             |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
             |  FROM kept a JOIN kept b ON a.wmin = b.wmin AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT shared, count(*) AS n_pairs FROM pairs
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Pseudonymization audit: deterministic tokenization of a direct
    // identifier (customer name → md5 token) must be a BIJECTION on the
    // release — collisions would merge identities, non-determinism would
    // break joins. Map-side token derivation, one rollup comparing
    // distinct names vs distinct tokens per segment.
    QueryDef(
      "privacy_pseudonymize_audit",
      (s, d) => {
        T(s, d, "customer")
          .withColumn("token", md5(col("c_name")))
          .groupBy("c_mktsegment")
          .agg(countDistinct("c_name").as("n_names"),
            countDistinct("token").as("n_tokens"),
            count(lit(1)).as("n_rows"))
          .withColumn("collisions", col("n_names") - col("n_tokens"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  count(DISTINCT c_name) AS n_names,
             |  count(DISTINCT md5(c_name)) AS n_tokens,
             |  count(*) AS n_rows,
             |  CAST(count(DISTINCT c_name) - count(DISTINCT md5(c_name)) AS BIGINT) AS collisions
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // HITS (hubs & authorities) over the customer→supplier order graph,
    // two unrolled half-iterations in exact integer arithmetic (no
    // normalization): auth1 = in-degree, hub1 = Σ auth1 over a
    // customer's suppliers, auth2 = Σ hub1 over a supplier's customers.
    // Each half-step is one keyed join + aggregation — the same
    // shuffle-per-iteration shape as the PageRank operator, and the
    // standard link-quality prior for corpus weighting.
    QueryDef(
      "graph_hits_unrolled",
      (s, d) => {
        val e = T(s, d, "lineitem").select("l_orderkey", "l_suppkey")
          .join(T(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
          .distinct()
        val a1 = e.groupBy("sup").agg(count(lit(1)).as("auth1"))
        val h1 = e.join(a1, Seq("sup"))
          .groupBy("c").agg(sum("auth1").as("hub1"))
        val a2 = e.join(h1, Seq("c"))
          .groupBy("sup").agg(sum("hub1").as("auth2"))
        a1.join(a2, Seq("sup"))
          .select(col("sup").as("s_suppkey"), col("auth1"), col("auth2"))
          .orderBy("s_suppkey")
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
             |           FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
             |a1 AS (SELECT sup, count(*) AS auth1 FROM e GROUP BY 1),
             |h1 AS (SELECT c, CAST(sum(auth1) AS BIGINT) AS hub1
             |       FROM e JOIN a1 USING (sup) GROUP BY 1),
             |a2 AS (SELECT sup, CAST(sum(hub1) AS BIGINT) AS auth2
             |       FROM e JOIN h1 USING (c) GROUP BY 1)
             |SELECT sup AS s_suppkey, auth1, auth2
             |FROM a1 JOIN a2 USING (sup) ORDER BY 1""".stripMargin)
    ),

    // DSIR-style data selection (after Xie et al. 2023, arXiv:2302.03169):
    // score every document by the log-likelihood ratio of a TARGET
    // hashed-n-gram bag model over the RAW corpus model, keep the top K.
    // DETERMINISTIC VARIANT, two deliberate departures from the paper so
    // the result is oracle-able: (1) the score is the per-token AVERAGE
    // log-ratio (length-normalized), where the paper sums over the doc's
    // hashed n-grams — normalization changes which long/short docs rank
    // ahead; (2) selection is exact top-K, not the paper's Gumbel-noise
    // importance RESAMPLING. Target distribution = the English slice
    // (lang = 'en');
    // features are unigram tokens hashed into B = 1024 buckets via the
    // md5-derived bucket id both engines compute identically (the paper's
    // hashed n-gram features). Scale shape: BOTH bucket-count models come
    // from ONE aggregation pass (raw count + conditional target count per
    // bucket) and are B-BOUNDED — 1024 rows regardless of corpus size —
    // so they broadcast; scoring is map-only into one per-doc aggregate;
    // the selection is a fixed-K TakeOrderedAndProject (each map
    // partition ships at most K rows — never a global sort of the
    // corpus). Cross-engine float contract: per-token log-ratio rounds
    // to 9 dp and DECIMAL-sums (the perplexity pattern — exact,
    // order-independent), only the final per-token average rounds at 6.
    QueryDef(
      "corpus_dsir_select",
      (s, d) => {
        val B = 1024
        val K = 128
        val toks = T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(expr("filter(split(text, ' +'), x -> x != '')")).as("tok"))
          .withColumn("b", expr(
            s"pmod(cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint), $B)"))
        // materialize the trained model ONCE (≤ B rows): without the pin,
        // the totals branch re-runs the whole tokenize+hash+count subtree —
        // a third full corpus pass for two scalars
        val bt = toks.groupBy("b").agg(
          count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
          .localCheckpoint()
        val totals = bt.agg(
          sum("cr").cast("long").as("nr"), sum("ct").cast("long").as("nt"))
        toks
          .join(broadcast(bt), Seq("b"))
          .crossJoin(broadcast(totals))
          .withColumn("lr", expr(
            s"""CAST(round(ln((ct + 1) / CAST(nt + $B AS DOUBLE)) -
               |          ln((cr + 1) / CAST(nr + $B AS DOUBLE)), 9)
               |     AS DECIMAL(18,9))""".stripMargin))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_toks"),
            sum(col("lr")).as("logw_dec"))
          .withColumn("logw_avg",
            round(col("logw_dec").cast("double") / col("n_toks"), 6))
          .orderBy(col("logw_avg").desc, col("doc_id")).limit(K)
          .select(col("doc_id"), col("n_toks"), col("logw_avg"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, tok,
             |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 1024 AS b
             |  FROM (SELECT doc_id, lang,
             |          unnest(list_filter(string_split_regex(text, ' +'),
             |                             x -> x <> '')) AS tok
             |        FROM documents)),
             |bt AS (SELECT b, count(*) AS cr,
             |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
             |       FROM toks GROUP BY b),
             |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
             |               CAST(sum(ct) AS BIGINT) AS nt FROM bt),
             |scored AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             |    round(CAST(sum(CAST(round(
             |        ln((ct + 1) / CAST(nt + 1024 AS DOUBLE)) -
             |        ln((cr + 1) / CAST(nr + 1024 AS DOUBLE)), 9)
             |      AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS logw_avg
             |  FROM toks JOIN bt USING (b) CROSS JOIN tot
             |  GROUP BY doc_id),
             |sel AS (SELECT * FROM scored
             |        ORDER BY logw_avg DESC, doc_id LIMIT 128)
             |SELECT doc_id, n_toks, logw_avg FROM sel ORDER BY doc_id""".stripMargin)
    ),

    // CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet:
    // Extracting high-quality monolingual datasets from web crawl
    // data"): per-language LM perplexity terciles — head (best third,
    // lowest perplexity), middle, tail — the split CCNet publishes and
    // downstream pipelines sample from. The LM here is the per-language
    // unigram model (the engine's perplexity pattern: per-token -ln(p)
    // rounded to 9 dp, DECIMAL-summed, exp at the end).
    // Scale shape: the per-(lang, token) count table is vocab-bounded;
    // the per-lang tercile does NOT use a per-lang window (a billion-doc
    // language would sort in one task) — instead ONE salted
    // ScalableWindow global rank over the total order (lang, ppl,
    // doc_id), per-lang rank by subtracting broadcast lang offsets, and
    // the exact SQL ntile arithmetic in integers. DuckDB oracles the
    // plain ntile(3) window — the two forms are value-identical.
    QueryDef(
      "corpus_ccnet_buckets",
      (s, d) => {
        val toks = T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(expr("filter(split(text, ' +'), x -> x != '')")).as("tok"))
        val freq = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        val nl = toks.groupBy("lang").agg(count(lit(1)).as("nl"))
        // the per-doc ppl frame feeds both phases of the salted tercile —
        // pin it once or the tokenize+join+aggregate subtree re-runs per
        // branch (the one-tokenize lesson from the minhash plans)
        val ppl = toks
          .join(freq, Seq("lang", "tok"))
          .join(broadcast(nl), Seq("lang"))
          .withColumn("nll", expr(
            "CAST(round(-ln(cnt / CAST(nl AS DOUBLE)), 9) AS DECIMAL(18,9))"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).cast("long").as("n_toks"),
            round(exp(sum(col("nll")).cast("double") / count(lit(1))), 6).as("ppl"))
          .localCheckpoint()
        // per-lang ntile(3) without a per-lang single-task window: lang is
        // the exact partition salt; the sub-salt is LOG-bucketed ppl —
        // floor(ln(ppl)·8) — because unigram perplexity is heavy-tailed
        // per language, so floor(ppl) would make the "bounded" offsets
        // frame data-dependent (one salt per integer ppl). ln caps the
        // distinct-salt count by the double exponent range (≤ ~5.7k
        // buckets ever, ≲ dozens in practice) independent of the ppl
        // distribution, and stays ASC-monotone + equal-preserving, so the
        // two-phase tile arithmetic in ScalableWindow is value-identical
        graft.operators.ScalableWindow.withPartitionedNtile(
          ppl, "bucket", 3)(
          Seq(col("lang")),
          Seq(floor(log(greatest(col("ppl"), lit(1.0))) * 8).cast("long")),
          col("ppl"), col("doc_id"))
          .select(col("doc_id"), col("lang"), col("n_toks"), col("ppl"),
            col("bucket"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |    unnest(list_filter(string_split_regex(text, ' +'),
             |                       x -> x <> '')) AS tok
             |  FROM documents),
             |freq AS (SELECT lang, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
             |nl AS (SELECT lang, count(*) AS nl FROM toks GROUP BY 1),
             |ppl AS (
             |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
             |    round(exp(CAST(sum(CAST(round(-ln(cnt / CAST(nl AS DOUBLE)), 9)
             |      AS DECIMAL(18,9))) AS DOUBLE) / count(*)), 6) AS ppl
             |  FROM toks JOIN freq USING (lang, tok) JOIN nl USING (lang)
             |  GROUP BY doc_id, lang)
             |SELECT doc_id, lang, n_toks, ppl,
             |  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS BIGINT) AS bucket
             |FROM ppl ORDER BY doc_id""".stripMargin)
    ),

    // Temperature-scaled language sampling (the mT5 / XLM-R multilingual
    // mixing rule, α = 0.3): q_i ∝ p_i^α flattens the language
    // distribution so low-resource languages are up-sampled without
    // swamping the head. One corpus aggregate (per-lang doc/token
    // counts — |langs|-bounded), then scalar math on the tiny frame:
    // natural share in integer basis points, p^α rounded to 9 dp, the
    // normalizer as an exact DECIMAL sum of the rounded terms, and the
    // final q at 6 dp — the established cross-engine float contract.
    QueryDef(
      "corpus_temperature_mix",
      (s, d) => {
        val byLang = T(s, d, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(expr("size(filter(split(text, ' +'), x -> x != ''))")
              .cast("long")).as("n_tokens"))
        val tot = byLang.agg(sum("n_tokens").cast("long").as("t"))
        val pw = byLang.crossJoin(broadcast(tot))
          .withColumn("p_bp", expr("n_tokens * 10000 div t"))
          .withColumn("pw", expr(
            "CAST(round(power(n_tokens / CAST(t AS DOUBLE), 0.3D), 9) AS DECIMAL(18,9))"))
        val z = pw.agg(sum("pw").as("z"))
        pw.crossJoin(broadcast(z))
          .withColumn("q", round(
            col("pw").cast("double") / col("z").cast("double"), 6))
          .select(col("lang"), col("n_docs"), col("n_tokens"), col("p_bp"),
            col("q"))
          .orderBy("lang")
      },
      Some("""WITH by_lang AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(len(list_filter(string_split_regex(text, ' +'),
             |                             x -> x <> ''))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM by_lang),
             |pw AS (
             |  SELECT lang, n_docs, n_tokens,
             |    n_tokens * 10000 // t AS p_bp,
             |    CAST(round(pow(n_tokens / CAST(t AS DOUBLE), 0.3), 9)
             |      AS DECIMAL(18,9)) AS pw
             |  FROM by_lang CROSS JOIN tot),
             |z AS (SELECT sum(pw) AS z FROM pw)
             |SELECT lang, n_docs, n_tokens, p_bp,
             |  round(CAST(pw AS DOUBLE) / CAST(z AS DOUBLE), 6) AS q
             |FROM pw CROSS JOIN z ORDER BY lang""".stripMargin)
    )
  )
}
