package graft.queries

import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, run over
  * the `documents` table. All are per-row map operations — at 100 TB they are
  * embarrassingly parallel, stay inside whole-stage codegen (no UDFs), and
  * shuffle only where an aggregation/dedup genuinely requires it.
  */
object TextOps {

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  private val stopwordSqlList = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  val qs: Seq[QueryDef] = Seq(
    // Token counting: whitespace tokenization, per-doc counts.
    QueryDef(
      "text_token_stats",
      (s, d) =>
        T(s, d, "documents")
          .select(
            col("doc_id"),
            col("n_chars"),
            length(col("text")).cast("long").as("len_chars"),
            size(split(col("text"), " +")).cast("long").as("n_tokens"),
            size(array_distinct(split(col("text"), " +"))).cast("long").as("n_distinct_tokens")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars, length(text) AS len_chars,
             |len(string_split_regex(text, ' +')) AS n_tokens,
             |len(list_distinct(string_split_regex(text, ' +'))) AS n_distinct_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      headline = true
    ),

    // Quality scoring: type-token ratio, stopword ratio, mean token length.
    QueryDef(
      "text_quality_score",
      (s, d) =>
        T(s, d, "documents")
          .withColumn("toks", split(col("text"), " +"))
          .select(
            col("doc_id"),
            round(size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")).cast("double"), 6).as("ttr"),
            round(expr(s"size(filter(toks, t -> t IN $stopwordSqlList))").cast("double") /
              size(col("toks")).cast("double"), 6).as("stopword_ratio"),
            round((length(col("text")) - size(col("toks")) + 1).cast("double") /
              size(col("toks")).cast("double"), 6).as("mean_token_len")
          )
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |round(CAST(len(list_distinct(string_split_regex(text, ' +'))) AS DOUBLE)
              |  / len(string_split_regex(text, ' +')), 6) AS ttr,
              |round(CAST(len(list_filter(string_split_regex(text, ' +'), t -> t IN $stopwordSqlList)) AS DOUBLE)
              |  / len(string_split_regex(text, ' +')), 6) AS stopword_ratio,
              |round(CAST(length(text) - len(string_split_regex(text, ' +')) + 1 AS DOUBLE)
              |  / len(string_split_regex(text, ' +')), 6) AS mean_token_len
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Language-ID heuristic: score marker-word hits per language, pick argmax.
    // (A real n-gram model rides the same plan shape; markers keep it
    // SQL-oracle-checkable.)
    QueryDef(
      "text_lang_id",
      (s, d) => {
        def hits(words: Seq[String]) = {
          val list = words.map(w => s"'$w'").mkString("(", ", ", ")")
          expr(s"size(filter(toks, t -> t IN $list))")
        }
        T(s, d, "documents")
          .withColumn("toks", split(col("text"), " +"))
          .withColumn("en_hits", hits(Seq("the", "and", "of")))
          .withColumn("es_hits", hits(Seq("el", "la", "de")))
          .withColumn("fr_hits", hits(Seq("le", "la", "et")))
          .select(
            col("doc_id"), col("lang"),
            when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("fr_hits"), "en")
              .when(col("es_hits") >= col("fr_hits"), "es")
              .otherwise("fr").as("lang_guess")
          )
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |  len(list_filter(string_split_regex(text, ' +'), t -> t IN ('the','and','of'))) AS en_hits,
             |  len(list_filter(string_split_regex(text, ' +'), t -> t IN ('el','la','de'))) AS es_hits,
             |  len(list_filter(string_split_regex(text, ' +'), t -> t IN ('le','la','et'))) AS fr_hits
             |  FROM documents)
             |SELECT doc_id, lang,
             |CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
             |     WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END AS lang_guess
             |FROM t ORDER BY doc_id""".stripMargin)
    ),

    // Document fingerprinting: md5 content hash (identical hex in both engines).
    QueryDef(
      "text_fingerprint",
      (s, d) =>
        T(s, d, "documents")
          .select(col("doc_id"), md5(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")
    ),

    // BPE-ish regex tokenization: letter runs / digit runs / single
    // punctuation marks, the pre-tokenization shape BPE vocabularies use.
    QueryDef(
      "text_bpe_tokens",
      (s, d) =>
        T(s, d, "documents")
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("text"),
              lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_pieces"),
            size(array_distinct(regexp_extract_all(col("text"),
              lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))).cast("long").as("n_vocab")
          )
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_pieces,
             |len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS n_vocab
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Exact dedup: hash-groupBy on normalized content; keep min doc_id.
    // At scale this is one shuffle on the 128-bit fingerprint.
    QueryDef(
      "dedup_exact",
      (s, d) =>
        T(s, d, "documents")
          .withColumn("fp", md5(regexp_replace(lower(col("text")), " +", " ")))
          .groupBy("fp")
          .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))
          .orderBy("fp"),
      Some("""SELECT md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp,
             |count(*) AS n_dups, min(doc_id) AS keep_id
             |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin),
      headline = true
    ),

    // Heavy-hitter tokens via the SpaceSaving sketch (O(m) state per group
    // vs the exact groupBy's unbounded key space). Rows-only — sketch
    // counts can overestimate — with the guarantee spec'd in
    // SpaceSavingSpec; the exact twin text_vocab_topk is DuckDB-oracled.
    QueryDef(
      "text_heavy_hitters",
      (s, d) => {
        s.udf.register("ss_topk",
          udaf(graft.operators.SpaceSaving.agg(m = 256, k = 10)))
        T(s, d, "documents")
          .select(explode(split(col("text"), " +")).as("tok"))
          .agg(expr("ss_topk(tok)").as("top"))
          .select(posexplode(col("top")).as(Seq("rank", "entry")))
          .select(col("rank").cast("long").as("rank"),
            col("entry._1").as("tok"), col("entry._2").as("est_count"))
          .orderBy("rank")
      }),

    // BPE merge training (Sennrich 2016) on the word-frequency table: one
    // corpus pass builds the vocab, every merge iteration is vocab-sized.
    // Rows-only — iterative training isn't ANSI SQL; BpeTrainSpec proves
    // the distributed run reproduces an in-memory reference implementation
    // merge-for-merge (deterministic count-desc/pair-asc tie-break).
    QueryDef(
      "text_bpe_train",
      (s, d) => graft.operators.BpeTrain
        .trainDf(s, T(s, d, "documents"), "text", merges = 12)
        .orderBy("rank")),

    // Unigram-LM perplexity (the CCNet-style quality filter): corpus token
    // frequencies → per-doc mean negative logprob → exp. The corpus model
    // is ONE aggregate whose result (the vocabulary) broadcasts to the
    // scoring join — at 100 TB the vocab is millions of rows while the
    // corpus is billions, so the big side never shuffles. Determinism
    // across engines: each token's -ln(p) is rounded to 9 decimals and
    // DECIMAL-summed (exact, order-independent); only the final
    // divide/exp/round are float ops (correctly-rounded or ulp-safe under
    // the 6-decimal output rounding).
    QueryDef(
      "text_unigram_perplexity",
      (s, d) => {
        val toks = T(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " +")).as("tok"))
        val n = toks.count()
        val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        toks.join(broadcast(freq), "tok")
          .withColumn("nll",
            expr(s"CAST(round(-ln(cnt / CAST($n AS DOUBLE)), 9) AS DECIMAL(18,9))"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_toks"),
            round(exp(sum(col("nll")).cast("double") / count(lit(1))), 6).as("ppl"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split_regex(text, ' +')) AS tok
             |  FROM documents),
             |n AS (SELECT count(*) AS n FROM toks),
             |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
             |SELECT doc_id, count(*) AS n_toks,
             |round(exp(CAST(sum(CAST(round(-ln(cnt / (SELECT CAST(n AS DOUBLE) FROM n)), 9)
             |  AS DECIMAL(18,9))) AS DOUBLE) / count(*)), 6) AS ppl
             |FROM toks JOIN freq USING (tok)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // PII scrub — the redaction pass every training-data pipeline runs
    // before tokenization. The synthetic docs carry no PII, so the query
    // first injects deterministic doc_id-derived PII IDENTICALLY on both
    // engines (same concat), then masks emails → urls → long digit runs in
    // that order (an email/url may contain digit runs; the digit pass must
    // see them already collapsed). Patterns use explicit character classes
    // only — identical semantics in Java regex and RE2 — and the oracle
    // pins the masked text exactly via md5. Per-row map, codegen'd, no
    // shuffle except the output sort.
    QueryDef(
      "text_pii_scrub",
      (s, d) => {
        val raw = concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@mail.example.com visit https://ex.com/p/"), col("doc_id").cast("string"),
          lit(" acct "), (col("doc_id") * col("doc_id") + lit(987654321L)).cast("string"))
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val url = "https?://[A-Za-z0-9./_-]+"
        val num = "[0-9]{6,}"
        T(s, d, "documents")
          .select(col("doc_id"), col("text"), raw.as("raw"))
          .select(
            col("doc_id"),
            size(regexp_extract_all(col("raw"), lit(email), lit(0))).cast("long").as("n_emails"),
            size(regexp_extract_all(col("raw"), lit(url), lit(0))).cast("long").as("n_urls"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              email, "<EMAIL>"), url, "<URL>"), num, "<NUM>").as("masked"))
          .select(col("doc_id"), col("n_emails"), col("n_urls"),
            length(col("masked")).cast("long").as("masked_len"),
            md5(col("masked")).as("masked_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text || ' contact u' || CAST(doc_id AS VARCHAR)
             |    || '@mail.example.com visit https://ex.com/p/' || CAST(doc_id AS VARCHAR)
             |    || ' acct ' || CAST(doc_id * doc_id + 987654321 AS VARCHAR) AS raw
             |  FROM documents)
             |SELECT doc_id,
             |len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |len(regexp_extract_all(raw, 'https?://[A-Za-z0-9./_-]+')) AS n_urls,
             |length(regexp_replace(regexp_replace(regexp_replace(raw,
             |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |  'https?://[A-Za-z0-9./_-]+', '<URL>', 'g'),
             |  '[0-9]{6,}', '<NUM>', 'g')) AS masked_len,
             |md5(regexp_replace(regexp_replace(regexp_replace(raw,
             |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |  'https?://[A-Za-z0-9./_-]+', '<URL>', 'g'),
             |  '[0-9]{6,}', '<NUM>', 'g')) AS masked_md5
             |FROM raw ORDER BY doc_id""".stripMargin)
    )
  )
}
