package graft.queries

import org.apache.spark.sql.functions._

/** Round-9 additions to the training-data pipeline surface: weighted
  * reservoir sampling (Efraimidis–Spirakis A-ES), content-defined
  * chunking dedup (the rolling-hash boundary scheme rsync/FastCDC-style
  * dedup uses, applied at the text level), and a KMV bottom-k sketch
  * Jaccard estimate with its exact counterpart in the same row.
  *
  * Cross-engine determinism follows the house rules (QueryDef scaladoc):
  * md5-derived uniforms, round(ln·1e9) integers before any transcendental
  * crosses an engine boundary, single IEEE divisions of identical
  * operands, total ORDER BY keys.
  */
object PipelineOps2 {

  /** Content-defined chunks of every non-empty document: (doc_id, chunk
    * text). Boundaries fall where a W=4-char polynomial rolling hash
    * ≡ 0 (mod 64) — FastCDC/rsync-style, so boundaries resync after
    * insertions instead of shifting every downstream chunk. Pure codegen
    * expression chain (no UDF); the only explode is the bounded per-doc
    * chunk array. Shared by the batch top-k query and the streaming
    * first-occurrence twin.
    */
  def cdcChunks(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    cdcChunksOf(T(s, d, "documents"))

  /** The chunker over any (doc_id, text) frame — split out so specs can
    * pin the content-defined property (boundaries RESYNC after an
    * insertion) on synthetic texts.
    */
  def cdcChunksOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val W = 4
    docs
      .where(length(col("text")) > 0)
      .withColumn("n", length(col("text")).cast("int"))
      // codepoint array: both engines index substr(text, i, 1) and
      // take its codepoint, so the hash agrees on any fixture
      .withColumn("cs", expr(
        "transform(sequence(1, n), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))"))
      // rolling hash at i (i ≥ W): Σ_{j<W} c[i−j]·31^j, boundary iff ≡0 (mod 64)
      .withColumn("bounds", expr(
        s"""CASE WHEN n < $W THEN array()
           |ELSE filter(sequence($W, n), i ->
           |  (element_at(cs, i) + element_at(cs, i - 1) * 31L +
           |   element_at(cs, i - 2) * 961L + element_at(cs, i - 3) * 29791L) % 64L = 0L)
           |END""".stripMargin.replace("\n", " ")))
      .withColumn("starts", expr(
        "concat(array(1), transform(filter(bounds, b -> b < n), b -> CAST(b + 1 AS INT)))"))
      .withColumn("ends", expr(
        "concat(transform(filter(bounds, b -> b < n), b -> CAST(b AS INT)), array(n))"))
      .withColumn("chunk", explode(expr(
        "zip_with(starts, ends, (a, b) -> substring(text, a, b - a + 1))")))
      .select(col("doc_id"), col("chunk"))
  }

  /** The DuckDB mirror of [[cdcChunks]] as CTEs ending in
    * `ch(doc_id, ch, clen)` — md5'd chunks with lengths.
    */
  val cdcChunkSql: String =
    """docs AS (SELECT doc_id, text, len(text) AS n FROM documents
      |  WHERE len(text) > 0),
      |cs AS (SELECT doc_id, text, n,
      |    list_transform(range(1, n + 1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS c
      |  FROM docs),
      |bs AS (SELECT doc_id, text, n,
      |    CASE WHEN n < 4 THEN [] ELSE
      |      list_filter(range(4, n + 1), i ->
      |        (c[i] + c[i-1] * 31 + c[i-2] * 961 + c[i-3] * 29791) % 64 = 0)
      |    END AS bounds
      |  FROM cs),
      |se AS (SELECT doc_id, text, n,
      |    list_prepend(1, list_transform(list_filter(bounds, b -> b < n),
      |      b -> b + 1)) AS starts,
      |    list_append(list_filter(bounds, b -> b < n), n) AS ends
      |  FROM bs),
      |ch AS (SELECT doc_id,
      |    md5(substr(text, CAST(starts[k] AS INT),
      |      CAST(ends[k] - starts[k] + 1 AS INT))) AS ch,
      |    CAST(ends[k] - starts[k] + 1 AS BIGINT) AS clen
      |  FROM se, LATERAL (SELECT unnest(range(1, len(starts) + 1)) AS k))""".stripMargin

  val qs: Seq[QueryDef] = Seq(

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    // each doc draws u ~ U(0,1] from md5(doc_id) and gets key
    // −ln(u)/w — the K smallest keys are a weight-proportional sample,
    // the standard one-pass scheme for "sample 200 docs ∝ length" in a
    // curation pipeline (retry-safe: the sample is a pure function of
    // the ids). Exactness: u = (h+1)/2³² is a power-of-two division
    // (exact); −ln(u) is frozen to an integer a = round(·1e9) before it
    // crosses engines; key = a/w is ONE IEEE division of identical
    // operands — bit-equal both sides, so ORDER BY (key, doc_id) picks
    // the identical sample. Scale shape: map-side key computation, then
    // global top-K = TakeOrderedAndProject (per-partition partial top-K,
    // K·P driver merge) — never a global sort.
    QueryDef(
      "sample_weighted_reservoir",
      (s, d) => {
        T(s, d, "documents")
          .select(col("doc_id"), col("source"),
            greatest(col("n_chars").cast("long"), lit(1L)).as("w"))
          .withColumn("h", expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING) || ':wrs'), 1, 8), 16, 10) AS BIGINT)"))
          .withColumn("a", expr(
            "CAST(round(-ln((h + 1.0D) / 4294967296.0D) * 1000000000.0D, 0) AS BIGINT)"))
          .withColumn("wkey", expr("CAST(a AS DOUBLE) / CAST(w AS DOUBLE)"))
          .orderBy(col("wkey"), col("doc_id"))
          .limit(200)
          .select("doc_id", "source", "w", "a", "wkey")
      },
      Some("""WITH t AS (SELECT doc_id, source,
             |    greatest(CAST(n_chars AS BIGINT), 1) AS w,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wrs'), 1, 8)) AS BIGINT) AS h
             |  FROM documents),
             |k AS (SELECT doc_id, source, w,
             |    CAST(round(-ln((h + 1.0) / 4294967296.0) * 1000000000.0, 0) AS BIGINT) AS a
             |  FROM t)
             |SELECT doc_id, source, w, a,
             |  CAST(a AS DOUBLE) / CAST(w AS DOUBLE) AS wkey
             |FROM k ORDER BY wkey, doc_id LIMIT 200""".stripMargin)),

    // Content-defined chunking dedup: chunk boundaries fall where a
    // W=4-char polynomial rolling hash ≡ 0 (mod 64) — the FastCDC/rsync
    // family's trick, which keeps chunk boundaries STABLE under insertions
    // (a fixed-stride chunker shifts every downstream chunk; a
    // content-defined one resyncs). Chunks are md5'd and the top
    // repeated chunks across the corpus reported — the span-level dedup
    // signal between exact-doc and n-gram-shingle granularity. Scale
    // shape: the chunker is a per-row codegen expression chain (no UDF,
    // no explode until the bounded per-doc chunk array), one shuffle on
    // the chunk hash, top-30 via TakeOrdered. Empty docs are excluded
    // up front (both engines), dodging Spark's descending sequence(1,0)
    // edge.
    QueryDef(
      "dedup_cdc_chunks",
      (s, d) => {
        cdcChunks(s, d)
          .select(col("doc_id"), md5(col("chunk")).as("ch"),
            length(col("chunk")).cast("long").as("clen"))
          .groupBy("ch")
          .agg(count(lit(1)).cast("long").as("n_occurrences"),
            countDistinct("doc_id").cast("long").as("n_docs"),
            max("clen").as("chunk_len"))
          .where(col("n_occurrences") >= 2)
          .orderBy(col("n_occurrences").desc, col("ch"))
          .limit(30)
      },
      Some(s"""WITH $cdcChunkSql
              |SELECT ch, count(*) AS n_occurrences,
              |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              |  CAST(max(clen) AS BIGINT) AS chunk_len
              |FROM ch GROUP BY 1 HAVING count(*) >= 2
              |ORDER BY n_occurrences DESC, ch LIMIT 30""".stripMargin)),

    // STREAMING twin of the CDC chunker — the production form: documents
    // arrive as a band-ordered file stream, each is chunked by the SAME
    // codegen chunker, and a stateful first-occurrence gate keyed on the
    // chunk hash (flatMapGroupsWithState, streaming/DocStream.scala)
    // admits only never-seen chunks — incremental chunk-level dedup of a
    // continuous ingest. Per doc the query reports distinct chunks vs
    // chunks the gate attributed to it; the emitted attribution equals
    // the batch min-doc_id pick (bands arrive in doc-id order), so the
    // oracle is the batch recompute. ≥3 micro-batches are forced.
    QueryDef(
      "dedup_cdc_chunks_stream",
      (s, d) => {
        val chunks = cdcChunks(s, d)
          .select(col("doc_id"), md5(col("chunk")).as("ch")).distinct()
        val (kept, nBatches) = graft.streaming.DocStream.cdcChunkGate(s, chunks)
        require(nBatches >= 3,
          s"expected >=3 micro-batches (one per doc-id band), saw $nBatches")
        val perDoc = chunks.groupBy("doc_id")
          .agg(countDistinct("ch").cast("long").as("n_chunks"))
        val novel = kept.groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_novel"))
        perDoc.join(novel, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_chunks"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $cdcChunkSql,
              |dc AS (SELECT DISTINCT doc_id, ch FROM ch),
              |f AS (SELECT ch, min(doc_id) AS first_doc FROM dc GROUP BY 1)
              |SELECT doc_id,
              |  CAST(count(*) AS BIGINT) AS n_chunks,
              |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
              |FROM dc JOIN f USING (ch)
              |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // KMV (bottom-k) sketch set operations: estimate the Jaccard overlap
    // of view-users vs click-users from two k=256 minimum-hash-value
    // sketches — the mergeable cardinality sketch a 100 TB profiler keeps
    // per partition and folds. Estimator: among the k smallest hashes of
    // A ∪ B, count those belonging to both sides. The SAME deterministic
    // estimate is computed in both engines (md5 hashes — no randomness at
    // compare time), alongside the EXACT intersection/union and a
    // within-error boolean (3-sigma ≈ 1.5/√k on the Jaccard scale).
    // Scale shape: per-side distinct is one shuffle; every top-k is
    // orderBy+limit (TakeOrdered), never a global-sort window.
    QueryDef(
      "stats_kmv_jaccard",
      (s, d) => {
        val k = 256
        def side(t: String) = T.events(s, d)
          .where(col("event_type") === t)
          .select(col("user_id")).distinct()
          .withColumn("h", expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
        val a = side("view").localCheckpoint()
        val b = side("click").localCheckpoint()
        val unionK = a.select("h").union(b.select("h")).distinct()
          .orderBy("h").limit(k)
        // distinct on h (not just user_id): a 60-bit hash collision between
        // two distinct user_ids would otherwise fan out this join while the
        // oracle's SELECT DISTINCT h keeps one row — engines must agree
        val tagged = unionK
          .join(a.select("h").distinct().withColumn("in_a", lit(1L)), Seq("h"), "left_outer")
          .join(b.select("h").distinct().withColumn("in_b", lit(1L)), Seq("h"), "left_outer")
        val est = tagged.agg(
          count(lit(1)).cast("long").as("k_used"),
          sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L).otherwise(0L))
            .as("est_shared"))
        val exact = a.select(col("user_id")).intersect(b.select(col("user_id")))
          .agg(count(lit(1)).cast("long").as("exact_inter"))
        val sizes = a.agg(count(lit(1)).cast("long").as("n_a"))
          .crossJoin(broadcast(b.agg(count(lit(1)).cast("long").as("n_b"))))
        est.crossJoin(broadcast(exact)).crossJoin(broadcast(sizes))
          .withColumn("exact_union", col("n_a") + col("n_b") - col("exact_inter"))
          // |est/k − exact_j| ≤ 1.5/√256: integer cross-multiply, no FP
          .withColumn("within_error", abs(
            col("est_shared") * col("exact_union") * lit(32L) -
              col("exact_inter") * col("k_used") * lit(32L)) <=
            col("k_used") * col("exact_union") * lit(3L))
          .select("k_used", "est_shared", "n_a", "n_b", "exact_inter",
            "exact_union", "within_error")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
             |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
             |ah AS (SELECT user_id, CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM a),
             |bh AS (SELECT user_id, CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM b),
             |uk AS (SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM ah UNION ALL SELECT h FROM bh))
             |       ORDER BY h LIMIT 256),
             |tagged AS (SELECT uk.h,
             |    CASE WHEN ah.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
             |    CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
             |  FROM uk LEFT JOIN (SELECT DISTINCT h FROM ah) ah ON uk.h = ah.h
             |  LEFT JOIN (SELECT DISTINCT h FROM bh) bh ON uk.h = bh.h),
             |est AS (SELECT count(*) AS k_used,
             |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS est_shared
             |  FROM tagged),
             |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter
             |  FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)),
             |sz AS (SELECT (SELECT count(*) FROM a) AS n_a, (SELECT count(*) FROM b) AS n_b)
             |SELECT k_used, est_shared, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b, exact_inter,
             |  CAST(n_a + n_b - exact_inter AS BIGINT) AS exact_union,
             |  abs(est_shared * (n_a + n_b - exact_inter) * 32
             |      - exact_inter * k_used * 32)
             |    <= k_used * (n_a + n_b - exact_inter) * 3 AS within_error
             |FROM est, ex, sz""".stripMargin))
  )
}
