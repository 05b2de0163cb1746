package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (array<float> vectors).
  *
  * Brute-force cosine top-k is the correctness baseline: the query set is
  * small and broadcast, so the big side streams map-only — at 100 TB this is
  * one scan, no shuffle of the corpus. The dot product runs as codegen'd
  * higher-order functions (`zip_with` + `aggregate`), not a UDF. An
  * LSH-bucketed variant (scale path pruning the candidate set) lives in
  * graft.operators.Similarity.
  */
object SimilarityQ {

  private val dotExpr =
    "aggregate(zip_with(ve, qe, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  val qs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_cosine_topk_bruteforce",
      (s, d) => {
        val e = T(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
        val q = e.where(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("ve").as("qe"))
        val scored = e
          .crossJoin(broadcast(q))
          .withColumn("score",
            round(expr(dotExpr) /
              (sqrt(expr("aggregate(transform(ve, x -> x * x), 0D, (acc, v) -> acc + v)")) *
               sqrt(expr("aggregate(transform(qe, x -> x * x), 0D, (acc, v) -> acc + v)"))), 6))
        val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
        scored
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 10)
          .select(col("qid"), col("vec_id").as("nid"), col("score"), col("rn"))
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
             |q AS (SELECT vec_id AS qid, ve AS qe FROM e WHERE vec_id < 5),
             |sc AS (SELECT q.qid, e.vec_id AS nid,
             |  round(list_dot_product(e.ve, q.qe) /
             |        (sqrt(list_dot_product(e.ve, e.ve)) * sqrt(list_dot_product(q.qe, q.qe))), 6) AS score
             |  FROM e CROSS JOIN q),
             |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rn FROM sc)
             |SELECT qid, nid, score, rn FROM r WHERE rn <= 10 ORDER BY qid, rn""".stripMargin),
      headline = true
    )
  )
}
