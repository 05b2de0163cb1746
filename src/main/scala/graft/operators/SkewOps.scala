package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators for the cases AQE's runtime skew-join
  * split cannot reach (it only rewrites sort-merge join partitions AFTER a
  * shuffle materializes; pre-shuffle salting also covers aggregations,
  * streaming state, and joins hidden below other operators).
  *
  * Both operators are pure row-level rewrites whose results are EXACTLY the
  * unsalted equivalent, so their registered queries carry plain-SQL DuckDB
  * oracles.
  */
object SkewOps {

  /** Salted equi-join: the fact side gets a deterministic per-row salt in
    * [0, salts); the dim side is replicated once per salt value; the join
    * key becomes (key, salt). A hot key's rows now land on `salts` distinct
    * reducers instead of one. Cost: dim shuffles ×salts — the knob trades
    * dim duplication for fact-side spread, so size `salts` to the observed
    * skew factor, not to parallelism.
    *
    * The salt is xxhash64 over ALL fact columns (not rand(): resubmitted
    * tasks must salt identically or shuffle retries double-count rows).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  /** Two-phase distinct count per key: phase 1 dedups (key, value) pairs —
    * spreading a hot key's values across reducers by the (key, value)
    * hash — phase 2 counts per key. A direct count_distinct shuffles every
    * pair of a hot key to ONE reducer; this shape is how the hot key's
    * distinct set is built in parallel. Exact (no sketch), identical to
    * count(DISTINCT value).
    */
  def distinctCountPerKey(df: DataFrame, keyCol: String, valueCol: String,
                          outCol: String): DataFrame =
    df.select(keyCol, valueCol).distinct()
      .groupBy(keyCol).agg(count(lit(1)).as(outCol))
}
