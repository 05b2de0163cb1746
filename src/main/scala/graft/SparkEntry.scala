package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query, in declaration order. */
  def registry: Seq[QueryDef] =
    Relational.qs ++ SetOps.qs ++ AnalyticsOps.qs ++ TextOps.qs ++ SimilarityQ.qs ++
      GeoQueries.qs ++ DedupQueries.qs ++ EventOps.qs ++ LayoutOps.qs ++ GraphOps.qs ++
      PipelineOps.qs ++ TpchOps.qs ++ TpchOps2.qs ++ OlapOps.qs ++ CurationOps.qs ++
      PrivacyOps.qs ++ StatsOps2.qs ++ MarkovOps.qs ++ PipelineOps2.qs ++
      EvalOps.qs

  /** Flagship: the full H3 pipeline (validate → index → resolve) on
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GeoQueries.qs.find(_.name == "h3_resolve_multi").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
