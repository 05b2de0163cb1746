package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when expressible)
  * the equivalent DuckDB ANSI SQL the driver uses as a correctness oracle.
  *
  * Conventions that keep the oracle hash-compare stable:
  *   - every computed column is aliased identically on both sides;
  *   - both sides end in the same ORDER BY over non-null keys;
  *   - floating-point aggregates go through DECIMAL (exact, order-independent)
  *     and are cast back to DOUBLE, so parallel sum order can't flip bits;
  *   - computed integer columns are cast to BIGINT on the Spark side to match
  *     DuckDB's 64-bit default.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** queries worth timing in Bench at sf0.1 */
    headline: Boolean = false
)

/** Helpers shared by query definitions. */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark only reads as a
    * nanosecond LONG (spark.sql.legacy.parquet.nanosAsLong). Normalize back
    * to a microsecond TIMESTAMP regardless of which way it was read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
}
