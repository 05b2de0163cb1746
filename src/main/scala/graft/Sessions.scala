package graft

import org.apache.spark.sql.SparkSession

/** Shared session builder. Mirrors the reference's tuned execution envelope
  * (/root/reference/src/h3_indexer/spark/spark.py:76-136): AQE + partition
  * coalescing + skew-join, 128 MB partition sizing, capped records/file —
  * minus the Sedona/Kryo/Arrow pieces our all-JVM engine doesn't need.
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse(
              "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString),
            shufflePartitions: Option[String] = None): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.files.maxRecordsPerFile", "500000")
      // driver testdata events.parquet uses TIMESTAMP(NANOS); Spark can only
      // read that as a long (normalized back in queries.T.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
