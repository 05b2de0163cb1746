package graft.tools

/** Mimic the driver's smoke check: plain session, entry(), count rows. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
  }
}
