package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Completeness and tightness of the prefix-filtered exact Jaccard join:
  * the three prunes (df-ordered prefix, length filter, positional filter)
  * must lose NOTHING against a brute-force all-pairs join at the same
  * threshold — on the full sf0.001 corpus and across thresholds.
  */
class JaccardPrefixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  /** All-pairs ground truth at threshold num/den (spec-only cross join). */
  private def bruteForce(num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    val sh = DedupQueries.shingleSets(spark, dir)
    val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("shb"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("bigint"))
      .withColumn("union_sz",
        (size(col("sha")) + size(col("shb"))).cast("bigint") - col("inter"))
      .where(lit(den) * col("inter") >= lit(num) * col("union_sz"))
      .select("a_id", "b_id", "inter", "union_sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def prefixJoin(num: Int, den: Int): Set[(Long, Long, Long, Long)] =
    DedupQueries.jaccardPrefixJoin(spark, dir, num, den)
      .select("a_id", "b_id", "inter", "union_sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("prefix join equals brute force at t=0.8 (the registered threshold)") {
    val brute = bruteForce(8, 10)
    val pref = prefixJoin(8, 10)
    assert(brute.nonEmpty, "corpus must contain qualifying pairs")
    assert(pref === brute)
  }

  test("prefix join equals brute force at t=0.5 (long prefixes) and t=0.9 (short)") {
    assert(prefixJoin(1, 2) === bruteForce(1, 2))
    assert(prefixJoin(9, 10) === bruteForce(9, 10))
  }

  /** All-pairs containment ground truth: C = |A∩B| / min(|A|,|B|) ≥ t. */
  private def bruteForceContainment(num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    val sh = DedupQueries.shingleSets(spark, dir)
    val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("shb"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("bigint"))
      .withColumn("min_sz", least(size(col("sha")), size(col("shb"))).cast("bigint"))
      .where(lit(den) * col("inter") >= lit(num) * col("min_sz"))
      .select("a_id", "b_id", "inter", "min_sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("containment join equals brute force at t=0.9 (registered) and t=0.5") {
    val brute9 = bruteForceContainment(9, 10)
    val cont9 = DedupQueries.containmentJoin(spark, dir, 9, 10)
      .select("a_id", "b_id", "inter", "min_sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(brute9.nonEmpty, "corpus must contain qualifying containment pairs")
    assert(cont9 === brute9)
    val brute5 = bruteForceContainment(1, 2)
    val cont5 = DedupQueries.containmentJoin(spark, dir, 1, 2)
      .select("a_id", "b_id", "inter", "min_sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(cont5 === brute5)
    // containment is a superset detector vs jaccard at the same t: every
    // jaccard-qualifying pair is containment-qualifying (J ≤ C always)
    assert(bruteForce(9, 10).map(p => (p._1, p._2)).subsetOf(
      brute9.map(p => (p._1, p._2))))
  }

  test("every emitted pair satisfies the threshold exactly (integer check)") {
    val rows = DedupQueries.jaccardPrefixJoin(spark, dir, 8, 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter"); val u = r.getAs[Long]("union_sz")
      assert(10 * inter >= 8 * u)
      assert(math.abs(r.getAs[Double]("jaccard") - inter.toDouble / u) < 1e-6)
    }
  }
}
