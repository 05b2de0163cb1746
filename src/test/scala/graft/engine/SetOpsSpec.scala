package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The sorted-merge intersection kernel must agree with
  * size(array_intersect(...)) on every distinct-sorted input — including
  * empty sides, disjoint sets, full containment, and unicode strings that
  * exercise the binary UTF8 ordering array_sort produces.
  */
class SetOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def interCol(a: String, b: String) =
    Expressions.sortedIntersectCount(col(a), col(b))

  test("string kernel equals size(array_intersect) on randomized sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // vocab with shared prefixes + multibyte chars so UTF8 binary order is real
    val vocab = (0 until 200).map(i => s"tok${i % 37}·${i}") ++ Seq("", "a", "aa", "ab", "日本", "日本語")
    val rows = (0 until 500).map { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(40)).distinct.sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(40)).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[String], Seq("x"))) :+ ((Seq("x"), Seq.empty[String])) :+
      ((Seq.empty[String], Seq.empty[String]))
    val df = rows.toDF("a", "b")
      .withColumn("native", interCol("a", "b"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("bigint"))
    assert(df.where(col("native") =!= col("builtin")).count() === 0L)
    assert(df.where(col("native") > 0).count() > 50, "fixture must contain overlapping pairs")
  }

  test("long kernel equals size(array_intersect) on randomized sorted-distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(120).toLong - 60L).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(120).toLong - 60L).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .withColumn("native", interCol("a", "b"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("bigint"))
    assert(df.where(col("native") =!= col("builtin")).count() === 0L)
    assert(df.where(col("native") > 0).count() > 100)
  }

  test("null array input yields null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Seq("a", "b")), Option.empty[Seq[String]]))
      .toDF("a", "b").withColumn("native", interCol("a", "b"))
    assert(df.select("native").collect().head.isNullAt(0))
  }

  test("kernel agrees with array_sort ordering end-to-end (unsorted input sorted in-plan)") {
    import spark.implicits._
    // the exact usage shape in dedup_jaccard_prefix: array_sort upstream,
    // kernel downstream — must equal the unsorted array_intersect count
    val df = Seq(
      (Seq("b c d", "a b c", "z", "日本"), Seq("z", "a b c", "q", "日本語")),
      (Seq("x"), Seq("x")))
      .toDF("ra", "rb")
      .withColumn("a", array_sort(col("ra"))).withColumn("b", array_sort(col("rb")))
      .withColumn("native", interCol("a", "b"))
      .withColumn("builtin", size(array_intersect(col("ra"), col("rb"))).cast("bigint"))
    assert(df.where(col("native") =!= col("builtin")).count() === 0L)
  }
}
