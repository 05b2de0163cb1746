package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SkewOps invariants: the salted join equals the plain join exactly (row
  * multiset, not just aggregates), spreads a hot key across reducers, and
  * stays a shuffle join (no broadcast that would defeat the demonstration).
  */
class SkewOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join on a skewed fact (90% one key)") {
    import spark.implicits._
    val fact = (1 to 20000).map { i =>
      val k = if (i % 10 == 0) (i % 50).toLong else 7L // hot key 7
      (k, s"row$i")
    }.toDF("fk", "payload")
    val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("dk", "attr")
    val salted = SkewOps.saltedJoin(fact, dim, "fk", "dk", salts = 8)
      .select("fk", "payload", "dk", "attr")
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("fk", "payload", "dk", "attr")
    assert(salted.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("hot key spreads across multiple salt shards") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (7L, s"row$i")).toDF("fk", "payload")
    val shards = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(shards >= 6, s"expected the hot key to spread over ~8 salts, got $shards")
  }

  test("salts=1 degenerates to the plain join") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (1L, "c")).toDF("fk", "p")
    val dim = Seq((1L, "x"), (3L, "y")).toDF("dk", "q")
    val r = SkewOps.saltedJoin(fact, dim, "fk", "dk", 1).select("fk", "p", "q")
    assert(r.collect().map(_.toString).sorted.toSeq ==
      Seq("[1,a,x]", "[1,c,x]"))
  }

  test("distinctCountPerKey equals count(DISTINCT)") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 7, i % 113)).toDF("k", "v")
    val got = SkewOps.distinctCountPerKey(df, "k", "v", "n").orderBy("k").collect()
    val want = df.groupBy("k").agg(countDistinct("v").as("n")).orderBy("k").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }
}
