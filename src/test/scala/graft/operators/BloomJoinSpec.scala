package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BloomJoin invariants: the pruned join's result is EXACTLY the plain
  * join (false positives die in the join), the pruning actually removes
  * non-matching probe rows at roughly the configured fpp, and merge
  * (bitwise OR) makes the bits partition-invariant.
  */
class BloomJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  test("pruned join equals plain join exactly") {
    import spark.implicits._
    val probe = (1L to 20000L).map(i => (i % 997, s"p$i")).toDF("key", "pv")
    val build = (1L to 50L).map(i => (i * 13, s"b$i")).toDF("bkey", "bv")
    val pruned = BloomJoin
      .prunedJoin(probe, build, "key", "bkey", expectedKeys = 64, fpp = 0.01)
      .select("key", "pv", "bkey", "bv")
    val plain = probe.join(build, probe("key") === build("bkey"))
      .select("key", "pv", "bkey", "bv")
    assert(pruned.collect().sortBy(_.toString).toSeq ==
      plain.collect().sortBy(_.toString).toSeq)
  }

  test("pruning removes non-matching probe rows near the configured fpp") {
    import spark.implicits._
    // build keys 0..99, probe keys 0..9999 → true selectivity 1%
    val probe = (0L until 10000L).toDF("key")
    val build = (0L until 100L).toDF("bkey")
    val (words, k) = BloomJoin.buildBits(build, col("bkey"), 100, 0.01)
    val kept = BloomJoin.prune(probe, col("key"), words, k).count()
    // 100 true + ~1% fp of the other 9900 → expect ≤ 100 + 3×99 + slack
    assert(kept >= 100, s"true matches must survive, kept=$kept")
    assert(kept <= 100 + 400, s"fpp blowout: kept=$kept of 10000")
  }

  test("no false negatives ever; bits identical across partitioning") {
    import spark.implicits._
    val keys = (1L to 5000L).map(_ * 7919)
    val df1 = keys.toDF("key").repartition(1)
    val df8 = keys.toDF("key").repartition(8)
    val (w1, k1) = BloomJoin.buildBits(df1, col("key"), 5000, 0.03)
    val (w8, k8) = BloomJoin.buildBits(df8, col("key"), 5000, 0.03)
    assert(k1 == k8 && w1.toSeq == w8.toSeq,
      "bloom bits must be partition-invariant (OR-merge associativity)")
    // membership: every inserted key hashes to set bits
    val hashed = df1.select(xxhash64(col("key")).as("h")).as[Long].collect()
    assert(hashed.forall(BloomJoin.mightContain(w1, k1, _)))
  }

  test("probe filter stays in whole-stage codegen") {
    import spark.implicits._
    // spark.range, not a LocalRelation: ConvertToLocalRelation would fold
    // the filter away at optimization time and leave nothing to inspect
    val probe = spark.range(100).toDF("key")
    val (words, k) = BloomJoin.buildBits((0L until 10L).toDF("b"), col("b"), 10, 0.01)
    val plan = BloomJoin.prune(probe, col("key"), words, k)
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen span
    assert("\\*\\(\\d+\\) Filter bloom_might_contain".r.findFirstIn(plan).isDefined, plan)
  }

  test("bloomDedup: no false negatives ever; kept set matches the reference filter") {
    import spark.implicits._
    // md5-derived 4×16-bit positions, the dedup_bloom_crosscorpus family
    val posCol = expr("transform(sequence(0, 3), h -> " +
      "cast(conv(substring(md5(k), h * 4 + 1, 4), 16, 10) as int) % 256)")
    val build = (0 until 300).map(i => s"key$i").toDF("k")
    val dups = (0 until 300 by 3).map(i => s"key$i")
    val fresh = (0 until 300).map(i => s"new$i")
    val probe = (dups ++ fresh).toDF("k")
    // m=256 with 300 build keys → dense filter, false positives guaranteed
    val kept = Dedup.bloomDedup(build, probe, posCol, mBits = 256)
      .as[String].collect().toSet
    // no false negatives: every true duplicate is dropped
    assert(dups.forall(d => !kept.contains(d)))
    // kept = exactly the fresh keys whose 4 positions are not all set in
    // the reference filter computed driver-side
    def positions(s: String): Seq[Int] = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (0 until 4).map(h => Integer.parseInt(hex.substring(h * 4, h * 4 + 4), 16) % 256)
    }
    val bits = (0 until 300).flatMap(i => positions(s"key$i")).toSet
    val expected = fresh.filterNot(f => positions(f).forall(bits)).toSet
    assert(kept == expected, s"fp-kept diff: ${kept.diff(expected)} ${expected.diff(kept)}")
    // the dense filter really does produce false positives here
    assert(expected.size < fresh.size, "test corpus produced no false positives")
  }
}
