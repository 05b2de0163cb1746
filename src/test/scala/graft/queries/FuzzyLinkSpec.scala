package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The SymSpell delete-1 blocking behind dedup_fuzzy_editdist must be
  * COMPLETE: every pair within edit distance 1 shares a delete-1 variant
  * (string itself + each single-character deletion), so the equi-join on
  * variants followed by an exact levenshtein verify loses nothing against
  * brute-force all-pairs. Proven on the full sf0.001 customer corpus and
  * on adversarial constructed cases (insert / delete / substitute at every
  * position, plus just-outside-threshold controls).
  */
class FuzzyLinkSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Delete-1 neighborhood of a string, original included. */
  private def neighborhood(x: String): Set[String] =
    (0 to x.length).map(i => x.substring(0, i) + x.substring(math.min(i + 1, x.length))).toSet

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("delete-1 neighborhoods intersect iff edit distance <= 1 (constructed cases)") {
    val base = "Customer#000012345"
    val variants = Seq(
      base,                                   // dist 0
      base.updated(12, '7'),                  // substitution mid
      base.updated(0, 'X'),                   // substitution first
      base.updated(base.length - 1, '9'),     // substitution last
      base.substring(1),                      // deletion first
      base.substring(0, 9) + base.substring(10), // deletion mid
      base.substring(0, base.length - 1),     // deletion last
      "Z" + base,                             // insertion front
      base.substring(0, 5) + "Q" + base.substring(5), // insertion mid
      base + "Q"                              // insertion back
    )
    for (v <- variants) {
      assert(neighborhood(base).intersect(neighborhood(v)).nonEmpty,
        s"dist-1 pair missed by blocking: $base / $v")
      assert(lev(base, v) <= 1)
    }
    // controls at distance 2: blocking MAY find them (neighborhoods can
    // intersect at dist 2) but the verify must reject them
    val far = Seq(base.updated(3, 'x').updated(7, 'y'), base.substring(2), "XY" + base)
    for (v <- far) assert(lev(base, v) == 2)
  }

  test("blocking + verify equals brute force on the sf0.001 corrupted-customer corpus") {
    val out = graft.SparkEntry.queries("dedup_fuzzy_editdist")(spark, dir)
      .select("qid", "best_match", "best_dist", "n_cand")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

    // brute-force ground truth, driver-side
    val canon = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corrupted = canon.map { case (k, nm) =>
      val pos = (9 + k % 8).toInt // 0-based index of the substituted digit
      val d = nm(pos)
      (k, nm.substring(0, pos) + ('0' + ((d - '0' + 1) % 10)).toChar + nm.substring(pos + 1))
    }
    assert(corrupted.forall { case (k, q) => lev(q, canon.find(_._1 == k).get._2) == 1 })

    val expected = corrupted.map { case (k, q) =>
      val matches = canon.filter { case (_, c) => lev(q, c) <= 1 }
        .map { case (_, c) => (lev(q, c).toLong, c) }
      val best = matches.min
      k -> (best._2, best._1, matches.length.toLong)
    }.toMap

    assert(out.size == expected.size)
    for ((k, (bm, bd, nc)) <- expected) {
      assert(out(k) == ((bm, bd, nc)), s"qid $k: got ${out(k)}, want ($bm,$bd,$nc)")
    }
  }
}
