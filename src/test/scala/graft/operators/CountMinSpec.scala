package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Count-Min invariants: never under-counts, merge is exactly the
  * whole-stream sketch (element-wise sums commute), the overestimate obeys
  * the e/width·N bound at the published confidence, and the md5 hash
  * positions match the SQL formulation the oracle uses.
  */
class CountMinSpec extends AnyFunSuite {

  private def zipfStream(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n) { s"item${(math.pow(rnd.nextDouble(), 3) * 200).toInt}" }

  test("estimate never under-counts and respects the e/width bound") {
    val rnd = new Random(41)
    val items = zipfStream(rnd, 20000)
    val sk = new CountMin.CMSketch(4, 1024)
    items.foreach(sk.add(_))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = math.ceil(math.E / 1024 * items.size).toLong
    var violations = 0
    exact.foreach { case (item, c) =>
      val est = sk.estimate(item)
      assert(est >= c, s"under-count: $item est=$est exact=$c")
      if (est - c > bound) violations += 1
    }
    // P(over > bound) ≤ e^-depth ≈ 1.8% per item; allow 5% of keys
    assert(violations <= exact.size / 20, s"$violations/${exact.size} over bound")
  }

  test("merged partials equal the whole-stream sketch bit-for-bit") {
    val rnd = new Random(42)
    val items = zipfStream(rnd, 8000)
    val whole = new CountMin.CMSketch(4, 1024)
    items.foreach(whole.add(_))
    val merged = items.grouped(1000).map { chunk =>
      val s = new CountMin.CMSketch(4, 1024)
      chunk.foreach(s.add(_))
      s
    }.reduce(_ merge _)
    assert(merged.cells.sameElements(whole.cells))
    assert(merged.n == whole.n)
  }

  test("hash positions match the SQL md5-chunk formulation") {
    for (item <- Seq("alpha", "beta", "", "item42", "ütf8"); d <- 0 until 4) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$item:$d".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val expected = Integer.parseInt(hex.substring(0, 4), 16) % 1024
      assert(CountMin.position(item, d, 1024) == expected, s"$item:$d")
    }
  }
}
