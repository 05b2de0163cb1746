package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData

/** Property-based invariants of the operator kernels, checked over
  * generated inputs rather than fixed fixtures (same fixed-seed loop style
  * as H3PropertySpec — the scalatestplus scalacheck bridge is not in the
  * offline dependency cache).
  *
  * TopK: the bounded-heap Aggregator must return exactly sort-then-take
  * regardless of how rows are split into partial buffers and in which
  * order the buffers merge — that is what makes map-side combine safe.
  *
  * VecOps: the codegen kernels must agree with naive arithmetic and keep
  * cosine's analytic invariants (symmetry, scale invariance, |cos| ≤ 1,
  * self-cosine = 1) — that is what makes them a drop-in for the HOF chain.
  */
class OperatorPropertySpec extends AnyFunSuite {

  private val N = 200

  test("TopK aggregator equals sort-take under arbitrary splits and merge orders") {
    val rnd = new scala.util.Random(0x70bL)
    (1 to N).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // duplicate scores on purpose: tie-breaks must be deterministic
      val rows = Seq.fill(n)((rnd.nextInt(5).toDouble, rnd.nextInt(10).toLong,
        rnd.nextInt(10).toLong))
      val agg = TopK.topK(k)

      // expected: global ordering score DESC, tiebreaks ASC, first k
      val expected = rows.sorted(Ordering.by[(Double, Long, Long), (Double, Long, Long)](
        r => (-r._1, r._2, r._3))).take(k)
        .map { case (s, a, b) => f"$s%.2f@$a:$b" }.mkString(",")

      // random split into partial buffers, reduced independently
      val nSplits = 1 + rnd.nextInt(4)
      val buffers = rows.grouped(math.max(1, (n + nSplits - 1) / nSplits)).map { part =>
        part.foldLeft(agg.zero)((b, r) => agg.reduce(b, r))
      }.toList
      // merge in a shuffled order (merge must be order-insensitive)
      val shuffled = rnd.shuffle(buffers)
      val merged = shuffled match {
        case Nil => agg.zero
        case h :: t => t.foldLeft(h)((a, b) => agg.merge(a, b))
      }
      assert(agg.finish(merged) == expected)
    }
  }

  private def ad(xs: Array[Double]): ArrayData = ArrayData.toArrayData(xs)

  test("vec kernels: dot matches naive sum; cosine symmetric, scale-invariant, bounded") {
    import graft.engine.VecOps
    val rnd = new scala.util.Random(0xabcdL)
    (1 to N).foreach { _ =>
      val n = 1 + rnd.nextInt(32)
      val a = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val b = Array.fill(n)(rnd.nextDouble() * 4 - 2)

      val naive = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      assert(VecOps.dot(ad(a), ad(b)) == naive) // same order → bit-equal

      val c = VecOps.cosine(ad(a), ad(b))
      assert(math.abs(c) <= 1.0 + 1e-12)
      assert(VecOps.cosine(ad(b), ad(a)) == c) // symmetric
      val scaled = a.map(_ * 7.5)
      assert(math.abs(VecOps.cosine(ad(scaled), ad(b)) - c) < 1e-12) // scale-invariant
      assert(math.abs(VecOps.cosine(ad(a), ad(a)) - 1.0) < 1e-12) // self
    }
    // zero-norm convention: 0.0, never NaN
    assert(graft.engine.VecOps.cosine(ad(Array(0.0, 0.0)), ad(Array(1.0, 2.0))) == 0.0)
  }

  test("float cosine kernel is bit-identical to the legacy cosine_f UDF body") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def af(a: Array[Float]): ArrayData = UnsafeArrayData.fromPrimitiveArray(a)
    val rnd = new scala.util.Random(0x5eedL)
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(96)
      val m = if (rnd.nextInt(8) == 0) 1 + rnd.nextInt(96) else n // ragged too
      val a = Array.fill(n)(rnd.nextFloat() * 4 - 2)
      val b = Array.fill(m)(rnd.nextFloat() * 4 - 2)
      val viaKernel = graft.engine.VecOps.cosineFloat(af(a), af(b))
      val viaUdf = graft.operators.AnnLsh.cosine(a, b)
      assert(java.lang.Double.doubleToLongBits(viaKernel) ===
        java.lang.Double.doubleToLongBits(viaUdf))
    }
    // zero-norm convention preserved
    assert(graft.engine.VecOps.cosineFloat(
      af(Array(0f, 0f)), af(Array(1f, 2f))) == 0.0)
  }

  test("PQ encode is deterministic and stable under re-encoding its own centroid") {
    val rnd = new scala.util.Random(0x9abL)
    // tiny synthetic model: 2 subspaces × 4 codes × 3 dims
    val codebooks = Array.fill(2, 4, 3)(rnd.nextDouble() * 2 - 1)
    val model = ProductQuantizer.PQModel(2, 3, codebooks)
    (1 to N).foreach { _ =>
      val v = Array.fill(6)(rnd.nextDouble() * 2 - 1)
      val c1 = model.encodeOne(v.toSeq)
      val c2 = model.encodeOne(v.toSeq)
      assert(c1.sameElements(c2))
      assert(c1.forall(c => c >= 0 && c < 4))
      // ADC distance of a vector to its own code is the minimum over codes
      val t = model.adcTable(v.toSeq)
      c1.zipWithIndex.foreach { case (code, s) =>
        assert(t(s)(code) == t(s).min)
      }
    }
  }
}
