package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Jacobi eigensolve unit checks on matrices with known spectra. */
class PcaSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, tol: Double = 1e-10) =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("diagonal matrix: eigenvalues are the diagonal, sorted desc") {
    val m = Array(
      Array(3.0, 0.0, 0.0),
      Array(0.0, 7.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(vals.toSeq == Seq(7.0, 3.0, 1.0))
    assert(vecs(0).toSeq == Seq(0.0, 1.0, 0.0))
  }

  test("2x2 analytic: [[2,1],[1,2]] has eigenvalues 3 and 1") {
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(approx(vals(0), 3.0) && approx(vals(1), 1.0))
    val r = 1.0 / math.sqrt(2.0)
    assert(approx(vecs(0)(0), r) && approx(vecs(0)(1), r))
    // sign convention: largest-|component| entry positive
    assert(vecs(1).map(math.abs).max == vecs(1).map(x => x).max)
  }

  test("reconstruction: V diag(λ) Vᵀ == A for a random symmetric matrix") {
    val rnd = new scala.util.Random(42)
    val n = 16
    val base = Array.fill(n, n)(rnd.nextGaussian())
    val m = Array.tabulate(n, n)((i, j) => (base(i)(j) + base(j)(i)) / 2)
    val (vals, vecs) = Pca.jacobiEigen(m)
    for (i <- 0 until n; j <- 0 until n) {
      val rec = (0 until n).map(k => vecs(k)(i) * vals(k) * vecs(k)(j)).sum
      assert(approx(rec, m(i)(j), 1e-9), s"($i,$j): $rec vs ${m(i)(j)}")
    }
    // orthonormal rows
    for (i <- 0 until n; j <- i until n) {
      val dot = (0 until n).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
  }

  test("determinism: identical input gives bit-identical output") {
    val rnd = new scala.util.Random(7)
    val n = 8
    val base = Array.fill(n, n)(rnd.nextGaussian())
    val m = Array.tabulate(n, n)((i, j) => (base(i)(j) + base(j)(i)) / 2)
    val (v1, e1) = Pca.jacobiEigen(m)
    val (v2, e2) = Pca.jacobiEigen(m)
    assert(v1.toSeq == v2.toSeq)
    assert(e1.map(_.toSeq).toSeq == e2.map(_.toSeq).toSeq)
  }
}
