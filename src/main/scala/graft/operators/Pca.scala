package graft.operators

/** Driver-side eigensolve for PCA over embedding covariance matrices.
  *
  * The data-sized work (the d(d+1)/2 second moments) is the distributed,
  * DuckDB-oracled `embedding_pca_covariance` query; what remains is an
  * O(d³) symmetric eigenproblem on a d×d matrix with d fixed and tiny
  * (64) next to the corpus — the standard split for PCA at scale (the
  * same shape as k-means centroids or PQ codebooks living on the driver).
  *
  * Cyclic Jacobi is used because it is simple, numerically robust for
  * symmetric matrices, and DETERMINISTIC: fixed (p, q) sweep order, fixed
  * convergence threshold, no pivot-order data dependence — the same input
  * matrix always produces bit-identical eigenpairs, which the checked
  * query's cross-run reproducibility relies on.
  */
object Pca {

  /** Eigendecomposition of symmetric `a0` (not mutated). Returns
    * (eigenvalues desc, eigenvectors as rows aligned with the values),
    * with a deterministic sign convention: each vector's
    * largest-|component| entry (first on ties) is made positive.
    */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 50)
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }

    var sweep = 0
    while (sweep < maxSweeps && offDiag() > 1e-24) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < n) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
              }
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    // columns of v are the eigenvectors; sort desc by value, tie on index
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      var best = 0
      var k = 1
      while (k < n) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }
}
