package graft.engine

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels called from generated code (Expressions.VecDotExpr
  * / VecCosineExpr). Operate directly on ArrayData — for UnsafeArrayData
  * this reads doubles straight out of the row buffer, no boxing, no copy.
  *
  * Accumulation is strictly left-to-right so results are bit-identical to
  * the HOF `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)`
  * chain these kernels replace (and to DuckDB's list_dot_product on the
  * oracle side).
  */
object VecOps {

  /** PRECONDITION: equal lengths — the owning expressions return NULL for
    * ragged pairs before calling in (matching the HOF chain, where
    * zip_with null-pads and the aggregate yields NULL), so a corrupt
    * embedding row surfaces as null, never as a plausible partial dot.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val na = math.sqrt(dot(a, a))
    val nb = math.sqrt(dot(b, b))
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }

  /** Cosine DISTANCE from a primitive centroid row to an ArrayData vector —
    * the exact operation order of IvfIndex.cosineDist, so native assignment
    * reproduces the boxed UDF's clusters bit-for-bit.
    */
  def cosineDistCent(cent: Array[Double], v: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(cent.length, v.numElements())
    while (i < n) {
      val a = cent(i); val b = v.getDouble(i)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Index of the nearest centroid (first minimum on ties — same as the
    * UDF's minBy).
    */
  def nearestCentroid(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = cosineDistCent(cents(c), v)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The n nearest centroid indices, distance asc with index tie-break —
    * same ordering as Model.nearest's stable sortBy.
    */
  def nearestCentroids(v: ArrayData, cents: Array[Array[Double]], n: Int): ArrayData = {
    val dists = Array.tabulate(cents.length)(c => cosineDistCent(cents(c), v))
    val idx = dists.indices.sortBy(i => (dists(i), i)).take(n).toArray
    ArrayData.toArrayData(idx)
  }

  /** Nearest code in one PQ subspace codebook by L2² — the exact loop of
    * the boxed assignment UDF it replaces (first minimum on ties).
    */
  def nearestSubCode(cb: Array[Array[Double]], sv: ArrayData): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val row = cb(c)
      var d = 0.0; var i = 0
      while (i < row.length) {
        val x = sv.getDouble(i) - row(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
