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
}
