package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ScalableWindow

/** Debug probe: ScalableWindow vs the plain global window, standalone and
  * nested (the nesting is what broke the earlier pid-based design).
  */
object ProbeSW {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local()
    val d = "/root/testdata/sf0.01"
    val b = graft.queries.T(s, d, "orders").select(col("o_orderkey"),
      col("o_custkey").as("xb"), expr("o_orderkey % 64").as("yb"),
      expr("o_orderkey * 7 % 1000").as("zval"))
    val ref = b
      .withColumn("fz", ntile(32).over(Window.orderBy(col("zval"), col("o_orderkey"))).cast("long"))
      .withColumn("fl", ntile(32).over(Window.orderBy(col("xb"), col("yb"), col("o_orderkey"))).cast("long"))
      .select("o_orderkey", "fz", "fl")
    val nested = ScalableWindow.withGlobalNtile(
      ScalableWindow.withGlobalNtile(b, "fz", 32)(
        Seq(expr("zval div 16L")), col("zval"), col("o_orderkey")),
      "fl", 32)(
      Seq(col("xb"), expr("yb div 8L")), col("xb"), col("yb"), col("o_orderkey"))
      .select(col("o_orderkey"), col("fz").as("fz2"), col("fl").as("fl2"))
    val j = ref.join(nested, "o_orderkey")
    println("fz mismatches=" + j.where(col("fz") =!= col("fz2")).count())
    println("fl mismatches=" + j.where(col("fl") =!= col("fl2")).count())
    s.stop()
  }
}
