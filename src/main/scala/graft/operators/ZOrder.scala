package graft.operators

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}

/** Z-order (Morton) clustering for the parquet sink: rows are laid out
  * along a space-filling curve over several columns, so per-file min/max
  * statistics become tight in EVERY clustered dimension at once — a range
  * scan on any of them prunes most files. A plain sort gives perfect
  * pruning on the leading column and none on the rest; at 100 TB the
  * difference is reading one dimension's worth of files versus all of them.
  *
  * Shape: quantile-normalize each column to a fixed bit budget — bucket
  * boundaries come from a DISTRIBUTED approxQuantile sketch (a global
  * rank window would serialize every row through one partition), the
  * per-row bucket lookup is a codegen binary search over the plan-shipped
  * boundary array, and the bit interleave is built-in shift/or
  * expressions. The only shuffles are the boundary sketch and the final
  * repartitionByRange — identical plan shape at any scale.
  */
object ZOrder {

  val BitsPerCol = 12 // 4096 buckets/column — file-pruning granularity

  /** Static bridge for generated code: bucket = #boundaries <= v (binary
    * search, boundaries sorted ascending).
    */
  def bucketOf(bounds: Array[Double], v: Double): Long = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** quantile_bucket(v DOUBLE) → LONG via plan-serialized boundaries. */
  case class QuantileBucketExpr(child: Expression, bounds: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "quantile_bucket"

    override protected def nullSafeEval(v: Any): Any =
      bucketOf(bounds, v.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("zBounds", bounds, "double[]")
      defineCodeGen(ctx, ev, v => s"graft.operators.ZOrder.bucketOf($ref, $v)")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Interleave the low `bits` bits of the given bucket columns (c0 owns
    * output bit positions 0, n, 2n, …; c1 positions 1, n+1, …). Built from
    * shift/or expressions — codegen, no UDF.
    */
  def interleaveBits(cols: Seq[Column], bits: Int = BitsPerCol): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits must fit a long")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Add a `_z` column: per-column quantile bucket (distributed sketch)
    * then bit-interleaved. Columns must be numeric (cast to double for
    * ranking only — output columns are untouched).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = BitsPerCol): DataFrame = {
    val buckets = 1 << bits
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bucketCols = cols.map { c =>
      val bounds = df.stat.approxQuantile(c, probes, 0.25 / buckets).distinct.sorted
      GraftBridge.column(QuantileBucketExpr(
        GraftBridge.expression(col(c).cast("double")), bounds))
    }
    df.withColumn("_z", interleaveBits(bucketCols, bits))
  }

  /** Cluster rows z-order-wise into `numFiles` output partitions. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame =
    withZValue(df, cols)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
