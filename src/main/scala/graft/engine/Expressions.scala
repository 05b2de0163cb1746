package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.h3.{H3, H3Index}

/** Native Catalyst expressions for the per-row H3 hot path. Unlike Scala
  * UDFs these participate in whole-stage codegen: the generated code calls
  * the static H3 core directly — no closure invocation, no Row boxing, and
  * the surrounding project/filter stays in one generated function.
  *
  * Registered under `*_native` names via GraftExtensions
  * (SparkSessionExtensions) or GraftFunctions.registerNative.
  */
object Expressions {

  /** h3_latlng_cell_native(lat DOUBLE, lng DOUBLE, res INT) → STRING */
  case class H3LatLngCellExpr(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "h3_latlng_cell_native"

    override protected def nullSafeEval(lat: Any, lng: Any, res: Any): Any =
      UTF8String.fromString(H3.latLngToCellString(
        lat.asInstanceOf[Double], lng.asInstanceOf[Double], res.asInstanceOf[Int]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (lat, lng, res) =>
        "org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.h3.H3.latLngToCellString($lat, $lng, $res))")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
  }

  /** h3_parent_native(cell STRING, res INT) → STRING (pure bit math). */
  case class H3ParentExpr(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "h3_parent_native"

    override protected def nullSafeEval(cell: Any, res: Any): Any =
      UTF8String.fromString(H3.cellToParentString(
        cell.asInstanceOf[UTF8String].toString, res.asInstanceOf[Int]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (cell, res) =>
        "org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.h3.H3.cellToParentString($cell.toString(), $res))")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
  }

  /** h3_resolution_native(cell STRING) → INT (bit extraction). */
  case class H3ResolutionExpr(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "h3_resolution_native"

    override protected def nullSafeEval(cell: Any): Any =
      H3Index.resolution(H3Index.fromHexString(cell.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, cell =>
        s"graft.h3.H3Index.resolution(graft.h3.H3Index.fromHexString($cell.toString()))")

    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  // explicit input coercion at build time (AbstractDataType/ExpectsInputTypes
  // is not public API in Spark 4, so the builders cast instead)
  private def asD(e: Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType)
  private def asI(e: Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(e, IntegerType)
  private def asS(e: Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(e, StringType)

  private val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "h3_latlng_cell_native" -> (es => H3LatLngCellExpr(asD(es(0)), asD(es(1)), asI(es(2)))),
    "h3_parent_native" -> (es => H3ParentExpr(asS(es(0)), asI(es(1)))),
    "h3_resolution_native" -> (es => H3ResolutionExpr(asS(es.head)))
  )

  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  def inject(ext: SparkSessionExtensions): Unit =
    registrations.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.engine.Expressions", name), builder))
    }
}

/** `spark.sql.extensions=graft.engine.GraftExtensions` injects the native
  * H3 expressions into every session of the cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = Expressions.inject(ext)
}
