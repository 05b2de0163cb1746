package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // exercise the SparkSessionExtensions injection path
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("native expressions agree with the UDF surface and stay in codegen") {
    val df = spark.range(500)
      .selectExpr("cast(id % 140 - 70 + 0.17 as double) AS lat",
        "cast(id % 350 - 175 + 0.29 as double) AS lng")
      .selectExpr(
        "h3_latlng_cell_native(lat, lng, 9) AS native",
        "h3_latlng_cell(lat, lng, 9) AS viaUdf")
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
    // known golden through the native path
    val sf = spark.sql(
      "SELECT h3_latlng_cell_native(37.7752702151959D, -122.418307270836D, 9) c")
      .head().getString(0)
    assert(sf == "8928308280fffff")
    // parent + resolution natives
    val row = spark.sql(
      """SELECT h3_parent_native('8928308280fffff', 3) p,
        |h3_resolution_native('8928308280fffff') r""".stripMargin).head()
    assert(row.getString(0) == H3GoldenHelper.parent)
    assert(row.getInt(1) == 9)
    // the projection must be inside WholeStageCodegen (the "*(n)" marker);
    // a codegen fallback would print a bare Project
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1) Project [h3_latlng_cell_native"), plan)
  }

  test("nulls propagate") {
    val r = spark.sql(
      "SELECT h3_parent_native(CAST(NULL AS STRING), 3) p").head()
    assert(r.isNullAt(0))
  }
}

object H3GoldenHelper {
  val parent: String = graft.h3.H3.cellToParentString("8928308280fffff", 3)
}
