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

  test("long hot-path natives: shape/parent/hex round-trip and ratio sums to 1") {
    // hex ↔ long round-trip and parent bit math vs the string surface
    val row = spark.sql(
      """SELECT h3_hex(h3_unhex('8928308280fffff')) rt,
        |h3_hex(h3_parent_long(h3_unhex('8928308280fffff'), 3)) p""".stripMargin).head()
    assert(row.getString(0) == "8928308280fffff")
    assert(row.getString(1) == H3GoldenHelper.parent)

    // index_shape_native over a polygon: explode to cells, PCT_AREA ratios
    // sum to area(g ∩ ∪cells)/area(g) — ≤ 1 exactly, and close to 1 since
    // centroid polyfill only misses boundary slivers whose cell centroid
    // falls outside
    val wkt = "POLYGON ((-122.46 37.73, -122.38 37.73, -122.38 37.81, " +
      "-122.46 37.81, -122.46 37.73))"
    val cells = spark.sql(
      s"""SELECT cell, st_ratio_area_cell_native('$wkt', cell) ratio,
         |h3_cell_area_cached_native(cell) area
         |FROM (SELECT explode(h3_index_shape_native('$wkt', 8)) cell)""".stripMargin)
      .collect()
    assert(cells.length > 5)
    val ratioSum = cells.map(_.getDouble(1)).sum
    assert(ratioSum > 0.85 && ratioSum <= 1.0 + 1e-9,
      s"PCT_AREA ratios sum to $ratioSum")
    cells.foreach(r => assert(r.getDouble(2) > 0.3 && r.getDouble(2) < 1.5,
      s"res-8 cell area ${r.getDouble(2)} km2 out of range"))

    // the long surface agrees with the string UDF surface
    val both = spark.sql(
      s"""SELECT h3_hex(l.cell) hx, s.cell sc FROM
         |(SELECT explode(h3_index_shape_native('$wkt', 8)) cell) l
         |FULL OUTER JOIN
         |(SELECT explode(h3_index_shape('$wkt', 8)) cell) s
         |ON h3_hex(l.cell) = s.cell""".stripMargin).collect()
    both.foreach(r => assert(!r.isNullAt(0) && !r.isNullAt(1),
      "long and string index_shape surfaces disagree"))
  }
}

object H3GoldenHelper {
  val parent: String = graft.h3.H3.cellToParentString("8928308280fffff", 3)
}
