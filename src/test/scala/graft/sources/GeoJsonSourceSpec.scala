package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The GeoJSON source must round-trip geometry and typed properties
  * losslessly (doubles bit-for-bit), infer property schemas like
  * spark.read.json, read whole-file FeatureCollections, and plug into the
  * validate→index pipeline through the extension router exactly like a
  * parquet input.
  */
class GeoJsonSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  test("NDJSON write/read round-trips typed properties bit-for-bit") {
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha", -69.17500000000001, true),
      (2L, "beta", 0.1 + 0.2, false), // 0.30000000000000004
      (3L, null.asInstanceOf[String], 2547.4, true))
    val src = rows.toDF("id", "tag", "score", "flag")
      .withColumn("geom_wkt", expr("concat('POINT (', id * 1.5D, ' ', score, ')')"))
    val dir = tmp("graft_geojson_props")
    GeoJson.write(src, "geom_wkt", dir)
    val back = GeoJson.read(spark, dir).orderBy("id")
      .select("id", "tag", "score", "flag", "geom_wkt").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha")
    assert(back(0).getDouble(2) == -69.17500000000001) // exact
    assert(back(1).getDouble(2) == 0.1 + 0.2)          // exact
    assert(back(2).isNullAt(1))                        // null property survives
    assert(back(0).getBoolean(3) && !back(1).getBoolean(3))
    // geometry survived with the double embedded
    assert(back(1).getString(4).contains("0.30000000000000004"))
  }

  test("an all-null property column survives the round-trip (schema-preserving)") {
    import spark.implicits._
    val df = Seq((1L, "POINT (1 2)"), (2L, "POINT (3 4)")).toDF("id", "geom_wkt")
      .withColumn("always_null", lit(null).cast("string"))
    val dir = tmp("graft_geojson_nullcol")
    GeoJson.write(df, "geom_wkt", dir)
    val back = GeoJson.read(spark, dir)
    assert(back.columns.contains("always_null"),
      s"all-null column dropped on round-trip: ${back.columns.mkString(",")}")
    assert(back.where(col("always_null").isNull).count() == 2)
  }

  test("geojson roundtrip query uses per-session temp dirs (concurrent sessions)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val q = graft.SparkEntry.registry.find(_.name == "geojson_source_roundtrip").get
    val s2 = spark.newSession()
    assert(!(s2 eq spark))
    val dir = "/root/testdata/sf0.001"
    val Seq(r1, r2) = Await.result(
      Future.sequence(Seq(
        Future(q.fn(spark, dir).collect()),
        Future(q.fn(s2, dir).collect()))), 120.seconds)
    assert(r1.length == r2.length && r1.length > 0)
    assert(r1.map(_.toSeq).sameElements(r2.map(_.toSeq)),
      "concurrent sessions over the same data dir must not corrupt each other")
  }

  test("all geometry types survive the round-trip") {
    import spark.implicits._
    val geoms = Seq(
      "POINT (1.5 -2.25)",
      "LINESTRING (0 0, 1.000000000000001 2, 3 4)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 2), (3 4))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    val src = geoms.zipWithIndex.map { case (g, i) => (i.toLong, g) }
      .toDF("id", "geom_wkt")
    val dir = tmp("graft_geojson_geoms")
    GeoJson.write(src, "geom_wkt", dir)
    val back = GeoJson.read(spark, dir).orderBy("id")
      .select("geom_wkt").as[String].collect()
    assert(back.toSeq == geoms)
  }

  test("FeatureCollection reader yields the same rows as NDJSON") {
    import spark.implicits._
    val fcDir = Files.createTempDirectory("graft_geojson_fc")
    fcDir.toFile.deleteOnExit()
    val fc =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[1.5,2.5]},"properties":{"id":1,"v":0.25}},
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[-3.5,4.0]},"properties":{"id":2,"v":1.75}}
        |]}""".stripMargin
    Files.writeString(fcDir.resolve("data.geojson"), fc)
    val got = GeoJson.readFeatureCollection(spark, fcDir.toString)
      .orderBy("id").select("id", "v", "geom_wkt").collect()
    assert(got.length == 2)
    assert(got(0).getLong(0) == 1 && got(0).getDouble(1) == 0.25)
    assert(got(0).getString(2) == "POINT (1.5 2.5)")
    assert(got(1).getString(2) == "POINT (-3.5 4)")
  }

  test("extension-routed .ndjson input indexes identically to the direct path") {
    import graft.engine._
    import graft.model._
    import graft.queries.GeoQueries
    GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.001"
    val pts = GeoQueries.pointsDf(spark, d)
      .select(col("point_id"), col("qty"),
        callUDF("st_point", col("longitude"), col("latitude")).as("geom_wkt"))
    val dir = tmp("graft_geojson_route") + ".ndjson"
    GeoJson.write(pts, "geom_wkt", dir)
    val in = VectorInput("g", Some(dir), None, None, None,
      "point_id", GeometryType.Point, Some("geom_wkt"), None, None,
      Method.Within, Seq("qty"))
    val viaSource = Indexer.index(spark, in,
      Validator.validate(spark, in, GraftJob.loadInput(spark, in)), 6)
      .select("h3_index", "point_id", "qty", "ratio")
    val direct = Indexer.index(spark, GeoQueries.pointsInput,
      Validator.validate(spark, GeoQueries.pointsInput,
        GeoQueries.pointsDf(spark, d)), 6)
      .select("h3_index", "point_id", "qty", "ratio")
    assert(viaSource.exceptAll(direct).isEmpty && direct.exceptAll(viaSource).isEmpty)
  }
}
