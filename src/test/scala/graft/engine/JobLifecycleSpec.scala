package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.model._

/** S4 JDBC option wiring (offline — asserts construction, not connection),
  * job lifecycle metadata, resolution-scaled shuffle partitions, and the
  * opt-in geometry_geojson compatibility column.
  */
class JobLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }
  override def afterAll(): Unit = spark.stop()

  private val R = org.apache.spark.sql.Row
  import scala.jdk.CollectionConverters._
  private def df(schema: String, rows: Seq[org.apache.spark.sql.Row]) =
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType.fromDDL(schema))

  private def glueInput(where: Option[String]) = VectorInput(
    "gi", None, Some("mydb"), Some("mytable"), where, "id",
    GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v"))

  test("S4 jdbc options mirror the reference's Athena wiring") {
    val opts = GraftJob.jdbcOptions(glueInput(Some("region = 'us-west-2'")))
    assert(opts("driver") == "com.simba.athena.jdbc.Driver")
    assert(opts("url").startsWith("jdbc:awsathena://"))
    assert(opts("WorkGroup") == "ReadOnlyWorkGroup")
    assert(opts("AwsCredentialsProviderClass").contains("DefaultAWSCredentialsProviderChain"))
    // the user predicate is pushed into the source query (P6), quoted like
    // the reference: SELECT * FROM db."table" WHERE ...
    assert(opts("query") == """SELECT * FROM mydb."mytable" WHERE region = 'us-west-2'""")
    val noWhere = GraftJob.jdbcOptions(glueInput(None))
    assert(noWhere("query") == """SELECT * FROM mydb."mytable"""")
  }

  test("resolution-scaled shuffle partitions follow the reference mapping") {
    assert(graft.Sessions.shufflePartitionsFor(3) == 100)
    assert(graft.Sessions.shufflePartitionsFor(6) == 800)
    assert(graft.Sessions.shufflePartitionsFor(10) == 8000)
  }

  test("job run advances lifecycle to CompletedResolver") {
    val dir = java.nio.file.Files.createTempDirectory("graftjob")
    val data = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE", Seq(
      R(1L, 37.7, -122.4, 10.0), R(2L, 37.8, -122.3, 5.0)))
    data.write.mode("overwrite").parquet(s"$dir/pts.parquet")
    val job = Job("j", "1.0.0", 6, s"$dir/out", Seq(VectorInput(
      "pts", Some(s"$dir/pts.parquet"), None, None, None, "pid",
      GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v"))))
    val (_, resolved, state) = GraftJob.run(spark, job)
    assert(resolved.count() == 2)
    assert(state.status == JobStatus.CompletedResolver)
    assert(state.errorMessage.isEmpty)
    assert(state.id.length == 12)
    assert(state.updatedAt.exists(!_.isBefore(state.createdAt)))
  }

  test("job run failure captures Failed state and the error") {
    val dir = java.nio.file.Files.createTempDirectory("graftjob2")
    // duplicate unique ids → validation failure
    val data = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE", Seq(
      R(1L, 37.7, -122.4, 10.0), R(1L, 37.8, -122.3, 5.0)))
    data.write.mode("overwrite").parquet(s"$dir/pts.parquet")
    val job = Job("j", "1.0.0", 6, s"$dir/out", Seq(VectorInput(
      "pts", Some(s"$dir/pts.parquet"), None, None, None, "pid",
      GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v"))))
    val e = intercept[GraftJob.JobFailed](GraftJob.run(spark, job))
    assert(e.state.status == JobStatus.Failed)
    assert(e.state.errorMessage.exists(_.contains("unique_id")))
  }

  test("quarantine_path opt-in writes dropped rows with reasons; resolve unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("graftq")
    val data = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE", Seq(
      R(1L, 37.7, -122.4, 10.0), R(2L, null, -122.3, 5.0), R(3L, 37.9, -122.2, 7.0)))
    data.write.mode("overwrite").parquet(s"$dir/pts.parquet")
    val job = Job("j", "1.0.0", 6, s"$dir/out", Seq(VectorInput(
      "pts", Some(s"$dir/pts.parquet"), None, None, None, "pid",
      GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v"))),
      quarantinePath = Some(s"$dir/rejects"))
    val (_, resolved, state) = GraftJob.run(spark, job)
    assert(state.status == JobStatus.CompletedResolver)
    assert(resolved.count() == 2) // null-lat row dropped from the main path
    val q = spark.read.parquet(s"$dir/rejects")
    assert(q.count() == 1)
    val row = q.select("pid", "reject_reason", "input_name").head()
    assert(row.getLong(0) == 2L)
    assert(row.getString(1) == "null_geometry")
    assert(row.getString(2) == "pts")
  }

  test("quarantine rerun with zero rejects clears the input's stale partition") {
    val dir = java.nio.file.Files.createTempDirectory("graftq2")
    def jobFor(path: String) = Job("j", "1.0.0", 6, s"$dir/out", Seq(VectorInput(
      "pts", Some(path), None, None, None, "pid",
      GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v"))),
      quarantinePath = Some(s"$dir/rejects"))
    // run 1: one reject lands in the pts partition
    val bad = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE", Seq(
      R(1L, 37.7, -122.4, 10.0), R(2L, null, -122.3, 5.0)))
    bad.write.mode("overwrite").parquet(s"$dir/bad.parquet")
    GraftJob.run(spark, jobFor(s"$dir/bad.parquet"))
    assert(spark.read.parquet(s"$dir/rejects").count() == 1)
    // run 2: all rows valid — the previous reject must NOT survive the rerun
    val good = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE", Seq(
      R(1L, 37.7, -122.4, 10.0), R(2L, 37.8, -122.3, 5.0)))
    good.write.mode("overwrite").parquet(s"$dir/good.parquet")
    GraftJob.run(spark, jobFor(s"$dir/good.parquet"))
    assert(spark.read.parquet(s"$dir/rejects/input_name=pts").count() == 0,
      "a zero-reject rerun must clear the input's stale quarantine partition")
  }

  test("quarantine_path parses from yaml and normalizes s3 scheme") {
    val y =
      """name: j
        |version: 1.0.0
        |h3_resolution: 6
        |output_s3_path: s3://b/out
        |quarantine_s3_path: s3://b/rejects
        |inputs:
        |  pts:
        |    s3_path: s3://b/pts
        |    unique_id: pid
        |    geometry_type: POINT
        |    lat_column_name: lat
        |    lon_column_name: lon
        |    method: WITHIN
        |    input_columns: [v]
        |""".stripMargin
    val job = JobConfig.fromYaml(y).toOption.get
    assert(job.quarantinePath.contains("s3a://b/rejects"))
  }

  test("materialize_geojson opt-in adds the reference's second canonical column") {
    val data = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE",
      Seq(R(1L, 37.7, -122.4, 10.0)))
    val in = VectorInput("pts", Some(""), None, None, None, "pid",
      GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v"))
    val validated = Validator.validate(spark, in, data, withGeoJson = true)
    assert(validated.columns.contains("geometry_geojson"))
    val gj = validated.select("geometry_geojson").head().getString(0)
    assert(gj.contains("\"type\"") && gj.contains("Point"))
    // parses back to the same point
    val g = graft.geo.GeoIO.fromGeoJson(gj)
    assert(math.abs(g.getCoordinate.x - -122.4) < 1e-9)
    // default path stays single-column (documented divergence)
    assert(!Validator.validate(spark, in, data).columns.contains("geometry_geojson"))
  }

  test("raster inputs validate then no-op, exactly like the reference") {
    // a valid raster input parses (s3_uri checked) …
    val yaml =
      """name: j
        |version: 1.0.0
        |h3_resolution: 6
        |output_path: /tmp/x
        |inputs:
        |  dem:
        |    type: raster
        |    s3_uri: s3://bucket/dem.tif
        |""".stripMargin
    val job = JobConfig.fromYaml(yaml).toOption.get
    assert(job.inputs == Seq(RasterInput("dem", "s3://bucket/dem.tif")))

    // … a malformed s3_uri is a validation error (raster.py:29-38) …
    val bad = JobConfig.fromYaml(yaml.replace("s3://bucket/dem.tif", "/local/dem.tif"))
    assert(bad.swap.toOption.get.exists(_.contains("S3 URI must start with s3://")))

    // … and a mixed job indexes ONLY the vector input (main.py:52): the
    // raster is carried but silently skipped, not an error
    val dir = java.nio.file.Files.createTempDirectory("graftraster")
    val data = df("pid BIGINT, lat DOUBLE, lon DOUBLE, v DOUBLE", Seq(
      R(1L, 37.7, -122.4, 10.0), R(2L, 37.8, -122.3, 5.0)))
    data.write.mode("overwrite").parquet(s"$dir/pts.parquet")
    val mixed = Job("j", "1.0.0", 6, s"$dir/out", Seq(
      VectorInput("pts", Some(s"$dir/pts.parquet"), None, None, None, "pid",
        GeometryType.Point, None, Some("lat"), Some("lon"), Method.Within, Seq("v")),
      RasterInput("dem", "s3://bucket/dem.tif")))
    val (indexed, resolved, state) = GraftJob.run(spark, mixed)
    assert(indexed.keySet == Set("pts"))
    assert(resolved.count() == 2)
    assert(state.status == JobStatus.CompletedResolver)
  }

  test("yaml config parses materialize_geojson") {
    val yaml =
      """name: j
        |version: 1.0.0
        |h3_resolution: 6
        |output_path: /tmp/x
        |materialize_geojson: true
        |inputs:
        |  a:
        |    s3_path: s3://b/p.parquet
        |    unique_id: id
        |    geometry_type: POINT
        |    lat_column_name: lat
        |    lon_column_name: lon
        |    method: WITHIN
        |    input_columns: [v]
        |""".stripMargin
    val job = JobConfig.fromYaml(yaml).toOption.get
    assert(job.materializeGeoJson)
    assert(job.inputs.head.asInstanceOf[graft.model.VectorInput]
      .path.contains("s3a://b/p.parquet"))
  }
}
