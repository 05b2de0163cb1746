package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.GeoIO
import scala.jdk.CollectionConverters._

/** Newline-delimited GeoJSON source/sink (one RFC 7946 `Feature` object per
  * line — the splittable at-scale layout; a whole-file `FeatureCollection`
  * reader is provided as a small-file convenience).
  *
  * The reference reads parquet and shapefiles through an extension router
  * (spark/spark.py:26-42) and already round-trips geometry through GeoJSON
  * internally (geospatial.py:55-83); this source extends the same router to
  * `.geojson`/`.ndjson` files, producing the engine's canonical `geom_wkt`
  * column plus one column per feature property.
  *
  * Scale notes:
  *  - read is two map-only passes over a text scan (schema inference, then
  *    parse) — exactly `spark.read.json`'s shape; NDJSON lines split across
  *    tasks like any text file, so a 100 TB corpus fans out by file blocks.
  *  - write is a single map stage: the feature line is assembled from
  *    `to_json` (codegen) plus one geometry UDF; no shuffle is introduced.
  *  - doubles survive the round-trip bit-for-bit: both Jackson (write) and
  *    Spark's JSON parser (read) use shortest-round-trip formatting, which
  *    is what lets geojson_source_roundtrip hash-match its DuckDB oracle.
  */
object GeoJson {

  /** Canonical geometry column name, shared with the rest of the engine. */
  val GeomCol = "geom_wkt"

  private val geojsonToWkt = udf { (g: String) =>
    if (g == null) null else GeoIO.toWkt(GeoIO.fromGeoJson(g))
  }
  private val wktToGeojson = udf { (w: String) =>
    if (w == null) null else GeoIO.toGeoJson(GeoIO.fromWkt(w))
  }

  /** Parse a dataset of single-feature JSON strings into
    * (properties..., geom_wkt). Property schema is inferred with Spark's
    * own JSON inference over the `properties` subtree (full pass, like
    * `spark.read.json`), then applied with codegen `from_json`.
    */
  private def parseFeatures(spark: SparkSession, features: Dataset[String]): DataFrame = {
    import spark.implicits._
    val lines = features.toDF("line").where(length(trim(col("line"))) > 0)
    val propsJson = get_json_object(col("line"), "$.properties")
    val geomJson = get_json_object(col("line"), "$.geometry")
    val propSchema = spark.read
      .json(lines.select(propsJson.as("p")).where(col("p").isNotNull).as[String])
      .schema
    val parsed = lines.select(
      from_json(propsJson, propSchema).as("__props"),
      geojsonToWkt(geomJson).as(GeomCol))
    if (propSchema.isEmpty) parsed.select(col(GeomCol))
    else {
      require(!propSchema.fieldNames.contains(GeomCol),
        s"feature property '$GeomCol' collides with the canonical geometry column")
      parsed.select(col("__props.*") +: Seq(col(GeomCol)): _*)
    }
  }

  /** Read newline-delimited GeoJSON (one Feature per line). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    parseFeatures(spark, spark.read.textFile(path))
  }

  /** Read a whole-file `FeatureCollection` (convenience for small files —
    * a single JSON document is not splittable, so each FILE is one task;
    * use NDJSON for anything large). Features are re-emitted as compact
    * single-feature JSON executor-side and parsed by the NDJSON path.
    */
  def readFeatureCollection(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val features = spark.read.option("wholetext", "true").textFile(path)
      .flatMap { doc =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(doc)
        val fs = root.get("features")
        require(fs != null && fs.isArray,
          "not a FeatureCollection: missing 'features' array")
        (0 until fs.size()).map(i => mapper.writeValueAsString(fs.get(i)))
      }
    parseFeatures(spark, features)
  }

  /** Write as newline-delimited GeoJSON: `geomCol` (WKT) becomes the
    * feature geometry, every other column a property. Null-valued
    * properties are emitted as explicit `"key":null` (ignoreNullFields
    * off): omission would be value-equivalent per row (GeoJSON is
    * schemaless), but a column that is null in EVERY row would then be
    * absent from every feature line and read-side schema inference would
    * drop the column entirely — explicit nulls keep the round trip
    * schema-preserving.
    */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    val props = df.columns.filterNot(_ == geomCol)
    val line = concat(
      lit("""{"type":"Feature","geometry":"""),
      coalesce(wktToGeojson(col(geomCol)), lit("null")),
      lit(""","properties":"""),
      coalesce(to_json(struct(props.map(col): _*),
        Map("ignoreNullFields" -> "false").asJava), lit("{}")),
      lit("}"))
    df.select(line.as("value")).write.mode("overwrite").text(path)
  }
}
