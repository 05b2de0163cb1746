package graft.geo

import graft.h3.{H3, H3Index}
import org.locationtech.jts.geom.{Coordinate, Polygon}

/** Bridge between the H3 core and JTS geometry: the U2/U3 UDF surface of the
  * reference (spark_udfs.py:12-21, 48-67) plus hexagon areas.
  */
object H3Geo {

  /** Cell boundary as a closed JTS polygon in (lng, lat) order — the
    * reference's h3_to_wkt swaps h3's lat/lng pairs and repeats the first
    * vertex (spark_udfs.py:48-67).
    */
  def cellPolygon(cell: Long): Polygon = {
    val b = H3.cellToBoundary(cell)
    val cs = new Array[Coordinate](b.length + 1)
    var i = 0
    while (i < b.length) {
      cs(i) = new Coordinate(math.toDegrees(b(i).lng), math.toDegrees(b(i).lat))
      i += 1
    }
    cs(b.length) = cs(0)
    GeoIO.factory.createPolygon(cs)
  }

  def cellToWkt(cell: Long): String = GeoIO.toWkt(cellPolygon(cell))
  def cellToWkt(cell: String): String = cellToWkt(H3Index.fromHexString(cell))

  /** Hexagon area in km² via the geodesic area of its boundary
    * (geospatial.py:117-137: ST_AreaSpheroid(h3_to_wkt(ix)) / 1e6).
    */
  def cellAreaKm2(cell: Long): Double =
    Geodesic.areaSqMeters(cellPolygon(cell)) / 1e6

  def cellAreaKm2(cell: String): Double = cellAreaKm2(H3Index.fromHexString(cell))

  /** Resolution-3 ancestor as hex string (U2, the partition key). */
  def parentRes3(cell: String): String = H3.cellToParentString(cell, 3)
}
