package graft.tools

/** Scratch: verify WKT round-trip precision of GeoIO. */
object WktPrecision {
  def main(a: Array[String]): Unit = {
    val g = graft.geo.GeoIO.point(-174.375, -69.17500000000001)
    val w = graft.geo.GeoIO.toWkt(g)
    println("wkt: " + w)
    val back = graft.geo.GeoIO.fromWkt(w)
    println("x=" + back.getCoordinate.x + " y=" + back.getCoordinate.y)
    println("json: " + graft.geo.GeoIO.toGeoJson(g))
  }
}
