package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import graft.h3.{H3, H3Index}

class GeoSpec extends AnyFunSuite {

  test("WKT/GeoJSON/WKB round trips") {
    val wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    val g = GeoIO.fromWkt(wkt)
    assert(GeoIO.fromGeoJson(GeoIO.toGeoJson(g)).equalsExact(g, 1e-12))
    assert(GeoIO.fromWkbHex(GeoIO.toWkbHex(g)).equalsExact(g, 1e-12))
    val line = GeoIO.fromWkt("LINESTRING (0 0, 1 1, 2 0)")
    assert(GeoIO.fromGeoJson(GeoIO.toGeoJson(line)).equalsExact(line, 1e-12))
    val mp = GeoIO.fromWkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))")
    assert(GeoIO.fromGeoJson(GeoIO.toGeoJson(mp)).equalsExact(mp, 1e-12))
  }

  test("encoding sniff follows the reference rules") {
    assert(GeoIO.sniffString("POINT (1 2)") == GeoIO.Wkt)
    assert(GeoIO.sniffString("""{"type":"Point","coordinates":[1,2]}""") == GeoIO.GeoJson)
    assert(GeoIO.sniffString("0101000000000000000000F03F0000000000000040") == GeoIO.StringWkb)
    val p = GeoIO.parseString("0101000000000000000000F03F0000000000000040")
    assert(p.getGeometryType == "Point")
    assert(p.getCoordinate.x == 1.0 && p.getCoordinate.y == 2.0)
  }

  test("makeValid repairs a bow-tie and keeps area") {
    val bowtie = GeoIO.fromWkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    assert(!GeoIO.isValid(bowtie))
    val fixed = GeoIO.makeValid(bowtie)
    assert(fixed.isDefined && GeoIO.isValid(fixed.get))
    assert(math.abs(fixed.get.getArea - 2.0) < 1e-9) // two unit triangles
  }

  test("Vincenty inverse matches published WGS84 arcs") {
    // one degree along the equator = a * pi/180
    val eq = Geodesic.distanceMeters(0, 0, 0, 1)
    assert(math.abs(eq - 111319.49079327358) < 1e-3, s"equator: $eq")
    // quarter meridian (equator to pole)
    val qm = Geodesic.distanceMeters(0, 0, 90, 0)
    assert(math.abs(qm - 10001965.7293) < 1.0, s"quarter meridian: $qm")
    // symmetry
    assert(math.abs(
      Geodesic.distanceMeters(37.7, -122.4, 40.7, -74.0) -
      Geodesic.distanceMeters(40.7, -74.0, 37.7, -122.4)) < 1e-6)
  }

  test("hexagon areas match reference README goldens") {
    // /root/reference/README.md:280-284, 306-313, 334-341
    val goldens = Seq(
      "840e4d3ffffffff" -> 2004.4344472440796,
      "840e4d7ffffffff" -> 2011.5201608518523,
      "86446cae7ffffff" -> 40.55609958082783,
      "86446ca57ffffff" -> 40.58272492454886,
      "8644697b7ffffff" -> 40.12018482559633,
      "86446945fffffff" -> 40.145249906240224
    )
    goldens.foreach { case (cell, want) =>
      val got = H3Geo.cellAreaKm2(cell)
      val rel = math.abs(got - want) / want
      // exact ellipsoidal area (GeodesicExact): measured 4e-13..4e-10
      // relative vs the Sedona/GeographicLib-computed goldens
      assert(rel < 5e-9, f"$cell: got $got%.6f want $want rel=$rel%.2e")
    }
  }

  test("res-0 cell areas tile the earth") {
    val total = (0 until 122).map { bc =>
      val h = H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc)
      H3Geo.cellAreaKm2(h)
    }.sum
    val earth = 510065621.724 // WGS84 surface area km²
    assert(math.abs(total - earth) / earth < 1e-6, s"total $total")
  }

  test("parent partition key helper") {
    assert(H3Geo.parentRes3("840e4d3ffffffff") == "830e4dfffffffff")
  }
}
