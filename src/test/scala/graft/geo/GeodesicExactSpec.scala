package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** The exact geodesic solver: distance vs Vincenty, azimuth orientation,
  * S12 antisymmetry, ring-area signs, pole winding, and agreement with the
  * authalic approximation within its known error.
  */
class GeodesicExactSpec extends AnyFunSuite {

  test("distance agrees with Vincenty to its 0.5 mm accuracy") {
    val pairs = Seq(
      (37.7749, -122.4194, 37.8044, -122.2712),
      (40.6398, -73.7789, 51.4775, -0.46138),
      (-33.8688, 151.2093, -37.8136, 144.9631),
      (0.0, 0.0, 0.0, 10.0),
      (0.0, 0.0, 10.0, 0.0),
      (-5.0, 0.0, 5.0, 179.0),
      (60.0, -45.0, 60.0001, -45.0001),
      (89.9, 0.0, 89.9, 180.0))
    pairs.foreach { case (a, b, c, d) =>
      val v = Geodesic.distanceMeters(a, b, c, d)
      val k = GeodesicExact.distance(a, b, c, d)
      assert(math.abs(v - k) < 1e-3, s"($a,$b)->($c,$d): vincenty $v exact $k")
    }
  }

  test("azimuths point the right way") {
    def azi1(lat1: Double, lon1: Double, lat2: Double, lon2: Double) =
      math.toDegrees(GeodesicExact.inverse(lat1, lon1, lat2, lon2).azi1Rad)
    assert(math.abs(azi1(0, 0, 0, 10) - 90) < 1e-9)  // east
    assert(math.abs(azi1(10, 20, 30, 20) - 0) < 1e-9) // north
    assert(math.abs(math.abs(azi1(30, 20, 10, 20)) - 180) < 1e-9) // south
    assert(math.abs(azi1(0, 10, 0, 0) + 90) < 1e-9)  // west
  }

  test("S12 edge area is antisymmetric under direction reversal") {
    val pts = Seq((37.3, -121.9), (37.5, -122.2), (40.0, -100.0), (-12.0, 31.0))
    for ((la1, lo1) <- pts; (la2, lo2) <- pts if (la1, lo1) != (la2, lo2)) {
      val f = GeodesicExact.inverse(la1, lo1, la2, lo2).area
      val r = GeodesicExact.inverse(la2, lo2, la1, lo1).area
      assert(math.abs(f + r) <= 1e-6 * math.max(1.0, math.abs(f)),
        s"($la1,$lo1)<->($la2,$lo2): $f vs $r")
    }
  }

  test("ring area: sign by orientation, agreement with authalic, pole winding") {
    val sq = Array((10.0, 40.0), (11.0, 40.0), (11.0, 41.0), (10.0, 41.0))
    val ccw = GeodesicExact.ringArea(sq)
    val cw = GeodesicExact.ringArea(sq.reverse)
    assert(ccw > 0 && cw < 0 && math.abs(ccw + cw) < 1e-3)
    val auth = Geodesic.areaSqMetersAuthalic(
      GeoIO.fromWkt("POLYGON ((10 40, 11 40, 11 41, 10 41, 10 40))"))
    assert(math.abs(ccw - auth) / auth < 1e-6, s"exact $ccw vs authalic $auth")
    // ring around the north pole: area must be the polar cap, not the zone
    val cap = (0 until 36).map(i => (i * 10.0, 80.0)).toArray
    val capArea = GeodesicExact.ringArea(cap)
    val sphereCap = 2 * math.Pi * 6371008.8 * 6371008.8 *
      (1 - math.sin(math.toRadians(80)))
    assert(math.abs(capArea) < GeodesicExact.TotalArea / 4, "not normalized")
    assert(math.abs(math.abs(capArea) - sphereCap) / sphereCap < 0.02,
      s"cap $capArea vs sphere approx $sphereCap")
  }

  test("total ellipsoid area constant matches WGS84") {
    assert(math.abs(GeodesicExact.TotalArea / 1e6 - 510065621.724) < 1.0)
  }
}
