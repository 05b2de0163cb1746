package graft.tools

import graft.geo.{Geodesic, GeodesicExact, H3Geo}

/** Scratch: validate GeodesicExact against Vincenty, the authalic area, and
  * the reference README hexagon goldens.
  */
object GeodCheck {
  def main(args: Array[String]): Unit = {
    // --- distances vs Vincenty (0.5 mm accuracy) over assorted pairs
    val pairs = Seq(
      (37.7749, -122.4194, 37.8044, -122.2712), // SF-Oakland ~13 km
      (40.6398, -73.7789, 51.4775, -0.46138),   // JFK-LHR ~5551 km
      (-33.8688, 151.2093, -37.8136, 144.9631), // SYD-MEL
      (0.0, 0.0, 0.0, 10.0),                    // equatorial
      (0.0, 0.0, 10.0, 0.0),                    // meridional
      (-5.0, 0.0, 5.0, 179.0),                  // near-antipodal-ish
      (60.0, -45.0, 60.0001, -45.0001),         // 13 m
      (89.9, 0.0, 89.9, 180.0))                 // over the pole
    pairs.foreach { case (a, b, c, d) =>
      val v = Geodesic.distanceMeters(a, b, c, d)
      val k = GeodesicExact.distance(a, b, c, d)
      println(f"dist ($a%8.4f,$b%9.4f)->($c%8.4f,$d%9.4f)  vincenty=$v%16.6f exact=$k%16.6f  rel=${math.abs(v - k) / math.max(k, 1e-9)}%.3e")
    }
    // --- azimuth sanity
    val e = GeodesicExact.inverse(0, 0, 0, 10)
    println(f"equatorial azi1=${math.toDegrees(e.azi1Rad)}%.6f (want 90)")
    val n = GeodesicExact.inverse(10, 20, 30, 20)
    println(f"northward azi1=${math.toDegrees(n.azi1Rad)}%.6f (want 0)")
    val s = GeodesicExact.inverse(30, 20, 10, 20)
    println(f"southward azi1=${math.toDegrees(s.azi1Rad)}%.6f (want ±180)")
    val w = GeodesicExact.inverse(0, 10, 0, 0)
    println(f"westward azi1=${math.toDegrees(w.azi1Rad)}%.6f (want -90)")

    // --- small-square area vs authalic (sign + magnitude, ~1e-3 agreement)
    val sq = Array((10.0, 40.0), (11.0, 40.0), (11.0, 41.0), (10.0, 41.0)) // CCW lon/lat
    val exact = GeodesicExact.ringArea(sq)
    val auth = {
      val wkt = "POLYGON ((10 40, 11 40, 11 41, 10 41, 10 40))"
      Geodesic.areaSqMeters(graft.geo.GeoIO.fromWkt(wkt))
    }
    println(f"square CCW exact=$exact%.3f authalic=$auth%.3f rel=${math.abs(exact - auth) / auth}%.3e")
    println(f"square CW  exact=${GeodesicExact.ringArea(sq.reverse)}%.3f (want negative)")

    // --- polar cap ring (winding handling)
    val cap = (0 until 36).map(i => (i * 10.0, 80.0)).toArray // CCW around N pole
    val capExact = GeodesicExact.ringArea(cap)
    println(f"85-deg cap exact=$capExact%.6e (rough sphere cap ~ ${2 * math.Pi * 6371008.8 * 6371008.8 * (1 - math.sin(math.toRadians(80)))}%.6e)")

    // --- per-edge S12 antisymmetry + hexagon edge dump
    val hb = graft.h3.H3.cellToBoundary(graft.h3.H3Index.fromHexString("86446cae7ffffff"))
    val hr = hb.map(v => (math.toDegrees(v.lng), math.toDegrees(v.lat)))
    var i = 0
    while (i < hr.length) {
      val (lon1, lat1) = hr(i); val (lon2, lat2) = hr((i + 1) % hr.length)
      val fwd = GeodesicExact.inverse(lat1, lon1, lat2, lon2)
      val rev = GeodesicExact.inverse(lat2, lon2, lat1, lon1)
      println(f"edge $i s=${fwd.s12}%12.3f S12=${fwd.area}%18.3f  S12rev=${rev.area}%18.3f  sum=${fwd.area + rev.area}%12.3e")
      i += 1
    }

    // --- res-0 cells: exact vs authalic per cell (tiling discrepancy hunt)
    var totalEx = 0.0; var totalAu = 0.0
    (0 until 122).foreach { bc =>
      val h = graft.h3.H3Index.setBaseCell(
        graft.h3.H3Index.setResolution(graft.h3.H3Index.Init, 0), bc)
      val bnd = graft.h3.H3.cellToBoundary(h)
      val ringDeg = bnd.map(v => (math.toDegrees(v.lng), math.toDegrees(v.lat)))
      val ex = math.abs(GeodesicExact.ringArea(ringDeg)) / 1e6
      val au = Geodesic.areaSqMetersAuthalic(H3Geo.cellPolygon(h)) / 1e6
      totalEx += ex; totalAu += au
      val rel = math.abs(ex - au) / au
      if (rel > 1e-5)
        println(f"bc=$bc%3d exact=$ex%16.3f authalic=$au%16.3f rel=$rel%.3e ctrLat=${math.toDegrees(graft.h3.H3.cellToLatLng(h).lat)}%7.2f")
    }
    println(f"res0 totals exact=$totalEx%.3f authalic=$totalAu%.3f earth=510065621.724")

    // --- README hexagon goldens (computed by Sedona -> GeographicLib)
    val goldens = Seq(
      "840e4d3ffffffff" -> 2004.4344472440796,
      "840e4d7ffffffff" -> 2011.5201608518523,
      "86446cae7ffffff" -> 40.55609958082783,
      "86446ca57ffffff" -> 40.58272492454886,
      "8644697b7ffffff" -> 40.12018482559633)
    goldens.foreach { case (cell, want) =>
      val b = graft.h3.H3.cellToBoundary(graft.h3.H3Index.fromHexString(cell))
      val ring = b.map(v => (math.toDegrees(v.lng), math.toDegrees(v.lat)))
      val got = math.abs(GeodesicExact.ringArea(ring)) / 1e6
      val old = H3Geo.cellAreaKm2(cell)
      println(f"$cell got=$got%.12f want=$want%.12f rel=${math.abs(got - want) / want}%.3e (authalic rel=${math.abs(old - want) / want}%.3e)")
    }
  }
}
