package graft.geo

import org.locationtech.jts.geom.{Geometry, LineString, Polygon}

/** Geodesic (WGS84) measures replacing Sedona's ST_LengthSpheroid /
  * ST_AreaSpheroid (reference call sites: h3_indexer.py:202-204, 266-268;
  * geospatial.py:128-135).
  *
  * Length: Vincenty inverse per segment (published algorithm, accuracy
  * ~0.5 mm — measured ≤1e-10 relative vs. the exact solver, well inside the
  * parity target, at a fraction of the cost; it stays on the per-feature hot
  * path). Area: exact ellipsoidal polygon area via [[GeodesicExact]]
  * (geodesic edges, Karney semantics — matches the reference README's
  * Sedona/GeographicLib hexagon goldens to ~1e-10 relative). The authalic
  * approximation this replaced is kept as [[areaSqMetersAuthalic]] for
  * comparison in specs.
  */
object Geodesic {

  // WGS84
  val A = 6378137.0
  val F = 1.0 / 298.257223563
  val B = A * (1.0 - F)
  val E2 = F * (2.0 - F)

  /** Authalic sphere radius in meters (radius of the equal-area sphere). */
  val AuthalicRadius: Double = {
    val e = math.sqrt(E2)
    // R² = a²/2 + b²/2 * atanh(e)/e
    math.sqrt(A * A / 2.0 + B * B / 2.0 * (0.5 * math.log((1 + e) / (1 - e))) / e)
  }

  /** Vincenty inverse distance in meters between two lat/lng (degrees). */
  def distanceMeters(lat1Deg: Double, lon1Deg: Double,
                     lat2Deg: Double, lon2Deg: Double): Double = {
    if (lat1Deg == lat2Deg && lon1Deg == lon2Deg) return 0.0
    val phi1 = math.toRadians(lat1Deg)
    val phi2 = math.toRadians(lat2Deg)
    val l = math.toRadians(lon2Deg - lon1Deg)
    val u1 = math.atan((1 - F) * math.tan(phi1))
    val u2 = math.atan((1 - F) * math.tan(phi2))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lambda = l
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinLambda, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosLambda, 2))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cosSqAlpha == 0.0) 0.0 // equatorial line
        else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = F / 16 * cosSqAlpha * (4 + F * (4 - 3 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = l + (1 - c) * F * sinAlpha *
        (sigma + c * sinSigma *
          (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    val uSq = cosSqAlpha * (A * A - B * B) / (B * B)
    val aCoef = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bCoef = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bCoef * sinSigma *
      (cos2SigmaM + bCoef / 4 *
        (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
          bCoef / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
            (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    B * aCoef * (sigma - deltaSigma)
  }

  /** Geodesic length in meters of a (multi)linestring with lon/lat degree
    * coordinates (ST_LengthSpheroid).
    */
  def lengthMeters(g: Geometry): Double = g match {
    case l: LineString =>
      val cs = l.getCoordinates
      var total = 0.0
      var i = 1
      while (i < cs.length) {
        total += distanceMeters(cs(i - 1).y, cs(i - 1).x, cs(i).y, cs(i).x)
        i += 1
      }
      total
    case other =>
      (0 until other.getNumGeometries).map(i => lengthMeters(other.getGeometryN(i))).sum
  }

  /** Authalic latitude (radians) of a geodetic latitude (radians). */
  def authalicLat(phi: Double): Double = {
    val e2 = E2; val e4 = e2 * e2; val e6 = e4 * e2
    phi - (e2 / 3 + 31 * e4 / 180 + 59 * e6 / 560) * math.sin(2 * phi) +
      (17 * e4 / 360 + 61 * e6 / 1260) * math.sin(4 * phi) -
      (383 * e6 / 45360) * math.sin(6 * phi)
  }

  /** Signed spherical area (steradians) of a lon/lat-degree ring on the unit
    * sphere after authalic conversion; positive = counter-clockwise.
    * Van Oosterom–Strackee signed excess over a fan triangulation.
    */
  private def ringAreaSteradians(cs: Array[org.locationtech.jts.geom.Coordinate]): Double = {
    val n = if (cs.length > 1 && cs(0).equals2D(cs(cs.length - 1))) cs.length - 1 else cs.length
    if (n < 3) return 0.0
    val vs = Array.tabulate(n) { i =>
      val lat = authalicLat(math.toRadians(cs(i).y))
      val lon = math.toRadians(cs(i).x)
      val cl = math.cos(lat)
      (cl * math.cos(lon), cl * math.sin(lon), math.sin(lat))
    }
    var total = 0.0
    val a = vs(0)
    var i = 1
    while (i < n - 1) {
      val b = vs(i); val c = vs(i + 1)
      val triple = a._1 * (b._2 * c._3 - b._3 * c._2) +
        a._2 * (b._3 * c._1 - b._1 * c._3) +
        a._3 * (b._1 * c._2 - b._2 * c._1)
      val dotAb = a._1 * b._1 + a._2 * b._2 + a._3 * b._3
      val dotBc = b._1 * c._1 + b._2 * c._2 + b._3 * c._3
      val dotCa = c._1 * a._1 + c._2 * a._2 + c._3 * a._3
      total += 2.0 * math.atan2(triple, 1.0 + dotAb + dotBc + dotCa)
      i += 1
    }
    total
  }

  /** Geodesic area in m² of a (multi)polygon with lon/lat degree coordinates
    * (ST_AreaSpheroid, exact ellipsoidal — Karney semantics). Holes are
    * subtracted.
    */
  def areaSqMeters(g: Geometry): Double = g match {
    case p: Polygon =>
      def ring(cs: Array[org.locationtech.jts.geom.Coordinate]) =
        math.abs(GeodesicExact.ringArea(cs.map(c => (c.x, c.y))))
      val shell = ring(p.getExteriorRing.getCoordinates)
      val holes = (0 until p.getNumInteriorRing)
        .map(i => ring(p.getInteriorRingN(i).getCoordinates)).sum
      shell - holes
    case other =>
      (0 until other.getNumGeometries).map(i => areaSqMeters(other.getGeometryN(i))).sum
  }

  /** The pre-round-2 authalic-sphere approximation (≤ ~1e-7 relative on
    * degree-scale polygons, ~1e-9 on H3 cells) — retained for spec
    * comparison and as a cheap alternative where exactness is not needed.
    */
  def areaSqMetersAuthalic(g: Geometry): Double = g match {
    case p: Polygon =>
      val shell = math.abs(ringAreaSteradians(p.getExteriorRing.getCoordinates))
      val holes = (0 until p.getNumInteriorRing)
        .map(i => math.abs(ringAreaSteradians(p.getInteriorRingN(i).getCoordinates))).sum
      (shell - holes) * AuthalicRadius * AuthalicRadius
    case other =>
      (0 until other.getNumGeometries).map(i => areaSqMetersAuthalic(other.getGeometryN(i))).sum
  }
}
