package graft.geo

import org.locationtech.jts.geom.{Geometry, LineString, Polygon}

/** Exact planar clipping against a CONVEX ring — the fast path for the
  * indexer's PCT_LENGTH / PCT_AREA ratios. A hexagon cell is convex in
  * planar lng/lat almost everywhere (the exceptions — antimeridian-crossing
  * and pole-adjacent cells, whose planar rings fold — fail the convexity
  * gate and fall back to the JTS overlay), so
  *
  *   length(line ∩ hex)  = Σ Cyrus–Beck-clipped segment lengths
  *   area(poly ∩ hex)    = shoelace(Sutherland–Hodgman(shell)) −
  *                         Σ shoelace(Sutherland–Hodgman(hole))
  *
  * Both are the same planar quantities `JTS Geometry.intersection` computes
  * (OverlayNG), minus the O(V log V) overlay machinery: ~0.5µs per pair
  * instead of ~50µs. Agreement with JTS is asserted to 1e-9 relative in
  * ConvexClipSpec.
  */
object ConvexClip {

  /** A convex clip region: open ring, oriented counter-clockwise. */
  final class Region(val xs: Array[Double], val ys: Array[Double]) {
    val n: Int = xs.length
  }

  /** Build a clip region from a JTS polygon ring if it is convex (within a
    * sliver tolerance) and antimeridian-sane; None → caller uses JTS.
    */
  def fromPolygon(p: Polygon): Option[Region] = {
    val cs = p.getExteriorRing.getCoordinates
    val n = cs.length - 1 // closed ring
    if (n < 3 || p.getNumInteriorRing > 0) return None
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    var minX = Double.MaxValue; var maxX = Double.MinValue
    while (i < n) {
      xs(i) = cs(i).x; ys(i) = cs(i).y
      if (xs(i) < minX) minX = xs(i)
      if (xs(i) > maxX) maxX = xs(i)
      i += 1
    }
    if (maxX - minX >= 180.0) return None // antimeridian-folded ring
    // orientation via shoelace
    var area2 = 0.0
    i = 0
    while (i < n) {
      val j = (i + 1) % n
      area2 += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    if (area2 == 0.0) return None
    if (area2 < 0) { // orient CCW
      var a = 0; var b = n - 1
      while (a < b) {
        val tx = xs(a); xs(a) = xs(b); xs(b) = tx
        val ty = ys(a); ys(a) = ys(b); ys(b) = ty
        a += 1; b -= 1
      }
    }
    // strict-enough convexity: every turn left, allowing ~collinear slivers
    // (clipping by the half-plane intersection then differs from the true
    // polygon by ≲1e-12-relative slivers, far under the 1e-9 gate)
    var scale2 = 0.0
    i = 0
    while (i < n) {
      val j = (i + 1) % n
      val dx = xs(j) - xs(i); val dy = ys(j) - ys(i)
      val l2 = dx * dx + dy * dy
      if (l2 > scale2) scale2 = l2
      i += 1
    }
    val eps = -1e-12 * scale2
    i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cross = (xs(j) - xs(i)) * (ys(k) - ys(j)) - (ys(j) - ys(i)) * (xs(k) - xs(j))
      if (cross < eps) return None
      i += 1
    }
    Some(new Region(xs, ys))
  }

  /** Length of the part of segment (x1,y1)-(x2,y2) inside the region
    * (Cyrus–Beck parametric clipping against the CCW half-planes).
    */
  def segmentLengthIn(r: Region, x1: Double, y1: Double,
                      x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    var tEnter = 0.0; var tExit = 1.0
    var i = 0
    while (i < r.n) {
      val j = (i + 1) % r.n
      // inward normal of CCW edge (P_i → P_j) is the left normal
      val ex = r.xs(j) - r.xs(i); val ey = r.ys(j) - r.ys(i)
      val nx = -ey; val ny = ex
      val denom = nx * dx + ny * dy
      val num = nx * (x1 - r.xs(i)) + ny * (y1 - r.ys(i))
      if (denom == 0.0) {
        if (num < 0.0) return 0.0 // parallel and outside this half-plane
      } else {
        val t = -num / denom
        if (denom > 0.0) { if (t > tEnter) tEnter = t } // entering
        else { if (t < tExit) tExit = t } // leaving
        if (tEnter > tExit) return 0.0
      }
      i += 1
    }
    (tExit - tEnter) * math.sqrt(dx * dx + dy * dy)
  }

  /** length(g ∩ region) for pure (multi)linestring geometries; NaN when the
    * geometry contains a non-line component (caller falls back to JTS).
    */
  def lengthIn(r: Region, g: Geometry): Double = g match {
    case l: LineString =>
      val cs = l.getCoordinates
      var s = 0.0
      var i = 1
      while (i < cs.length) {
        s += segmentLengthIn(r, cs(i - 1).x, cs(i - 1).y, cs(i).x, cs(i).y)
        i += 1
      }
      s
    case multi if multi.getGeometryType.startsWith("Multi") ||
        multi.getGeometryType == "GeometryCollection" =>
      var s = 0.0
      var i = 0
      while (i < multi.getNumGeometries) {
        val part = lengthIn(r, multi.getGeometryN(i))
        if (part.isNaN) return Double.NaN
        s += part
        i += 1
      }
      s
    case _ => Double.NaN
  }

  /** |ring ∩ region| via Sutherland–Hodgman then shoelace. `ring` is a
    * closed coordinate ring (first == last).
    */
  def ringAreaIn(r: Region, ring: Array[org.locationtech.jts.geom.Coordinate]): Double = {
    if (ring.length < 4) return 0.0 // empty/degenerate ring (e.g. POLYGON EMPTY component)
    var subjX = new Array[Double](ring.length - 1)
    var subjY = new Array[Double](ring.length - 1)
    var m = ring.length - 1
    var i = 0
    while (i < m) { subjX(i) = ring(i).x; subjY(i) = ring(i).y; i += 1 }
    var e = 0
    while (e < r.n && m > 0) {
      val j = (e + 1) % r.n
      val ex = r.xs(j) - r.xs(e); val ey = r.ys(j) - r.ys(e)
      val nx = -ey; val ny = ex
      val px = r.xs(e); val py = r.ys(e)
      val outX = new Array[Double](2 * m + 4)
      val outY = new Array[Double](2 * m + 4)
      var k = 0
      var a = 0
      while (a < m) {
        val b = (a + 1) % m
        val da = nx * (subjX(a) - px) + ny * (subjY(a) - py)
        val db = nx * (subjX(b) - px) + ny * (subjY(b) - py)
        if (da >= 0.0) { outX(k) = subjX(a); outY(k) = subjY(a); k += 1 }
        if ((da > 0.0 && db < 0.0) || (da < 0.0 && db > 0.0)) {
          val t = da / (da - db)
          outX(k) = subjX(a) + t * (subjX(b) - subjX(a))
          outY(k) = subjY(a) + t * (subjY(b) - subjY(a))
          k += 1
        }
        a += 1
      }
      subjX = java.util.Arrays.copyOf(outX, k)
      subjY = java.util.Arrays.copyOf(outY, k)
      m = k
      e += 1
    }
    // shoelace anchored at the first vertex: at large lng/lat offsets the
    // unanchored form loses ~8 digits to cancellation (coord² × ulp);
    // JTS's Area.ofRing anchors the same way, which is what the 1e-9
    // agreement gate compares against
    var area2 = 0.0
    if (m > 0) {
      val ax = subjX(0); val ay = subjY(0)
      i = 0
      while (i < m) {
        val j = (i + 1) % m
        area2 += (subjX(i) - ax) * (subjY(j) - ay) - (subjX(j) - ax) * (subjY(i) - ay)
        i += 1
      }
    }
    math.abs(area2) / 2.0
  }

  /** area(g ∩ region) for (multi)polygons; NaN → caller falls back to JTS. */
  def areaIn(r: Region, g: Geometry): Double = g match {
    case p: Polygon =>
      var a = ringAreaIn(r, p.getExteriorRing.getCoordinates)
      var h = 0
      while (h < p.getNumInteriorRing) {
        a -= ringAreaIn(r, p.getInteriorRingN(h).getCoordinates)
        h += 1
      }
      a
    case multi if multi.getGeometryType.startsWith("Multi") ||
        multi.getGeometryType == "GeometryCollection" =>
      var s = 0.0
      var i = 0
      while (i < multi.getNumGeometries) {
        val part = areaIn(r, multi.getGeometryN(i))
        if (part.isNaN) return Double.NaN
        s += part
        i += 1
      }
      s
    case _ => Double.NaN
  }
}
