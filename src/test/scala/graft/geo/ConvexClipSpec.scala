package graft.geo

import graft.h3.H3
import org.scalatest.funsuite.AnyFunSuite

/** The convex-clip fast path must agree with the JTS overlay it replaces —
  * same planar intersection length/area to 1e-9 relative — across real H3
  * cells and deterministic pseudo-random lines/polygons, including
  * fully-inside, fully-outside, crossing, and vertex-grazing cases.
  */
class ConvexClipSpec extends AnyFunSuite {

  private def cellAt(i: Int, res: Int) = {
    // degrees: the (Double, Double, Int) overload converts internally.
    // (An earlier revision wrapped these in toRadians, which silently
    // clustered every test cell within ±1.2° of the equator.)
    val lat = ((i * 7919 + 13) % 140000) / 1000.0 - 70 + 0.0005
    val lng = ((i * 104729 + 7) % 350000) / 1000.0 - 175 + 0.0005
    H3.latLngToCell(lat, lng, res)
  }

  test("H3 cells are convex in planar lng/lat away from the antimeridian") {
    val convex = (0 until 2000).count { i =>
      val c = H3Geo.cellInfoCached(cellAt(i, 6))
      c.clip.isDefined
    }
    // the gate may reject a handful of folded/edge cells; the fast path
    // must carry virtually all of the load or it is pointless
    assert(convex >= 1990, s"only $convex/2000 cells took the fast path")
  }

  test("segment clip length agrees with JTS overlay to 1e-9") {
    var checked = 0
    (0 until 500).foreach { i =>
      val info = H3Geo.cellInfoCached(cellAt(i, 6))
      info.clip.foreach { r =>
        val c = info.poly.getCentroid
        val (cx, cy) = (c.getX, c.getY)
        // lines at assorted scales/angles through and around the cell
        (0 until 6).foreach { k =>
          val ang = (i * 31 + k * 61) % 360 * math.Pi / 180
          val len = 0.002 + 0.03 * ((i + k) % 7)
          val off = 0.004 * (k - 2.5)
          val x1 = cx + off * math.cos(ang + math.Pi / 2) - len * math.cos(ang)
          val y1 = cy + off * math.sin(ang + math.Pi / 2) - len * math.sin(ang)
          val x2 = cx + off * math.cos(ang + math.Pi / 2) + len * math.cos(ang)
          val y2 = cy + off * math.sin(ang + math.Pi / 2) + len * math.sin(ang)
          val line = GeoIO.fromWkt(s"LINESTRING ($x1 $y1, $x2 $y2)")
          val fast = ConvexClip.lengthIn(r, line)
          val jts = line.intersection(info.poly).getLength
          assert(math.abs(fast - jts) <= 1e-9 * math.max(1.0, jts),
            s"cell $i line $k: fast $fast vs jts $jts")
          checked += 1
        }
      }
    }
    assert(checked > 2500)
  }

  test("polygon clip area agrees with JTS overlay to 1e-9, holes included") {
    var checked = 0
    (0 until 300).foreach { i =>
      val info = H3Geo.cellInfoCached(cellAt(i, 6))
      info.clip.foreach { r =>
        val c = info.poly.getCentroid
        val (cx, cy) = (c.getX, c.getY)
        (0 until 4).foreach { k =>
          val h = 0.002 + 0.012 * k // half-width from sub-cell to super-cell
          val ox = 0.003 * (k - 1.5)
          val shell = s"${cx - h + ox} ${cy - h}, ${cx + h + ox} ${cy - h}, " +
            s"${cx + h + ox} ${cy + h}, ${cx - h + ox} ${cy + h}, ${cx - h + ox} ${cy - h}"
          val hh = h / 3
          val hole = s"${cx + ox - hh} ${cy - hh}, ${cx + ox + hh} ${cy - hh}, " +
            s"${cx + ox + hh} ${cy + hh}, ${cx + ox - hh} ${cy + hh}, ${cx + ox - hh} ${cy - hh}"
          val poly = GeoIO.fromWkt(s"POLYGON (($shell), ($hole))")
          val fast = ConvexClip.areaIn(r, poly)
          val jts = poly.intersection(info.poly).getArea
          assert(math.abs(fast - jts) <= 1e-9 * math.max(1e-6, jts),
            s"cell $i poly $k: fast $fast vs jts $jts")
          checked += 1
        }
      }
    }
    assert(checked > 1000)
  }

  test("degenerate cases: outside, inside, grazing") {
    val info = H3Geo.cellInfoCached(H3.latLngToCell(37.77, -122.42, 6))
    val r = info.clip.get
    // fully outside
    assert(ConvexClip.lengthIn(r,
      GeoIO.fromWkt("LINESTRING (0 0, 1 1)")) == 0.0)
    // fully inside: clipped length = full length
    val c = info.poly.getCentroid
    val tiny = GeoIO.fromWkt(
      s"LINESTRING (${c.getX - 1e-4} ${c.getY}, ${c.getX + 1e-4} ${c.getY})")
    assert(math.abs(ConvexClip.lengthIn(r, tiny) - tiny.getLength) < 1e-15)
    // vertex-grazing: a segment through a boundary vertex — both paths agree
    val v = info.poly.getExteriorRing.getCoordinateN(0)
    val graze = GeoIO.fromWkt(
      s"LINESTRING (${v.x - 0.01} ${v.y}, ${v.x + 0.01} ${v.y})")
    val fast = ConvexClip.lengthIn(r, graze)
    val jts = graze.intersection(info.poly).getLength
    assert(math.abs(fast - jts) <= 1e-9, s"graze: $fast vs $jts")
    // non-line geometry → NaN (caller falls back)
    assert(ConvexClip.lengthIn(r, info.poly).isNaN)
    assert(ConvexClip.areaIn(r, tiny).isNaN)
  }

  test("empty polygon components contribute 0 area instead of throwing") {
    val info = H3Geo.cellInfoCached(H3.latLngToCell(37.77, -122.42, 6))
    val r = info.clip.get
    assert(ConvexClip.areaIn(r, GeoIO.fromWkt("POLYGON EMPTY")) == 0.0)
    val c = info.poly.getCentroid
    val h = 1e-4
    val square = s"POLYGON ((${c.getX - h} ${c.getY - h}, ${c.getX + h} ${c.getY - h}, " +
      s"${c.getX + h} ${c.getY + h}, ${c.getX - h} ${c.getY + h}, ${c.getX - h} ${c.getY - h}))"
    val mixed = GeoIO.fromWkt(s"GEOMETRYCOLLECTION (POLYGON EMPTY, $square)")
    val alone = ConvexClip.areaIn(r, GeoIO.fromWkt(square))
    assert(ConvexClip.areaIn(r, mixed) == alone && alone > 0.0)
  }
}
