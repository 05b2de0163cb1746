package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/** Pentagon boundary conformance: pentagons straddle an icosahedron vertex,
  * so their boundaries span five faces (with mid-edge crossings at Class
  * III). Round-1 shipped a wrong vertex choice that made pentagon polygons
  * inconsistent with their neighbors' — caught by a chord-tiling audit.
  */
class PentagonSpec extends AnyFunSuite {

  private def centerPentagon(bc: Int, res: Int): Long = {
    var h = H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, res), bc)
    (1 to res).foreach(r => h = H3Index.setDigit(h, r, 0))
    h
  }

  private def chords(h: Long): Set[((Long, Long), (Long, Long))] = {
    val b = H3.cellToBoundary(h)
    (0 until b.length).map { i =>
      val v1 = b(i); val v2 = b((i + 1) % b.length)
      def k(v: LatLng) = (math.round(v.lat * 1e10), math.round(v.lng * 1e10))
      val (a, c) = (k(v1), k(v2))
      if (a._1 < c._1 || (a._1 == c._1 && a._2 <= c._2)) (a, c) else (c, a)
    }.toSet
  }

  test("pentagon boundary point counts: 5 at Class II, 10 at Class III") {
    val pents = (0 until 122).filter(BaseCells.isPentagon)
    pents.foreach { bc =>
      assert(H3.cellToBoundary(centerPentagon(bc, 0)).length == 5)
      assert(H3.cellToBoundary(centerPentagon(bc, 2)).length == 5, s"bc=$bc res=2")
      // Class III: every one of the 5 edges crosses an icosa edge
      assert(H3.cellToBoundary(centerPentagon(bc, 1)).length == 10, s"bc=$bc res=1")
      assert(H3.cellToBoundary(centerPentagon(bc, 3)).length == 10, s"bc=$bc res=3")
    }
  }

  test("every pentagon boundary chord is traversed by a neighbor (res 1-4)") {
    (0 until 122).filter(BaseCells.isPentagon).foreach { bc =>
      (1 to 4).foreach { res =>
        val pent = centerPentagon(bc, res)
        val pc = chords(pent)
        val nc = H3.neighbors(pent).flatMap(n => chords(n)).toSet
        val missing = pc -- nc
        assert(missing.isEmpty,
          s"bc=$bc res=$res: ${missing.size}/${pc.size} pentagon chords unmatched")
      }
    }
  }

  test("res-0 chord polygons tile the ellipsoid exactly") {
    val total = (0 until 122).map { bc =>
      val b = H3.cellToBoundary(centerPentagon(bc, 0)) // hexagons too: bc loop covers all
      math.abs(graft.geo.GeodesicExact.ringArea(
        b.map(v => (math.toDegrees(v.lng), math.toDegrees(v.lat)))))
    }.sum
    assert(math.abs(total - graft.geo.GeodesicExact.TotalArea) / graft.geo.GeodesicExact.TotalArea < 1e-11,
      s"res-0 tiling total $total vs ${graft.geo.GeodesicExact.TotalArea}")
  }
}
