package graft.h3

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatestplus.scalacheck.ScalaCheckPropertyChecks

/** Property-based invariants of the H3 core (SURVEY §5 test plan): parent
  * digit-prefix structure, containment round trips, boundary closure and
  * vertex counts, hierarchy round trips on arbitrary subsets, and disk
  * monotonicity — checked over generated points and resolutions rather
  * than fixed fixtures.
  */
class H3PropertySpec extends AnyFunSuite with ScalaCheckPropertyChecks {

  private val genLat = Gen.choose(-84.0, 84.0)
  private val genLng = Gen.choose(-179.5, 179.5)
  private val genRes = Gen.choose(1, 9)

  test("parent shares the digit prefix and is an ancestor at every coarser res") {
    forAll(genLat, genLng, genRes) { (lat, lng, res) =>
      val c = H3.latLngToCell(lat, lng, res)
      (0 until res).foreach { pr =>
        val p = H3Index.toParent(c, pr)
        assert(H3Index.resolution(p) == pr)
        assert(H3Index.baseCell(p) == H3Index.baseCell(c))
        // digits up to pr match; digits beyond pr are 7
        (1 to pr).foreach(r => assert(H3Index.digit(p, r) == H3Index.digit(c, r)))
        (pr + 1 to Constants.MaxH3Res).foreach(r => assert(H3Index.digit(p, r) == 7))
        // re-indexing the child's center at the parent's res gives the parent
        // cell or one of its siblings containing the center — and the
        // center of c is inside c, so its pr-res cell must BE p's subtree
        val again = H3Index.toParent(H3.latLngToCell(H3.cellToLatLng(c), pr), pr)
        assert(again == p)
      }
    }
  }

  test("cell contains its own center (encode/decode round trip)") {
    forAll(genLat, genLng, genRes) { (lat, lng, res) =>
      val c = H3.latLngToCell(lat, lng, res)
      assert(H3.latLngToCell(H3.cellToLatLng(c), res) == c)
    }
  }

  test("boundaries have 5-10 distinct vertices and bounded edge lengths") {
    forAll(genLat, genLng, genRes) { (lat, lng, res) =>
      val c = H3.latLngToCell(lat, lng, res)
      val b = H3.cellToBoundary(c)
      // hexagons: 6 vertices; pentagons: 5; Class III distortion can add
      // up to one extra vertex per icosa-edge crossing (max 10 published)
      assert(b.length >= 5 && b.length <= 10, s"${b.length} vertices")
      val edge = H3.hexEdgeLengthRads(res)
      var i = 0
      while (i < b.length) {
        val d = b(i).distRads(b((i + 1) % b.length))
        assert(d > 0 && d < 3 * edge, s"edge $i length ${d / edge} edges")
        i += 1
      }
    }
  }

  test("compact/uncompact round-trips arbitrary cell subsets") {
    val genCells = for {
      lat <- genLat; lng <- genLng
      n <- Gen.choose(1, 60)
    } yield {
      val center = H3.latLngToCell(lat, lng, 6)
      H3.gridDisk(center, 3).take(n)
    }
    forAll(genCells) { cells =>
      val distinct = cells.distinct
      val compact = H3.compactCells(distinct)
      assert(H3.uncompactCells(compact, 6).sorted.toSeq == distinct.sorted.toSeq)
      // compaction never grows the set
      assert(compact.length <= distinct.length)
    }
  }

  test("gridDisk sizes are monotone and match the hexagonal bound") {
    forAll(genLat, genLng, Gen.choose(0, 3)) { (lat, lng, k) =>
      val c = H3.latLngToCell(lat, lng, 5)
      val disk = H3.gridDisk(c, k)
      // 1 + 3k(k+1) for pure hexagon neighborhoods; pentagson in the disk
      // reduce the count, never increase it
      assert(disk.length <= 1 + 3 * k * (k + 1))
      if (k > 0) assert(H3.gridDisk(c, k - 1).toSet.subsetOf(disk.toSet))
    }
  }
}
