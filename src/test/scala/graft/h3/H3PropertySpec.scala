package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the H3 core (SURVEY §5 test plan): parent
  * digit-prefix structure, containment round trips, boundary closure and
  * vertex counts, hierarchy round trips on arbitrary subsets, and disk
  * monotonicity — checked over generated points and resolutions rather
  * than fixed fixtures. Uses a fixed-seed generator loop (the scalatestplus
  * scalacheck bridge is not in the offline dependency cache).
  */
class H3PropertySpec extends AnyFunSuite {

  private val N = 300

  /** Deterministic sample stream: (lat, lng, res) triples. */
  private def samples(seed: Long = 0x5eedL): Seq[(Double, Double, Int)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(N)((rnd.nextDouble() * 168 - 84, rnd.nextDouble() * 359 - 179.5,
      1 + rnd.nextInt(9)))
  }

  test("parent shares the digit prefix and is an ancestor at every coarser res") {
    samples().foreach { case (lat, lng, res) =>
      val c = H3.latLngToCell(lat, lng, res)
      (0 until res).foreach { pr =>
        val p = H3Index.toParent(c, pr)
        assert(H3Index.resolution(p) == pr)
        assert(H3Index.baseCell(p) == H3Index.baseCell(c))
        // digits up to pr match; digits beyond pr are 7
        (1 to pr).foreach(r => assert(H3Index.digit(p, r) == H3Index.digit(c, r)))
        (pr + 1 to Constants.MaxH3Res).foreach(r => assert(H3Index.digit(p, r) == 7))
        // the parent's own center round-trips at its res (containment of a
        // cell's center is exact; note a CHILD's center may legitimately
        // fall outside the hierarchical ancestor across several levels near
        // icosahedron edges, so that stronger claim is NOT an H3 invariant)
        assert(H3.latLngToCell(H3.cellToLatLng(p), pr) == p)
      }
    }
  }

  test("cell contains its own center (encode/decode round trip)") {
    samples(1).foreach { case (lat, lng, res) =>
      val c = H3.latLngToCell(lat, lng, res)
      assert(H3.latLngToCell(H3.cellToLatLng(c), res) == c)
    }
  }

  test("boundaries have 5-10 distinct vertices and bounded edge lengths") {
    samples(2).foreach { case (lat, lng, res) =>
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
    val rnd = new scala.util.Random(3)
    samples(4).take(100).foreach { case (lat, lng, _) =>
      val center = H3.latLngToCell(lat, lng, 6)
      val cells = H3.gridDisk(center, 3).take(1 + rnd.nextInt(60))
      val distinct = cells.distinct
      val compact = H3.compactCells(distinct)
      assert(H3.uncompactCells(compact, 6).sorted.toSeq == distinct.sorted.toSeq)
      // compaction never grows the set
      assert(compact.length <= distinct.length)
    }
  }

  test("gridDisk sizes are monotone and match the hexagonal bound") {
    val rnd = new scala.util.Random(5)
    samples(6).foreach { case (lat, lng, _) =>
      val k = rnd.nextInt(4)
      val c = H3.latLngToCell(lat, lng, 5)
      val disk = H3.gridDisk(c, k)
      // 1 + 3k(k+1) for pure hexagon neighborhoods; pentagons in the disk
      // reduce the count, never increase it
      assert(disk.length <= 1 + 3 * k * (k + 1))
      if (k > 0) assert(H3.gridDisk(c, k - 1).toSet.subsetOf(disk.toSet))
    }
  }

  test("gridDistance: zero to self, one to neighbors, bounded by ring, symmetric") {
    samples(7).take(60).foreach { case (lat, lng, _) =>
      val c = H3.latLngToCell(lat, lng, 5)
      assert(H3.gridDistance(c, c) == 0)
      H3.neighbors(c).foreach(n => assert(H3.gridDistance(c, n) == 1))
      val k = 3
      H3.gridDisk(c, k).foreach { m =>
        val dist = H3.gridDistance(c, m)
        assert(dist <= k)
        assert(H3.gridDistance(m, c) == dist) // symmetry
      }
    }
  }
}
