package graft.operators

import graft.h3.H3
import org.scalatest.funsuite.AnyFunSuite

/** coverCells must terminate on every geometry class and be a SUPERSET of
  * the cells that can contain a point of the polygon — the correctness
  * precondition of the spatial join's candidate generation.
  */
class SpatialJoinSpec extends AnyFunSuite {

  test("coverCells handles non-polygon leafs without recursion blowup") {
    val line = SpatialJoin.coverCells("LINESTRING (-122.4 37.7, -122.3 37.8)", 7)
    assert(line.nonEmpty)
    val pt = SpatialJoin.coverCells("POINT (-122.4 37.7)", 7)
    assert(pt.length == 1)
    val mixed = SpatialJoin.coverCells(
      "GEOMETRYCOLLECTION (POINT (-122.4 37.7), " +
        "POLYGON ((-122.5 37.7, -122.3 37.7, -122.3 37.9, -122.5 37.9, -122.5 37.7)))", 6)
    assert(mixed.length > 1)
  }

  test("cover is a superset of the cells of interior points") {
    val rnd = new java.util.Random(7)
    (0 until 50).foreach { k =>
      val cx = rnd.nextDouble() * 300 - 150
      val cy = rnd.nextDouble() * 120 - 60
      val h = 0.05 + rnd.nextDouble() * 0.15
      val wkt = s"POLYGON ((${cx - h} ${cy - h}, ${cx + h} ${cy - h}, " +
        s"${cx + h} ${cy + h}, ${cx - h} ${cy + h}, ${cx - h} ${cy - h}))"
      val cover = SpatialJoin.coverCells(wkt, 6).toSet
      (0 until 40).foreach { _ =>
        val px = cx + (rnd.nextDouble() * 2 - 1) * h
        val py = cy + (rnd.nextDouble() * 2 - 1) * h
        val cell = H3.latLngToCell(py, px, 6) // (Double, Double, Int) overload takes degrees
        assert(cover.contains(cell),
          s"square $k: interior point ($px,$py) cell not covered")
      }
    }
  }
}
