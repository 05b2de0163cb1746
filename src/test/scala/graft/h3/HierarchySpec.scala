package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/** cellToChildren / compactCells / uncompactCells against the published H3
  * hierarchy contract: 7 children per cell (6 under a pentagon, digit 1
  * skipped), children partition the parent, compact∘uncompact is the
  * identity, and compaction is minimal (no complete sibling group remains).
  */
class HierarchySpec extends AnyFunSuite {

  // (Double, Double, Int) overload takes degrees
  private val sf = H3.latLngToCell(37.7752702151959, -122.418307270836, 5)

  test("children: 7 per hexagon, all distinct, parent round-trips") {
    val kids = H3.cellToChildren(sf, 6)
    assert(kids.length == 7)
    assert(kids.distinct.length == 7)
    kids.foreach(k => assert(H3Index.toParent(k, 5) == sf))
    // two levels: 49 grandchildren
    assert(H3.cellToChildren(sf, 7).length == 49)
    // identity at own resolution
    assert(H3.cellToChildren(sf, 5).toSeq == Seq(sf))
  }

  test("children: pentagons have 6 and their digit-0 child is a pentagon") {
    // base cell 4 is a pentagon (published base-cell table)
    val pent = (0 until 122).map(bc =>
      H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc))
      .find(H3Index.isPentagon).get
    val kids = H3.cellToChildren(pent, 1)
    assert(kids.length == 6)
    assert(kids.count(H3Index.isPentagon) == 1)
    // the pentagon child keeps 6 children at the next level; 6+5*7 → 41
    assert(H3.cellToChildren(pent, 2).length == 41)
  }

  test("compact(children(c)) == c, and uncompact restores the set") {
    val kids = H3.cellToChildren(sf, 7)
    assert(H3.compactCells(kids).toSeq == Seq(sf))
    val back = H3.uncompactCells(Array(sf), 7)
    assert(back.sorted.toSeq == kids.sorted.toSeq)
  }

  test("compact on a polyfill coverage is minimal and lossless") {
    // a real connected coverage: polyfill of a box around SF at res 7
    val ring = Array(
      LatLng.degrees(37.6, -122.6), LatLng.degrees(37.6, -122.2),
      LatLng.degrees(37.95, -122.2), LatLng.degrees(37.95, -122.6))
    val cells = H3.polygonToCells(ring, Seq.empty, 7)
    assert(cells.length > 100)
    val compact = H3.compactCells(cells)
    assert(compact.length < cells.length, "a solid coverage must compact")
    // lossless
    val restored = compact.flatMap(h => H3.cellToChildren(h, 7))
    assert(restored.sorted.toSeq == cells.sorted.toSeq)
    // minimal: no parent has its complete sibling group in the result
    val set = compact.toSet
    val violations = compact.groupBy { h =>
      val r = H3Index.resolution(h)
      if (r == 0) -1L else H3Index.toParent(h, r - 1)
    }.collect {
      case (p, sibs) if p != -1L &&
        sibs.length == (if (H3Index.isPentagon(p)) 6 else 7) => p
    }
    assert(violations.isEmpty, s"incomplete compaction under ${violations.toSeq}")
    // mixed-resolution uncompact also restores
    assert(H3.uncompactCells(compact, 7).sorted.toSeq == cells.sorted.toSeq)
  }

  test("isValidCell accepts real cells and rejects structural corruption") {
    (0 until 500).foreach { i =>
      val c = H3.latLngToCell(((i * 37) % 160) - 80 + 0.5, ((i * 73) % 350) - 175 + 0.5, 3 + i % 8)
      assert(H3Index.isValidCell(c), s"real cell $i rejected")
    }
    val c = H3.latLngToCell(37.77, -122.42, 6)
    assert(!H3Index.isValidCell(c | (1L << 63))) // high bit set
    assert(!H3Index.isValidCell(H3Index.setBaseCell(c, 123))) // base cell >= 122
    assert(!H3Index.isValidCell(H3Index.setDigit(c, 3, 7))) // digit 7 above res
    assert(!H3Index.isValidCell(H3Index.setResolution(c, 7))) // missing digit at res
    assert(!H3Index.isValidCell(0L))
    // a pentagon's deleted-K child is invalid
    val pent = (0 until 122).map(bc =>
      H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc))
      .find(H3Index.isPentagon).get
    val kChild = H3Index.setDigit(
      H3Index.setResolution(pent, 1), 1, 1)
    assert(!H3Index.isValidCell(kChild))
    // every child enumerated by the hierarchy is valid
    H3.cellToChildren(pent, 2).foreach(k => assert(H3Index.isValidCell(k)))
  }

  test("gridDisk k=1 is the cell plus its 6 neighbors; scatter conserves mass") {
    val disk = H3.gridDisk(sf, 1)
    assert(disk.length == 7)
    assert(disk.contains(sf))
    val disk2 = H3.gridDisk(sf, 2)
    assert(disk2.length == 19)
    assert(disk.forall(disk2.contains))
  }
}
