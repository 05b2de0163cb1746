package graft.h3

import org.scalatest.funsuite.AnyFunSuite

/** Local-IJ coordinate system and IJ-space line drawing, validated against
  * the repo's independent GEOMETRIC primitives (BFS grid distance, midpoint
  * neighbor stepping, centroid round trips) — no upstream tables exist in
  * the repo to compare to, so geometry is the ground truth (same strategy
  * as BaseCellsSpec's fresh-derivation check).
  */
class LocalIJSpec extends AnyFunSuite {

  private val N = 120

  private def samples(seed: Long): Seq[(Double, Double, Int)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(N)((rnd.nextDouble() * 168 - 84, rnd.nextDouble() * 359 - 179.5,
      2 + rnd.nextInt(7)))
  }

  test("cellToLocalIjk round-trips through localIjkToCell") {
    var checked = 0
    samples(0xabc1L).foreach { case (lat, lng, res) =>
      val origin = H3.latLngToCell(lat, lng, res)
      // nearby cells: the origin itself, its neighbors, and a 2-ring
      H3.gridDisk(origin, 2).foreach { h =>
        LocalIJ.cellToLocalIjk(origin, h).foreach { ijk =>
          val back = LocalIJ.localIjkToCell(origin, ijk)
          assert(back.contains(h),
            s"roundtrip failed: origin=$origin h=$h ijk=$ijk back=$back")
          checked += 1
        }
      }
    }
    assert(checked > N * 3, s"too few supported pairs exercised: $checked")
  }

  test("local-IJ grid distance equals geometric BFS distance") {
    var checked = 0
    samples(0xabc2L).foreach { case (lat, lng, res) =>
      val origin = H3.latLngToCell(lat, lng, res)
      val rnd = new scala.util.Random(origin)
      // probe a few cells at varying offsets from the origin
      H3.gridDisk(origin, 3).filter(_ => rnd.nextInt(6) == 0).take(4).foreach { h =>
        LocalIJ.gridDistance(origin, h).foreach { dIj =>
          val dBfs = H3.gridDistanceBfs(origin, h)
          assert(dIj == dBfs, s"distance mismatch origin=$origin h=$h ij=$dIj bfs=$dBfs")
          checked += 1
        }
      }
    }
    assert(checked > N, s"too few supported pairs exercised: $checked")
  }

  test("gridPathCells: endpoints exact, length = distance+1, consecutive cells adjacent") {
    var paths = 0
    samples(0xabc3L).foreach { case (lat, lng, res) =>
      val a = H3.latLngToCell(lat, lng, res)
      // a second point a few cells away in a deterministic direction
      val g = H3.cellToLatLng(a)
      val step = H3.hexEdgeLengthRads(res)
      val b = H3.latLngToCell(g.destination((lat + lng).abs % (2 * math.Pi), step * 4.5), res)
      LocalIJ.gridPathCells(a, b).foreach { path =>
        assert(path.head == a && path.last == b)
        assert(path.length == H3.gridDistanceBfs(a, b) + 1,
          s"path length ${path.length} != bfs+1 for $a→$b")
        path.sliding(2).foreach {
          case Array(x, y) =>
            assert(H3.neighbors(x).contains(y),
              s"non-adjacent consecutive path cells $x → $y (path $a→$b)")
          case _ =>
        }
        assert(path.distinct.length == path.length, "path revisits a cell")
        paths += 1
      }
    }
    assert(paths > N / 2, s"too few supported paths exercised: $paths")
  }

  test("pentagon neighborhoods are unsupported (upstream errors there) and fall back") {
    val pentBcs = (0 until 122).filter(BaseCells.isPentagon)
    assert(pentBcs.size == 12)
    pentBcs.take(3).foreach { bc =>
      val pent = (1 to 5).foldLeft(
        H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 5), bc))(
        (h, r) => H3Index.setDigit(h, r, 0))
      assert(H3Index.isPentagon(pent))
      val nb = H3.neighbors(pent).head
      assert(LocalIJ.cellToLocalIjk(pent, nb).isEmpty)
      assert(LocalIJ.cellToLocalIjk(nb, pent).isEmpty)
      // the public path API must still produce a connected chain via the
      // sampling fallback
      val g1 = H3.cellToLatLng(pent); val g2 = H3.cellToLatLng(nb)
      val path = H3.pathCells(g1, g2, 5)
      assert(path.nonEmpty && path.head == pent && path.contains(nb))
    }
  }

  test("cross-base-cell paths work between neighboring hexagon base cells") {
    // random nearby pairs, kept only when they straddle a base-cell edge
    val rnd = new scala.util.Random(0xabc4L)
    var crossed = 0
    var tries = 0
    while (crossed < 40 && tries < 4000) {
      tries += 1
      val lat = rnd.nextDouble() * 168 - 84
      val lng = rnd.nextDouble() * 359 - 179.5
      val res = 2 + rnd.nextInt(7)
      val a = H3.latLngToCell(lat, lng, res)
      val g = H3.cellToLatLng(a)
      val b = H3.latLngToCell(g.destination(rnd.nextDouble() * 2 * math.Pi,
        H3.hexEdgeLengthRads(res) * (2 + rnd.nextInt(10))), res)
      if (H3Index.baseCell(a) != H3Index.baseCell(b)) {
        LocalIJ.gridPathCells(a, b).foreach { path =>
          assert(path.head == a && path.last == b)
          assert(path.length == H3.gridDistanceBfs(a, b) + 1)
          path.sliding(2).foreach {
            case Array(x, y) => assert(H3.neighbors(x).contains(y),
              s"non-adjacent cells in cross-bc path $a→$b")
            case _ =>
          }
          crossed += 1
        }
      }
    }
    assert(crossed >= 40, s"too few cross-base-cell paths exercised: $crossed")
  }
}
