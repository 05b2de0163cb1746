package graft.h3

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class H3CoreSpec extends AnyFunSuite {

  test("icosahedron face centers are unit vectors with proper adjacency") {
    val cosAdj = math.sqrt(5.0) / 3.0 // angle between adjacent face normals
    for (f <- 0 until 20) {
      val v = Icosa.faceCenterPoint(f)
      val mag = math.sqrt(v.x * v.x + v.y * v.y + v.z * v.z)
      assert(math.abs(mag - 1.0) < 1e-9, s"face $f center not unit: $mag")
      // each face has exactly 3 edge-adjacent faces
      val adj = (0 until 20).filter { g =>
        g != f && {
          val w = Icosa.faceCenterPoint(g)
          val dot = v.x * w.x + v.y * w.y + v.z * w.z
          math.abs(dot - cosAdj) < 1e-6
        }
      }
      assert(adj.size == 3, s"face $f has ${adj.size} adjacent faces: $adj")
      // the faceNeighbors table rows must name exactly those faces
      val tableAdj = Icosa.faceNeighbors(f).drop(1).map(_.face).toSet
      assert(tableAdj == adj.toSet, s"face $f table $tableAdj vs geometric $adj")
    }
  }

  test("base cell tables load and centers are distinct") {
    val centers = BaseCells.centers
    assert(centers.length == 122)
    for (a <- 0 until 122; b <- (a + 1) until 122) {
      assert(centers(a).distRads(centers(b)) > 0.05,
        s"base cells $a and $b nearly coincide")
    }
    // every base cell resolves to itself through the inverse lookup
    for (bc <- 0 until 122) {
      val info = BaseCells.cells(bc)
      val got = BaseCells.faceIjkToBaseCell(FaceIJK(info.homeFace, info.homeIjk))
      assert(got == bc, s"home lookup of $bc returned $got")
      val rot = BaseCells.faceIjkToBaseCellCCWrot60(FaceIJK(info.homeFace, info.homeIjk))
      assert(rot == 0, s"home rotation of $bc is $rot, expected 0")
    }
  }

  test("res-0 round trip for all base cells") {
    for (bc <- 0 until 122) {
      val h = H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc)
      val center = H3.cellToLatLng(h)
      val back = H3.latLngToCell(center, 0)
      assert(back == h,
        s"res0 round trip failed for bc=$bc: got ${H3Index.toHexString(back)}")
    }
  }

  test("golden cells from public H3 documentation") {
    // SF point at res 9 (h3 docs/bindings canonical example)
    assert(H3.latLngToCellString(37.7752702151959, -122.418307270836, 9)
      == "8928308280fffff")
    // San José cell at res 5: canonical centroid from the h3 tutorials
    val c = H3.cellToLatLng(H3Index.fromHexString("85283473fffffff"))
    assert(math.abs(math.toDegrees(c.lat) - 37.34579337536848) < 1e-9,
      s"lat ${math.toDegrees(c.lat)}")
    assert(math.abs(math.toDegrees(c.lng) - -121.97637597255124) < 1e-9,
      s"lng ${math.toDegrees(c.lng)}")
    // and the SF point's coarser ancestors follow the same digit path
    assert(H3.latLngToCellString(37.7752702151959, -122.418307270836, 5)
      == "85283083fffffff")
    assert(H3.latLngToCellString(37.7752702151959, -122.418307270836, 1)
      == "81283ffffffffff")
  }

  test("parent derivation matches reference README golden") {
    // /root/reference/README.md:280-284
    assert(H3.cellToParentString("840e4d3ffffffff", 3) == "830e4dfffffffff")
    // parent of a cell at its own res is itself
    assert(H3.cellToParentString("8928308280fffff", 9) == "8928308280fffff")
  }

  test("random point round trips at many resolutions") {
    val rnd = new Random(42)
    for (_ <- 1 to 2000) {
      val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lng = rnd.nextDouble() * 360 - 180
      val res = rnd.nextInt(11)
      val cell = H3.latLngToCell(lat, lng, res)
      assert(H3Index.resolution(cell) == res)
      val center = H3.cellToLatLng(cell)
      val back = H3.latLngToCell(center, res)
      assert(back == cell,
        s"round trip failed at ($lat,$lng,$res): ${H3Index.toHexString(cell)} -> " +
          s"${H3Index.toHexString(back)}")
      val d = LatLng.degrees(lat, lng).distRads(center)
      assert(d < 2 * H3.hexEdgeLengthRads(res),
        s"center too far at ($lat,$lng,$res): $d rads")
    }
  }

  test("boundary encloses centroid; vertex counts correct") {
    val rnd = new Random(7)
    var distorted = 0
    for (_ <- 1 to 300) {
      val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lng = rnd.nextDouble() * 360 - 180
      val res = rnd.nextInt(9)
      val cell = H3.latLngToCell(lat, lng, res)
      val b = H3.cellToBoundary(cell)
      val base = if (H3Index.isPentagon(cell)) 5 else 6
      if (graft.h3.Constants.isResClassIII(res)) {
        // Class III cells straddling an icosa edge gain distortion vertices
        assert(b.length >= base && b.length <= base + 4,
          s"${H3Index.toHexString(cell)}: ${b.length} verts")
        if (b.length > base) distorted += 1
      } else {
        assert(b.length == base, s"${H3Index.toHexString(cell)}: ${b.length} verts")
      }
      val c = H3.cellToLatLng(cell)
      // every vertex is within ~1.3 edge lengths of the centroid
      b.foreach { v =>
        val d = c.distRads(v)
        assert(d < 1.8 * H3.hexEdgeLengthRads(res) && d > 0.3 * H3.hexEdgeLengthRads(res),
          s"vertex dist $d vs edge ${H3.hexEdgeLengthRads(res)} for ${H3Index.toHexString(cell)}")
      }
    }
    // coarse Class III cells are large enough that the sample hits several
    assert(distorted > 0, "no distortion vertices observed in 300 samples")
  }

  test("neighbors are symmetric and correctly counted") {
    val rnd = new Random(13)
    for (_ <- 1 to 100) {
      val lat = math.toDegrees(math.asin(rnd.nextDouble() * 2 - 1))
      val lng = rnd.nextDouble() * 360 - 180
      val res = 1 + rnd.nextInt(7)
      val cell = H3.latLngToCell(lat, lng, res)
      val ns = H3.neighbors(cell)
      val expected = if (H3Index.isPentagon(cell)) 5 else 6
      assert(ns.length == expected,
        s"${H3Index.toHexString(cell)}: ${ns.length} neighbors")
      ns.foreach { n =>
        assert(H3.neighbors(n).contains(cell),
          s"asymmetric neighbor ${H3Index.toHexString(n)} of ${H3Index.toHexString(cell)}")
      }
    }
  }

  test("polygonToCells: centroid semantics around a known point") {
    // ~0.5 degree box around a point in California
    val outer = Array(
      LatLng.degrees(37.5, -122.5), LatLng.degrees(37.5, -122.0),
      LatLng.degrees(38.0, -122.0), LatLng.degrees(38.0, -122.5))
    val res = 5
    val cells = H3.polygonToCells(outer, Nil, res)
    assert(cells.nonEmpty)
    // every returned cell's centroid is inside
    cells.foreach { cll =>
      assert(H3.pointInPolygon(H3.cellToLatLng(cll), outer, Nil))
    }
    // the cell of an interior point is included
    val interior = H3.latLngToCell(37.75, -122.25, res)
    assert(cells.contains(interior))
    // rough area check: box is ~0.5°x0.44° ≈ 2400 km²; res5 hex ≈ 252 km²
    assert(cells.length > 4 && cells.length < 20, s"got ${cells.length} cells")
  }

  test("pathCells connects endpoints") {
    val a = LatLng.degrees(37.77, -122.42)
    val b = LatLng.degrees(37.80, -122.27) // ~13 km
    val res = 8
    val path = H3.pathCells(a, b, res)
    assert(path.head == H3.latLngToCell(a, res))
    assert(path.last == H3.latLngToCell(b, res))
    assert(path.length > 5)
    // consecutive path cells are neighbors (connected chain)
    path.sliding(2).foreach {
      case Array(x, y) => assert(H3.neighbors(x).contains(y),
        s"disconnected: ${H3Index.toHexString(x)} !~ ${H3Index.toHexString(y)}")
      case _ =>
    }
  }
}
