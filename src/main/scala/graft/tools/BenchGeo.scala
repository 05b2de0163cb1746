package graft.tools

import graft.engine.GraftFunctions
import graft.geo.H3Geo
import graft.h3.H3

/** Microbench of the per-row geometry UDF implementations. */
object BenchGeo {
  def main(args: Array[String]): Unit = {
    println("jts.overlay=" + System.getProperty("jts.overlay"))
    val box = "POLYGON ((-122.5 37.7, -122.3 37.7, -122.3 37.85, -122.5 37.85, -122.5 37.7))"
    val cell = H3.latLngToCell(37.75, -122.4, 6)
    val hexWkt = H3Geo.cellToWkt(cell)
    val n = 2000
    // warmup
    (1 to 500).foreach(_ => GraftFunctions.ratioArea(box, hexWkt))
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => GraftFunctions.ratioArea(box, hexWkt))
    println(f"ratioArea:          ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => GraftFunctions.parseGeom(box))
    println(f"parse box:          ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => GraftFunctions.parseGeom(hexWkt))
    println(f"parse hex:          ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    val g1 = GraftFunctions.parseGeom(box)
    val g2 = GraftFunctions.parseGeom(hexWkt)
    t0 = System.nanoTime()
    (1 to n).foreach(_ => g1.intersection(g2).getArea)
    println(f"intersection only:  ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => GraftFunctions.areaSpheroidKm2(box))
    println(f"areaSpheroidKm2:    ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    t0 = System.nanoTime()
    (1 to n).foreach(_ => GraftFunctions.indexShape(box, 6))
    println(f"indexShape(poly,6): ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")

    // pairs shaped exactly like the h3_index_polygons query at sf0.1
    def pm(x: Long, m: Long) = ((x % m) + m) % m
    val pairs = (1L to 300L).flatMap { k =>
      val cx = pm(k * 13 + 7 * 7, 35000) / 100.0 - 175 + 0.005
      val cy = pm(k * 31 + 3 * 17, 14000) / 100.0 - 70 + 0.005
      val h = (pm(k, 10) + 5) / 100.0
      val wkt = s"POLYGON ((${cx - h} ${cy - h}, ${cx + h} ${cy - h}, ${cx + h} ${cy + h}, " +
        s"${cx - h} ${cy + h}, ${cx - h} ${cy - h}))"
      GraftFunctions.indexShape(wkt, 6).map(c => (wkt, c))
    }
    println(s"real pairs: ${pairs.length}")
    pairs.take(500).foreach { case (w, c) => GraftFunctions.ratioArea(w, H3Geo.cellToWkt(c)) }
    t0 = System.nanoTime()
    var slow = 0
    pairs.foreach { case (w, c) =>
      val s = System.nanoTime()
      GraftFunctions.ratioArea(w, H3Geo.cellToWkt(c))
      if (System.nanoTime() - s > 2_000_000) {
        slow += 1
        if (slow <= 3) println(s"  SLOW pair (${(System.nanoTime() - s) / 1e6}%.0f ms): $w ∩ cell $c")
      }
    }
    println(f"real ratioArea+wkt: ${(System.nanoTime() - t0) / 1e3 / pairs.length}%8.2f us/op, slow(>2ms)=$slow")
  }
}
