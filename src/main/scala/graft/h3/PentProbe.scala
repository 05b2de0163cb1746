package graft.h3
import Constants._
import graft.geo.GeodesicExact

/** Scratch: pentagon boundary sanity at res 0..8 — vertex settling, ring
  * validity, area continuity (child pentagon ≈ 1/7 of parent-ish), and a
  * local tiling audit at res 1-3 around each pentagon.
  */
object PentProbe {
  def main(args: Array[String]): Unit = {
    (0 until 122).filter(BaseCells.isPentagon).foreach { bc =>
      var prev = -1.0
      (0 to 8).foreach { res =>
        var h = H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc)
        h = H3Index.setResolution(h, res)
        try {
          val b = H3.cellToBoundary(h)
          val ring = b.map(v => (math.toDegrees(v.lng), math.toDegrees(v.lat)))
          val a = math.abs(GeodesicExact.ringArea(ring)) / 1e6
          val nv = b.length
          val distinct = b.map(v => (math.round(v.lat * 1e12), math.round(v.lng * 1e12))).distinct.length
          val ratio = if (prev > 0) prev / a else 0.0
          if (distinct != nv || (res > 0 && (ratio < 5.5 || ratio > 8.5)))
            println(f"SUSPECT bc=$bc res=$res nv=$nv distinct=$distinct area=$a%.6f parentRatio=$ratio%.3f")
          prev = a
        } catch {
          case e: Throwable => println(s"FAIL bc=$bc res=$res: ${e.getMessage}")
        }
      }
    }
    println("probe done")
  }
}
