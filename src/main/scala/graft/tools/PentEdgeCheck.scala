package graft.tools
import graft.h3.{H3, H3Index, BaseCells}

/** Scratch: every chord of a pentagon's boundary must also be traversed by
  * one of its five neighbors (crossing points must match exactly).
  */
object PentEdgeCheck {
  def main(args: Array[String]): Unit = {
    var bad = 0
    (0 until 122).filter(BaseCells.isPentagon).foreach { bc =>
      (1 to 6).foreach { res =>
        var pent = H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, res), bc)
        (1 to res).foreach(r => pent = H3Index.setDigit(pent, r, 0))
        def chords(h: Long) = {
          val b = H3.cellToBoundary(h)
          (0 until b.length).map { i =>
            val v1 = b(i); val v2 = b((i + 1) % b.length)
            def k(v: graft.h3.LatLng) = (math.round(v.lat * 1e10), math.round(v.lng * 1e10))
            val (a, c) = (k(v1), k(v2))
            if (a._1 < c._1 || (a._1 == c._1 && a._2 <= c._2)) (a, c) else (c, a)
          }.toSet
        }
        val pc = chords(pent)
        val nc = H3.neighbors(pent).flatMap(n => chords(n)).toSet
        val missing = pc -- nc
        if (missing.nonEmpty) {
          bad += 1
          println(s"MISSING bc=$bc res=$res ${missing.size}/${pc.size} pentagon chords unmatched")
        }
      }
    }
    println(s"pent edge check done, bad=$bad")
  }
}
