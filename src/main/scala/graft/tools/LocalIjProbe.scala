package graft.tools

import graft.h3._

/** Scratch: measure how often local-IJ supports (a,b) pairs, split by
  * same- vs cross-base-cell, and dump per-direction frame derivations.
  */
object LocalIjProbe {
  def main(args: Array[String]): Unit = {
    var supported = 0; var unsupported = 0; var crossSup = 0; var crossUnsup = 0
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val lat = rnd.nextDouble() * 168 - 84; val lng = rnd.nextDouble() * 359 - 179.5
      val res = 2 + rnd.nextInt(7)
      val a = H3.latLngToCell(lat, lng, res)
      val g = H3.cellToLatLng(a)
      val b = H3.latLngToCell(g.destination(rnd.nextDouble() * 2 * math.Pi,
        H3.hexEdgeLengthRads(res) * (2 + rnd.nextInt(10))), res)
      val cross = H3Index.baseCell(a) != H3Index.baseCell(b)
      LocalIJ.cellToLocalIjk(a, b) match {
        case Some(_) => supported += 1; if (cross) crossSup += 1
        case None => unsupported += 1; if (cross) crossUnsup += 1
      }
    }
    println(s"supported=$supported unsupported=$unsupported crossSup=$crossSup crossUnsup=$crossUnsup")
  }
}
