package graft.tools

import graft.h3.{H3, H3Index}

/** Scratch: do adjacent cells' boundary polygons share vertex positions?
  * If every chord (vertex pair) is traversed by exactly two cells in
  * opposite directions, the chord polygons tile exactly and areas sum to
  * the earth. Mismatches localize boundary-construction inconsistencies.
  */
object EdgeAudit {
  def main(args: Array[String]): Unit = {
    val res = if (args.nonEmpty) args(0).toInt else 0
    val cells: Seq[Long] =
      if (res == 0) (0 until 122).map(bc =>
        H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc))
      else {
        // all res-r descendants of every base cell via gridDisk from center
        // too slow; instead audit around each pentagon: the pentagon plus
        // its 2-ring
        (0 until 122).filter { bc =>
          graft.h3.BaseCells.isPentagon(bc)
        }.flatMap { bc =>
          val base = H3Index.setBaseCell(H3Index.setResolution(H3Index.Init, 0), bc)
          val c = H3.cellToLatLng(base)
          val pent = H3.latLngToCell(c, res)
          H3.gridDisk(pent, 2)
        }.distinct
      }
    val cellSet = cells.toSet
    def key(lat: Double, lng: Double): (Long, Long) =
      (math.round(lat * 1e9), math.round(lng * 1e9)) // ~1e-7 deg buckets
    val edges = scala.collection.mutable.HashMap.empty[((Long, Long), (Long, Long)), Int]
    cells.foreach { h =>
      val b = H3.cellToBoundary(h)
      var i = 0
      while (i < b.length) {
        val v1 = b(i); val v2 = b((i + 1) % b.length)
        val k1 = key(math.toDegrees(v1.lat), math.toDegrees(v1.lng))
        val k2 = key(math.toDegrees(v2.lat), math.toDegrees(v2.lng))
        val e = if (k1._1 < k2._1 || (k1._1 == k2._1 && k1._2 <= k2._2)) (k1, k2) else (k2, k1)
        edges(e) = edges.getOrElse(e, 0) + 1
        i += 1
      }
    }
    val counts = edges.values.groupBy(identity).map { case (k, v) => k -> v.size }
    println(s"res=$res cells=${cells.size} edge-count histogram: " +
      counts.toSeq.sortBy(_._1).map { case (k, v) => s"$k->$v" }.mkString(", "))
    if (res == 0) {
      // every edge should appear exactly twice
      val bad = edges.filter(_._2 != 2)
      println(s"unmatched edges: ${bad.size}")
      bad.take(10).foreach { case (((a1, o1), (a2, o2)), n) =>
        println(f"  n=$n (${a1 / 1e9}%.6f,${o1 / 1e9}%.6f)-(${a2 / 1e9}%.6f,${o2 / 1e9}%.6f)")
      }
    }
  }
}
