package graft.tools

import scala.util.Random
import graft.geo.{ConvexClip, GeoSegIndex, H3Geo}
import graft.h3.H3

/** Micro-measure of the per-cell ratio kernels on a realistic giant
  * feature: a 20k-vertex coastline-ish ring (~60k res-8 cells) and a
  * 20k-vertex route. Compares the full-walk clip against the indexed
  * path over a sample of the feature's own cells — the quantity the
  * indexing stage pays per (feature, cell) row.
  */
object SegIndexBench {
  def main(args: Array[String]): Unit = {
    val rnd = new Random(2026)
    val c = graft.h3.LatLng.degrees(46.0, 8.0)

    def fmt(p: graft.h3.LatLng) =
      f"${math.toDegrees(p.lng)}%.7f ${math.toDegrees(p.lat)}%.7f"

    // giant ring: radius ~140 km, 20k vertices, coastline-like (smooth
    // low-frequency lobes + small local noise — NOT white-noise radius,
    // which would make half the area a boundary corridor)
    val ringPts = (0 until 20000).map { i =>
      val az = 2 * math.Pi * i / 20000
      val r = 140.0 * (1 + 0.15 * math.sin(3 * az + 0.7) +
        0.07 * math.sin(11 * az + 2.1) + 0.008 * (rnd.nextDouble() - 0.5)) /
        H3.EarthRadiusKm
      fmt(c.destination(az, r))
    }
    val polyWkt = s"POLYGON ((${(ringPts :+ ringPts.head).mkString(", ")}))"

    // giant route: 20k segments random-walking ~150 m steps
    val routePts = (0 until 20000).scanLeft(c) { (p, _) =>
      p.destination(rnd.nextDouble() * 2 * math.Pi * 0.3 + 0.8,
        0.15 / H3.EarthRadiusKm)
    }
    val lineWkt = "LINESTRING (" + routePts.map(fmt).mkString(", ") + ")"

    val reader = new org.locationtech.jts.io.WKTReader()
    for ((label, wkt, res) <- Seq(("polygon-20k-verts", polyWkt, 7),
                                  ("line-20k-segs", lineWkt, 9))) {
      val g = reader.read(wkt)
      val cells = graft.engine.GraftFunctions.indexGeometry(g, res)
      val sample = cells.take(2000)
      val idx = GeoSegIndex.cached(g)
      require(idx != null, "index must build at this size")
      // warm the cell memo out of the timing
      sample.foreach(H3Geo.cellInfoCached)

      var t0 = System.nanoTime()
      var accFull = 0.0
      sample.foreach { cell =>
        val r = H3Geo.cellInfoCached(cell).clip.get
        accFull += (if (idx.isLine) ConvexClip.lengthIn(r, g) else ConvexClip.areaIn(r, g))
      }
      val fullUs = (System.nanoTime() - t0) / 1e3 / sample.length

      t0 = System.nanoTime()
      var accFast = 0.0
      sample.foreach { cell =>
        val r = H3Geo.cellInfoCached(cell).clip.get
        accFast += (if (idx.isLine) GeoSegIndex.lengthIn(r, idx) else GeoSegIndex.areaIn(r, g, idx))
      }
      val fastUs = (System.nanoTime() - t0) / 1e3 / sample.length

      val rel = math.abs(accFull - accFast) / math.max(accFull, accFast)
      println(f"$label%-18s cells=${cells.length}%7d sampled=${sample.length} " +
        f"full=$fullUs%8.1fus/cell indexed=$fastUs%6.2fus/cell " +
        f"speedup=${fullUs / fastUs}%7.1fx relErr=$rel%.2e")
    }
  }
}
