package graft.tools
import graft.h3.H3
import graft.geo.{GeodesicExact, H3Geo, ConvexClip, GeoIO}
import org.locationtech.jts.geom.Coordinate

object MicroCell {
  def main(args: Array[String]): Unit = {
    val n = 50000
    val cells = Array.tabulate(n)(i => H3.latLngToCell(10 + (i % 700) * 0.09, -120 + (i / 700) * 0.09, 6))
    // warm
    var w = 0.0
    for (c <- cells.take(5000)) w += H3Geo.cellInfoCached(c).areaKm2
    def time(label: String)(f: Long => Double): Unit = {
      val t0 = System.nanoTime(); var s = 0.0
      var i = 0; while (i < n) { s += f(cells(i)); i += 1 }
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e3/n}%8.2f us/cell   (sink=$s%.3f)")
    }
    time("latLngToCell r6")(c => H3.latLngToCell(10 + (c % 700) * 0.09, -120 + ((c / 700) % 70) * 0.09, 6).toDouble % 97)
    time("latLngToCell r9")(c => H3.latLngToCell(10 + (c % 700) * 0.09, -120 + ((c / 700) % 70) * 0.09, 9).toDouble % 97)
    time("latLngToCell r12")(c => H3.latLngToCell(10 + (c % 700) * 0.09, -120 + ((c / 700) % 70) * 0.09, 12).toDouble % 97)
    time("cellToBoundary")(c => H3.cellToBoundary(c).length)
    time("boundary+ringArea") { c =>
      val b = H3.cellToBoundary(c)
      math.abs(GeodesicExact.ringArea(b.map(v => (math.toDegrees(v.lng), math.toDegrees(v.lat))))) / 1e6
    }
    time("boundary+poly+convexclip") { c =>
      val b = H3.cellToBoundary(c)
      val cs = new Array[Coordinate](b.length + 1)
      var i = 0; while (i < b.length) { cs(i) = new Coordinate(math.toDegrees(b(i).lng), math.toDegrees(b(i).lat)); i += 1 }
      cs(b.length) = cs(0)
      val poly = GeoIO.factory.createPolygon(cs)
      ConvexClip.fromPolygon(poly).map(_.xs.length).getOrElse(0).toDouble
    }
    time("full cellInfo miss") { c => H3Geo.memoClear(); H3Geo.cellInfoCached(c).areaKm2 }
  }
}
