package graft.h3

import graft.geo.H3Geo

/** Microbenchmark of the per-row H3 ops that dominate the indexing UDFs. */
object BenchH3 {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val n = 200000
    val pts = Array.fill(n)((rnd.nextDouble() * 140 - 70, rnd.nextDouble() * 350 - 175))
    // warmup
    pts.take(20000).foreach { case (la, lo) => H3.latLngToCell(la, lo, 6) }
    var t0 = System.nanoTime()
    var acc = 0L
    pts.foreach { case (la, lo) => acc ^= H3.latLngToCell(la, lo, 6) }
    println(f"latLngToCell:   ${(System.nanoTime() - t0) / 1e3 / n}%8.2f us/op")
    val cells = pts.take(50000).map { case (la, lo) => H3.latLngToCell(la, lo, 6) }.distinct
    t0 = System.nanoTime()
    cells.foreach(c => acc ^= H3.cellToLatLng(c).lat.toLong)
    println(f"cellToLatLng:   ${(System.nanoTime() - t0) / 1e3 / cells.length}%8.2f us/op")
    t0 = System.nanoTime()
    cells.foreach(c => acc ^= H3.cellToBoundary(c).length)
    println(f"cellToBoundary: ${(System.nanoTime() - t0) / 1e3 / cells.length}%8.2f us/op")
    t0 = System.nanoTime()
    cells.foreach(c => acc ^= H3Geo.cellToWkt(c).length)
    println(f"cellToWkt:      ${(System.nanoTime() - t0) / 1e3 / cells.length}%8.2f us/op")
    t0 = System.nanoTime()
    cells.foreach(c => acc ^= H3Geo.cellAreaKm2(c).toLong)
    println(f"cellAreaKm2:    ${(System.nanoTime() - t0) / 1e3 / cells.length}%8.2f us/op")
    t0 = System.nanoTime()
    cells.take(5000).foreach(c => acc ^= H3.neighbors(c).length)
    println(f"neighbors:      ${(System.nanoTime() - t0) / 1e3 / 5000}%8.2f us/op")
    println(s"(sink $acc)")
  }
}
