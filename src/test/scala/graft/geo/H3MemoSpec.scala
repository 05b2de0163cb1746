package graft.geo

import graft.h3.H3
import org.scalatest.funsuite.AnyFunSuite

/** The cell-info memo must evict partially (one stripe at a time), never
  * full-clear — round-1's clear-at-cap caused a measured 5× degradation on
  * h3_index_lines once distinct cells crossed the cap.
  */
class H3MemoSpec extends AnyFunSuite {

  private def distinctCells(n: Int): Seq[Long] = {
    // deterministic spread of res-6 cells across the globe
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (out.size < n && i < n * 50) {
      val lat = math.toRadians((i * 17 % 14000) / 100.0 - 70 + 0.005)
      val lng = math.toRadians((i * 13 % 35000) / 100.0 - 175 + 0.005)
      out += H3.latLngToCell(lat, lng, 6)
      i += 1
    }
    out.toSeq
  }

  private def withSmallCap[A](cap: Int)(body: => A): A = {
    val saved = H3Geo.memoStripeCap
    H3Geo.memoStripeCap = cap
    H3Geo.memoClear()
    try body finally { H3Geo.memoStripeCap = saved; H3Geo.memoClear() }
  }

  test("memo stays populated under concurrent load far past the cap (no full clear)") {
    withSmallCap(64) {
      val totalCap = 64 * H3Geo.MemoStripes // 8192
      val cells = distinctCells(totalCap * 4) // forces many stripe evictions
      val lowWater = new java.util.concurrent.atomic.AtomicInteger(Int.MaxValue)
      val warmFloor = totalCap / 4
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val warmed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val tasks = (0 until 8).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val slice = cells.drop(t * cells.size / 8) ++ cells.take(t * cells.size / 8)
            slice.foreach { c =>
              H3Geo.cellInfoCached(c)
              val s = H3Geo.memoSize
              if (s > totalCap / 2) warmed.set(true)
              if (warmed.get) lowWater.getAndUpdate(m => math.min(m, s))
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      assert(warmed.get, "memo never warmed past half its cap")
      // a full clear anywhere after warm-up would drive the size toward 0;
      // one-stripe eviction can only dip by ~stripeCap per miss burst
      assert(lowWater.get >= warmFloor,
        s"memo collapsed to ${lowWater.get} entries mid-run (floor $warmFloor)")
      val finalSize = H3Geo.memoSize
      assert(finalSize <= totalCap + H3Geo.MemoStripes,
        s"memo size $finalSize exceeds bound ${totalCap + H3Geo.MemoStripes}")
    }
  }

  test("area-only cache is bit-identical to CellInfo.areaKm2 in every hit order") {
    H3Geo.memoClear()
    val cells = distinctCells(500) :+
      H3.latLngToCell(math.toRadians(58.2), math.toRadians(10.4), 6) // near a pentagon basin
    // cold light-cache path first (no CellInfo built yet)...
    val light = cells.map(H3Geo.cellAreaKm2Cached)
    // ...then the full geometry path
    val full = cells.map(c => H3Geo.cellInfoCached(c).areaKm2)
    cells.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(light(i)) ===
        java.lang.Double.doubleToLongBits(full(i)), s"cell ${cells(i)}")
    }
    // and warm CellInfo first → the light call free-rides the geometry memo
    val again = cells.map(H3Geo.cellAreaKm2Cached)
    assert(again === full)
  }

  test("inserting far beyond one stripe's cap leaves most entries alive") {
    withSmallCap(64) {
      val cells = distinctCells(64 * H3Geo.MemoStripes * 2)
      cells.foreach(H3Geo.cellInfoCached)
      val size = H3Geo.memoSize
      assert(size > 64 * H3Geo.MemoStripes / 2,
        s"memo holds only $size entries after ${cells.size} inserts — full-clear behavior")
    }
  }
}
