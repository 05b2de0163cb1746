package graft.tools
object CoverBench {
  def main(args: Array[String]): Unit = {
    def square(cx: Double, cy: Double, h: Double) =
      s"POLYGON (($cx ${cy}, ${cx+2*h} ${cy}, ${cx+2*h} ${cy+2*h}, $cx ${cy+2*h}, $cx ${cy}))"
    // warm
    (0 until 50).foreach(i => graft.operators.SpatialJoin.coverCells(square(-122 + i*0.3, 37, 0.1), 7))
    val t0 = System.nanoTime()
    var n = 0L
    (0 until 500).foreach { i =>
      n += graft.operators.SpatialJoin.coverCells(square(-100 + (i%300)*0.5, -60 + (i%120), 0.075 + (i%10)*0.01), 7).length
    }
    println(f"coverCells res7: ${(System.nanoTime()-t0)/1e6/500}%.2f ms/poly, avg cells ${n/500}")
    val t1 = System.nanoTime()
    n = 0
    (0 until 500).foreach { i =>
      n += graft.operators.SpatialJoin.coverCells(square(-100 + (i%300)*0.5, -60 + (i%120), 0.075 + (i%10)*0.01), 6).length
    }
    println(f"coverCells res6: ${(System.nanoTime()-t1)/1e6/500}%.2f ms/poly, avg cells ${n/500}")
  }
}
