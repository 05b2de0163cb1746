package graft.tools
object InitTime { def main(a: Array[String]): Unit = {
  val t0 = System.nanoTime()
  graft.h3.BaseCells.centers.length
  println(f"BaseCells init: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
}}
