package graft.tools

object CountQueries {
  def main(a: Array[String]): Unit = {
    val r = graft.SparkEntry.registry
    println(s"registered=${r.length} oracled=${r.count(_.oracle.nonEmpty)} headline=${r.count(_.headline)}")
  }
}
