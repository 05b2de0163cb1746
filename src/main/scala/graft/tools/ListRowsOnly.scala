package graft.tools

/** Diagnostic: list registered queries that have no DuckDB oracle. */
object ListRowsOnly {
  def main(a: Array[String]): Unit = {
    val r = graft.SparkEntry.registry
    println(s"registered=${r.length} oracled=${r.count(_.oracle.nonEmpty)}")
    r.filter(_.oracle.isEmpty).foreach(q => println("rows-only: " + q.name))
  }
}
