package graft.tools
object ListNames {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.registry.foreach(q => println(q.name + (if (q.oracle.isEmpty) " [rows-only]" else "")))
}
