package graft.tools

/** Scratch: run a registered query at an SF dir and write the result to a
  * parquet path for offline inspection (DuckDB, pandas).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local()
    val q = graft.SparkEntry.registry.find(_.name == args(0)).get
    q.fn(s, args(1)).write.mode("overwrite").parquet(args(2))
    s.stop()
  }
}
