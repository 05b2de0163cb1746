package graft.tools

/** Scratch: row counts of a registered query at one or more SF dirs. */
object CountOut {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local()
    val q = graft.SparkEntry.registry.find(_.name == args(0)).get
    args.drop(1).foreach { d =>
      println(s"${args(0)} @ $d rows=" + q.fn(s, d).count())
    }
    s.stop()
  }
}
