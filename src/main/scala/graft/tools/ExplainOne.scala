package graft.tools

/** Scratch: print the formatted physical plan of registered queries. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("8")
    args(0).split(",").foreach { name =>
      val q = graft.SparkEntry.registry.find(_.name == name).get
      println(s"\n========== $name ==========")
      q.fn(spark, args(1)).explain("formatted")
    }
    spark.stop()
  }
}
