package graft.tools

/** Scratch: Bench-methodology timing for a SUBSET of registered queries —
  * sf0.001 warmup, one untimed target-SF rep, then min-of-N with per-rep
  * gc attribution. Args: comma-separated query names, sf dir, [reps=3].
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = args(0).split(",").toSeq
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val defs = names.map(n => graft.SparkEntry.registry.find(_.name == n)
      .getOrElse(sys.error(s"unknown query name: $n")))
    // warmup/untimed failures are logged, not silent: a deterministically
    // failing query otherwise surfaced only as an opaque crash in rep 1,
    // after the diagnostic cause had been discarded
    defs.foreach { q =>
      try q.fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable =>
        System.err.println(s"[benchsome] warm ${q.name}: ${t.getClass.getName}: ${t.getMessage}") }
    }
    val out = defs.map { q =>
      try q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case t: Throwable =>
        System.err.println(s"[benchsome] untimed ${q.name}: ${t.getClass.getName}: ${t.getMessage}") }
      val ts = (1 to reps).map { _ =>
        val gc0 = graft.Bench.gcMillis
        val t0 = System.nanoTime()
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (graft.Bench.gcMillis - gc0) / 1e3)
      }
      val line = ts.map { case (t, g) =>
        f"$t%.3f(gc=$g%.2f)" }.mkString(" ")
      println(f"== ${q.name}%-28s min=${ts.map(_._1).min}%.3f  [$line]")
      (q.name, ts.map(_._1).min)
    }
    println("TOTAL min-sum: " + graft.Bench.num(out.map(_._2).sum, 3))
    spark.stop()
  }
}
