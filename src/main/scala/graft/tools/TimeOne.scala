package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Scratch: time registered queries at a given SF dir with per-stage
  * breakdown (task count, total executor CPU, wall).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val stages = mutable.ArrayBuffer.empty[(Int, String, Int, Double, Double)]
    val tRef = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = j.stageInfos.map(s =>
          s"${s.stageId}:" + s.name.takeWhile(_ != '\n').take(40)).mkString(" | ")
        println(f"    [job ${j.jobId}%3d start t=${(System.nanoTime() - tRef.get()) / 1e9}%6.2f  $names]")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"    [job ${j.jobId}%3d   end t=${(System.nanoTime() - tRef.get()) / 1e9}%6.2f]")
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          wall, si.taskMetrics.executorCpuTime / 1e9))
      }
    })
    args(0).split(",").foreach { name =>
      stages.clear()
      val q = graft.SparkEntry.registry.find(_.name == name).get
      val t0 = System.nanoTime(); tRef.set(t0)
      q.fn(spark, args(1)).write.format("noop").mode("overwrite").save()
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(ratioAreaCalls=${graft.engine.GraftFunctions.ratioAreaCalls.get()}, " +
        s"ratioLengthCalls=${graft.engine.GraftFunctions.ratioLengthCalls.get()}, " +
        s"indexShapeCalls=${graft.engine.GraftFunctions.indexShapeCalls.get()}, " +
        s"memoMisses=${graft.geo.H3Geo.memoMisses.get()}, " +
        s"areaMisses=${graft.geo.H3Geo.areaMisses.get()}, " +
        s"memoSize=${graft.geo.H3Geo.memoSize})")
      Thread.sleep(300)
      stages.sortBy(-_._4).take(12).foreach { case (id, nm, nt, run, cpu) =>
        println(f"  stage $id%4d $nm%-60s tasks=$nt%3d wall=$run%7.1fs cpuSum=$cpu%8.1fs")
      }
    }
    spark.stop()
  }
}
