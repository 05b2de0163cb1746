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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          si.taskMetrics.executorRunTime / 1e3, si.taskMetrics.executorCpuTime / 1e9))
      }
    })
    args(0).split(",").foreach { name =>
      stages.clear()
      val q = graft.SparkEntry.registry.find(_.name == name).get
      val t0 = System.nanoTime()
      q.fn(spark, args(1)).write.format("noop").mode("overwrite").save()
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(ratioAreaCalls=${graft.engine.GraftFunctions.ratioAreaCalls.get()}, " +
        s"indexShapeCalls=${graft.engine.GraftFunctions.indexShapeCalls.get()})")
      Thread.sleep(300)
      stages.sortBy(-_._4).take(12).foreach { case (id, nm, nt, run, cpu) =>
        println(f"  stage $id%4d $nm%-60s tasks=$nt%3d runSum=$run%8.1fs cpuSum=$cpu%8.1fs")
      }
    }
    spark.stop()
  }
}
