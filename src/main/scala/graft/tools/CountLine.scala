package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable
object CountLine {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32")
    val stages = mutable.ArrayBuffer.empty[(Int, String, Int, Double, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(40), si.numTasks,
          si.taskMetrics.executorRunTime / 1e3, si.taskMetrics.executorCpuTime / 1e9))
      }
    })
    val q = graft.SparkEntry.registry.find(_.name == args(0)).get
    for (i <- 1 to 3) {
      stages.clear()
      val t0 = System.nanoTime()
      q.fn(spark, args(1)).write.format("noop").mode("overwrite").save()
      println(f"== ${args(0)} run$i: ${(System.nanoTime() - t0) / 1e9}%.1f s ratioLen=${graft.engine.GraftFunctions.ratioLengthCalls.get} memoMiss=${graft.geo.H3Geo.memoMisses.get} indexGeom=${graft.engine.GraftFunctions.indexGeometryCalls.get}")
      if (i == 3) {
        Thread.sleep(300)
        stages.sortBy(-_._4).take(10).foreach { case (id, nm, nt, run, cpu) =>
          println(f"  stage $id%4d $nm%-40s tasks=$nt%3d runSum=$run%8.1fs cpuSum=$cpu%8.1fs")
        }
      }
    }
    spark.stop()
  }
}
