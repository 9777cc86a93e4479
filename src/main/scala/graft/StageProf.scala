package graft

import scala.collection.mutable

/** Measurement main (r20 optimization round): run a query cold+warm through
  * the noop sink with a stage-metrics listener attached, and print the warm
  * run's top stages by duration — task count, executor run/cpu time, shuffle
  * bytes, records — so a slow query can be attributed to its actual stage
  * (serial scan? shuffle? barrier?) without the UI.
  *
  * Usage: runMain graft.StageProf <query> [topN]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProf <query> [topN]")
    val name = args(0)
    val topN = args.lift(1).flatMap(_.toIntOption).getOrElse(18)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries(name)

    // cold run (codegen/JIT) — not profiled
    q(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    final case class St(id: Int, nameLine: String, var tasks: Int = 0,
                        var runMs: Long = 0, var cpuMs: Long = 0,
                        var inRec: Long = 0, var outRec: Long = 0,
                        var shRead: Long = 0, var shWrite: Long = 0,
                        var wallMs: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val st = stages.getOrElseUpdate(i.stageId,
          St(i.stageId, i.name.linesIterator.next().take(120)))
        st.tasks += i.numTasks
        st.wallMs += (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        st.runMs += m.executorRunTime
        st.cpuMs += m.executorCpuTime / 1000000
        st.inRec += m.inputMetrics.recordsRead
        st.outRec += m.outputMetrics.recordsWritten
        st.shRead += m.shuffleReadMetrics.totalBytesRead
        st.shWrite += m.shuffleWriteMetrics.bytesWritten
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    q(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    println(f"[stageprof] $name warm ${wall}%.2f s, ${stages.size} stages")
    val top = stages.values.toSeq.sortBy(-_.wallMs).take(topN)
    println(f"[stageprof] ${"stage"}%6s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"tasks"}%6s ${"in_rec"}%10s ${"shR_kb"}%8s ${"shW_kb"}%8s  name")
    for (s <- top)
      println(f"[stageprof] ${s.id}%6d ${s.wallMs}%8d ${s.runMs}%8d ${s.cpuMs}%8d ${s.tasks}%6d ${s.inRec}%10d ${s.shRead / 1024}%8d ${s.shWrite / 1024}%8d  ${s.nameLine}")
    val totWall = stages.values.map(_.wallMs).sum
    println(f"[stageprof] total stage wall ${totWall}ms over ${stages.size} stages (query wall ${wall * 1000}%.0f ms — gap = driver/scheduling)")
    spark.stop()
  }
}
