package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Throwaway per-stage profiler (not part of the driver contract).
  *
  * Runs each named query twice (warm + measured) and prints, for the
  * measured run, every completed stage sorted by wall duration with its
  * task count, input/shuffle bytes and the callsite name — the
  * local-mode stand-in for the Spark UI's stage table (guide §1/§7).
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("PROFILE_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class StageRow(
        id: Int, name: String, tasks: Int, durMs: Long,
        inputMB: Double, shReadMB: Double, shWriteMB: Double,
        cpuMs: Long, gcMs: Long, subMs: Long)
    val rows = mutable.ArrayBuffer.empty[StageRow]
    val jobDescs = mutable.Map.empty[Int, String]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = ()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val dur = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          rows += StageRow(
            si.stageId,
            si.name.linesIterator.next().take(140),
            si.numTasks, dur,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.executorCpuTime / 1000000L,
            m.jvmGCTime,
            si.submissionTime.getOrElse(-1L))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // PROFILE_WARM=0 profiles the FIRST (cold) run — one-time session
    // builds included — instead of warming them off the measurement.
    val warm = sys.env.getOrElse("PROFILE_WARM", "1") != "0"
    for (name <- args) {
      // warm run: classloading + codegen compile off the measurement
      if (warm) {
        try {
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable => println(s"[profile] $name warm failed: ${e.getMessage}") }
      }
      graft.operators.CacheScope.releaseAll()
      rows.clear(); collecting = true
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      graft.operators.CacheScope.releaseAll()
      // give the listener bus a moment to drain
      Thread.sleep(300)
      println(f"===== $name  wall=$wall%.2f s  stages=${rows.size}  stageWallSum=${rows.map(_.durMs).sum / 1e3}%.2f s =====")
      val base = rows.map(_.subMs).filter(_ > 0).minOption.getOrElse(0L)
      println(f"${"stage"}%6s ${"t0ms"}%7s ${"ms"}%7s ${"tasks"}%5s ${"cpuMs"}%7s ${"gcMs"}%5s ${"inMB"}%8s ${"shRdMB"}%8s ${"shWrMB"}%8s  name")
      for (r <- rows.sortBy(_.subMs)) {
        println(f"${r.id}%6d ${r.subMs - base}%7d ${r.durMs}%7d ${r.tasks}%5d ${r.cpuMs}%7d ${r.gcMs}%5d ${r.inputMB}%8.1f ${r.shReadMB}%8.1f ${r.shWriteMB}%8.1f  ${r.name}")
      }
    }
    spark.stop()
  }
}
