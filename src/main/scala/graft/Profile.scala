package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round tooling (guide §1.1 "empirical"): run the named
  * queries once warm then once measured, recording per-stage wall time,
  * task count and shuffle/input bytes through a SparkListener — the
  * sandbox has no Spark UI, so this is the Stages tab in text form.
  * Usage: runMain graft.Profile <q1> [q2 ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-profile")

    final case class St(jobId: Int, stageId: Int, name: String, ms: Long,
        tasks: Int, inputMB: Double, shufReadMB: Double, shufWriteMB: Double,
        spillMB: Double)
    val stages = mutable.ArrayBuffer[St]()
    val stageToJob = mutable.Map[Int, Int]()
    var enabled = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (enabled) j.stageIds.foreach(s => stageToJob(s) = j.jobId)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (enabled) {
          val i = e.stageInfo
          val m = i.taskMetrics
          val ms = (for (c <- i.completionTime; s <- i.submissionTime) yield c - s).getOrElse(-1L)
          stages += St(stageToJob.getOrElse(i.stageId, -1), i.stageId,
            i.name.takeWhile(_ != '\n').take(90), ms, i.numTasks,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.memoryBytesSpilled / 1e6)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      fn(spark, sfDir).count() // warm-up: JIT + codegen + artifact builds
      stages.clear(); stageToJob.clear()
      enabled = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      enabled = false
      // listener bus is async; give stage-completed events time to land
      Thread.sleep(500)
      println(f"%n=== $name: $total%.3f s, ${stages.map(_.ms).sum} ms across ${stages.size} stages ===")
      println(f"${"job"}%4s ${"stage"}%5s ${"ms"}%7s ${"tasks"}%5s ${"inMB"}%8s ${"sRdMB"}%8s ${"sWrMB"}%8s ${"spill"}%6s  name")
      stages.sortBy(-_.ms).take(30).foreach { s =>
        println(f"${s.jobId}%4d ${s.stageId}%5d ${s.ms}%7d ${s.tasks}%5d ${s.inputMB}%8.1f ${s.shufReadMB}%8.2f ${s.shufWriteMB}%8.2f ${s.spillMB}%6.1f  ${s.name}")
      }
      val nJobs = stages.map(_.jobId).distinct.size
      println(f"[profile] $name: $nJobs jobs, ${stages.size} stages, sum-stage ${stages.map(_.ms).sum} ms vs wall ${total * 1000}%.0f ms")
    }
    spark.stop()
  }
}
