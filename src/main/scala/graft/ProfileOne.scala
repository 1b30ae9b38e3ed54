package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Scratch: per-job / per-stage breakdown for one inventory query — the
  * empirical half of the optimization loop (guide §1.1) where the UI is
  * unavailable. Runs the gate exactly as Bench does (prewarm outside the
  * timed region, noop sink, warm run first) and prints, for the timed run:
  * every job (wall ms, description) and every stage (task-time sum, input
  * bytes, shuffle read/write bytes, peak task count).
  *
  * Usage: SPARK_GRAFT_CPUS=16 sbt "runMain graft.ProfileOne q_name [sfDir]"
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, start: Long, var end: Long = 0L,
                      stages: mutable.ArrayBuffer[Int] = mutable.ArrayBuffer())
    case class StageRec(id: Int, nm: String, taskMs: Long, inB: Long,
                        srB: Long, swB: Long, nTasks: Int, spill: Long,
                        cpuMs: Long, gcMs: Long)
    val jobs = mutable.ArrayBuffer[JobRec]()
    val stages = mutable.Map[Int, StageRec]()
    val details = mutable.Map[Int, String]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val r = JobRec(e.jobId, desc, System.nanoTime())
        r.stages ++= e.stageIds
        jobs.synchronized { jobs += r }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (record) {
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = e.stageInfo
          val m = si.taskMetrics
          val where = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileOne"))
            .map(_.trim.stripPrefix("at ").take(60))
            .getOrElse(si.name.takeWhile(_ != '\n').take(60))
          stages.synchronized {
            if (m.executorRunTime > 3000) details(si.stageId) = si.details
            stages(si.stageId) = StageRec(si.stageId,
              where,
              m.executorRunTime, m.inputMetrics.bytesRead,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten,
              si.numTasks, m.memoryBytesSpilled,
              m.executorCpuTime / 1000000, m.jvmGCTime)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val q = SparkEntry.inventory.toMap.apply(name)
    def once(): Double = {
      graft.core.CacheScope.beginGate()
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally graft.core.CacheScope.endGate()
      (System.nanoTime() - t0) / 1e9
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def prewarm(): Unit = q.prewarm.foreach(f => f(spark, sfDir))
    // two warm runs (fresh JVM): codegen + JIT
    (1 to 2).foreach { _ => prewarm(); once(); sweep() }
    System.gc()
    prewarm()
    record = true
    val secs = once()
    record = false
    println(f"%nTIMED RUN: $name = $secs%.3f s%n")
    println(f"${"job"}%4s ${"wall_ms"}%8s  desc / stages")
    jobs.foreach { j =>
      val w = if (j.end > 0) (j.end - j.start) / 1e6 else -1.0
      val st = j.stages.toSeq.sorted.flatMap(stages.get).map { s =>
        f"[s${s.id} ${s.nm} task=${s.taskMs}ms cpu=${s.cpuMs}ms gc=${s.gcMs}ms " +
          f"in=${s.inB / 1024 / 1024}MB sr=${s.srB / 1024}KB sw=${s.swB / 1024}KB n=${s.nTasks}" +
          (if (s.spill > 0) f" SPILL=${s.spill / 1024 / 1024}MB" else "") + "]"
      }.mkString(" ")
      println(f"${j.id}%4d ${w}%8.1f  ${j.desc.take(40)} $st")
    }
    val totalTask = stages.values.map(_.taskMs).sum
    println(f"%njobs=${jobs.size} stages=${stages.size} " +
      f"sum(taskMs)=$totalTask wall=${secs}%.3f s")
    if (sys.env.contains("SPARK_GRAFT_PROFILE_DETAILS")) {
      details.toSeq.sortBy(_._1).foreach { case (id, det) =>
        println(s"---- stage $id details ----")
        println(det.linesIterator.take(12).mkString("\n"))
      }
    }
    spark.stop()
  }
}
