package graft

import org.apache.spark.scheduler._

/** Per-JOB profile of one declared query — the measurement tool the
  * optimization guide's §1 loop needs for COMPOSITE queries, where
  * QDebug's build-once-count-thrice shape misses the construction-time
  * jobs (localCheckpoints, gate collects, staging writes, streaming
  * micro-batches). Runs the query exactly as Bench does (fresh
  * construction + count per round, caches cleared, sf0.001 warmup) and
  * prints every Spark job's wall seconds, task count, summed task time
  * and first-stage call site, plus the driver-side gap (wall − job
  * wall): a query whose gap dominates is bottlenecked on driver work
  * (planning, commits, collects), not on executors.
  *
  * Usage: runMain graft.QProf <query> [sfDir] [rounds]
  */
object QProf {
  private final class JobRec(val id: Int) {
    @volatile var name = ""
    @volatile var t0 = 0L
    @volatile var t1 = 0L
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.local()
    val jobs = scala.collection.concurrent.TrieMap[Int, JobRec]()
    val stageJob = scala.collection.concurrent.TrieMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = new JobRec(e.jobId)
        j.t0 = e.time
        // the RESULT stage's name carries the action's call site
        j.name = e.stageInfos.lastOption.map(_.name).getOrElse("")
        e.stageIds.foreach(sid => stageJob(sid) = e.jobId)
        jobs(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stageJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks.incrementAndGet()
          if (e.taskInfo != null) j.taskTime.addAndGet(e.taskInfo.duration)
        }
    })
    val qs = SparkEntry.queries
    require(qs.contains(name), s"unknown query $name")
    // untimed warmup at the smallest SF (Bench's codegen warmup)
    try qs(name)(spark, "/root/testdata/sf0.001").count()
    catch { case t: Throwable => println(s"[qprof] warmup threw: $t") }
    (1 to rounds).foreach { r =>
      spark.sharedState.cacheManager.clearCache()
      GraftConf.releaseCaches()
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      jobs.clear(); stageJob.clear()
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val js = jobs.values.toSeq.sortBy(_.t0)
      val jobWall = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
      println(f"[qprof] $name round$r wall=$wall%.3fs jobs=${js.size} " +
        f"jobWall=$jobWall%.3fs driverGap=${wall - jobWall}%.3fs")
      js.sortBy(j => -(j.t1 - j.t0)).take(30).foreach { j =>
        println(f"[qprof]   job=${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.3fs " +
          f"tasks=${j.tasks.get}%4d taskTime=${j.taskTime.get / 1e3}%8.1fs  " +
          j.name.take(100))
      }
    }
    spark.stop()
  }
}
