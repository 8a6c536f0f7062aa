package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Job/stage accounting for one declared query (r16, verdict #4 — the
  * text_bpe_train precedent): attach a listener, run the query warm
  * (min-of-reps wall), and print how many jobs and stages it spawns and
  * where the wall time sits. Fixed multi-stage job latency shows up as
  * a high job count with tiny per-stage task time.
  * Usage: runMain graft.tools.ProbeJobs <query>[,<query>...] [sfDir] [reps]
  * (comma list runs several queries in one session — one JVM/session
  * startup amortized across the band being audited)
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-jobs")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val inRows = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        inRows.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
      }
    })
    for (name <- names) {
      for (i <- 1 to reps) {
        jobs.set(0); stages.set(0); taskMs.set(0); inRows.set(0)
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9 // before drain + listener sleep
        // drain INSIDE the loop, matching Bench.timedRun: without it a
        // rep reuses the prior rep's persisted frames (CacheManager
        // matches canonicalized plans) and the warm numbers flatter
        graft.queries.Persisted.drain()
        Thread.sleep(300) // let the listener bus drain
        println(f"[jobs] $name run $i: wall=$wall%.2f s " +
          s"jobs=${jobs.get} stages=${stages.get} taskMs=${taskMs.get} " +
          s"inRows=${inRows.get} rows=$n")
      }
    }
    spark.stop()
  }
}
