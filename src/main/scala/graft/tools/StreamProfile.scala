package graft.tools

import org.apache.spark.sql.functions._

/** Dev diagnostic (not part of the driver contract): replays the
  * stream-stream left-join roundtrip's exact choreography and prints each
  * micro-batch's duration breakdown from StreamingQueryProgress, so the
  * per-batch fixed cost of the streaming roundtrips is attributable
  * (planning vs state commit vs WAL vs addBatch) instead of guessed.
  * Run: sbt -batch "runMain graft.tools.StreamProfile"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    graft.engine.Sessions.preferShmScratch()
    val s: org.apache.spark.sql.SparkSession = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-stream-profile")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // warmup: one throwaway run so codegen/classloading land outside the
    // profiled run, mirroring Bench's warmup pass
    def once(label: String): Unit = {
      val imps = MemoryStream[(String, Long)]
      val clicks = MemoryStream[(String, Long)]
      def src(m: MemoryStream[(String, Long)]) = m.toDF().toDF("ts_s", "ad_id")
        .withColumn("ts", to_timestamp(col("ts_s")))
      val joined = graft.engine.stream.WindowedAggs
        .adAttributionOuter(src(imps), src(clicks))
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "1")
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("memory")
        .queryName(s"prof_${System.nanoTime()}")
        .outputMode("append").start()
      try {
        imps.addData(Seq(("2024-01-01 00:00:00", 1L), ("2024-01-01 00:10:00", 2L)))
        clicks.addData(Seq(("2024-01-01 00:30:00", 1L)))
        q.processAllAvailable()
        clicks.addData(Seq(("2024-01-01 00:40:00", 2L)))
        imps.addData(Seq(("2024-01-05 02:00:00", -1L)))
        clicks.addData(Seq(("2024-01-05 02:00:00", -2L)))
        q.processAllAvailable()
      } finally q.stop()
      s.conf.set("spark.sql.shuffle.partitions", prev)
      val total = (System.nanoTime() - t0) / 1e9
      println(s"== $label total=${f"$total%.2f"}s batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"    state: commitMs=${so.commitTimeMs} updMs=${so.allUpdatesTimeMs} " +
            s"rmMs=${so.allRemovalsTimeMs} mem=${so.memoryUsedBytes} custom=${so.customMetrics}")
        }
      }
    }
    // Two passes: the first absorbs one-time session cost (codegen,
    // classloading); the second is the representative measurement.
    // Findings this tool established (kept here so they aren't re-derived):
    // each micro-batch costs ~0.5s flat — addBatch ~0.4s (of which state
    // commit ~0.14s across the join's 4 store instances), incremental
    // queryPlanning ~0.1s, WAL+offsets ~0.08s. Codegen on/off, state-store
    // compression codec, and RawLocalFileSystem (no .crc sidecars) all
    // measured as noise — batch COUNT is the only real lever, which is why
    // the declared roundtrips disable no-data micro-batches and use
    // explicit flush data batches instead.
    //
    // r12 follow-up (the r11 VERDICT #4 floor hunt), all measured here:
    //   - interleaved conf sweep: stateStore.maintenanceInterval=600s,
    //     minBatchesToRetain=2, unloadOnCommit, and RocksDB +
    //     join.stateFormatVersion=3 (ONE column-family store instead of
    //     4) are ALL within run-to-run noise of interleaved baselines
    //     (~2.6s/4 batches either way) — no conf moves the floor;
    //   - job accounting: a 4-batch roundtrip runs 4 jobs, 8 stages,
    //     9 tasks TOTAL (1 job / 2 stages / ~2 tasks per batch), with
    //     ~250ms/batch inside tasks (state load + commit + the join) and
    //     ~20ms deserialization, 0 GC — so the remaining ~200ms of
    //     addBatch is driver-side incremental physical planning + job
    //     turnaround, and the per-batch total decomposes as ~0.25 task +
    //     ~0.1 logical planning + ~0.07 WAL/offsets + ~0.2 driver;
    //   - batch counts across all 22 roundtrips are at their semantic
    //     minimum (1-3 processAllAvailable calls, each a required
    //     cross-batch-state or watermark-advance witness).
    // Conclusion: the ~0.5s/batch orchestration floor is a property of
    // micro-batch execution in this runtime, not of the roundtrips; the
    // stream subtotal scales with (batches x floor) and is already at
    // the minimum batch count the semantics gates allow.
    once("warmup")
    once("profiled")
    // conf sweep: each candidate applied around a run (session-scoped,
    // restored after); compare totals against the second baseline
    def sweep(label: String, confs: (String, String)*): Unit = {
      val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try once(label) finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
    // the interleaved sweep that established "no conf moves the floor"
    // (baselines re-run BETWEEN candidates so session warmth can't
    // masquerade as a conf win) — kept executable so the documented
    // evidence reproduces from HEAD
    once("baseline-a")
    sweep("maintenance-off",
      "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s")
    once("baseline-b")
    sweep("wal-retain-2",
      "spark.sql.streaming.stateStore.maintenanceInterval" -> "600s",
      "spark.sql.streaming.minBatchesToRetain" -> "2")
    once("baseline-c")
    sweep("statefmt3-rocksdb",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.join.stateFormatVersion" -> "3")
    once("baseline-d")
    // job/stage/task accounting for one run: is the unattributed addBatch
    // time many tiny jobs, or few slow ones?
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) {
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
          deserMs.addAndGet(e.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(e.taskMetrics.jvmGCTime)
        }
      }
    }
    s.sparkContext.addSparkListener(listener)
    once("counted")
    Thread.sleep(500) // let the listener bus drain
    println(s"== counted run: jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
      s"taskRunMs=${taskMs.get} deserMs=${deserMs.get} gcMs=${gcMs.get}")
    s.stop()
  }
}
