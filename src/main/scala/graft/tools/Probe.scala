package graft.tools

/** Scratch profiling main (dev-only): times one declared query's build
  * and action at an SF dir, printing per-phase wall times.
  * Usage: sbt "runMain graft.tools.Probe <query> [sfDir] [reps]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.engine.Sessions.local(32, "graft-probe")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      if (i == 1 && sys.env.contains("PROBE_EXPLAIN")) df.explain("formatted")
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[probe] run $i: build=${(t1 - t0) / 1e9}%.2f s action=${(t2 - t1) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
