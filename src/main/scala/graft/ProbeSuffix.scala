package graft

/** Throwaway profiling probe for dedup_suffix_repeats' stage costs at a
  * given SF dir (not part of the bench contract; used to attribute the
  * query's wall time across word-rank / doubling / candidate / LCP).
  * Usage: sbt "runMain graft.ProbeSuffix [sfdir]"
  */
object ProbeSuffix {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(32, "graft-probe")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm session fixed costs so stage times aren't codegen-dominated
    spark.range(1000).selectExpr("sum(id)").collect()
    t("full query cold") {
      SparkEntry.queries("dedup_suffix_repeats")(spark, d).count()
    }
    graft.queries.Persisted.drain()
    t("full query warm") {
      SparkEntry.queries("dedup_suffix_repeats")(spark, d).count()
    }
    graft.queries.Persisted.drain()
    spark.stop()
  }
}
