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
    val spark = graft.engine.Sessions.local(cpus, "graft-bench")
    // one-time session warmup (codegen infra, parquet footers) so the
    // per-query numbers measure the queries, not JVM startup
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // release any frames a query persisted (outside the timed region),
      // so later queries aren't squeezed by accumulated cache
      spark.catalog.clearCache()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
