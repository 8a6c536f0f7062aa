package graft.tools

/** Dev probe: repeated timing of the production sim_pq_adc query in a
  * cold session (no shared tier), the tool that attributed the r11
  * bench regression. It times the DECLARED query only — stage-level
  * attribution lives in the git history of the r12 investigation, and
  * duplicating the query body here would drift from Similarity.scala
  * and time a plan the bench no longer runs.
  *
  * Findings established with it (r12): the old shape's cost was
  * Catalyst re-executing the cb1 codebook subtree once per consumer
  * (no cross-plan common-subtree dedup), NOT the interpreted
  * aggregate/zip_with distance HOF (0.07s for the whole corpus
  * assignment); and unrolling that HOF into straight-line arithmetic
  * inside 8 struct candidates exploded optimizer time to 270+s — the
  * literal-HOF-per-candidate grain is right.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.engine.Sessions.preferShmScratch()
    val spark = graft.engine.Sessions.local(32, "probe-pq")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    graft.engine.Tables.embeddings(spark, sfDir).count()
    for (i <- 1 to 3) {
      t(s"run$i full") { graft.SparkEntry.queries("sim_pq_adc")(spark, sfDir).count() }
      graft.queries.Persisted.drain()
    }
    spark.stop()
  }
}
