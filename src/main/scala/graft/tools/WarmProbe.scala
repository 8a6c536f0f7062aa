package graft.tools

/** Times each shared-tier warm item individually (the Bench setup runs
  * them concurrently and reports only the max-of-families total, so a
  * quadratic regression inside ONE family hides behind the single
  * `shared_setup_sec` number — this probe is how the r14 30x audit
  * attributed its 300s setup line).
  *
  * Usage: runMain graft.tools.WarmProbe [sfDir]   (defaults to
  * SPARK_GRAFT_SF_DIR, then the checkout-relative target/sfx30)
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("target/sfx30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Sessions.local(cpus, "graft-warmprobe")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[warm] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    graft.queries.Dedup.warmItems(spark, d).zipWithIndex.foreach {
      case (w, i) => t(s"dedup#$i")(w())
    }
    graft.queries.TextOps.warmItems(spark, d).zipWithIndex.foreach {
      case (w, i) => t(s"text#$i")(w())
    }
    t("simShared")(graft.queries.Similarity.warmShared(spark, d))
    spark.stop()
  }
}
