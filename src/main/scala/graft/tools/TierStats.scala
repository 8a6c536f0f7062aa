package graft.tools

/** Prints the embedding band tier's candidate count vs its >=0.4
  * verified-output count at a scale dir — the honesty check for the
  * tier's cost: candidates ~ output means the scoring work IS the
  * answer (output-bound); candidates >> output means the key scheme
  * still wastes verification and needs a deeper split.
  *
  * Usage: runMain graft.tools.TierStats [sfDir]   (defaults to
  * SPARK_GRAFT_SF_DIR, then the checkout-relative target/sfx30)
  */
object TierStats {
  def main(args: Array[String]): Unit = {
    val d = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("target/sfx30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Sessions.local(cpus, "graft-tierstats")
    val tier = graft.queries.Similarity.tierForStats(spark, d)
    val agg = tier.selectExpr("count(*) AS cand",
      "sum(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END) AS out04",
      "sum(CASE WHEN cos >= 0.9 THEN 1 ELSE 0 END) AS out09").collect()(0)
    println(s"[tier] candidates=${agg.getLong(0)} out@0.4=${agg.getLong(1)} out@0.9=${agg.getLong(2)}")
    spark.stop()
  }
}
