package graft

import org.apache.spark.sql.SparkSession

/** Standalone check that GraftExtensions installs the native functions
  * through the spark.sql.extensions deployment path (must run in a fresh
  * JVM — an active session would be reused and mask the injection).
  *
  * Usage: runMain graft.ExtensionsCheck
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-check")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      "SELECT graft_strhash('hello') AS h, " +
        "graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "size(graft_shingles(array('a','b','c','d'))) AS sh, " +
        "size(graft_minhash(array(CAST(5 AS BIGINT)))) AS mh, " +
        "graft_simhash(array(CAST(5 AS BIGINT))) AS sim, " +
        "graft_morton(CAST(3 AS BIGINT), CAST(1 AS BIGINT)) AS z").collect().head
    val ok0 = r.getAs[Long]("h") == 99162322L && r.getAs[Double]("d") == 11.0 &&
      r.getAs[Int]("sh") == 2 && r.getAs[Int]("mh") == 16 &&
      r.getAs[Long]("sim") == 5L && // single element: its bits ARE the signature
      r.getAs[Long]("z") == 7L
    // the optimizer rule must also ride the extensions path: a pure
    // inequality join plans banded (no nested loop) once the bin conf
    // is set
    spark.conf.set(graft.plans.RangeJoinRule.BinConf, "10")
    val rj = spark.range(100).selectExpr("id AS p")
      .join(
        spark.range(20).selectExpr("id * 7 AS lo", "id * 7 + 5 AS hi"),
        org.apache.spark.sql.functions.expr("p >= lo AND p <= hi"))
    val rjPlan = rj.queryExecution.executedPlan.toString
    // 20 intervals of 6 ints each over points 0..99: ids 0..13 fully
    // inside (84) + id 14 contributes {98, 99} -> 86 pairs
    val rjOk = !rjPlan.contains("BroadcastNestedLoopJoin") &&
      rjPlan.contains("_rj_bin") && rj.count() == 86L
    if (!rjOk) System.err.println(s"[extensions-check] range-join plan:\n$rjPlan")
    val ok = ok0 && rjOk
    println(s"[extensions-check] graft_strhash('hello')=${r.getAs[Long]("h")} " +
      s"graft_dot=${r.getAs[Double]("d")} shingles=${r.getAs[Int]("sh")} " +
      s"minhash_k=${r.getAs[Int]("mh")} simhash=${r.getAs[Long]("sim")} " +
      s"morton=${r.getAs[Long]("z")} rangeJoinRule=${if (rjOk) "banded" else "MISSING"} " +
      s"=> ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
