package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B diagnostic for SuffixArray pass 1's window cost: the same
  * bucketed 16-string-tuple rank, with and without the `_csz`
  * peers-count frame processor (r15 added it to drive the later-pass
  * tie refinement). Usage: runMain graft.tools.ProbeSuffixPass [sfDir]
  */
object ProbeSuffixPass {
  def main(args: Array[String]): Unit = {
    val d = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("target/sfx30")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-sap")
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.Portable
    val ws0 = graft.engine.Tables.documents(spark, d)
      .selectExpr("doc_id", s"${Portable.sparkWords("lower(text)")} AS ws")
      .where(expr("size(ws) > 0 AND size(ws) <= 127"))
    val pos = ws0
      .select(col("doc_id"), posexplode(col("ws")))
      .selectExpr("doc_id", "CAST(pos + 1 AS BIGINT) AS p",
        "doc_id * 128 + CAST(pos + 1 AS BIGINT) AS gid", "col AS w")
      .localCheckpoint()
    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    var paired = pos
    for (i <- 1 to 15)
      paired = paired.withColumn(s"_rkb$i",
        coalesce(lead(col("w"), i).over(wdoc), lit("")))
    val keys = col("w") +: (1 to 15).map(i => col(s"_rkb$i"))
    val fan = math.min(512, graft.engine.ops.GlobalOrder.fanOf(pos))
    val bnds = graft.engine.ops.SuffixArray.wordBoundaries(pos, fan)
    val bucketed = paired
      .withColumn("_pk", expr(graft.engine.ops.SuffixArray.PackedPrefixSql))
      .withColumn("_b", graft.engine.ops.SuffixArray.wordBucket(bnds))
      .drop("_pk")
    val wb = Window.partitionBy(col("_b")).orderBy(keys: _*)
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.select(max(col("_lrk"))).head
        println(f"[sap] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    time("rank only")(
      bucketed.withColumn("_lrk", rank().over(wb).cast("long")))
    time("rank + csz")(
      bucketed.withColumn("_lrk", rank().over(wb).cast("long"))
        .withColumn("_csz", count(lit(1)).over(
          wb.rangeBetween(Window.currentRow, Window.currentRow)).cast("long")))
    spark.stop()
  }
}
