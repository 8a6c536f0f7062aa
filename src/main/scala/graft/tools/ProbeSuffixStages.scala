package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pass-1 stage attribution + string-vs-integer A/B for the suffix
  * construction at a scale dir (r16, verdict #1): times (A) the pos
  * checkpoint, (B) the per-doc 15-lead window over word STRINGS,
  * (C) the bucketed 16-string-tuple rank + checkpoint — pass 1 as
  * shipped — and (D) the same pass 1 after dictionary-encoding words
  * to dense integer ranks via a broadcast vocabulary (the pre-r11
  * design, retired at sf0.1 scale where its fixed costs dominated).
  * Usage: runMain graft.tools.ProbeSuffixStages [sfDir]
  */
object ProbeSuffixStages {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/sfx100")
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-sst")
    import graft.queries.Portable
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sst] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val ws0 = graft.engine.Tables.documents(spark, d)
      .selectExpr("doc_id", s"${Portable.sparkWords("lower(text)")} AS ws")
      .where(expr("size(ws) > 0 AND size(ws) <= 127"))
    val pos = t("A pos checkpoint") {
      val p = ws0
        .select(col("doc_id"), posexplode(col("ws")))
        .selectExpr("doc_id", "CAST(pos + 1 AS BIGINT) AS p",
          "doc_id * 128 + CAST(pos + 1 AS BIGINT) AS gid", "col AS w")
        .localCheckpoint()
      println(s"[sst] positions: ${p.count()}")
      p
    }
    val nVocab = t("vocab count")(pos.select(col("w")).distinct().count())
    println(s"[sst] vocab: $nVocab")

    val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    def pass1(in: org.apache.spark.sql.DataFrame, key: String,
        sentinel: org.apache.spark.sql.Column,
        bucket: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        label: String): Unit = {
      var paired = in
      for (i <- 1 to 15)
        paired = paired.withColumn(s"_rkb$i",
          coalesce(lead(col(key), i).over(wdoc), sentinel))
      val keys = col(key) +: (1 to 15).map(i => col(s"_rkb$i"))
      val leads = t(s"$label B leads window (count)")(
        paired.select(count(col("_rkb15"))).head)
      val bucketed = bucket(paired)
      val wb = Window.partitionBy(col("_b")).orderBy(keys: _*)
      val local = t(s"$label C bucketed rank + checkpoint") {
        bucketed
          .withColumn("_lrk", rank().over(wb).cast("long"))
          .withColumn("_csz", count(lit(1)).over(
            wb.rangeBetween(Window.currentRow, Window.currentRow)).cast("long"))
          .localCheckpoint()
      }
      t(s"$label D stitch collect") {
        local.groupBy(col("_b"))
          .agg(count(lit(1)).as("_cnt"), countDistinct(col("_lrk")).as("_ncls"))
          .collect()
      }
    }

    // shipped shape: strings
    val fan = math.min(512, graft.engine.ops.GlobalOrder.fanOf(pos))
    val bnds = t("string boundary agg")(
      graft.engine.ops.SuffixArray.wordBoundaries(pos, fan))
    pass1(pos, "w", lit(""),
      df => df.withColumn("_pk", expr(graft.engine.ops.SuffixArray.PackedPrefixSql))
        .withColumn("_b", graft.engine.ops.SuffixArray.wordBucket(bnds))
        .drop("_pk"),
      "STR")

    // integer variant: dictionary-encode first (vocab rank via one
    // driver collect — vocab is corpus-distinct words, orders of
    // magnitude below positions)
    val posI = t("INT dictionary encode + checkpoint") {
      val vocab = pos.select(col("w")).distinct()
        .orderBy(col("w")).collect().map(_.getString(0))
      val ranks = vocab.zipWithIndex.map { case (w, i) => (w, (i + 1).toLong) }
      val rmap = typedLit(ranks.toMap)
      val p = pos.withColumn("rk", element_at(rmap, col("w"))).drop("w")
        .localCheckpoint()
      p.count()
      p
    }
    val mx = nVocab
    pass1(posI, "rk", lit(-1L),
      df => df.withColumn("_b", expr(s"((rk - 1) * $fan) div $mx")),
      "INT")
    spark.stop()
  }
}
