package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level attribution for sim_margin_bitext at a scale dir (r17,
  * verdict #5: the last >=2 s data query above 2x its oracle twin —
  * where do the 100x seconds go: candidate generation, cosine scoring,
  * the two top-k neighborhood windows, or the mutual-best stage?).
  * Mirrors marginBitextLshPairs stage for stage with eager counts and
  * timers between stages; persistScoped intermediates make each timer
  * the INCREMENTAL cost of that stage.
  * Usage: runMain graft.tools.ProbeBitext [sfDir]
  */
object ProbeBitext {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/sfx100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.engine.Sessions.local(cpus, "graft-probe-bitext")
    graft.functions.GraftFunctions.register(s)
    import graft.queries.Similarity._
    val Q = graft.queries.Q
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bitext] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.engine.Tables.embeddings(s, d)
    val a0 = e.where(expr("label % 2 = 0")).select(col("vec_id"), col("embedding"))
    val b0 = e.where(expr("label % 2 = 1")).select(col("vec_id"), col("embedding"))
    val cc = t("lsh consts")(lshConstsCached(s, d))
    val n = cc._1
    val ppb = 4 + lshExtraBits(n)
    val hotCap = bandHotCap(n, ppb)
    println(s"[bitext] n=$n ppb=$ppb hotCap=$hotCap")
    val (nn, mq) = cc
    def keyed(df: DataFrame, id: String, vec: String, norm: String) =
      df.selectExpr(s"vec_id AS $id", s"embedding AS $vec",
        s"sqrt(${graft.queries.Portable.sparkDot("embedding", "embedding")}) AS $norm")
    val ak = keyed(a0, "a_id", "ea", "na").persist()
    val bk = keyed(b0, "b_id", "eb", "nb").persist()
    t("ak+bk norms")(println(s"[bitext] ak=${ak.count()} bk=${bk.count()}"))
    val aRaw = rawBandRows(a0, ppb, 2, withExt = true, nn, mq)
    val bRaw = rawBandRows(b0, ppb, 2, withExt = true, nn, mq)
    val counts = bandKeyCounts(aRaw.select(col("band"), col("key"))
      .unionAll(bRaw.select(col("band"), col("key")))).persist()
    t("band-key occupancy")(println(s"[bitext] hotKeys=${counts.count()}"))
    val cand = splitBandRows(aRaw, counts, ppb, hotCap)
      .toDF("a_id", "band", "key")
      .join(splitBandRows(bRaw, counts, ppb, hotCap)
        .toDF("b_id", "band2", "key2"),
        col("band") === col("band2") && col("key") === col("key2"))
      .select(col("a_id"), col("b_id")).distinct()
      .persist()
    t("candidates")(println(s"[bitext] cand=${cand.count()}"))
    val pr = cand
      .join(ak.select(col("a_id"), col("ea"), col("na")), "a_id")
      .join(bk.select(col("b_id"), col("eb"), col("nb")), "b_id")
      .selectExpr("a_id", "b_id",
        s"${Q.scaledLong(s"${graft.queries.Portable.sparkDot("ea", "eb")} / (na * nb)", 6)} AS c_e6")
      .repartition(col("a_id"))
      .persist()
    t("cosine scoring")(println(s"[bitext] pr=${pr.count()}"))
    def topSum(key: String, other: String, out: String) = pr
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col("c_e6").desc, col(other))))
      .where(col("rn") <= 4)
      .groupBy(col(key)).agg(sum(col("c_e6")).as(out))
    val mg = pr.join(topSum("a_id", "b_id", "sax"), "a_id")
      .join(topSum("b_id", "a_id", "sby"), "b_id")
      .selectExpr("a_id", "b_id", "c_e6",
        s"${Q.scaledLong("2.0 * 4 * CAST(c_e6 AS DOUBLE) / CAST(nullif(sax + sby, 0) AS DOUBLE)", 6)} AS margin_e6")
      .persist()
    t("neighborhood sums + margin")(println(s"[bitext] mg=${mg.count()}"))
    val ba = mg.withColumn("rn", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col("margin_e6").desc, col("b_id"))))
      .where(col("rn") === 1).drop("rn")
    val bb = mg.withColumn("rn", row_number().over(
        Window.partitionBy(col("b_id")).orderBy(col("margin_e6").desc, col("a_id"))))
      .where(col("rn") === 1)
      .select(col("a_id").as("a2"), col("b_id").as("b2"))
    val fin = ba.join(bb, col("a_id") === col("a2") && col("b_id") === col("b2"))
      .where(col("margin_e6") > 1000000L)
      .orderBy(col("margin_e6").desc, col("a_id")).limit(20)
    t("mutual-best + final")(println(s"[bitext] out=${fin.count()}"))
    s.stop()
  }
}
