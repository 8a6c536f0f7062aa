package graft.tools

/** Dev probe: stage-level timing for sim_pq_adc in a cold session (no
  * shared tier), to attribute the r11 bench regression. Not part of the
  * bench or verify surface.
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
    // warm table footers
    graft.engine.Tables.embeddings(spark, sfDir).count()
    for (i <- 1 to 2) {
      t(s"run$i full") { graft.SparkEntry.queries("sim_pq_adc")(spark, sfDir).count() }
      graft.queries.Persisted.drain()
    }
    // stage-by-stage of the NEW per-vector shape
    import org.apache.spark.sql.functions.{col, expr, explode, array, struct, lit, array_min, row_number}
    import org.apache.spark.sql.expressions.Window
    import graft.queries.ScopedPersist
    val xi = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) + 2000000)"
    val xf = graft.engine.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", s"$xi AS xi").persistScoped()
    val head = t("head collect") { xf.where(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).sortBy(_._1) }
    def subv(v: Array[Long], sIdx: Int) = v.slice(sIdx * 16, sIdx * 16 + 16)
    type Model = Map[Int, Seq[(Long, Array[Long])]]
    val seeds: Model = (0 to 3).map(sIdx =>
      sIdx -> head.filter(_._1 < 8).toSeq.map { case (id, v) => id -> subv(v, sIdx) }).toMap
    def bestCode(cb: Model, sIdx: Int) = array_min(array(cb(sIdx).sortBy(_._1).map {
      case (code, cv) =>
        struct(
          expr(s"""aggregate(zip_with(slice(xi, ${sIdx * 16 + 1}, 16),
                   array(${cv.mkString(",")}),
                   (p, q) -> (p - q) * (p - q)),
                   CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("d2"),
          lit(code).as("code"))
    }: _*)).getField("code")
    val meanCols = (1 to 16).map(i =>
      expr(s"sum(element_at(v, $i)) div count(1)").as(s"_m$i"))
    val assigned = (0 to 3).map(sIdx => struct(
      lit(sIdx).as("sub"), bestCode(seeds, sIdx).as("code"),
      expr(s"slice(xi, ${sIdx * 16 + 1}, 16)").as("v")))
    val cb1: Model = t("cb1 agg+collect") { xf.select(explode(array(assigned: _*)).as("t"))
      .select(col("t.sub").as("sub"), col("t.code").as("code"), col("t.v").as("v"))
      .groupBy(col("sub"), col("code"))
      .agg(meanCols.head, meanCols.tail: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), (2 until 18).map(r.getLong).toArray))
      .groupBy(_._1).map { case (sIdx, rows) =>
        sIdx -> rows.toSeq.map(tt => tt._2 -> tt._3) } }
    val pd2: Map[Long, Array[Array[Long]]] = head.filter(_._1 < 10).map {
      case (qid, qv) =>
        qid -> Array.tabulate(4) { sIdx =>
          val row = Array.fill(8)(0L)
          cb1(sIdx).foreach { case (code, cv) =>
            row(code.toInt) = subv(qv, sIdx).zip(cv)
              .map { case (p, q) => (p - q) * (p - q) }.sum
          }
          row
        }
    }.toMap
    val codeCols = (0 to 3).map(sIdx => bestCode(cb1, sIdx).as(s"_c$sIdx"))
    val adcStructs = pd2.keys.toSeq.sorted.map { qid =>
      val sumExpr = (0 to 3).map { sIdx =>
        s"element_at(array(${pd2(qid)(sIdx).mkString(",")}), CAST(_c$sIdx AS INT) + 1)"
      }.mkString(" + ")
      struct(lit(qid).as("qid"), expr(sumExpr).as("adc_d2"))
    }
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_d2"), col("vid"))
    val fin = xf.select(col("vec_id").as("vid") +: codeCols: _*)
      .select(col("vid"), explode(array(adcStructs: _*)).as("t"))
      .select(col("t.qid").as("qid"), col("vid"), col("t.adc_d2").as("adc_d2"))
      .where(col("qid") =!= col("vid"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .selectExpr("qid", "CAST(rn AS BIGINT) AS rn", "vid", "adc_d2")
      .orderBy(col("qid"), col("rn"))
    t("fin optimize") { fin.queryExecution.executedPlan }
    val planStr = fin.queryExecution.executedPlan.toString
    println(s"[probe] plan aggregate( occurrences = ${"aggregate\\(".r.findAllIn(planStr).length}, plan len = ${planStr.length}")
    t("fin count") { fin.count() }
    t("fin count2") { fin.count() }
    graft.queries.Persisted.drain()
    spark.stop()
  }
}
