package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Synthesize a K-times scale-up of the three LLM-pipeline tables
  * (events / documents / embeddings) for the full-surface scale audit
  * (r12 VERDICT #5): ~280 of the 300 queries had never executed above
  * sf0.1, and this repo's history (r8/r9) says real defects surface on
  * the first BIGGER run, not in review.
  *
  * Usage: runMain graft.tools.ScaleUpData [srcDir] [dstDir] [k]
  *
  * Layout: the TPC-H tables are symlinked from the source SF (the
  * verdict scopes the scale-up to the pipeline tables); the three
  * scaled tables are written as parquet dirs `Tables.table` reads
  * transparently. Deterministic content, no RNG:
  *
  *   - events: K copies, `event_id` shifted per copy (uniqueness);
  *     `user_id`/`ts` KEPT so per-user/per-window density grows 10x —
  *     the axis that stresses sessionize/window partitions — and joins
  *     against the (unscaled) customer dimension stay semantically
  *     intact;
  *   - documents: K copies, `doc_id` shifted; copies >0 get a per-copy
  *     suffix token so near-dup families grow without the degenerate
  *     everything-is-a-verbatim-dup corpus (which would measure the
  *     dedup caps, not the scan path);
  *   - embeddings: K copies, `vec_id` shifted; copies >0 perturbed by a
  *     deterministic per-id epsilon so ANN candidates scale without
  *     10-way cosine ties.
  */
object ScaleUpData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sfx10")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Sessions.local(cpus, "graft-scaleup")
    Files.createDirectories(Paths.get(dst))
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      val link = Paths.get(dst, s"$t.parquet")
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, Paths.get(src, s"$t.parquet"))
    }
    def copies(n: Int) = spark.range(n).toDF("_copy")

    val events = graft.engine.Tables.events(spark, src)
    events.crossJoin(copies(k))
      .withColumn("event_id", col("event_id") + col("_copy") * lit(1000000000L))
      .drop("_copy")
      .repartition(cpus)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    scaleDocuments(spark, src, dst, k, cpus)

    val emb = graft.engine.Tables.embeddings(spark, src)
    emb.crossJoin(copies(k))
      .withColumn("vec_id", col("vec_id") + col("_copy") * lit(10000000L))
      .withColumn("embedding",
        when(col("_copy") === 0, col("embedding"))
          .otherwise(expr(
            "transform(embedding, (x, i) -> CAST(x + ((vec_id % 97) - 48) * 0.0005 AS FLOAT))")))
      .drop("_copy")
      .repartition(cpus)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    for (t <- Seq("events", "documents", "embeddings"))
      println(s"[scaleup] $t: " +
        spark.read.parquet(s"$dst/$t.parquet").count() + " rows")
    spark.stop()
  }

  /** The documents-table leg alone, reusable by specs that need a
    * corpus big enough to engage a specific ladder rung (r17, verdict
    * #3: the recall audit synthesizes >20k docs so the simhash width
    * reaches 44 bits — a regime no gate corpus exercises). Same
    * deterministic per-copy suffix as the full scale-up.
    */
  private[graft] def scaleDocuments(spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String, k: Int, cpus: Int = 32): Unit = {
    val docs = graft.engine.Tables.documents(spark, src)
    docs.crossJoin(spark.range(k).toDF("_copy"))
      .withColumn("doc_id", col("doc_id") + col("_copy") * lit(10000000L))
      .withColumn("text",
        when(col("_copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" xcp"), col("_copy"))))
      .drop("_copy")
      .repartition(cpus)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }
}
