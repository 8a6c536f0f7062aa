package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** One-off diagnostic for the StressFunnel candidate superlinearity:
  * synthesizes the marked corpus at a given replica count, rebuilds the
  * LSH band buckets, and attributes candidate-pair volume to
  * within-replica vs cross-replica collisions, plus dumps the top bucket
  * compositions. Not part of any contract — a scale-forensics tool.
  */
object FunnelDiag {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(50)
    val spark = graft.engine.Sessions.local(32, "graft-funnel-diag")
    val src = "/root/testdata/sf0.1"
    val dir = Files.createTempDirectory("graft_fdiag_").toString
    graft.engine.Tables.documents(spark, src)
      .crossJoin(spark.range(reps.toLong).toDF("rep"))
      .selectExpr(
        "doc_id * 1000 + rep AS doc_id",
        """CASE WHEN rep < 3 THEN text
           ELSE regexp_replace(text, ' ', concat(' r', CAST(rep AS STRING), ' ')) END AS text""",
        "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val capped = !args.drop(1).headOption.contains("uncapped")
    println(s"[diag] signatures capped=$capped")
    val buckets = graft.queries.Dedup.bandBucketLedgerDocs(spark, dir, capped)
      .withColumn("rep", expr("doc_id % 1000"))
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_reps"),
        min(col("rep")).as("rep_min"), max(col("rep")).as("rep_max"))
      .where(col("n_docs") >= 2)
      .persist()

    val tot = buckets.agg(
      sum(expr("n_docs * (n_docs - 1) div 2")).as("cand"),
      sum(expr("CASE WHEN n_reps = 1 THEN n_docs * (n_docs - 1) div 2 ELSE 0 END")).as("cand_within"),
      sum(expr("CASE WHEN n_reps > 1 AND rep_max >= 3 THEN n_docs * (n_docs - 1) div 2 ELSE 0 END")).as("cand_cross_marked"),
      count(lit(1)).as("buckets")).collect().head
    println(s"[diag] reps=$reps buckets=${tot.getLong(3)} cand=${tot.getLong(0)} " +
      s"within_rep=${tot.getLong(1)} cross_with_marked=${tot.getLong(2)}")

    println("[diag] top 8 buckets:")
    buckets.orderBy(col("n_docs").desc).limit(8).collect().foreach { r =>
      println(s"[diag]   band=${r.getInt(0)} key=${r.getLong(1)} n_docs=${r.getLong(2)} " +
        s"n_reps=${r.getLong(3)} reps=[${r.getLong(4)}..${r.getLong(5)}]")
    }

    // for the biggest bucket, what do its docs look like?
    val top = buckets.orderBy(col("n_docs").desc).limit(1).collect().head
    val members = graft.queries.Dedup.bandBucketLedgerDocs(spark, dir, capped)
      .where(col("band") === top.getInt(0) && col("key") === top.getLong(1))
      .limit(6).select(col("doc_id")).collect().map(_.getLong(0))
    spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(members: _*))
      .selectExpr("doc_id", "substring(text, 1, 120) AS head", "n_chars")
      .collect().foreach(r => println(s"[diag]   doc=${r.getLong(0)} n_chars=${r.getInt(2)} text=${r.getString(1)}"))

    buckets.unpersist()
    graft.engine.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
