package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The 1M-document dedup-funnel stress leg — the strongest 100 TB evidence
  * a single 128 GiB box can produce: synthesize a 1,000,000-document corpus
  * (200 replicas of the 5,000 sf0.1 documents; replicas 0-2 VERBATIM — 5,000
  * exact-dup triples — and replicas 3-199 marker-tokened so their shingle
  * sets are disjoint across replicas while each replica preserves the
  * original corpus's near-dup structure), then run the FULL funnel the
  * declared dedup queries compose — shingle -> MinHash -> LSH bands ->
  * candidate-verified pairs -> connected components -> keep-best canonical
  * selection — with per-stage wall time and candidates≈output accounting.
  *
  * What linearity means here: every stage's output must scale ~linearly in
  * the replica count (8x the 125k StressCheck leg), because each stage is
  * bucketed/blocked — signatures are row-local, band buckets hold only
  * colliding docs (the verbatim triple + per-replica near-dups), candidate
  * verification joins candidates to shingles (never co-shingled all-pairs),
  * and components iterate over the verified-pair graph, which is tiny next
  * to the corpus. A quadratic stage would blow its accounting row up by
  * ~64x instead of ~8x.
  *
  * Usage: sbt "runMain graft.StressFunnel [reps]" (default 200 -> 1M docs;
  * prints timings + counts; not part of the bench contract).
  */
object StressFunnel {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("phash")) {
      phashLeg(args.lift(1).map(_.toInt).getOrElse(50))
      return
    }
    val reps = args.headOption.map(_.toInt).getOrElse(200)
    val spark = graft.engine.Sessions.local(32, "graft-stress-funnel")
    val src = "/root/testdata/sf0.1"
    val dir = Files.createTempDirectory("graft_funnel_").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[funnel] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val nDocs = t(s"synthesize ${reps}x corpus") {
      graft.engine.Tables.documents(spark, src)
        .crossJoin(spark.range(reps.toLong).toDF("rep"))
        .selectExpr(
          "doc_id * 1000 + rep AS doc_id",
          """CASE WHEN rep < 3 THEN text
             ELSE regexp_replace(text, ' ', concat(' r', CAST(rep AS STRING), ' ')) END AS text""",
          "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.read.parquet(s"$dir/documents.parquet").count()
    }
    println(s"[funnel] corpus: $nDocs docs")

    // stage 1: shingle feature space (row-local extraction; the distinct
    // is the funnel's first shuffle) — one materialization of the raw
    // space feeds BOTH the capped frame and the stop-shingle broadcast,
    // the same sharing minHashDupPairs does internally
    val raw = graft.queries.Dedup.funnelRaw(spark, dir).persist()
    val shd = graft.queries.Dedup.funnelShinglesFrom(raw).persist()
    val hot = graft.queries.Dedup.funnelHotFrom(raw)
    val nShingles = t("stage 1: capped distinct shingles") { shd.count() }

    // stage 2: MinHash signatures (over the capped space) -> LSH band
    // buckets; the ledger is the candidate accounting — sum n*(n-1)/2 is
    // the work the verify stage will do, max n_docs is the hottest bucket
    val (nBuckets, candidates, maxBucket) = t("stage 2: band-bucket ledger") {
      val r = graft.queries.Dedup.bandBucketLedger(spark, dir, hot)
        .agg(count(lit(1)).as("buckets"),
          sum(expr("n_docs * (n_docs - 1) div 2")).as("cand"),
          max(col("n_docs")).as("mx")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    println(s"[funnel] buckets=$nBuckets candidates=$candidates max_bucket=$maxBucket")

    // stage 3: candidate-verified pairs (exact Jaccard restricted to LSH
    // candidates); localCheckpoint truncates the deep LSH lineage before
    // the iterative stage re-plans it per round
    val pairs = t("stage 3: verified pairs") {
      val p = graft.queries.Dedup.funnelPairs(spark, dir, hot, shd)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      p
    }
    val nPairs = pairs.count()
    println(s"[funnel] verified_pairs=$nPairs")

    // stage 4: connected components over the verified-pair graph
    val labels = t("stage 4: connected components") {
      val l = graft.engine.ops.ConnectedComponents.run(pairs)
        .selectExpr("CAST(v AS BIGINT) AS doc_id", "CAST(lbl AS BIGINT) AS cluster_id")
        .persist()
      l.count()
      l
    }
    val (nMembers, nClusters, maxCluster) = {
      val r = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .agg(sum(col("sz")).as("m"), count(lit(1)).as("c"), max(col("sz")).as("mx"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    println(s"[funnel] members=$nMembers clusters=$nClusters max_cluster=$maxCluster")

    // stage 5: keep-best canonical selection (longest doc, min-id
    // tie-break — dedup_keep_best's rule): the label frame is tiny next to
    // the corpus, so it broadcasts into the documents join
    val nCanonical = t("stage 5: keep-best canonical selection") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id")).orderBy(col("n_chars").desc, col("doc_id"))
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("n_chars"))
        .join(broadcast(labels), Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .count()
    }
    println(s"[funnel] canonical_docs=$nCanonical")
    labels.unpersist(); shd.unpersist(); raw.unpersist()

    // accounting: every verbatim triple must survive as a cluster (>=
    // 5000 clusters, >= 15000 verbatim pairs); candidate volume stays
    // linear in the corpus (<= ~20 candidates/doc, vs the ~64x blow-up a
    // quadratic bucket would show); exactly one canonical per cluster
    val ok = nDocs == 5000L * reps &&
      nPairs >= 15000 && candidates >= nPairs &&
      candidates <= 20L * nDocs && maxBucket <= 10000 &&
      nClusters >= 5000 && nMembers > nClusters &&
      nCanonical == nClusters
    println(s"[funnel] docs=$nDocs shingles=$nShingles candidates=$candidates " +
      s"pairs=$nPairs clusters=$nClusters canonical=$nCanonical => " +
      (if (ok) "OK" else "UNEXPECTED"))
    graft.engine.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }

  /** pHash pigeonhole stress leg (`runMain graft.StressFunnel phash
    * [reps]`, default 50 -> 250k payloads): drives the IDENTICAL staged
    * pipeline multimodal_phash_pairs declares (TextOps.phashHashes ->
    * phashPairsAll) over a replica corpus — replicas 0-2 verbatim (5,000
    * exact-dup triples, hamming 0), replicas 3+ marker-tokened so each
    * replica keeps the original near-dup structure while its histograms
    * shift. Accounting mirrors the MinHash leg: the (chunk, value)
    * bucket ledger BEFORE the join is the candidate volume the verify
    * stage will pay — sum n*(n-1)/2 must stay ~linear in the replica
    * count and the hottest bucket bounded, or the 8-bit pigeonhole has
    * collapsed (the text-LSH r8 failure mode).
    */
  private def phashLeg(reps: Int): Unit = {
    val spark = graft.engine.Sessions.local(32, "graft-stress-phash")
    val src = "/root/testdata/sf0.1"
    val dir = Files.createTempDirectory("graft_phash_").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phash] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    // replicas 3+ suffix EVERY word with the replica marker, so each
    // replica's 64-bin histograms redistribute independently (the
    // pHash analogue of the text leg's disjoint shingle spaces) while
    // within-replica near-dup structure is preserved; replicas 0-2 stay
    // verbatim -> 5,000 exact-dup triples at hamming 0
    val nDocs = t(s"synthesize ${reps}x corpus") {
      graft.engine.Tables.documents(spark, src)
        .crossJoin(spark.range(reps.toLong).toDF("rep"))
        .selectExpr(
          "doc_id * 1000 + rep AS doc_id",
          """CASE WHEN rep < 3 THEN text
             ELSE regexp_replace(text, '(\\S+)', concat('$1r', CAST(rep AS STRING))) END AS text""",
          "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.read.parquet(s"$dir/documents.parquet").count()
    }
    println(s"[phash] corpus: $nDocs payloads")

    val hashes = t("stage 1: staged 63-bit pHash") {
      val h = graft.queries.TextOps.phashHashes(spark, dir).localCheckpoint()
      h.count()
      h
    }
    // ledger BEFORE the cap (what a naive pigeonhole would pay) and the
    // CAPPED index the verify stage actually joins — the delta is the
    // stop-chunk cap's work
    val (rawCand, rawMax) = t("stage 2a: raw chunk-bucket ledger") {
      val r = graft.queries.TextOps.phashChunks(hashes)
        .groupBy(col("c"), col("ck")).agg(count(lit(1)).as("n_docs"))
        .agg(sum(expr("n_docs * (n_docs - 1) div 2")).as("cand"),
          max(col("n_docs")).as("mx")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val (nBuckets, candidates, maxBucket) = t("stage 2b: capped index ledger") {
      val r = graft.queries.TextOps.phashIndexChunks(hashes)
        .groupBy(col("c"), col("ck")).agg(count(lit(1)).as("n_docs"))
        .agg(count(lit(1)).as("buckets"),
          sum(expr("n_docs * (n_docs - 1) div 2")).as("cand"),
          max(col("n_docs")).as("mx")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    println(s"[phash] raw: candidates=$rawCand max_bucket=$rawMax | capped: " +
      s"buckets=$nBuckets candidates=$candidates max_bucket=$maxBucket")
    val nPairs = t("stage 3: verified pairs (hamming <= 7)") {
      graft.queries.TextOps.phashPairsAll(hashes).count()
    }
    println(s"[phash] verified_pairs=$nPairs")

    // accounting: 5,000 verbatim triples -> >= 15,000 hamming-0 pairs;
    // capped candidate volume within the cap's LINEAR guarantee (each
    // payload's 8 chunks contribute < MaxChunkDocFreq/2 candidates
    // apiece), hottest surviving bucket <= the cap
    val ok = nDocs == 5000L * reps && nPairs >= 15000 &&
      candidates <= 4L * graft.queries.TextOps.MaxChunkDocFreq * nDocs &&
      maxBucket <= graft.queries.TextOps.MaxChunkDocFreq
    println(s"[phash] docs=$nDocs candidates=$candidates pairs=$nPairs " +
      s"cand_per_doc=${candidates / math.max(nDocs, 1)} => " +
      (if (ok) "OK" else "UNEXPECTED"))
    graft.engine.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
