package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dup-heavy dedup stress: synthesizes a 125k-document corpus (25
  * replicas of the 5,000 sf0.1 documents; replicas 0-2 VERBATIM — 5,000
  * exact-dup clusters of size 3 — and replicas 3-24 token-marked so
  * their shingle sets are disjoint across replicas), writes it in the
  * testdata layout, and runs the declared MinHash pair +
  * connected-components cluster queries over it unchanged.
  *
  * Measured (local[32]): 125,000 docs -> 22,907 verified pairs in ~76 s,
  * 9,857 duplicate clusters / 25,443 member docs (max cluster 12) in
  * ~123 s end-to-end — 25x the bench corpus with dup-heavy LSH buckets,
  * no quadratic blow-up.
  *
  * This is the adversarial shape for shingle LSH — every band bucket that
  * holds a dup cluster is hit 3+ times — and the design claims it checks:
  * candidate-restricted Jaccard verification (never all co-shingled
  * pairs) and the aggregate+anti-join doc-frequency cap keep the pair
  * stage linear in candidates, and cluster labels converge in 2-3 rounds
  * on near-clique components.
  *
  * Usage: sbt "runMain graft.StressCheck" (prints timings + counts; not
  * part of the bench contract).
  */
object StressCheck {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("stream")) {
      streamLeg(args.lift(1).map(_.toInt).getOrElse(1000000))
      return
    }
    if (args.headOption.contains("order")) {
      orderLeg(args.lift(1).map(_.toInt).getOrElse(10000000))
      return
    }
    if (args.headOption.contains("compact")) {
      compactLeg(args.lift(1).map(_.toInt).getOrElse(240))
      return
    }
    if (args.headOption.contains("bitext")) {
      bitextLeg(args.lift(1).map(_.toInt).getOrElse(25000))
      return
    }
    if (args.headOption.contains("amplify")) {
      amplifyLeg(args.lift(1).map(_.toInt).getOrElse(240))
      return
    }
    val spark = graft.engine.Sessions.local(32, "graft-stress")
    val src = "/root/testdata/sf0.1"
    val dir = Files.createTempDirectory("graft_stress_").toString
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val nDocs = t("synthesize 25x corpus") {
      val docs = graft.engine.Tables.documents(spark, src)
        .crossJoin(spark.range(25).toDF("rep"))
        .selectExpr(
          "doc_id * 100 + rep AS doc_id",
          // reps 0-2 verbatim (exact dup cluster of 3); reps 3+ get a
          // per-replica marker token between every word, so their
          // shingles are disjoint from every other replica
          """CASE WHEN rep < 3 THEN text
             ELSE regexp_replace(text, ' ', concat(' r', CAST(rep AS STRING), ' ')) END AS text""",
          "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      spark.read.parquet(s"$dir/documents.parquet").count()
    }
    println(s"[stress] corpus: $nDocs docs")

    val pairs = t("dedup_minhash_pairs") {
      SparkEntry.queries("dedup_minhash_pairs")(spark, dir).count()
    }
    spark.catalog.clearCache()
    val clusters = t("dedup_clusters") {
      val labels = SparkEntry.queries("dedup_clusters")(spark, dir).persist()
      val members = labels.count()
      val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_clusters"), max(col("sz")).as("max_sz"))
        .collect().head
      println(s"[stress] members=$members clusters=${sizes.getLong(0)} max_cluster=${sizes.getLong(1)}")
      sizes.getLong(0)
    }
    // centrality at stress scale: 3-round integer PageRank over the
    // 22.9k-pair graph — bounded-iteration like CC, one shuffle per
    // round, plan-truncated; proves the iterative op family holds on the
    // dup-heavy 25x graph, not just the 500-pair bench graph
    val edges = t("materialize stress edge list") {
      val e = SparkEntry.queries("dedup_minhash_pairs")(spark, dir)
        .select(col("doc_a"), col("doc_b")).persist()
      e.count()
      e
    }
    t("graph_pagerank (stress graph, 3 rounds)") {
      val pr = graft.engine.ops.PageRank.run(edges, iters = 3)
      println(s"[stress] pagerank vertices=${pr.count()}")
    }
    edges.unpersist()
    spark.catalog.clearCache()
    // training-sample fanout at stress scale: the generate+explode
    // chunker over the 125k-doc corpus (~10x the longest replica texts
    // thanks to the marker tokens) — proves the row-local fanout stays
    // a narrow map with no memory blow-up at 25x corpus size
    val chunks = t("chunk_documents (125k docs)") {
      SparkEntry.queries("chunk_documents")(spark, dir).count()
    }
    println(s"[stress] chunks=$chunks")
    spark.catalog.clearCache()
    // chunk -> pack as ONE composed pass (the trainer-feed shape): the
    // 125k-doc corpus fans out through the row-local chunker and the
    // chunks pack straight into 4096-char bins per shard — no
    // materialization between the stages, one window shuffle on the
    // shard key. Bin accounting (chunks in ≈ sum of bin membership)
    // proves nothing quadratic appears between the generate and the
    // running-sum.
    val packedBins = t("chunk->pack composed (125k docs)") {
      val ch = graft.engine.ops.Chunk
        .chunks(spark.read.parquet(s"$dir/documents.parquet"))
        .selectExpr("doc_id", "chunk_idx",
          "CAST(length(chunk) AS BIGINT) AS n_chars",
          "CAST(doc_id % 32 AS BIGINT) AS shard")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val bins = ch
        .withColumn("before", coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .withColumn("bin", (col("before") / lit(4096L)).cast("long"))
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_chars")).as("bin_chars"))
        .persist()
      val nBins = bins.count()
      val packedChunks = bins.agg(sum(col("n_chunks"))).collect().head.getLong(0)
      println(s"[stress] packed_chunks=$packedChunks bins=$nBins")
      bins.unpersist()
      nBins
    }
    spark.catalog.clearCache()
    // curation hygiene ops at 125k docs: decontamination (broadcast
    // bench-shingle semi-join — candidates ARE the output rows) and
    // containment pairs (same banded-minhash candidate restriction as
    // the pair queries above) run UNCHANGED over the stress corpus.
    val decontam = t("dedup_decontam (125k docs)") {
      SparkEntry.queries("dedup_decontam")(spark, dir).count()
    }
    spark.catalog.clearCache()
    val containment = t("dedup_containment_pairs (125k docs)") {
      SparkEntry.queries("dedup_containment_pairs")(spark, dir).count()
    }
    println(s"[stress] decontam_docs=$decontam containment_pairs=$containment")
    spark.catalog.clearCache()
    // incremental dedup at 25x: the 5,000 rep-0 verbatim docs play the
    // incoming crawl batch (doc_id % 100 = rep), probing the 120k-doc
    // remainder as the existing-corpus LSH index. Every incoming doc has
    // two verbatim copies (reps 1, 2) in the index, so the expected
    // outcome is exact: 5,000 'dup' verdicts at jacc 1.0 — and the
    // candidate join stays incoming x collisions (never incoming x
    // incoming), which is the contract the declared query documents.
    val incDups = t("dedup_incremental (5k incoming vs 120k index)") {
      val v = graft.queries.Dedup.incrementalVerdicts(spark, dir,
        "doc_id % 100 = 0", "doc_id % 100 <> 0").persist()
      val n = v.count()
      val dups = v.where("verdict = 'dup'").count()
      println(s"[stress] incremental: incoming=$n dups=$dups")
      v.unpersist()
      dups
    }
    spark.catalog.clearCache()
    // vector ops at 25x: a 50k-vector corpus (25 deterministically
    // perturbed replicas of the 2k sf0.1 embeddings — replica r shifts
    // dimension r%dim by r*1e-3, keeping replicas of one vector true
    // near-dups and replicas of different vectors apart), then the
    // WIDE-BAND variant of the near-dup query (the corpus-size dial)
    // and the unchanged IVF top-k query run over it. Proves the
    // candidate-restricted band join and the cell-keyed IVF shuffle
    // hold at 25x the bench vector corpus — no all-pairs blow-up, no
    // skewed cell.
    // The 50k replica corpus lives in its OWN dir (not $dir): $dir is the
    // shared 125k-document stress dataset, and writing embeddings into it
    // would silently point any later doc+vector stage at the replica
    // corpus — the vector stages below take vecDir explicitly instead.
    val vecDir = s"$dir/vec50k"
    val nVecs = t("synthesize 25x embeddings") {
      graft.engine.Tables.embeddings(spark, src)
        .crossJoin(spark.range(25).toDF("rep"))
        .selectExpr(
          // rep-0 originals keep ids 0..1999: sim_ivf_topk selects its
          // centroids (vec_id < 8) and queries (vec_id < 20) by id, so
          // the id encoding must leave the ORIGINAL distinct vectors
          // there — vec_id*100+rep would hand it 8 near-identical
          // replicas of vector 0 as the codebook (degenerate cells)
          "rep * 2000 + vec_id AS vec_id",
          """transform(embedding,
               (v, i) -> CAST(v + CASE WHEN i = rep % size(embedding)
                 THEN rep * 0.001 ELSE 0.0 END AS FLOAT)) AS embedding""",
          "label")
        .write.mode("overwrite").parquet(s"$vecDir/embeddings.parquet")
      spark.read.parquet(s"$vecDir/embeddings.parquet").count()
    }
    // The 4-bit bands the 2k-vector declared query uses degrade
    // quadratically at 50k (16 keys/band -> ~3.1k vectors/bucket ->
    // ~156M candidates; measured 1073s) — which is exactly the dial the
    // query documents. The scale config widens the bands: 16 planes x 2
    // bands = 65k keys/band, so candidates collapse to the true
    // near-dup replicas and the same plan verifies them in seconds.
    val annPairs = t("banded near-dup, 16-plane bands (50k vectors)") {
      graft.queries.Similarity.bandedNearDupPairs(
        spark.read.parquet(s"$vecDir/embeddings.parquet"),
        planesPerBand = 16, bands = 2, threshold = 0.9).count()
    }
    val ivfRows = t("sim_ivf_topk (50k vectors)") {
      SparkEntry.queries("sim_ivf_topk")(spark, vecDir).count()
    }
    println(s"[stress] vectors=$nVecs ann_pairs=$annPairs ivf_rows=$ivfRows")
    spark.catalog.clearCache()
    // trained-codebook IVF at 50k: recall@3 of the fixed-seed codebook vs
    // the 2-round k-means-trained codebook, both against brute-force
    // ground truth for the 20 declared queries. The trained quantizer
    // must not LOSE recall — the point of wiring the training loop into
    // the probe path.
    val (recallFixed, recallTrained) = t("sim_ivf_trained recall audit (50k vectors)") {
      import org.apache.spark.sql.expressions.Window
      val e50 = spark.read.parquet(s"$vecDir/embeddings.parquet")
      val q = e50.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val n = e50.select(col("vec_id").as("vid"), col("embedding").as("nv"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
      val gt = broadcast(q).join(n, expr("qid <> vid"))
        .withColumn("cos",
          expr("graft_dot(qv, nv) / (sqrt(graft_dot(qv, qv)) * sqrt(graft_dot(nv, nv)))"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3).select(col("qid"), col("vid")).persist()
      val gtN = gt.count()
      def hits(name: String): Long =
        gt.join(SparkEntry.queries(name)(spark, vecDir)
          .select(col("qid"), col("vid")), Seq("qid", "vid")).count()
      val hf = hits("sim_ivf_topk")
      val ht = hits("sim_ivf_trained")
      gt.unpersist()
      println(s"[stress] ivf_recall@3: fixed=$hf/$gtN trained=$ht/$gtN")
      (hf, ht)
    }
    spark.catalog.clearCache()
    // PQ at 50k vectors: the compressed-search path must run at 25x the
    // bench corpus with the same plan (broadcast codebooks + broadcast
    // ADC tables, codes-only shuffle) and return a full top-3 per query
    // — the quantizer is fit on the replica corpus, searched in place.
    val pqRows = t("sim_pq_adc (50k vectors)") {
      SparkEntry.queries("sim_pq_adc")(spark, vecDir).count()
    }
    println(s"[stress] pq_rows=$pqRows")
    spark.catalog.clearCache()
    // binary-quantization retrieval at 50k vectors: the packed-word
    // Hamming scan (20 queries x 50k corpus = 1M codegen'd bit_count
    // rows) + exact rerank must hold its 5-rows-per-query contract at
    // 25x the bench corpus — the memory-bound ANN path whose whole point
    // is surviving corpus growth the float scan cannot.
    val bqRows = t("sim_binary_quantize (50k vectors)") {
      SparkEntry.queries("sim_binary_quantize")(spark, vecDir).count()
    }
    println(s"[stress] bq_rows=$bqRows")
    spark.catalog.clearCache()
    // int8 scalar quantization at 50k vectors: train (one 64-group
    // aggregate) + decode-and-scan shortlist + exact rerank must keep
    // the broadcast-queries x one-corpus-scan shape at 50x bench scale.
    val sqRows = t("sim_scalar_quantize (50k vectors)") {
      SparkEntry.queries("sim_scalar_quantize")(spark, vecDir).count()
    }
    println(s"[stress] sq_rows=$sqRows")
    spark.catalog.clearCache()
    // k-center seeding at 50k vectors: 4 sequential rounds, each ONE
    // corpus scan + a TakeOrdered argmax — the declarative greedy loop
    // must not degrade to driver-side iteration at corpus scale.
    val kcRows = t("sim_kcenter_init (50k vectors)") {
      SparkEntry.queries("sim_kcenter_init")(spark, vecDir).count()
    }
    println(s"[stress] kcenter_rows=$kcRows")
    spark.catalog.clearCache()
    // edit-distance blocking at 125k docs: the quadratic Levenshtein is
    // only viable if the (prefix, length-band) blocks STAY bounded as
    // the corpus grows 25x — log the max block so a degenerate key
    // (template corpora) would show up here before it bites at 100 TB.
    val (edPairs, maxBlock) = t("dedup_editdist_pairs blocking (125k docs)") {
      val p = SparkEntry.queries("dedup_editdist_pairs")(spark, dir).count()
      val mb = graft.engine.Tables.documents(spark, dir)
        .selectExpr("substring(lower(text), 1, 12) AS pfx", "n_chars div 16 AS band")
        .groupBy("pfx", "band").count()
        .agg(max("count")).collect().head.getLong(0)
      (p, mb)
    }
    println(s"[stress] editdist_pairs=$edPairs max_block=$maxBlock")
    spark.catalog.clearCache()
    // winnowing at 125k docs (marker-token replicas make the texts ~2x
    // the bench corpus): the O(len * w) row-local fingerprint selection
    // must stay a narrow map — no explode, no shuffle, memory flat.
    val winnowed = t("text_winnow_fingerprint (125k docs)") {
      SparkEntry.queries("text_winnow_fingerprint")(spark, dir).count()
    }
    println(s"[stress] winnowed_docs=$winnowed")
    spark.catalog.clearCache()
    // SemDeDup at 50k vectors: the declared k=8 codebook would put ~6k
    // vectors in every cell (~156M within-cell candidates — the same
    // quadratic cliff the 4-bit LSH bands hit above). The published fix
    // is the k dial: k=256 keeps cells ~200 wide, so candidates collapse
    // ~30x while the plan — broadcast centroids, cell-keyed equi-join —
    // is unchanged. Log the candidate accounting so a regression that
    // silently fattens cells shows up in the stress transcript.
    val semdedup = t("semdedup ledger, k=256 (50k vectors)") {
      val ledger = graft.queries.Similarity.semdedupLedger(
        spark.read.parquet(s"$vecDir/embeddings.parquet"), k = 256, tau = 0.3)
        .persist()
      val agg = ledger.selectExpr(
        "count(1) AS cells",
        "sum(n_vectors * (n_vectors - 1) div 2) AS candidates",
        "max(n_vectors) AS max_cell",
        "sum(n_dropped) AS dropped").collect().head
      println(s"[stress] semdedup: cells=${agg.getLong(0)} " +
        s"candidates=${agg.getLong(1)} max_cell=${agg.getLong(2)} " +
        s"dropped=${agg.getLong(3)}")
      val d = agg.getLong(3)
      ledger.unpersist()
      d
    }
    println(s"[stress] semdedup_dropped=$semdedup")
    spark.catalog.clearCache()
    // exactness audit: the unrestricted all-pairs Jaccard baseline (too
    // expensive to DECLARE — quadratic in co-shingled pairs — but the
    // ground truth the candidate-restricted production path must match).
    // Run at sf0.01 full-corpus; any >=threshold pair LSH banding missed
    // shows up as a nonzero miss count.
    val missed = t("exact-vs-LSH recall audit (sf0.01)") {
      val sf = "/root/testdata/sf0.01"
      val exact = graft.queries.Dedup.jaccardAllPairs(spark, sf)
        .where("jacc >= 0.5").select(col("doc_a"), col("doc_b"))
      val lsh = SparkEntry.queries("dedup_minhash_pairs")(spark, sf)
        .select(col("doc_a"), col("doc_b"))
      val m = exact.exceptAll(lsh).count()
      println(s"[stress] exact_pairs=${exact.count()} lsh_missed=$m")
      m
    }
    println(s"[stress] pairs=$pairs clusters=$clusters missed=$missed => " +
      (if (pairs >= 6000 && clusters >= 1900 && missed == 0 && chunks >= nDocs &&
        nVecs == 50000 && annPairs >= 500000 && ivfRows >= 50 &&
        packedBins >= 1 && decontam >= 1 && containment >= 1 &&
        recallTrained >= recallFixed && pqRows == 30 && incDups == 5000 &&
        bqRows == 100 && winnowed >= nDocs - 25 &&
        sqRows == 100 && kcRows == 4 && maxBlock <= 100)
        "OK" else "UNEXPECTED"))
    graft.engine.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }

  /** Distributed-global-order stress leg (`runMain graft.StressCheck
    * order [n]`, default 10M rows): the scale evidence for the r9
    * GlobalOrder rework — rank a 10M-row ZIPF-CLUSTERED key frame (90%
    * of rows inside 100 adjacent values of a 1e12 span, the shape that
    * defeats span bucketing) three ways and compare:
    *
    *   1. the single-task global window (what the rewired queries used
    *      to do — every row through ONE task);
    *   2. GlobalOrder.rowNumber (bucketed two-pass, two-level
    *      equalized);
    *   3. GlobalOrder.ntileCol (the quintile shape RFM runs).
    *
    * Reports wall times, the speedup, the per-bucket balance ledger
    * (hottest bucket share vs the 90% cluster), and asserts the
    * distributed ranks are VALUE-IDENTICAL to the window's on a
    * deterministic row sample.
    */
  private def orderLeg(n: Int): Unit = {
    val spark = graft.engine.Sessions.local(32, "graft-stress-order")
    def t[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[order] $name: $sec%.1f s"); (r, sec)
    }
    val df = spark.range(n.toLong).selectExpr("id",
      """CASE WHEN id % 10 != 0
           THEN (id * 2654435761) % 100
           ELSE (id * 2654435761) % 1000000000000 END AS k""")
      .localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    // warmup: compile the codegen shapes once at 1% scale so the timed
    // legs measure steady-state execution, not Janino
    graft.engine.ops.GlobalOrder
      .rowNumber(df.where(col("id") % 100 === 0), col("k"), Seq(col("id")), "rn")
      .count()
    val (windowSample, winSec) = t("single-task global window rank") {
      df.withColumn("rn", row_number().over(
          Window.orderBy(col("k"), col("id"))).cast("long"))
        .where(col("id") % 99991 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    val (distSample, distSec) = t("GlobalOrder.rowNumber (distributed)") {
      graft.engine.ops.GlobalOrder.rowNumber(df, col("k"), Seq(col("id")), "rn")
        .where(col("id") % 99991 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    val identical = windowSample == distSample
    val (_, ntileSec) = t("GlobalOrder.ntileCol(5)") {
      graft.engine.ops.GlobalOrder
        .ntileCol(df, 5, col("k"), Seq(col("id")), "q")
        .groupBy(col("q")).count().collect()
    }
    val counts = graft.engine.ops.GlobalOrder.bucketCounts(df, col("k"))
      .collect().map(r => r.getLong(1))
    val maxShare = counts.max.toDouble / n
    println(f"[order] balance: buckets=${counts.length} " +
      f"hottest=${counts.max} (${maxShare * 100}%.1f%% of rows; the " +
      f"zipf cluster holds 90%%)")
    println(f"[order] n=$n window=$winSec%.1f s distributed=$distSec%.1f s " +
      f"(${winSec / distSec}%.2fx) ntile5=$ntileSec%.1f s " +
      s"values_identical=$identical => " +
      (if (identical && maxShare < 0.25) "OK" else "UNEXPECTED"))
    spark.stop()
  }

  /** LSH-bucketed margin-bitext leg (`runMain graft.StressCheck bitext
    * [nPerSide]`, default 25k/side): drives the SAME plan the declared
    * sim_margin_bitext gates since r14 (Similarity.marginBitextLshPairs
    * — banded-LSH candidates, candidate-restricted neighborhood sums)
    * at the wide-band dial (16 planes x 4 bands) and a scale where the
    * exact product (625M pairs) is off the table, on a corpus with
    * known ground truth: the b-side is the a-side under a tiny
    * deterministic perturbation, so a_i's true partner is b-side id
    * i + 10M. Asserts candidates stay near-linear (the scale claim) and
    * mutual-best recall against the constructed truth stays high (the
    * quality claim).
    */
  private def bitextLeg(nPerSide: Int): Unit = {
    val spark = graft.engine.Sessions.local(32, "graft-stress-bitext")
    val src = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bitext] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val reps = math.max(1, (nPerSide + 1999) / 2000)
    // a-side: `reps` deterministically distinct replicas of the 2k
    // corpus (rep r shifts dimension r%dim by r*2e-3 — replicas of one
    // original stay NEAR each other, the realistic hubness shape that
    // makes plain-cosine mining fail and margin mining the right tool)
    val a = graft.engine.Tables.embeddings(spark, src)
      .crossJoin(spark.range(reps).toDF("rep"))
      .selectExpr("rep * 2000 + vec_id AS vec_id",
        """transform(embedding, (v, i) -> CAST(v + CASE
             WHEN i = rep % size(embedding) THEN rep * 0.002
             ELSE 0.0 END AS FLOAT)) AS embedding""")
      .where(col("vec_id") < nPerSide)
    // b-side: the a-side under a tiny fixed perturbation (the "other
    // language's" translation), ids offset by 10M
    val b = a.selectExpr("vec_id + 10000000 AS vec_id",
      """transform(embedding, (v, i) -> CAST(v + CASE
           WHEN i = 7 THEN 0.0005 ELSE 0.0 END AS FLOAT)) AS embedding""")
    val mined = t(s"marginBitextLshPairs ($nPerSide x $nPerSide, 16-plane x 4 bands)") {
      val m = graft.queries.Similarity
        .marginBitextLshPairs(a, b, planesPerBand = 16, bands = 4).persist()
      m.count()
      m
    }
    val total = mined.count()
    val correct = mined.where(col("b_id") === col("a_id") + 10000000L).count()
    val aboveMargin = mined.where(col("margin_e6") > 1000000L).count()
    mined.unpersist()
    graft.queries.Persisted.drain()
    val recall = correct.toDouble / nPerSide
    println(f"[bitext] mutual-best pairs=$total correct=$correct " +
      f"(recall=$recall%.3f of $nPerSide truths), margin>1: $aboveMargin")
    println(s"[bitext] exact product would be ${nPerSide.toLong * nPerSide} pairs => " +
      (if (recall >= 0.95 && total <= 2L * nPerSide) "OK" else "UNEXPECTED"))
    spark.stop()
  }

  /** Bronze-maintenance leg (`runMain graft.StressCheck compact
    * [nBatches]`, default 240): the small-files death a per-micro-batch
    * append guarantees at stream lifetime (the maintenance gap the
    * reference README names at /root/reference/README.md:74-80), and
    * the r13 fix measured. Writes `nBatches` tiny committed batches
    * (each one commit: data dir + ledger + log line + sidecar),
    * measures the full-read and manifest-planned-read cost over the
    * fragmented table, runs compactBatches + expireSnapshots(1), and
    * re-measures. Asserts: checksum-identical rows before/after, file
    * count collapses, and the expired history throws instead of lying.
    */
  private def compactLeg(nBatches: Int): Unit = {
    val spark = graft.engine.Sessions.local(32, "graft-stress-compact")
    val root = Files.createTempDirectory("graft_compact_")
    val dir = root.toString + "/bronze"
    val sink = new graft.engine.sinks.EvolvingTableSink(dir)
    def t[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[compact] $name: $sec%.1f s"); (r, sec)
    }
    t(s"write $nBatches tiny committed batches") {
      for (i <- 0 until nBatches)
        sink.write(spark.range(i * 10L, i * 10L + 10L).selectExpr(
          "id",
          "CAST(timestamp'2024-01-01 00:00:00' + make_dt_interval(0, CAST(id % 72 AS INT), 0, 0) AS timestamp) AS event_timestamp",
          "CAST(id % 1000 AS BIGINT) AS qty").coalesce(1), batchId = i)
    }
    def parquetFiles(): Long = {
      val w = Files.walk(java.nio.file.Paths.get(dir))
      try w.filter(f => f.getFileName.toString.endsWith(".parquet") &&
        !f.toString.contains("_manifest")).count()
      finally w.close()
    }
    def checksum(): (Long, Long) = {
      val r = sink.read(spark)
        .agg(count(lit(1)), expr("bit_xor(xxhash64(id, qty))")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val filesBefore = parquetFiles()
    // min-of-2: first read pays footer/listing caches either side would
    val (before, _) = t("full read over fragmented table (run 2)") {
      checksum(); checksum()
    }
    val (planBefore, _) = t("manifest-planned read (fragmented)") {
      val (df, total, kept) = sink.prunedRead(spark, Seq(("qty", 100L, 199L)))
      (df.count(), total, kept)
    }
    val (_, compactSec) = t("compactBatches(clusterBy=qty) + expireSnapshots(1)") {
      // clustered rewrite (Iceberg sort-order): per-file qty bounds stay
      // narrow, so the ledger keeps skipping files AFTER compaction too
      sink.compactBatches(spark, clusterBy = Seq("qty"))
      sink.expireSnapshots(keepLast = 1)
    }
    val filesAfter = parquetFiles()
    val (after, readAfterSec) = t("full read over compacted table (run 2)") {
      checksum(); checksum()
    }
    val (planAfter, planAfterSec) = t("manifest-planned read (compacted)") {
      val (df, total, kept) = sink.prunedRead(spark, Seq(("qty", 100L, 199L)))
      (df.count(), total, kept)
    }
    val expiredThrows =
      try { sink.readAsOf(spark, 2); false }
      catch { case _: IllegalStateException => true }
    println(s"[compact] files: $filesBefore -> $filesAfter; " +
      s"ledgered plan rows: ${planBefore._1} -> ${planAfter._1} " +
      s"(files ${planBefore._3}/${planBefore._2} -> ${planAfter._3}/${planAfter._2}); " +
      f"maintenance cost $compactSec%.1f s, post read $readAfterSec%.1f s, " +
      f"post plan $planAfterSec%.1f s")
    val ok = before == after && planBefore._1 == planAfter._1 &&
      filesAfter * 5 <= filesBefore && expiredThrows &&
      planAfter._3 < planAfter._2
    println(s"[compact] rows_identical=${before == after} " +
      s"pruned_identical=${planBefore._1 == planAfter._1} " +
      s"files_collapsed=${filesAfter * 5 <= filesBefore} " +
      s"expired_throws=$expiredThrows " +
      s"still_skips_after_compaction=${planAfter._3 < planAfter._2} => " +
      (if (ok) "OK" else "UNEXPECTED"))
    graft.engine.util.Fs.deleteRecursively(root)
    spark.stop()
  }

  /** Write-amplification leg (`runMain graft.StressCheck amplify
    * [nBatches]`, default 240): the r13 verdict's top finding measured.
    * A long-lived stream with recurring in-line maintenance runs the
    * SAME 240-tiny-batch ingest twice — once with the r13 full rewrite
    * (every tick re-compacts the whole visible table, including the
    * previous tick's output: O(T²/N) bytes over the stream lifetime)
    * and once with the r14 incremental mode (size-thresholded +
    * day-granular: a tick rewrites only new small dirs of still-active
    * days). Ticks fire every 10 committed batches, event days roll
    * every 48 batches (5 days over the default run), expiry keeps the
    * last snapshot. Reports data bytes appended vs bytes rewritten by
    * maintenance; asserts the incremental mode's amplification is
    * small and BOUNDED (per-day, not per-table) while the full rewrite
    * grows with table size.
    */
  private def amplifyLeg(nBatches: Int): Unit = {
    val spark = graft.engine.Sessions.local(32, "graft-stress-amplify")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[amplify] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    def bytesUnder(p: java.nio.file.Path): Long =
      if (!Files.isDirectory(p)) 0L
      else {
        val w = Files.walk(p)
        try w.filter(f => Files.isRegularFile(f)).mapToLong(f => Files.size(f)).sum()
        finally w.close()
      }
    def run(incremental: Boolean): (Long, Long, Long) = {
      val root = Files.createTempDirectory("graft_amp_")
      val dir = root.toString + "/bronze"
      val sink = new graft.engine.sinks.EvolvingTableSink(dir)
      def rewriteDirs(): Map[Long, Long] = {
        val d = new java.io.File(dir).listFiles()
        if (d == null) Map.empty
        else d.toSeq.flatMap { f =>
          val n = f.getName
          if (n.startsWith("_batch_id=-"))
            Some(n.stripPrefix("_batch_id=").toLong -> bytesUnder(f.toPath))
          else None
        }.toMap
      }
      var dataBytes = 0L
      var rewriteBytes = 0L
      for (i <- 0 until nBatches) {
        sink.write(spark.range(i * 10L, i * 10L + 10L).selectExpr(
          "id",
          s"CAST(timestamp'2024-01-01 00:00:00' + make_dt_interval(${i / 48}, 0, CAST(id % 1440 AS INT), 0) AS timestamp) AS event_timestamp",
          "CAST(id % 1000 AS BIGINT) AS qty").coalesce(1), batchId = i)
        dataBytes += bytesUnder(java.nio.file.Paths.get(dir, s"_batch_id=$i"))
        if ((i + 1) % 10 == 0) {
          val before = rewriteDirs().keySet
          if (incremental)
            sink.compactBatches(spark, targetBytes = 8192, byDay = true)
          else
            sink.compactBatches(spark)
          rewriteBytes += rewriteDirs()
            .filterNot { case (id, _) => before.contains(id) }.values.sum
          sink.expireSnapshots(keepLast = 1)
        }
      }
      val rows = sink.read(spark).count()
      graft.engine.util.Fs.deleteRecursively(root)
      (dataBytes, rewriteBytes, rows)
    }
    val (dataFull, rwFull, rowsFull) = t(s"$nBatches batches, FULL rewrite per tick") {
      run(incremental = false)
    }
    val (dataInc, rwInc, rowsInc) = t(s"$nBatches batches, INCREMENTAL rewrite per tick") {
      run(incremental = true)
    }
    val ampFull = rwFull.toDouble / dataFull
    val ampInc = rwInc.toDouble / dataInc
    println(f"[amplify] full:        data=${dataFull / 1024}%d KiB rewritten=${rwFull / 1024}%d KiB amplification=$ampFull%.1fx")
    println(f"[amplify] incremental: data=${dataInc / 1024}%d KiB rewritten=${rwInc / 1024}%d KiB amplification=$ampInc%.1fx")
    val ok = rowsFull == nBatches * 10L && rowsInc == rowsFull &&
      ampInc <= 4.0 && ampFull >= 2 * ampInc
    println(s"[amplify] rows_identical=${rowsInc == rowsFull} " +
      f"incremental_bounded=${ampInc <= 4.0} full_grows=${ampFull >= 2 * ampInc} => " +
      (if (ok) "OK" else "UNEXPECTED"))
    spark.stop()
  }

  /** Streaming scale-out throughput leg (`runMain graft.StressCheck
    * stream [nEvents]`, default 1M): the THROUGHPUT half of
    * StatePartitionDialSpec's semantics half — that spec proves the
    * gated output is identical at 1 vs 8 state partitions; this leg
    * measures what the dial BUYS, at a volume where state-store work
    * dominates, and re-asserts output identity at the same time.
    *
    * Leg A drives the full StreamProcessor (parse -> route ->
    * EvolvingTableSink bronze + dead-letter parquet, checkpointed;
    * reference: src/consumer/stream_processor.py:24-167) over
    * executor-generated raw batch files, reporting end-to-end events/s
    * and the T7 progress telemetry fields the reference logs
    * (stream_processor.py:137-144). The parse->route path is stateless
    * and narrow, so its throughput is partition-count independent — the
    * baseline the stateful leg is read against.
    *
    * Leg B runs a watermarked dropDuplicatesWithinWatermark over the
    * same volume — every event a DISTINCT key, so the state store holds
    * nEvents rows by end-of-run (the adversarial shape for state
    * throughput) — once with 1 state partition and once with 8,
    * reporting wall time, events/s, and the per-run state-store time
    * (sum of allUpdatesTimeMs + commitTimeMs over all micro-batches /
    * stateful operators). The two runs' outputs must be checksum-equal:
    * partition count is a throughput dial, never a semantics dial.
    */
  private def streamLeg(nEvents: Int): Unit = {
    val spark = graft.engine.Sessions.local(32, "graft-stress-stream")
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_sstream_").toString
    def t[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sstream] $name: $sec%.1f s"); (r, sec)
    }

    // ---- leg A: StreamProcessor end-to-end ----
    val perBatch = 1000
    val nBatches = math.max(nEvents / perBatch, 1)
    t(s"generate $nBatches raw batch files (executor-side)") {
      spark.range(nBatches)
        .map(i => new graft.fixtures.EventGen(seed = 5000L + i,
          corruptionChance = 0.05, invalidSchemaChance = 0.05).nextBatch(perBatch))
        .toDF("value").repartition(64)
        .write.text(s"$dir/raw")
    }
    val proc = new graft.engine.stream.StreamProcessor(
      new graft.engine.sinks.EvolvingTableSink(s"$dir/bronze"),
      new graft.engine.sinks.ParquetAppendSink(s"$dir/dead"),
      checkpointLocation = s"$dir/ckpt",
      trigger = Trigger.AvailableNow())
    val (_, procSec) = t(s"StreamProcessor ${nBatches * perBatch} events") {
      val q = proc.start(spark.readStream
        .option("maxFilesPerTrigger", 16).text(s"$dir/raw"))
      q.awaitTermination()
      proc.progressSummary(q).foreach(s => println(s"[sstream] $s"))
    }
    val (valid, dead) = proc.lastBatchCounts
    println(f"[sstream] StreamProcessor: ${nBatches * perBatch / procSec}%.0f events/s " +
      s"(last batch valid=$valid dead=$dead)")

    // ---- leg B: stateful dedup, 1 vs 8 state partitions ----
    t("generate event parquet") {
      spark.range(nEvents.toLong).selectExpr(
        "CAST(timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, id % 86400) AS timestamp) AS ts",
        "concat('e', CAST(id AS STRING)) AS event_id",
        "CAST(id % 97 AS BIGINT) AS user_id")
        .repartition(32).write.mode("overwrite").parquet(s"$dir/events")
    }
    val schema = spark.read.parquet(s"$dir/events").schema
    val results = for (parts <- Seq(1, 8)) yield {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val out = s"$dir/out$parts"
        val (_, sec) = t(s"dedup roundtrip @ $parts state partition(s)") {
          val q = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8).parquet(s"$dir/events")
            .withWatermark("ts", "48 hours")
            .dropDuplicatesWithinWatermark("event_id")
            .writeStream
            .option("checkpointLocation", s"$dir/ckpt$parts")
            .trigger(Trigger.AvailableNow())
            .format("parquet").option("path", out)
            .start()
          q.awaitTermination()
          val stateMs = q.recentProgress.toSeq
            .flatMap(_.stateOperators.toSeq)
            .map(so => so.allUpdatesTimeMs + so.commitTimeMs).sum
          val batches = q.recentProgress.length
          println(s"[sstream] parts=$parts micro_batches=$batches state_store_ms=$stateMs")
          stateMs
        }
        val chk = spark.read.parquet(out)
          .agg(count(lit(1)).as("n"),
            expr("bit_xor(xxhash64(event_id))").as("h"))
          .collect().head
        println(f"[sstream] parts=$parts wall=$sec%.1f s " +
          f"rate=${nEvents / sec}%.0f events/s rows=${chk.getLong(0)}")
        (parts, sec, chk.getLong(0), chk.getLong(1))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val Seq((_, s1, n1, h1), (_, s8, n8, h8)) = results
    val ok = n1 == nEvents.toLong && n8 == n1 && h8 == h1
    println(f"[sstream] dial: 1 -> 8 partitions speedup=${s1 / s8}%.2fx " +
      s"outputs_identical=${n8 == n1 && h8 == h1} => " +
      (if (ok) "OK" else "UNEXPECTED"))
    graft.engine.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    spark.stop()
  }
}
