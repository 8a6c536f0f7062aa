package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostics for LadderRecallSpec calibration (r17, verdict
  * #3): hamming histogram + old-4-chunk escape counts of the exact
  * simhash pair set, and the Jaccard distribution of the minhash
  * cluster-split pairs, at a k-times sf0.1 corpus.
  * Usage: runMain graft.tools.ProbeLadder [k]
  */
object ProbeLadder {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(5)
    val spark = graft.engine.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-ladder")
    val dir = java.nio.file.Files.createTempDirectory("graft_ladder_probe_").toString
    graft.engine.util.Fs.deleteOnExit(java.nio.file.Paths.get(dir))
    ScaleUpData.scaleDocuments(spark, "/root/testdata/sf0.1", dir, k)
    val n = graft.queries.Dedup.docN(spark, dir)
    val bits = graft.queries.Dedup.simhashBits(n)
    val ht = (3 * bits) / 32
    println(s"[ladder] n=$n bits=$bits ht=$ht")

    val sigRows = graft.SparkEntry.queries("dedup_simhash_sig")(spark, dir).collect()
    val sigs = sigRows.map(_.getLong(1)).distinct.sorted
    println(s"[ladder] distinctSigs=${sigs.length}")
    val old4 = (0 until 4).map { c =>
      val lo = (c * bits) / 4
      val width = ((c + 1) * bits) / 4 - lo
      ((1L << width) - 1) << lo
    }
    val hist = new Array[Long](ht + 1)
    var escapes = 0L
    var i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        val x = sigs(i) ^ sigs(j)
        val h = java.lang.Long.bitCount(x)
        if (h <= ht) {
          hist(h) += 1
          if (old4.forall(m => (x & m) != 0L)) escapes += 1
        }
        j += 1
      }
      i += 1
    }
    println(s"[ladder] hammingHist=${hist.toList} old4Escapes=$escapes")
    // flip-position histogram over the exact pairs: does any bit range
    // never flip (which would make the old-4 escape condition
    // unreachable on natural data)?
    val flipPos = new Array[Long](bits)
    i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        var x = sigs(i) ^ sigs(j)
        if (java.lang.Long.bitCount(x) <= ht) {
          while (x != 0L) {
            flipPos(java.lang.Long.numberOfTrailingZeros(x)) += 1
            x &= x - 1
          }
        }
        j += 1
      }
      i += 1
    }
    println(s"[ladder] flipPos=${flipPos.toList}")

    // minhash: jacc distribution of cluster-split truth pairs
    val ids = graft.engine.Tables.documents(spark, dir).select(col("doc_id"))
    val famPairs = ids.toDF("doc_a").join(ids.toDF("doc_b"),
      col("doc_a") % 10000000L === col("doc_b") % 10000000L &&
        col("doc_a") < col("doc_b"))
    val shd = graft.queries.Dedup.sharedCappedShingles(spark, dir)
    val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val truth = famPairs
      .join(shd.toDF("doc_a", "sh"), "doc_a")
      .join(shd.toDF("doc_b2", "sh2"),
        col("doc_b") === col("doc_b2") && col("sh") === col("sh2"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .selectExpr("doc_a", "doc_b",
        "CAST(inter AS DOUBLE) / (na + nb - inter) AS jacc")
      .where("jacc >= 0.5").persist()
    println(s"[ladder] truthPairs=${truth.count()}")
    val lsh = graft.SparkEntry.queries("dedup_minhash_pairs")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val missed = truth.join(lsh, Seq("doc_a", "doc_b"), "left_anti").persist()
    val labels = graft.SparkEntry.queries("dedup_clusters")(spark, dir)
    val split = missed
      .join(labels.toDF("doc_a", "ca"), Seq("doc_a"), "left")
      .join(labels.toDF("doc_b", "cb"), Seq("doc_b"), "left")
      .where(col("ca").isNull || col("cb").isNull || col("ca") =!= col("cb"))
      .persist()
    println(s"[ladder] missed=${missed.count()} split=${split.count()}")
    split.selectExpr("floor(jacc * 20) / 20 AS jb").groupBy("jb").count()
      .orderBy(col("jb")).collect()
      .foreach(r => println(s"[ladder] splitJacc ${r.get(0)} -> ${r.getLong(1)}"))
    truth.selectExpr("floor(jacc * 20) / 20 AS jb").groupBy("jb").count()
      .orderBy(col("jb")).collect()
      .foreach(r => println(s"[ladder] truthJacc ${r.get(0)} -> ${r.getLong(1)}"))
    spark.stop()
  }
}
