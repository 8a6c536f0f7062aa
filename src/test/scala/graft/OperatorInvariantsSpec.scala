package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent re-derivations of the round-6 operators' semantics —
  * HITS recomputed in plain Scala from the declared dup-pair query,
  * winnowing recomputed per document from the raw text, and the binary-
  * quantization shortlist checked against the exact brute-force top-k —
  * so each operator is pinned by a second implementation, not only by
  * the DuckDB oracle mirroring the same SQL shape.
  */
class OperatorInvariantsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")
  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("graph_hits_dups matches a driver-side HITS recomputation") {
    val pairs = q("dedup_minhash_pairs").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val a1 = edges.groupBy(_._2).map { case (v, es) => v -> es.length.toLong }
    val h1 = edges.groupBy(_._1).map { case (v, es) =>
      v -> es.map(e => a1(e._2)).sum }
    val a2 = edges.groupBy(_._2).map { case (v, es) =>
      v -> es.map(e => h1(e._1)).sum }
    val got = q("graph_hits_dups").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (v, hub, auth) =>
      assert(hub == h1(v), s"hub($v)")
      assert(auth == a2(v), s"auth($v)")
    }
    assert(got.map(_._1).toSet == h1.keySet, "vertex set mismatch")
  }

  test("text_winnow_fingerprint matches a per-document Scala recomputation") {
    val P = 1000000007L
    def winnow(text: String): (Long, Long, Long) = {
      val t = text.toLowerCase
      val hs = (0 to t.length - 6).map { p =>
        t.substring(p, p + 6).foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
      }
      val mins = (0 to hs.length - 4).map(qi => hs.slice(qi, qi + 4).min)
      val fps = mins.distinct.sorted
      val fh = fps.foldLeft(0L)((acc, x) => (acc * 31 + x) % P)
      (hs.length.toLong, fps.length.toLong, fh)
    }
    val docs = graft.engine.Tables.documents(spark, d)
      .where(length(col("text")) >= 9).where(col("doc_id") < 25)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("text_winnow_fingerprint")
      .where(col("doc_id") < 25).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ng, nf, fh) = winnow(docs(r.getLong(0)))
      assert(r.getLong(1) == ng, s"n_grams(${r.getLong(0)})")
      assert(r.getLong(2) == nf, s"n_fp(${r.getLong(0)})")
      assert(r.getLong(3) == fh, s"fp_hash(${r.getLong(0)})")
    }
  }

  test("sim_binary_quantize: 5 ranked rows per query, Hamming bounds, approx <= exact") {
    val rows = q("sim_binary_quantize").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.forall(_._2.length == 5))
    assert(rows.forall(r => r._4 >= 0 && r._4 <= 64))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._5).zip(sorted.map(_._5).tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
    }
    // shortlist rerank can't beat the exact scan: top-1 cosine per query
    // is at most the brute-force top-1 from sim_topk_cosine
    val exact = q("sim_topk_cosine").where(col("rn") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    byQ.foreach { case (qid, g) =>
      val approxTop = g.minBy(_._2)._5
      assert(approxTop <= exact(qid) + 1e-9, s"query $qid: approx beats exact?")
    }
  }
}
