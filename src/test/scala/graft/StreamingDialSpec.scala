package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the STREAMING side of the corpus-width ladder (r16, verdict
  * #6): a bronze documents table that grows in place across
  * micro-batches must re-key signatures at the wider ladder width
  * MID-STREAM — through the same (dir, fingerprint) freshened caches
  * the batch queries use — instead of pinning batch-0's width for the
  * query lifetime. The spec streams two micro-batches through a
  * foreachBatch signer; between them the bronze dir grows past the
  * 5000-doc simhash anchor, and the recorded widths must move 32 → 36.
  */
class StreamingDialSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private def writeDocs(dir: String, from: Long, until: Long): Unit = {
    spark.range(from, until)
      .selectExpr("id AS doc_id",
        "concat('alpha beta gamma delta epsilon zeta eta theta doc ', id) AS text")
      .coalesce(1)
      .write.mode("append").parquet(s"$dir/documents.parquet")
  }

  test("a bronze table growing past a ladder boundary re-keys mid-stream (32 -> 36)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dial_stream_").toString
    graft.engine.util.Fs.deleteOnExit(java.nio.file.Paths.get(dir))
    writeDocs(dir, 0L, 4000L) // below the 5000-doc anchor -> 32 bits
    assert(graft.engine.stream.DialedSigner.currentSimhashBits(spark, dir) == 32)

    val widths = scala.collection.mutable.ListBuffer.empty[Int]
    val maxSig = scala.collection.mutable.ListBuffer.empty[Long]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val (signed, bits) =
          graft.engine.stream.DialedSigner.signBatch(spark, df, dir)
        widths += bits
        val mx = signed.agg(org.apache.spark.sql.functions.max("simhash")).head
        maxSig += (if (mx.isNullAt(0)) 0L else mx.getLong(0))
        (): Unit
      }
      .start()
    try {
      in.addData((1L, "the quick brown fox jumps over the lazy dog again and again"))
      q.processAllAvailable()
      // the bronze table grows IN PLACE past the anchor between batches
      writeDocs(dir, 4000L, 6000L)
      in.addData((2L, "the quick brown fox jumps over the lazy dog again and again"))
      q.processAllAvailable()
    } finally q.stop()

    assert(widths.toList == List(32, 36),
      s"mid-stream re-key expected widths 32 then 36, got $widths — " +
        "the signer is pinning batch-0's width (stale fingerprint cache?)")
    // the width is not just reported — the mask actually widens
    assert(maxSig.head <= (1L << 32) - 1)
  }
}
