package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.multimodal.Multimodal

/** Edge cases of the multimodal seam that the oracle corpus (all docs
  * >= 10 words) never exercises: empty payloads, payloads shorter than a
  * frame/quarter, and hand-checked digests.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  test("StubDecoder handles empty and tiny payloads") {
    assert(Multimodal.StubDecoder.decode(Array.emptyByteArray).toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    // 3 bytes: quarter bounds are floor(q*3/4) -> [0,0) [0,1) [1,2) [2,3),
    // i.e. the first quarter is empty and each later one holds one byte
    val f = Multimodal.StubDecoder.decode(Array[Byte](10, 20, 30))
    assert(f.toSeq == Seq(0.0, 10.0, 20.0, 30.0))
  }

  test("sampleFrames: counts and digest match hand computation") {
    val s = spark
    import s.implicits._
    // 40 bytes of value 1: blocks = 2 (frameLen 16), stride 4 keeps block 0
    val payload = Array.fill[Byte](40)(1)
    val media = Seq((1L, payload)).toDF("doc_id", "media")
    val r = Multimodal.sampleFrames(media, frameLen = 16, stride = 4).collect().head
    assert(r.getLong(1) == 40L)   // n_bytes
    assert(r.getLong(2) == 1L)    // n_frames: ceil(2/4) -> just block 0
    assert(r.getLong(3) == 16L)   // digest: 16 bytes of 1

    // shorter than one frame: zero frames, zero digest
    val tiny = Seq((2L, Array[Byte](5, 5))).toDF("doc_id", "media")
    val t = Multimodal.sampleFrames(tiny).collect().head
    assert(t.getLong(2) == 0L && t.getLong(3) == 0L)
  }

  test("mediaTable carries payload bytes and typed metadata") {
    val s = spark
    import s.implicits._
    val docs = Seq((7L, "abcd")).toDF("doc_id", "text")
    val m = Multimodal.mediaTable(docs).collect().head
    assert(m.getAs[Array[Byte]]("media").toSeq == "abcd".getBytes("UTF-8").toSeq)
    val meta = m.getStruct(m.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 4L)
  }
}
