package graft.engine.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads ride through the
  * engine as opaque BINARY columns with typed metadata; decode and
  * feature-extraction run partition-wise over the binary batches (the
  * same batch shape an Arrow/Pandas-UDF pipeline uses on a Python stack).
  *
  * The reference has no media path (its only payloads are JSON events);
  * this is the §7.6 training-data-pipeline extension. The decode step is
  * a STUB: the real image/audio codecs are not in this build environment,
  * so `StubDecoder` computes deterministic byte statistics where a real
  * deployment would plug a native decoder behind the same `MediaDecoder`
  * seam. Everything around the stub — binary schema, metadata struct,
  * partition-wise iteration, feature vector output — is real and tested.
  *
  * Scale notes: the media table is a narrow projection of the source
  * (no shuffle); feature extraction is mapPartitions, so one task per
  * input split streams its binary batch through the decoder without
  * driver involvement — exactly the layout a 1000-executor cluster
  * needs for 100 TB of media (tune spark.sql.files.maxPartitionBytes so
  * a partition's payload fits executor memory).
  */
object Multimodal {

  /** Pluggable decode seam — a real deployment binds e.g. a JNI image
    * decoder here.
    */
  trait MediaDecoder extends Serializable {
    def decode(media: Array[Byte]): Array[Double]
  }

  /** Deterministic stand-in for a media decoder: per-quarter mean byte
    * values (integer byte sums, then one double division — exactly
    * reproducible in the DuckDB oracle for ASCII payloads).
    */
  object StubDecoder extends MediaDecoder {
    override def decode(media: Array[Byte]): Array[Double] = {
      val n = media.length
      Array.tabulate(4) { q =>
        val from = q * n / 4
        val until = (q + 1) * n / 4
        var s = 0L
        var i = from
        while (i < until) { s += media(i) & 0xff; i += 1 }
        if (until > from) s.toDouble / (until - from) else 0.0
      }
    }
  }

  /** Opaque media table: binary payload + typed metadata struct. Uses the
    * documents' text bytes as the stand-in payload.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Frame sampling over the opaque payload: split into fixed-size frames
    * (stand-in for video frames / audio windows), keep every `stride`-th
    * frame, and emit the sampled-frame count plus an integer digest (sum
    * of sampled bytes — order-free, so exactly reproducible). Runs
    * partition-wise like the decoder: at 100 TB each input split streams
    * its payloads through the sampler with no shuffle and no driver
    * involvement; a real deployment swaps the byte-block logic for a
    * keyframe extractor behind the same seam.
    */
  def sampleFrames(media: DataFrame, frameLen: Int = 16, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val blocks = bytes.length / frameLen
          var nFrames = 0L
          var digest = 0L
          var b = 0
          while (b < blocks) {
            var i = b * frameLen
            val end = i + frameLen
            while (i < end) { digest += bytes(i) & 0xff; i += 1 }
            nFrames += 1
            b += stride
          }
          (id, bytes.length.toLong, nFrames, digest)
        }
      }
      .toDF("doc_id", "n_bytes", "n_frames", "digest")
  }

  /** Partition-wise decode: one decoder pass per input split, no shuffle,
    * no driver round-trip.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => (id, bytes.length.toLong, decoder.decode(bytes)) }
      }
      .toDF("doc_id", "n_bytes", "features")
  }
}
