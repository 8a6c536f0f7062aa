package graft.engine.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming/batch sources for raw batch files (reference:
  * src/consumer/data_sources.py:9-50). The text format is load-bearing:
  * corrupted (non-JSON) bytes must survive to the parser as rows, so the
  * source never attempts JSON itself (data_sources.py:13).
  */
object Sources {

  /** S1: monitor a directory; each new file's lines become rows
    * (`value: string`).
    */
  def textDirStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream.format("text").load(path)

  /** Batch variant for reprocessing/backfill over the same layout. */
  def textDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").load(path)

  /** S2: s3a path rendering (reference: src/consumer/utilities.py:6-10).
    * Same source, object-store path — the cluster deployment path; not
    * runnable in this offline build environment but kept for surface
    * parity.
    */
  def s3aPath(bucket: String, prefix: String): String =
    s"s3a://$bucket/$prefix"

  def textS3Stream(spark: SparkSession, bucket: String, prefix: String): DataFrame =
    textDirStream(spark, s3aPath(bucket, prefix))
}
