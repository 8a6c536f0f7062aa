package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.engine.Sessions
import graft.engine.sinks.{EvolvingTableSink, ParquetAppendSink}
import graft.engine.sources.Sources
import graft.engine.stream.StreamProcessor
import graft.fixtures.EventGen

/** Runnable end-to-end demo of the ingestion pipeline (the reference's
  * producer -> consumer -> analytical read loop, reference: README.md:3):
  * generates fault-injected batch files, streams them through
  * parse/route/dual-sink, and prints the dead-letter breakdown the
  * reference demos in DuckDB (reference: demos/duckdb.tape:33-34).
  *
  * Usage: runMain graft.IngestDemo [workDir] [nBatches] [eventsPerBatch]
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val root = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft_ingest_demo").toString))
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(2).map(_.toInt).getOrElse(50)

    val spark = Sessions.local(8, "graft-ingest-demo")
    val gen = new EventGen(seed = 42L, corruptionChance = 0.1,
      invalidSchemaChance = 0.1)
    gen.writeBatchFiles(root.resolve("in"), nBatches, perBatch)

    val bronze = new EvolvingTableSink(root.resolve("bronze").toString)
    val dead = new ParquetAppendSink(root.resolve("dead_letters").toString)
    val proc = new StreamProcessor(bronze, dead,
      checkpointLocation = root.resolve("checkpoint").toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"))

    val query = proc.start(Sources.textDirStream(spark, root.resolve("in").toString))
    query.processAllAvailable()
    proc.progressSummary(query).foreach(p => println(s"[demo] $p"))
    query.stop()

    val bronzeDf = bronze.read(spark)
    println(s"[demo] bronze rows: ${bronzeDf.count()}")
    bronzeDf.groupBy("event_type").count().orderBy("event_type").show()
    val deadDf = spark.read.parquet(dead.path)
    println(s"[demo] dead-letter rows: ${deadDf.count()}")
    deadDf.groupBy("_dead_letter_reason").count().orderBy("_dead_letter_reason").show()

    // restart on the same checkpoint: no new input, no duplicates
    val q2 = proc.start(Sources.textDirStream(spark, root.resolve("in").toString))
    q2.processAllAvailable()
    q2.stop()
    println(s"[demo] bronze rows after restart: ${bronze.read(spark).count()}")

    // Silver layer: batch dedup downstream of ingest (the reference
    // defers dedup here, reference: README.md:58-72)
    val silverCount = graft.engine.silver.Silver.compact(
      spark, bronze, root.resolve("silver").toString)
    println(s"[demo] silver rows after dedup: $silverCount")
    spark.stop()
  }
}
