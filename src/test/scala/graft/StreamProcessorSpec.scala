package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ingest.{EventSchema, JsonArrayBatchParser, Router}
import graft.engine.sinks.{EvolvingTableSink, ParquetAppendSink}
import graft.engine.sources.Sources
import graft.engine.stream.StreamProcessor
import graft.fixtures.EventGen

/** End-to-end streaming smoke (reference: the full consumer pipeline,
  * src/consumer/stream_processor.py:146-167): EventGen batch files ->
  * text dir stream -> parse/route -> bronze + dead-letter sinks, with
  * checkpoint restart not duplicating batches.
  */
class StreamProcessorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  test("streams batch files to bronze and dead-letter sinks, exactly once across restarts") {
    val root = Files.createTempDirectory("graft_stream")
    val inDir = root.resolve("in")
    val gen = new EventGen(seed = 7L, corruptionChance = 0.3, invalidSchemaChance = 0.2)
    gen.writeBatchFiles(inDir, nBatches = 5, eventsPerBatch = 20)

    val bronze = new EvolvingTableSink(root.resolve("bronze").toString)
    val dead = new ParquetAppendSink(root.resolve("dead").toString)
    val proc = new StreamProcessor(
      bronze, dead,
      checkpointLocation = root.resolve("ckpt").toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"))

    val q1 = proc.start(Sources.textDirStream(spark, inDir.toString))
    q1.processAllAvailable()
    q1.stop()

    // expected counts from the batch path over the same files
    val expected = Router.withReason(
      new JsonArrayBatchParser().parse(Sources.textDir(spark, inDir.toString)))
    val expValid = expected.filter(s"${EventSchema.DeadLetterReason} IS NULL").count()
    val expDead = expected.filter(s"${EventSchema.DeadLetterReason} IS NOT NULL").count()
    assert(expValid > 0 && expDead > 0, "fixture should produce both classes")

    def bronzeCount = bronze.read(spark).count()
    def deadCount = spark.read.parquet(dead.path).count()
    assert(bronzeCount == expValid)
    assert(deadCount == expDead)
    assert(proc.lastBatchCounts._1 + proc.lastBatchCounts._2 > 0)

    // restart on the same checkpoint with no new data: no duplicates
    val q2 = proc.start(Sources.textDirStream(spark, inDir.toString))
    q2.processAllAvailable()
    q2.stop()
    assert(bronzeCount == expValid)
    assert(deadCount == expDead)

    // one more file: only its rows are appended
    gen.writeBatchFiles(inDir, nBatches = 1, eventsPerBatch = 10)
    val q3 = proc.start(Sources.textDirStream(spark, inDir.toString))
    q3.processAllAvailable()
    q3.stop()
    val expected2 = Router.withReason(
      new JsonArrayBatchParser().parse(Sources.textDir(spark, inDir.toString)))
    assert(bronzeCount == expected2.filter(s"${EventSchema.DeadLetterReason} IS NULL").count())
    assert(deadCount == expected2.filter(s"${EventSchema.DeadLetterReason} IS NOT NULL").count())
  }

  test("in-line maintenance compacts and expires without touching results") {
    val root = Files.createTempDirectory("graft_stream_maint")
    val inDir = root.resolve("in")
    val gen = new EventGen(seed = 23L, corruptionChance = 0.2, invalidSchemaChance = 0.1)
    gen.writeBatchFiles(inDir, nBatches = 6, eventsPerBatch = 15)

    val bronze = new EvolvingTableSink(root.resolve("bronze").toString)
    val dead = new ParquetAppendSink(root.resolve("dead").toString)
    val proc = new StreamProcessor(
      bronze, dead,
      checkpointLocation = root.resolve("ckpt").toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"),
      maintenanceEvery = 2, maintenanceKeepSnapshots = 1)
    // one file per micro-batch so maintenance actually fires mid-stream
    val q = proc.start(spark.readStream.option("maxFilesPerTrigger", 1)
      .text(inDir.toString))
    q.processAllAvailable()
    q.stop()

    val expected = Router.withReason(
      new JsonArrayBatchParser().parse(Sources.textDir(spark, inDir.toString)))
      .filter(s"${EventSchema.DeadLetterReason} IS NULL").count()
    assert(bronze.read(spark).count() == expected,
      "maintenance must never change the visible rows")
    // compaction + expiry actually ran: far fewer live dirs than batches
    val dirs = new java.io.File(root.resolve("bronze").toString).listFiles()
      .map(_.getName).count(_.startsWith("_batch_id="))
    assert(dirs < 6, s"expected compacted dir count, got $dirs")
    // replay safety is untouched: a restart appends nothing
    val q2 = proc.start(spark.readStream.option("maxFilesPerTrigger", 1)
      .text(inDir.toString))
    q2.processAllAvailable()
    q2.stop()
    assert(bronze.read(spark).count() == expected)
    // r14 incremental contract: run maintenance to quiescence, then a
    // further tick with NO new small dirs must be a no-op — the stream's
    // recurring maintenance never rewrites its own settled outputs
    bronze.compactBatches(spark, targetBytes = 128L * 1024 * 1024, byDay = true)
    assert(bronze.compactBatches(spark,
      targetBytes = 128L * 1024 * 1024, byDay = true).isEmpty,
      "a maintenance tick with no new small dirs must be a no-op")
    assert(bronze.read(spark).count() == expected)
  }

  test("schema evolution flows through the streaming sink (purchase adds product_id)") {
    val root = Files.createTempDirectory("graft_stream_evo")
    val bronze = new EvolvingTableSink(root.resolve("bronze").toString)
    val dead = new ParquetAppendSink(root.resolve("dead").toString)
    val proc = new StreamProcessor(
      bronze, dead,
      checkpointLocation = root.resolve("ckpt").toString,
      trigger = Trigger.ProcessingTime("100 milliseconds"))

    val inDir = root.resolve("in")
    // page_view-only first (no product_id values), then purchases appear
    val gen = new EventGen(seed = 11L)
    gen.writeBatchFiles(inDir, nBatches = 3, eventsPerBatch = 15)
    val q = proc.start(Sources.textDirStream(spark, inDir.toString))
    q.processAllAvailable()
    q.stop()

    val back = bronze.read(spark)
    assert(back.columns.contains("product_id"))
    val types = back.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("page_view", "purchase")))
    // purchases carry product_id, page_views do not
    assert(back.filter("event_type = 'purchase' AND product_id IS NULL").count() == 0)
    assert(back.filter("event_type = 'page_view' AND product_id IS NOT NULL").count() == 0)
  }
}
